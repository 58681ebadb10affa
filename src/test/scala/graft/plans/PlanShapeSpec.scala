package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Physical-plan regression guards for the shapes the 100 TB story relies
  * on (PLANS.md): these FAIL if a refactor silently reintroduces a
  * full-scan, an extra shuffle, or a cloned expensive expression.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("parquet scan: filter pushdown + column pruning reach the reader") {
    val df = graft.io.Sources.table(spark, sf, "lineitem")
      .filter(col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"),
      s"filter not pushed:\n$p")
    // pruned read schema: only the two referenced columns
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$p")
  }

  test("q67-style keep-first-per-digest prunes map-side (WindowGroupLimit)") {
    val docs = graft.io.Sources.table(spark, sf, "documents")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val df = docs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
    val p = plan(df)
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$p")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, // Partial before the exchange + Final
      s"expected partial+final WindowGroupLimit:\n$p")
  }

  test("chunkByTokens is map-only: one Generate, no shuffle") {
    val df = graft.text.TextAnalysis.chunkByTokens(
      graft.io.Sources.table(spark, sf, "documents"), "text", "doc_id", 40, 32)
    val p = plan(df)
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
    assert("Generate".r.findAllIn(p).size == 1, s"expected exactly one Generate:\n$p")
  }

  test("packSequences adds exactly one shard-key exchange (the window)") {
    val chunks = Seq(("A", 1L, 0, 300), ("A", 1L, 1, 300)).toDF("shard", "doc_id", "chunk_idx", "n_tok")
    val df = graft.text.TextAnalysis.packSequences(
      chunks, Seq("shard"), Seq("doc_id", "chunk_idx"), "n_tok", 512)
    val p = plan(df)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one hash exchange:\n$p")
    assert(p.contains("Window"), s"expected a window:\n$p")
  }

  test("mirrorable seasonal fit: one key exchange, in-partition sort, no extra shuffle") {
    val ev = graft.io.Sources.table(spark, sf, "events")
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) / 1e6).as("t_sec"), col("value"))
    val df = graft.ml.SeasonalRegression.fitPredictMirrorable(
      ev, Seq("user_id"), "t_sec", "value", period = 86400.0, harmonics = 2)
    val p = plan(df)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one key exchange:\n$p")
    // the per-series pass sorts WITHIN partitions — a global Sort (range
    // exchange) would mean the one-pass-per-series contract broke
    assert(!p.contains("Exchange rangepartitioning"),
      s"global sort crept in:\n$p")
  }

  test("q17-style fit-then-apply broadcasts the stats side") {
    val ev = graft.io.Sources.table(spark, sf, "events")
    val stats = ev.groupBy(col("event_type"))
      .agg(avg(col("value")).as("mu"))
    val df = ev.join(broadcast(stats), "event_type")
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"stats join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected sort-merge join:\n$p")
  }

  test("decontaminate never shuffles the training side (both joins broadcast)") {
    val docs = graft.io.Sources.table(spark, sf, "documents")
    val df = graft.dedup.Dedup.decontaminate(
      docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0),
      "text", "doc_id", 8)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"gram probe must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"training scan must not sort-merge:\n$p")
    // the contaminated-id anti join is the broadcast kind too
    assert("BroadcastHashJoin.*LeftAnti".r.findAllIn(p).nonEmpty,
      s"anti join must broadcast:\n$p")
  }

  test("winnowFingerprints: one doc-key exchange, one Generate") {
    val df = graft.text.TextAnalysis.winnowFingerprints(
      graft.io.Sources.table(spark, sf, "documents"), "text", "doc_id", 3, 4)
    val p = plan(df)
    // doc_id hash exchange feeds the window; the final distinct reuses it
    // (distinct keys start with doc_id) — AQE may add one more for the
    // distinct but never a third
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"too many shuffles:\n$p")
    assert("Generate".r.findAllIn(p).size == 1, s"expected one Generate:\n$p")
  }

  test("resampleMixture filters map-side behind a broadcast threshold join") {
    val docs = graft.io.Sources.table(spark, sf, "documents")
    val df = graft.text.TextAnalysis.resampleMixture(
      docs, "lang", "doc_id", Map("en" -> 0.5, "fr" -> 0.5))
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"threshold join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus scan must not sort-merge:\n$p")
  }

  test("native single-pass kernels appear once per row in the plan") {
    val docs = graft.io.Sources.table(spark, sf, "documents")
    val p = plan(docs.select(
      graft.text.TextAnalysis.qualityScore(col("text")).as("q"),
      graft.text.TextAnalysis.langId(col("text")).as("l")))
    // exactly one quality_score and one lang_id_argmax node — the cloned
    // composable trees carried 5 count_in_set + repeated split() nodes
    assert("quality_score".r.findAllIn(p).size == 1, s"quality_score cloned:\n$p")
    assert("lang_id_argmax".r.findAllIn(p).size == 1, s"lang_id_argmax cloned:\n$p")
  }

  test("pointInInterval plans as an equi-join, never BroadcastNestedLoop") {
    val pts = Seq((1L, 10L)).toDF("pid", "p")
    val ivs = Seq((1L, 5L, 15L)).toDF("iid", "s", "e")
    val p = plan(graft.joins.RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", 4L))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to nested loop:\n$p")
    // the bucket key must be the join key of a hash-based join
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"expected an equi-join on the bucket:\n$p")
  }

  test("saltedInner keeps an equi-join on (keys, salt) with no nested loop") {
    val l = Seq((1L, "a")).toDF("k", "lv")
    val r = Seq((1L, "b")).toDF("k", "rv")
    val p = plan(graft.joins.SkewJoin.saltedInner(l, r, Seq("k"), 8))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"salted join degenerated:\n$p")
    assert(p.contains("__salt"), s"salt key missing from the join:\n$p")
  }

  test("heavyHitters verify pass pushes the candidate isin filter to parquet") {
    val ev = graft.io.Sources.table(spark, sf, "events")
      .select(col("user_id").as("account"))
    val df = graft.metrics.Sketches.heavyHitters(ev, "account", 64, 20L)
    val p = plan(df)
    // the second scan must carry a pushed In() predicate — that is the
    // whole point: row groups outside the candidate set never decompress
    assert("PushedFilters: \\[[^\\]]*In\\(user_id".r.findFirstIn(p).isDefined,
      s"isin not pushed:\n$p")
  }

  test("knnIvfMirrorable: corpus joins probes on cell, whole-stage cosine") {
    val rnd = new scala.util.Random(3)
    val data = (0 until 64).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian()))).toDF("vec_id", "v")
    val p = plan(graft.similarity.Similarity.knnIvfMirrorable(
      data, "vec_id", "v", nCells = 4, nProbe = 2, k = 3, iters = 1))
    // the corpus side must reach the scorer through an equi-join on the
    // cell id — a nested loop here is the all-pairs scan IVF exists to
    // avoid (the 16-row probe/centroid cross join is bounded and fine)
    assert(!p.contains("CartesianProduct"), s"IVF degenerated to all-pairs:\n$p")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("BroadcastHashJoin"), s"expected an equi-join on cell:\n$p")
    // cosine_sim must be inside a WholeStageCodegen span, not a fallback
    // below it — the pair scorer is the hot loop
    val stages = p.split("WholeStageCodegen").count(_.contains("cosine_sim"))
    assert(stages >= 1, s"cosine_sim fell out of codegen:\n$p")
    graft.similarity.Similarity.clearCaches()
  }

  test("decontaminateBloom: training side broadcast-joined, never sort-merged") {
    val docs = graft.io.Sources.table(spark, sf, "documents")
    val df = graft.dedup.Dedup.decontaminateBloom(
      docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0),
      "text", "doc_id", 6, numBits = 1 << 16)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"verify join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"training scan must not sort-merge:\n$p")
  }

  test("q108 MC explode: the pass axis folds in a partial agg BEFORE the shuffle") {
    val p = plan(graft.SparkEntry.queries("q108_mc_welford")(spark, sf))
    assert("Generate".r.findAllIn(p).size == 1, s"expected one Generate:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one hash exchange:\n$p")
    // partial + final HashAggregate: the ×passes row blowup never
    // crosses the wire
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregation:\n$p")
    val (pre, post) = p.splitAt(p.indexOf("Exchange hashpartitioning"))
    assert(post.contains("Generate") && post.contains("HashAggregate"),
      s"Generate and the partial agg must sit below the exchange:\n$p")
    assert(pre.contains("HashAggregate"), s"final agg above the exchange:\n$p")
  }

  test("q110 fact melt: one keyed-window exchange, broadcast dim, partial agg") {
    val p = plan(graft.SparkEntry.queries("q110_fact_predictions")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"dim_horizon must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"a 6-row dim must never sort-merge:\n$p")
    assert("Generate".r.findAllIn(p).size == 1, s"expected one melt Generate:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected window + final-agg exchanges only:\n$p")
  }

  test("q107 daily targets: both leads collapse into ONE keyed window pass") {
    val p = plan(graft.SparkEntry.queries("q107_daily_targets")(spark, sf))
    assert("Window".r.findAllIn(p).size == 1,
      s"CollapseWindow must fuse the lead stack:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected only the window's key exchange:\n$p")
  }

  test("q61 contract check: the approx relation broadcasts back onto events") {
    val p = plan(graft.SparkEntry.queries("q61_percentiles_approx")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"the groups×ps relation must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no sort-merge for a 15-row side:\n$p")
  }

  test("q113 t-digest fold: count broadcast + one key exchange, no window, no global sort") {
    val p = plan(graft.SparkEntry.queries("q113_tdigest_values")(spark, sf))
    // the Backtest.run pattern plus the fit-statistic count join:
    // exchanges are exactly (counts agg, repartition(user_id)); the
    // per-user count relation broadcasts, never sort-merges
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected counts-agg + repartition exchanges only:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"count relation must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no sort-merge for the tiny count side:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"group-local sort must not become a global sort:\n$p")
    assert(p.contains("Sort ") && p.contains("MapPartitions"),
      s"expected in-partition sort feeding the fold:\n$p")
    assert(!p.contains("Window"), s"the fold IS the aggregation — no window:\n$p")
    // only the two referenced columns are read
    assert(p.contains("ReadSchema: struct<user_id:bigint,value:double>"),
      s"columns not pruned:\n$p")
  }

  test("q114 strategy grid: ONE symbol exchange for the whole grid (OPT-r17), no global sort") {
    val p = plan(graft.SparkEntry.queries("q114_strategy_grid")(spark, sf))
    // the whole grid walks in one sorted pass (Backtest.runGrid): the
    // bars are scanned, shuffled and sorted ONCE, not once per param set
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected the single symbol exchange + the param_id agg exchange:\n$p")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"grid must scan the bar feed exactly once:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"per-symbol sort must stay in-partition:\n$p")
    assert(!p.contains("Window"), s"the state machine IS the fold — no window:\n$p")
    // the per-param profit sums fold partially before the exchange
    // (3 aggregate rows cross the wire, not trades)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregation over the grid trades:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"grid-meta reinstatement join must broadcast:\n$p")
  }

  test("q115 mergeable digest: UDAF partials below the exchange, verdict side broadcast") {
    val p = plan(graft.SparkEntry.queries("q115_tdigest_mergeable")(spark, sf))
    // the t-digest UDAF must partial-aggregate map-side (sketches cross
    // the wire, not values) — typed Aggregator buffers plan as
    // ObjectHashAggregate partial+final
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"digest must partial-aggregate before the exchange:\n$p")
    // the groups×ps sketch relation broadcasts back onto events (q61's
    // contract-check shape) — never a sort-merge
    assert(p.contains("BroadcastHashJoin"), s"sketch relation must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no sort-merge for a 15-row side:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"no global sort:\n$p")
  }

  test("q116 strategy fact: champion pick is a TakeOrdered, flatten is one Generate") {
    val p = plan(graft.SparkEntry.queries("q116_strategy_fact")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"argmax over 3 rows must be a TakeOrdered, not a window/global sort:\n$p")
    assert(!p.contains("Window") && !p.contains("Exchange rangepartitioning"),
      s"no window / range exchange for the champion pick:\n$p")
    assert("Generate".r.findAllIn(p).size == 1,
      s"expected exactly one flatten Generate:\n$p")
  }

  test("q117 rollup: two digest-aggregate levels, sketches on the wire, verdict broadcast") {
    val p = plan(graft.SparkEntry.queries("q117_tdigest_rollup")(spark, sf))
    // level 1 (values → per-grain digests) and level 2 (digest merge)
    // both partial-aggregate: ≥ 4 ObjectHashAggregate nodes — raw
    // values never cross an exchange, stored sketches do
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 4,
      s"expected partial+final at both rollup levels:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"verdict side must broadcast:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"no global sort:\n$p")
  }

  test("q118 HLL contract: sketch partials below the exchange, no global sort") {
    val p = plan(graft.SparkEntry.queries("q118_hll_contract")(spark, sf))
    // the HLL sketch must partial-aggregate map-side (registers cross
    // the wire); the exact side rides the same keyed exchanges
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregation:\n$p")
    assert(p.contains("approx_count_distinct") || p.contains("hllsketch") ||
      p.contains("HyperLogLog"), s"HLL aggregate missing:\n$p")
    assert(!p.contains("Exchange rangepartitioning") && !p.contains("Window"),
      s"no global sort / window:\n$p")
  }

  test("q119 HLL rollup: partials at both levels, registers on the wire, verdict broadcast") {
    val p = plan(graft.SparkEntry.queries("q119_hll_rollup")(spark, sf))
    // level 1 (values → per-grain sketches) and level 2 (register-max
    // rollup) both partial-aggregate map-side: raw l_partkey values
    // never cross the level-2 exchange, 4096-byte registers do
    assert(p.contains("partial_sketchagg"),
      s"level-1 sketch must partial-aggregate map-side:\n$p")
    assert(p.contains("partial_mergesketchesagg"),
      s"level-2 rollup must partial-merge map-side:\n$p")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 6,
      s"expected partial+final at both levels plus the direct branch:\n$p")
    // TWO scans (grains; shared distinct feeding the direct sketch AND
    // the exact count as PLAIN aggregates — OPT-r17). Still no Expand:
    // the one-scan grouping-sets variant was measured 2.8-5.9× slower
    // at the ×100/×1000 grid points because Expand doubles the rows
    // entering the register-fold partial aggregate (SCALE-R15C), and
    // the r15 distinct-REWRITE hazard (countDistinct co-planned with
    // the UDAF keys register partials per (group, value) — 18.6 s) is
    // excluded by the explicit .distinct(): the fold below it stays
    // keyed by the group alone. This pin keeps both failure shapes out.
    assert("Scan parquet".r.findAllIn(p).size == 2 && !p.contains("Expand"),
      s"q119 must keep grains scan + one shared distinct scan:\n$p")
    assert(p.contains("partial_distinctagg"),
      s"direct sketch must partial-aggregate map-side over the distinct:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"verdict side must broadcast:\n$p")
    assert(!p.contains("Exchange rangepartitioning") && !p.contains("Window"),
      s"no global sort / window:\n$p")
  }

  test("q122 sketch-fact READ: grain pruning reaches the fact scan; no raw-events access") {
    val factPath = graft.SparkEntry.q122Ingest(spark, sf)
    val p = plan(graft.SparkEntry.q122Estimate(spark, factPath))
    // the whole point of the warehouse fact: the estimate side answers
    // from the committed sketch table with the grain range PUSHED into
    // the parquet reader — the raw events table appears nowhere
    assert(p.contains("GreaterThanOrEqual(grain,") &&
      p.contains("LessThanOrEqual(grain,"),
      s"grain range not pushed to the fact scan:\n$p")
    assert(!p.contains("events.parquet"),
      s"estimate side must never touch raw events:\n$p")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"estimate side reads exactly the fact table:\n$p")
    // both sketch families partial-aggregate map-side (centroids and
    // registers cross the wire, not re-expanded values)
    assert(p.contains("partial_mergedigestsagg") &&
      p.contains("partial_mergesketchesagg"),
      s"rollup aggregators must partial-merge map-side:\n$p")
    assert(!p.contains("Exchange rangepartitioning") && !p.contains("Window"),
      s"no global sort / window:\n$p")
  }

  test("q123 compacted-fact READ: same pruned one-scan shape as q122 (r16)") {
    val (factPath, _) = graft.SparkEntry.q123Ingest(spark, sf)
    // hour-unit bounds (r17: the compacted fact keeps its ingest units)
    val p = plan(graft.SparkEntry.q123Estimate(spark, factPath))
    // compaction must not cost the read face anything: the compacted
    // fact answers with the identical grain-pruned single-scan rollup
    assert(p.contains("GreaterThanOrEqual(grain,") &&
      p.contains("LessThanOrEqual(grain,"),
      s"grain range not pushed to the compacted-fact scan:\n$p")
    assert(!p.contains("events.parquet"),
      s"estimate side must never touch raw events:\n$p")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"estimate side reads exactly the compacted fact:\n$p")
    assert(p.contains("partial_mergedigestsagg") &&
      p.contains("partial_mergesketchesagg"),
      s"rollup aggregators must partial-merge map-side:\n$p")
  }

  test("q124 mixed-grain READ: the straddling range over a scoped-compacted fact keeps the q122 shape (r17)") {
    val (factPath, _) = graft.SparkEntry.q124Ingest(spark, sf)
    val p = plan(graft.SparkEntry.q123Estimate(spark, factPath))
    // the mixed fact (coarse day rows below the boundary, hourly rows
    // above) answers with the identical grain-pruned single-scan rollup
    assert(p.contains("GreaterThanOrEqual(grain,") &&
      p.contains("LessThanOrEqual(grain,"),
      s"grain range not pushed to the mixed-grain fact scan:\n$p")
    assert(!p.contains("events.parquet"),
      s"estimate side must never touch raw events:\n$p")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"estimate side reads exactly the fact table:\n$p")
    assert(p.contains("partial_mergedigestsagg") &&
      p.contains("partial_mergesketchesagg"),
      s"rollup aggregators must partial-merge map-side:\n$p")
  }

  test("q120 HLL set ops: ONE scan builds both side sketches (OPT-r17), no SMJ") {
    val p = plan(graft.SparkEntry.queries("q120_hll_setops")(spark, sf))
    // both sides' sketches come from one (priority, side) aggregation,
    // pivoted back with first(when) — 2 scans total (sketches + exact),
    // one partial_sketchagg, one broadcast join
    assert(p.contains("partial_sketchagg"),
      s"side sketches must partial-aggregate map-side:\n$p")
    assert("Scan parquet".r.findAllIn(p).size == 2,
      s"expected one sketch scan + one exact scan:\n$p")
    // the exact side is one pass of conditional COUNT(DISTINCT)s —
    // Expand + two-phase distinct aggregation, not three scans
    assert(p.contains("Expand"),
      s"exact side must use the Expand multi-distinct plan:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 1 &&
      !p.contains("SortMergeJoin"),
      s"the pivoted sketch relation must broadcast:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"no global sort:\n$p")
  }

  test("q121 hash sample: map-side top-k partials, one group exchange, NO window") {
    val p = plan(graft.SparkEntry.queries("q121_hash_sample")(spark, sf))
    // the whole point vs the oracle's row_number formulation: each task
    // ships <= k pairs per group, the corpus never shuffles whole
    assert(p.contains("partial_hashtopkagg"),
      s"top-k must partial-aggregate map-side:\n$p")
    assert(!p.contains("Window") && !p.contains("Exchange rangepartitioning"),
      s"sample must not window/global-sort the corpus:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one group-key exchange:\n$p")
    assert("Generate".r.findAllIn(p).size == 1,
      s"expected exactly one posexplode Generate:\n$p")
  }

  test("q76 tfidf: tf exchange is ONE shared stage — corpus tokenized once (OPT-r17)") {
    // runtime pin, not a static-plan pin: AQE stage reuse is decided at
    // materialization, and it only fires while the dfreq branch's copy
    // of the tf aggregate stays canonically identical (the `tf >= 1`
    // reuse anchor in TextAnalysis.tfidfTopTerms keeps the optimizer
    // from pruning the count out of that copy). One file scan in the
    // FINAL plan ⇔ the tokenize+dedup pass ran once; the separate
    // corpus-N scan is doc_id-only and pruned-column (asserted cheap).
    val df = graft.SparkEntry.queries("q76_tfidf")(spark, sf)
    df.collect()
    val fin = plan(df).split("== Initial Plan ==")(0)
    val scans = "FileScan parquet \\[[^\\]]*\\]".r.findAllIn(fin).toList
    val textScans = scans.filter(_.contains("text"))
    assert(textScans.size == 1,
      s"corpus must be tokenized exactly once (AQE reuse regressed):\n$fin")
    assert(scans.filterNot(_.contains("text")).forall(_.contains("doc_id")),
      s"non-text scans must be doc_id-only (the N count):\n$fin")
  }

  test("q90 dsir: gram stream persisted — corpus tokenized ONCE at cache build (OPT-r17)") {
    // the bucketed gram stream feeds the counting pass, the totals
    // fold and the scoring pass; persistGrams materializes it once and
    // every consumer reads the cache (InMemoryTableScan). The FileScan
    // lines in the final plan sit inside InMemoryRelation — the cache
    // BUILD recipe, executed once — so the pin is on cache reads, not
    // scan counts.
    val df = graft.SparkEntry.queries("q90_dsir_scores")(spark, sf)
    df.collect()
    val fin = plan(df).split("== Initial Plan ==")(0)
    assert("InMemoryTableScan".r.findAllIn(fin).size >= 2,
      s"count and score passes must read the persisted gram stream:\n$fin")
    assert(fin.contains("InMemoryRelation"),
      s"gram stream must be persisted (tokenize once):\n$fin")
    graft.text.TextAnalysis.clearCaches()
  }

  test("q111 trade metrics: aggregates the persisted trades, no recompute") {
    val p = plan(graft.SparkEntry.queries("q111_fact_trade_metrics")(spark, sf))
    assert(p.contains("InMemoryTableScan"),
      s"must reuse the persisted q46/q47 trades relation:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregation:\n$p")
    graft.SparkEntry.clearTradesCache()
  }
}
