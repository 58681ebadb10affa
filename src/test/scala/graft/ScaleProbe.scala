package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe (not part of the driver contract): replicate the sf0.1
  * events table 10× and 100× with disjoint user/event ids (1M and 10M
  * rows, 1.5k and 15k series) and time representative kernel queries at
  * each scale. Linear-ish growth = the partition strategy holds as the
  * series dimension grows, which is the 100 TB scaling axis.
  *
  *   sbt "Test/runMain graft.ScaleProbe"           — every section
  *   sbt "Test/runMain graft.ScaleProbe docs ann"  — only those sections
  *
  * Sections: docs (text/dedup kernels incl. q95 + dedupPipeline + CC),
  * events (the ts-kernel sweep + SCALE-LONG anchors), baseline (the
  * 9-head champion selection — the ~15 min block), r4 (range join /
  * heavy hitters / bloom / ANN serving), balance (q100 on replicated
  * embeddings dirs).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val want: String => Boolean =
      if (args.isEmpty) _ => true else args.toSet.contains _
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.io.Sources.table(spark, "/root/testdata/sf0.1", "events")

    // shards: scan-parallel file count for big replicas (the r13 layout
    // lesson — replicated rows compress so well that a naive write
    // collapses into 1-2 input splits and the probe times a single
    // decompressing core, not the kernel)
    def replicate(factor: Int, outDir: String, shards: Option[Int] = None): Unit = {
      val reps = spark.range(factor).withColumnRenamed("id", "rep")
      val rows = base.crossJoin(reps)
        .select(
          (col("event_id") + col("rep") * 100000000L).as("event_id"),
          col("ts"),
          (col("user_id") + col("rep") * 10000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
      shards.fold(rows)(rows.repartition(_))
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }

    // THE row-replication idiom for scan-parallel sharded replicas (the
    // r13 layout lesson below) — one definition for every table/round,
    // so the "same layout" premise cannot drift between probe sections
    def replicateSharded(src: org.apache.spark.sql.DataFrame, factor: Int,
        shards: Int, outFile: String): Unit =
      if (!new java.io.File(outFile).exists) {
        val reps = spark.range(factor).withColumnRenamed("id", "rep")
        src.crossJoin(reps).drop("rep").repartition(shards)
          .write.mode("overwrite").parquet(outFile)
      }

    // lineitem replicas; orders rides along unreplicated (q83's
    // interval side / q120's exact side)
    def ensureLiReplicas(): Unit = {
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select(col("l_suppkey"), col("l_partkey"), col("l_orderkey"),
          col("l_quantity"), col("l_shipdate"))
      val ord = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      for ((factor, shards, dir) <- Seq((100, 64, "/tmp/li100"), (1000, 512, "/tmp/li1000"))) {
        if (!new java.io.File(s"$dir/lineitem.parquet").exists) {
          replicateSharded(li, factor, shards, s"$dir/lineitem.parquet")
          ord.write.mode("overwrite").parquet(s"$dir/orders.parquet")
        }
      }
    }
    if (want("events") || want("r4")) {
      replicate(10, "/tmp/scale10")
      replicate(100, "/tmp/scale100")
    }

    if (want("events")) {
    // BASELINE anchor: the reference preprocesses 25,200-row series at
    // ws=144 (`sliding_windows.py` hot loop; BASELINE.md data scales).
    // The driver testdata never has series that long (scale adds USERS,
    // max 99 rows/user even at sf0.1), so build 4 reference-shaped
    // series from the same rows: q48's adaptive ws then picks 144 and
    // the timing is apples-to-apples with the reference's per-split
    // preprocessing scale.
    base.select(
        col("event_id"),
        timestamp_micros(lit(1577836800000000L) +
          (col("event_id") / 4).cast("long") * 3600000000L).as("ts"),
        (col("event_id") % 4).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet("/tmp/scalelong/events.parquet")

    val queries = Seq("q10_log_return", "q12_multi_horizon", "q14_rolling_stats",
      "q18_naive_mae", "q22_rolling_count_5d", "q48_preprocess_slice", "q44_stl_decompose",
      "q49_seasonal_fit", "q58_sessionize", "q62_deep_flatten",
      // round-7 spectral operators: scaling axis = number of series
      // (q96 one bounded collect per series; q97 map-only DFT per row)
      "q96_haar_dwt", "q97_multitaper",
      // round-7 ARIMA: one capped collect per series, kernel local —
      // time must track series COUNT (the q96 shape), never series×iters
      "q98_arima_fit", "q99_arima_order",
      // round-8: ACF/Ljung–Box — same axis as q98 (one capped collect
      // per series; time tracks series count, lags stay fixed)
      "q101_acf_ljungbox",
      // round-8: plot downsample — scan-shaped (one min/max agg + one
      // bucketed groupBy); output stays 500 rows at every scale
      "q102_plot_downsample",
      // round-11: W14 reversal (keyed window + generate, output 6× the
      // input rows) and J4 keyed positional concat (two keyed windows +
      // an equi-join on (user, position)) — axis = series count
      "q104_time_reversal", "q105_row_concat")
    // warm code paths
    queries.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      .write.mode("overwrite").format("noop").save())

    // q48 at ws=144 on 4 × 25,000-row series (the reference's shape)
    val tLong0 = System.nanoTime()
    SparkEntry.queries("q48_preprocess_slice")(spark, "/tmp/scalelong")
      .write.mode("overwrite").format("noop").save()
    println(f"SCALE-LONG q48 ws=144 on 4x25k-row series: ${(System.nanoTime() - tLong0) / 1e9}%.2f s")

    // M9 anchor: the reference fits one Prophet per ~25k-row split
    // (`predictor_plugin_prophet.py`, seconds-to-minutes per fit); the
    // mirrorable closed-form fit covers the same 4 × 25k-row shape in
    // one per-series pass.
    val tSeas0 = System.nanoTime()
    SparkEntry.queries("q49_seasonal_fit")(spark, "/tmp/scalelong")
      .write.mode("overwrite").format("noop").save()
    println(f"SCALE-LONG q49 seasonal fit on 4x25k-row series: ${(System.nanoTime() - tSeas0) / 1e9}%.2f s")

    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/scale10", "/tmp/scale100")) {
      val times = queries.map { q =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
        f"$q=${(System.nanoTime() - t0) / 1e9}%.2f"
      }
      println(s"SCALE $dir: ${times.mkString(" ")}")
    }
    } // want(events)

    // round-9: the plot SINK end-to-end (lastN → downsample → SVG
    // write) — q102 covers the downsample kernel; this measures the
    // full user path including lastN's approx_percentile threshold scan
    // and the bounded (≤ maxPoints) collect into the SVG writer, at
    // 1×/10×/100× the sf0.1 events table.
    // round-11: time ONLY the two new kernels (the full events sweep is
    // the expensive block; this section reuses its replicas)
    if (want("r11")) {
      if (!new java.io.File("/tmp/scale10/events.parquet").exists) replicate(10, "/tmp/scale10")
      if (!new java.io.File("/tmp/scale100/events.parquet").exists) replicate(100, "/tmp/scale100")
      val qs = Seq("q104_time_reversal", "q105_row_concat")
      qs.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
        .write.mode("overwrite").format("noop").save())
      for (dir <- Seq("/root/testdata/sf0.1", "/tmp/scale10", "/tmp/scale100")) {
        val times = qs.map { q =>
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
          f"$q=${(System.nanoTime() - t0) / 1e9}%.2f"
        }
        println(s"SCALE-R11 $dir: ${times.mkString(" ")}")
      }
    }

    // round-12: the promoted/new kernels — q61 (sketch agg + broadcast
    // of the groups×ps approx relation back onto events), q106
    // (broadcast 5-row stats apply), q107 (two leads in one keyed
    // window), q108 (explode ×10 folded by map-side partial agg before
    // the event_id shuffle), q109 (keyed window delta + broadcast
    // stats), q110 (Generate melt ×3 + broadcast dim join + grouped
    // exact-decimal rollup). Axis = row/series count; every shape is
    // keyed-window, broadcast, or partial-agg — nothing
    // single-partition, nothing driver-resident.
    if (want("r12")) {
      if (!new java.io.File("/tmp/scale10/events.parquet").exists) replicate(10, "/tmp/scale10")
      if (!new java.io.File("/tmp/scale100/events.parquet").exists) replicate(100, "/tmp/scale100")
      val qs = Seq("q61_percentiles_approx", "q106_minmax_norm",
        "q107_daily_targets", "q108_mc_welford", "q109_delta_rescale",
        "q110_fact_predictions")
      qs.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
        .write.mode("overwrite").format("noop").save())
      for (dir <- Seq("/root/testdata/sf0.1", "/tmp/scale10", "/tmp/scale100")) {
        val times = qs.map { q =>
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
          f"$q=${(System.nanoTime() - t0) / 1e9}%.2f"
        }
        println(s"SCALE-R12 $dir: ${times.mkString(" ")}")
      }
    }

    if (want("plots")) {
      if (!new java.io.File("/tmp/scale10/events.parquet").exists) replicate(10, "/tmp/scale10")
      if (!new java.io.File("/tmp/scale100/events.parquet").exists) replicate(100, "/tmp/scale100")
      for (dir <- Seq("/root/testdata/sf0.1", "/tmp/scale10", "/tmp/scale100")) {
        val ev = graft.io.Sources.table(spark, dir, "events")
          .select(unix_micros(col("ts")).cast("double").as("x"), col("value").as("y"))
        // warm the scan, then time the pieces and the whole
        ev.write.mode("overwrite").format("noop").save()
        val t0 = System.nanoTime()
        graft.io.Plots.lastN(ev, "x", 100000L).write.mode("overwrite").format("noop").save()
        val tLastN = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        graft.io.Plots.linePlot(ev, "x", Seq("y"), "/tmp/scaleprobe_plot.svg",
          plotPoints = 100000L, maxPoints = 1500)
        val tLine = (System.nanoTime() - t1) / 1e9
        println(f"SCALE-PLOTS $dir: lastN=$tLastN%.2f s linePlot_e2e=$tLine%.2f s")
      }
    }

    if (want("tech")) {
      if (!new java.io.File("/tmp/scale10/events.parquet").exists) replicate(10, "/tmp/scale10")
      if (!new java.io.File("/tmp/scale100/events.parquet").exists) replicate(100, "/tmp/scale100")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      for (dir <- Seq("/root/testdata/sf0.1", "/tmp/scale10", "/tmp/scale100")) {
        val ev = graft.io.Sources.table(spark, dir, "events")
        // derive OHLC like q103 so both families run their real shapes
        val ret1 = coalesce(col("value") - lag(col("value"), 1).over(w), lit(0.0))
        val base = ev.select(col("event_id"), col("user_id"), col("ts"),
          col("value").as("close"),
          (col("value") + lit(0.5) * abs(ret1)).as("high"),
          (col("value") - lit(0.3) * abs(ret1)).as("low"))
        base.write.mode("overwrite").format("noop").save() // warm scan
        val t0 = System.nanoTime()
        base.withColumn("tr", graft.ts.TechIndicators.trueRange(col("high"), col("low"), col("close"), w))
          .select(col("event_id"),
            graft.ts.TechIndicators.momentum(col("close"), w, 6).as("m"),
            graft.ts.TechIndicators.stochasticK(col("close"), col("high"), col("low"), w, 14).as("k"),
            graft.ts.TechIndicators.atrSma(col("tr"), w, 14).as("a"),
            graft.ts.TechIndicators.cci(col("high"), col("low"), col("close"), w, 20).as("c"))
          .write.mode("overwrite").format("noop").save()
        val tWin = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        graft.ts.TechIndicators.withRecursiveIndicators(base, Seq("user_id"),
          Seq("ts", "event_id"), "high", "low", "close")
          .write.mode("overwrite").format("noop").save()
        val tRec = (System.nanoTime() - t1) / 1e9
        println(f"SCALE-TECH $dir: window_family=$tWin%.2f s recursive_family=$tRec%.2f s")
      }
    }

    // Replicated documents (5k → 50k → 500k docs; replica docs get
    // disjoint ids but IDENTICAL text, so dup groups grow with the
    // factor — the adversarial case for candidate generation: a naive
    // all-pairs LSH would blow up quadratically). Shared by docs + r4.
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // dedicated docs replicas on the SAME uniform sharded layout
    // (docs100r, not the standing /tmp/docs100) so 100×→1000× exponents
    // compare kernels, not file counts; shared by r13 and r14b
    def replicateDocsSharded(factor: Int, shards: Int, outDir: String): Unit =
      if (!new java.io.File(s"$outDir/documents.parquet").exists) {
        val reps = spark.range(factor).withColumnRenamed("id", "rep")
        docs.crossJoin(reps)
          .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"),
            col("text"), col("lang"), col("source"), col("n_chars"))
          .repartition(shards)
          .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      }
    def replicateDocs(factor: Int, outDir: String): Unit = {
      val reps = spark.range(factor).withColumnRenamed("id", "rep")
      docs.crossJoin(reps)
        .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    }
    if (want("docs") || want("r4")) {
      replicateDocs(10, "/tmp/docs10")
      replicateDocs(100, "/tmp/docs100")
    }

    // round-13: the 1000× points on the heavy-tail kernels — the r12
    // verdict's remaining evidence gap: a 100× grid cannot resolve a
    // super-linear term that only dominates later. Per-kernel axes:
    //   - q55 / q83: row axis ×100/×1000 (60M/600M lineitem rows,
    //     group count FIXED so rows-per-group grows 1000×) — the
    //     two-phase distinct-agg expand and the bucketed range join
    //     must stay linear in the point stream;
    //   - q95 / q90: 500k/5M docs with every gram duplicated
    //     corpus-wide (q95's adversarial case) — the tokenize-once /
    //     gram-once handles and bucketed joins must stay linear;
    //   - identical-copy dedup at 1000×: candidate generation is
    //     inherently quadratic per dup group (1000² pairs per text),
    //     so the PRESCRIBED scale shape is measured — exact-first
    //     dedupPipeline, which collapses copy groups in one digest
    //     shuffle before banding (q56's CC consumes those pairs);
    //   - CC round growth (the q56 axis): a 1M-node path must close in
    //     ~log2(1e6) ≈ 20 star-contraction rounds, 10× the nodes of
    //     the standing 100k probe for ~1.2× the rounds.
    // Prints a growth exponent per kernel: log10(t_1000x / t_100x) —
    // 1.0 = linear in the replication factor, <1 sublinear.
    // round-13 extension: the events-axis kernels at the 1000× point
    // (100M rows, 150k series) — generalizes the heavy-tail 1000× table
    // to the r12-promoted shapes + the r13 queries. Sharded replica
    // write (the layout lesson: compressed replicas must not collapse
    // into single input splits).
    // round-13 ANN serving at the 1000× point (5M codes) — completes
    // the r4 1×/10×/100× serving grid one decade further: index build
    // must stay linear (bounded-sample fits + one assignment pass),
    // flat ADC search linear in the code count, IVF-PQ search
    // nProbe/nCells of it.
    if (want("r13a")) {
      val emb1k = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val reps = spark.range(1000).withColumnRenamed("id", "rep")
      val corpus = emb1k.crossJoin(reps)
        .select((col("vec_id") + col("rep") * 10000000L).as("vec_id"), col("v"))
        .repartition(256)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      corpus.count()
      val queries = corpus.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val tIdx0 = System.nanoTime()
      val idx = graft.similarity.Similarity.buildIvfPqIndex(
        corpus, "vec_id", "v", nCells = 64, m = 8, ksub = 16)
      val codes = idx.codes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      codes.count()
      val tIdx = (System.nanoTime() - tIdx0) / 1e9
      val t0 = System.nanoTime()
      graft.similarity.Similarity.knnPq(queries, codes,
          "qid", "vec_id", "qv", idx.codebooks, 10)
        .write.mode("overwrite").format("noop").save()
      val tFlat = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      graft.similarity.Similarity.searchIvfPq(idx, queries, "qid", "qv",
          nProbe = 8, k = 10)
        .write.mode("overwrite").format("noop").save()
      val tIvf = (System.nanoTime() - t1) / 1e9
      println(f"SCALE-R13A ANN 1000x (5000000 codes): " +
        f"index=$tIdx%.2f s flatPQsearch=$tFlat%.2f s ivfPQsearch=$tIvf%.2f s")
      codes.unpersist(); corpus.unpersist()
    }

    if (want("r13e")) {
      if (!new java.io.File("/tmp/scale1000/events.parquet").exists)
        replicate(1000, "/tmp/scale1000", shards = Some(512))
      val qs = Seq("q61_percentiles_approx", "q106_minmax_norm",
        "q107_daily_targets", "q108_mc_welford", "q109_delta_rescale",
        "q110_fact_predictions", "q113_tdigest_values", "q114_strategy_grid")
      qs.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
        .write.mode("overwrite").format("noop").save())
      val times = qs.map { q =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, "/tmp/scale1000").write.mode("overwrite")
          .format("noop").save()
        f"$q=${(System.nanoTime() - t0) / 1e9}%.2f"
      }
      println(s"SCALE-R13E /tmp/scale1000 (100M rows): ${times.mkString(" ")}")
    }

    // round-13 promoted queries on the events replicas: q113 (broadcast
    // count join + repartition(user) + in-partition sort + O(centroids)
    // sequential fold — axis = series count) and q114 (three independent
    // keyed backtest folds — axis = rows; each set is repartition(symbol)
    // + one pass). Both are the Backtest.run physical shape, so time
    // must track the row axis linearly.
    if (want("r13q")) {
      if (!new java.io.File("/tmp/scale10/events.parquet").exists) replicate(10, "/tmp/scale10")
      if (!new java.io.File("/tmp/scale100/events.parquet").exists) replicate(100, "/tmp/scale100")
      val qs = Seq("q113_tdigest_values", "q114_strategy_grid")
      qs.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
        .write.mode("overwrite").format("noop").save())
      for (dir <- Seq("/root/testdata/sf0.1", "/tmp/scale10", "/tmp/scale100")) {
        val times = qs.map { q =>
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
          f"$q=${(System.nanoTime() - t0) / 1e9}%.2f"
        }
        println(s"SCALE-R13Q $dir: ${times.mkString(" ")}")
      }
    }

    // round-14 promoted kernels: q115 (mergeable digest UDAF — axis =
    // rows; map-side partials are O(compression) per task and the
    // exchange carries SKETCHES, never values, so the wire cost is flat
    // in n) and q116 (q114's three walks + a TakeOrdered over 3 rows +
    // one Generate — rides the backtest row axis r13q already pinned).
    // The digest CONTRACT must hold at every scale, not just the
    // timing: tdigestDifferential re-checks the rank bound at the
    // 1000× point. streamingQuantiles scales on the tick axis with
    // O(compression) state per key — timed through the MemoryStream
    // differential (driver-fed by construction; the kernel under test
    // is the per-batch group-state fold).
    if (want("r14")) {
      if (!new java.io.File("/tmp/scale10/events.parquet").exists) replicate(10, "/tmp/scale10")
      if (!new java.io.File("/tmp/scale100/events.parquet").exists) replicate(100, "/tmp/scale100")
      if (!new java.io.File("/tmp/scale1000/events.parquet").exists)
        replicate(1000, "/tmp/scale1000", shards = Some(512))
      val qs = Seq("q115_tdigest_mergeable", "q116_strategy_fact",
        "q117_tdigest_rollup")
      qs.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
        .write.mode("overwrite").format("noop").save())
      for (dir <- Seq("/root/testdata/sf0.1", "/tmp/scale10", "/tmp/scale100")) {
        val times = qs.map { q =>
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
          f"$q=${(System.nanoTime() - t0) / 1e9}%.2f"
        }
        println(s"SCALE-R14 $dir: ${times.mkString(" ")}")
      }
      for (q <- Seq("q115_tdigest_mergeable", "q117_tdigest_rollup")) {
        val t115 = System.nanoTime()
        SparkEntry.queries(q)(spark, "/tmp/scale1000")
          .write.mode("overwrite").format("noop").save()
        println(f"SCALE-R14 /tmp/scale1000 (100M rows): " +
          f"$q=${(System.nanoTime() - t115) / 1e9}%.2f")
      }
      val (checks, viols, _, _, maxOver) =
        SparkEntry.tdigestDifferential(spark, "/tmp/scale1000")
      println(f"SCALE-R14 q115 bound at 100M rows (20M values/group): " +
        f"checks=$checks viols=$viols maxOver=$maxOver%.3f")
      for ((dir, label) <- Seq(("/root/testdata/sf0.1", "100k"), ("/tmp/scale10", "1M"))) {
        val t1 = System.nanoTime()
        val (ticks, keys, fm, nm, v, mo) =
          SparkEntry.streamingQuantilesDifferential(spark, dir, chunks = 10)
        println(f"SCALE-R14 streamingQuantiles $label: ticks=$ticks keys=$keys " +
          f"fold=$fm n=$nm viols=$v maxOver=$mo%.3f " +
          f"t=${(System.nanoTime() - t1) / 1e9}%.2f s")
      }
      // q118 on the r13 lineitem replicas (distinct counts are invariant
      // under replication, so the axis is scan + partial-dedup volume;
      // the HLL sketch side never shuffles values — registers only)
      if (new java.io.File("/tmp/li1000/lineitem.parquet").exists) {
        SparkEntry.queries("q118_hll_contract")(spark, "/root/testdata/sf0.01")
          .write.mode("overwrite").format("noop").save()
        for (dir <- Seq("/root/testdata/sf0.1", "/tmp/li100", "/tmp/li1000")) {
          val t0 = System.nanoTime()
          SparkEntry.queries("q118_hll_contract")(spark, dir)
            .write.mode("overwrite").format("noop").save()
          println(f"SCALE-R14 $dir: q118_hll_contract=${(System.nanoTime() - t0) / 1e9}%.2f")
        }
        val (checks, viols, maxOver) =
          SparkEntry.hllDifferential(spark, "/tmp/li1000")
        println(f"SCALE-R14 q118 bound at 600M rows: " +
          f"groups=$checks viols=$viols maxOver=$maxOver%.3f")
      }
    }

    if (want("r14b")) {
      // the HLL family: q119 rides the r13 lineitem axis (replication
      // keeps distinct counts and grain buckets invariant — the axis is
      // scan + map-side register-fold volume; only 4096-byte registers
      // ever cross an exchange), q120 rides an orders axis of the same
      // uniform sharded layout, and streamingDistinct mirrors the
      // streamingQuantiles ticks axis
      Seq("q119_hll_rollup", "q120_hll_setops").foreach(q =>
        SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
          .write.mode("overwrite").format("noop").save())
      ensureLiReplicas()
      if (!new java.io.File("/tmp/scale10/events.parquet").exists)
        replicate(10, "/tmp/scale10")
      if (new java.io.File("/tmp/li1000/lineitem.parquet").exists) {
        for (dir <- Seq("/root/testdata/sf0.1", "/tmp/li100", "/tmp/li1000")) {
          val t0 = System.nanoTime()
          SparkEntry.queries("q119_hll_rollup")(spark, dir)
            .write.mode("overwrite").format("noop").save()
          println(f"SCALE-R14B $dir: q119_hll_rollup=${(System.nanoTime() - t0) / 1e9}%.2f")
        }
        val (checks, viols, maxOver, lossless) =
          SparkEntry.hllRollupDifferential(spark, "/tmp/li1000")
        println(f"SCALE-R14B q119 bound at 600M rows: groups=$checks " +
          f"viols=$viols maxOver=$maxOver%.3f lossless=$lossless")
      }
      val ordScale = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      for ((factor, shards, dir) <- Seq((100, 64, "/tmp/ord100"), (1000, 512, "/tmp/ord1000")))
        replicateSharded(ordScale, factor, shards, s"$dir/orders.parquet")
      for (dir <- Seq("/root/testdata/sf0.1", "/tmp/ord100", "/tmp/ord1000")) {
        val t0 = System.nanoTime()
        val bad = SparkEntry.queries("q120_hll_setops")(spark, dir)
          .filter(!col("union_within") || !col("inter_within")).count()
        println(f"SCALE-R14B $dir: q120_hll_setops=${(System.nanoTime() - t0) / 1e9}%.2f " +
          f"violations=$bad")
      }
      for ((dir, label) <- Seq(("/root/testdata/sf0.1", "100k"), ("/tmp/scale10", "1M"))) {
        if (new java.io.File(s"${dir.stripSuffix("/")}/events.parquet").exists) {
          val t1 = System.nanoTime()
          val (ticks, keys, fm, em, v, mo) =
            SparkEntry.streamingDistinctDifferential(spark, dir, chunks = 10)
          println(f"SCALE-R14B streamingDistinct $label: ticks=$ticks keys=$keys " +
            f"fold=$fm est=$em viols=$v maxOver=$mo%.3f " +
            f"t=${(System.nanoTime() - t1) / 1e9}%.2f s")
        }
      }
      for ((dir, label) <- Seq(("/root/testdata/sf0.1", "100k"), ("/tmp/scale10", "1M"))) {
        if (new java.io.File(s"${dir.stripSuffix("/")}/events.parquet").exists) {
          val t1 = System.nanoTime()
          val (ticks, keys, fm, sm) =
            SparkEntry.streamingSampleDifferential(spark, dir, chunks = 10)
          println(f"SCALE-R14B streamingSample $label: ticks=$ticks keys=$keys " +
            f"fold=$fm sample=$sm t=${(System.nanoTime() - t1) / 1e9}%.2f s")
        }
      }
      // q121 on the sharded docs axis (5k/500k/5M docs): the map-side
      // top-k must stay scan-shaped — each task ships <= k pairs/group
      replicateDocsSharded(100, 64, "/tmp/docs100r")
      replicateDocsSharded(1000, 512, "/tmp/docs1000")
      SparkEntry.queries("q121_hash_sample")(spark, "/root/testdata/sf0.01")
        .write.mode("overwrite").format("noop").save()
      for (dir <- Seq("/root/testdata/sf0.1", "/tmp/docs100r", "/tmp/docs1000")) {
        val t0 = System.nanoTime()
        SparkEntry.queries("q121_hash_sample")(spark, dir)
          .write.mode("overwrite").format("noop").save()
        println(f"SCALE-R14B $dir: q121_hash_sample=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }

    if (want("r15")) {
      // the KEY axis (r14 probed ticks — flat): the 100 TB state-store
      // risk for the streaming sketch faces is key cardinality ×
      // per-key state (t-digest ≈ centroids×16 B compacted, HLL 4 KiB
      // registers, sample O(k)). Constant 2M ticks spread over 10k →
      // 1M keys, driven through REAL micro-batch queries (noop sink),
      // recording per-batch latency and the state store's own
      // numRowsTotal / memoryUsedBytes. Expectation: state memory
      // linear in keys (it IS per-key state — the design point is the
      // per-key constant, not sublinearity), batch latency linear in
      // ticks + touched keys, nothing super-linear anywhere.
      import graft.streaming.StreamOps
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val totalTicks = 2000000
      val chunks = 4
      // `measured` tags the printed row. JIT/codegen warmup dominates
      // early runs of each face in a fresh JVM (an initial ordered
      // sweep measured 187 s → 18 s for IDENTICAL per-tick work purely
      // by run position; a driver-side microbench of the same fold —
      // `QuantStateBench`, 10k keys × 50 ticks/key/batch — does the
      // kernel + TestGroupState cycle in 0.3-0.5 s/batch, so the wall
      // numbers here are harness-dominated), so: one GLOBAL warmup of
      // both faces first, then every case measured twice (ascending
      // then descending key order) — the grid row is the MIN of the
      // two, the stable floor under GC/JIT noise.
      def keyProbe[T, R](label: String, keys: Int, measured: Boolean,
          mk: Int => T,
          build: org.apache.spark.sql.Dataset[T] => org.apache.spark.sql.Dataset[R])(
          implicit te: org.apache.spark.sql.Encoder[T]): Unit = {
        val mem = MemoryStream[T]
        val q = build(mem.toDS()).writeStream
          .outputMode("update").format("noop").start()
        try {
          val per = totalTicks / chunks
          var lastBatchS = 0.0
          val t0 = System.nanoTime()
          (0 until chunks).foreach { c =>
            val batch = (0 until per).map(i => mk(c * per + i))
            val tb = System.nanoTime()
            mem.addData(batch: _*)
            q.processAllAvailable()
            lastBatchS = (System.nanoTime() - tb) / 1e9
          }
          val so = q.lastProgress.stateOperators.head
          val tag = if (measured) "" else " (warm-up pass, not the grid row)"
          println(f"SCALE-R15 $label keys=$keys: " +
            f"total=${(System.nanoTime() - t0) / 1e9}%.2f s " +
            f"lastBatch=$lastBatchS%.2f s stateRows=${so.numRowsTotal} " +
            f"stateMem=${so.memoryUsedBytes / 1048576.0}%.1f MiB$tag")
        } finally q.stop()
      }
      def qCase(k: Int, measured: Boolean): Unit =
        keyProbe[StreamOps.QuantileTick, StreamOps.QuantileRow](
          "streamingQuantiles", k, measured,
          i => StreamOps.QuantileTick("k" + (i % k), i.toLong,
            ((i * 2654435761L) % 100000).toDouble),
          in => StreamOps.streamingQuantiles(in, Seq(0.5, 0.99)))
      def dCase(k: Int, measured: Boolean): Unit =
        keyProbe[StreamOps.DistinctTick, StreamOps.DistinctRow](
          "streamingDistinct", k, measured,
          i => StreamOps.DistinctTick("k" + (i % k), i.toLong,
            (i * 2654435761L) % 500000L),
          in => StreamOps.streamingDistinct(in))
      // global JIT/codegen warmup: both faces once, unmeasured
      qCase(50000, measured = false); dCase(50000, measured = false)
      for (k <- Seq(10000, 100000, 1000000)) {
        qCase(k, measured = true); dCase(k, measured = true)
      }
      for (k <- Seq(1000000, 100000, 10000)) {
        qCase(k, measured = true); dCase(k, measured = true)
      }
    }

    if (want("r15b")) {
      // the warehouse payoff, quantified (q122's 100 TB story): answer
      // "p50/p99 of value + distinct users for a 10-day range" once
      // from the COMMITTED sketch fact (grain-pruned scan + rollup of
      // KB-sized sketch rows) and once from the raw events (scan +
      // aggregate), on the ×100 events replica (10M rows). Ingest is
      // the one-time cost the warehouse already paid; the read path is
      // what every later question costs. At 100 TB the raw side is a
      // cold-storage rescan and the ratio below is the whole point.
      if (!new java.io.File("/tmp/scale100/events.parquet").exists)
        replicate(100, "/tmp/scale100")
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // warm both paths at sf0.01 (codegen/classloading off the clock)
      val warmFact = SparkEntry.q122Ingest(spark, "/root/testdata/sf0.01")
      SparkEntry.q122Estimate(spark, warmFact)
        .write.mode("overwrite").format("noop").save()
      // the SAME slice q122 reads — shared constants, not re-derived
      // copies (a moved read range must move this baseline with it)
      def rawAnswer(dir: String): Unit =
        graft.io.Sources.table(spark, dir, "events")
          .filter(col("value").isNotNull && col("user_id").isNotNull)
          .filter(graft.olap.OlapEtl.grainCol(col("ts"), SparkEntry.Q122GrainUs)
            .between(SparkEntry.Q122GrainLo, SparkEntry.Q122GrainHi))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("id_exact"),
            percentile_approx(col("value"),
              array(lit(0.5), lit(0.99)), lit(10000)).as("qs"))
          .write.mode("overwrite").format("noop").save()
      rawAnswer("/root/testdata/sf0.01") // warm the raw path too
      var factPath = ""
      val tIngest = timed { factPath = SparkEntry.q122Ingest(spark, "/tmp/scale100") }
      val tRead = timed(SparkEntry.q122Estimate(spark, factPath)
        .write.mode("overwrite").format("noop").save())
      val tRaw = timed(rawAnswer("/tmp/scale100"))
      println(f"SCALE-R15B sketch-fact read @10M rows: ingest(once)=$tIngest%.2f s " +
        f"read-from-fact=$tRead%.2f s raw-rescan=$tRaw%.2f s " +
        f"ratio=${tRaw / tRead}%.1fx")
    }

    if (want("r15d")) {
      // merge-ingest CADENCE: 20 time-ordered micro-batches (~1.5 days
      // each, day grains, 1000 synthetic series) through the fenced
      // sink's core path (loadFactSketches MergeGrain), timing each
      // batch as the fact grows, plus one REPLAYED batchId mid-stream
      // (must be a ~free fence no-op). Expectation, stated up front and
      // honestly: per-batch time grows with |fact| because SnapshotStore
      // rewrites the FULL snapshot per commit — the disclosed
      // no-Delta/Iceberg container boundary — NOT because of the merge
      // algebra (the semi/anti split folds only colliding grains; a
      // lakehouse table format would rewrite only those files). The
      // probe pins the SHAPE of that cost so the boundary is measured,
      // not hand-waved.
      val dir = java.nio.file.Files
        .createTempDirectory("graft-r15d").toString + "/fact"
      val ev = graft.io.Sources.table(spark, "/root/testdata/sf0.1", "events")
        .withColumn("series",
          concat(col("event_type"), lit("_"), pmod(col("user_id"), lit(200))))
      val writer = graft.olap.OlapEtl.sketchFactBatchWriter(
        "series", "ts", "value", "event_id", 86400000000L, dir)
      val day0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay
      def slice(b: Int) = ev.filter(
        ((unix_micros(col("ts")) / 86400000000L) - lit(day0) >= b * 1.5) &&
        ((unix_micros(col("ts")) / 86400000000L) - lit(day0) < (b + 1) * 1.5))
      val times = (0 until 20).map { b =>
        val t0 = System.nanoTime()
        writer(slice(b), b.toLong)
        (System.nanoTime() - t0) / 1e9
      }
      val factRows = graft.olap.SnapshotStore.read(spark, dir).get.count()
      val tReplay = {
        val t0 = System.nanoTime()
        writer(slice(10), 10L) // already-fenced batchId → no-op
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SCALE-R15D merge-ingest cadence (fact grows to $factRows rows): " +
        f"batch1=${times(1)}%.2f s batch5=${times(5)}%.2f s " +
        f"batch10=${times(10)}%.2f s batch19=${times(19)}%.2f s " +
        f"replayed-batch no-op=$tReplay%.3f s")
      println("SCALE-R15D all batches: " +
        times.zipWithIndex.map { case (t, i) => f"b$i=$t%.2f" }.mkString(" "))
    }

    if (want("r16")) {
      // THE r15 disclosed boundary, measured closed: merge-ingest a
      // constant-size micro-batch into facts 10×/100×/1000× the batch,
      // on BOTH snapshot layouts. The monolithic store rewrites the
      // full snapshot per commit → per-batch cost grows with |fact|;
      // the partitioned manifest-of-files store restages only the
      // colliding grain bucket → per-batch cost must stay FLAT. Same
      // merge algebra, same fold, same fence machinery — the layout is
      // the only variable.
      import graft.olap.{OlapEtl, PartitionedSnapshotStore, SnapshotStore}
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val GrainUs = 86400000000L // day grains
      val Series = 5000
      val RowsPerSeriesDay = 20
      // synthetic events: `part` splits a day's rows into two halves so
      // the measured merge batch is a genuine PARTIAL grain (MergeGrain
      // shape), uids disjoint from the first half
      def ev(dayLo: Int, dayHi: Int, part: Int) = {
        val days = dayHi - dayLo + 1
        spark.range(days.toLong * Series * (RowsPerSeriesDay / 2))
          .select(
            concat(lit("s"), (col("id") % Series)).as("series"),
            timestamp_micros(
              (lit(dayLo.toLong) + floor(col("id") / Series).cast("long") % days)
                * lit(GrainUs) +
                (col("id") % 86400L) * 1000000L + lit(part.toLong)).as("ts"),
            (col("id") % 1000L).cast("double").as("value"),
            (col("id") * 3L + part).as("event_id")) // parts id-disjoint
      }
      def grow(path: String, days: Int): Unit = {
        // one-shot ReplaceGrain history build (constant commits either
        // way — the probe times the MERGE batch, not the backfill)
        OlapEtl.loadFactSketches(spark, ev(0, days - 1, 0), "series", "ts",
          "value", "event_id", GrainUs, path,
          layout = PartitionedSnapshotStore.Layout(grainsPerBucket = 32L))
      }
      val results = Seq(20, 200, 2000).zipWithIndex.map { case (days, i) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"r16-$days")
        val ptnPath = s"$tmp/ptn"
        val monoPath = s"$tmp/mono"
        grow(ptnPath, days)
        // monolithic contrast table: seed v0 via SnapshotStore.commit
        // (the legacy layout), then the loader keeps that layout
        SnapshotStore.commit(
          SnapshotStore.read(spark, ptnPath).get, monoPath)
        def mergeBatch(path: String, part: Int): Double = timed {
          OlapEtl.loadFactSketches(spark, ev(days - 1, days - 1, part),
            "series", "ts", "value", "event_id", GrainUs, path,
            mode = OlapEtl.MergeGrain)
        }
        // first merge at the smallest size is codegen warmup for both
        // paths (unmeasured); each grid row is a fresh partial batch
        if (i == 0) { mergeBatch(ptnPath, 1); mergeBatch(monoPath, 1) }
        val tPtn = mergeBatch(ptnPath, 2)
        val tMono = mergeBatch(monoPath, 2)
        val factRows = days.toLong * Series
        org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
        (days, factRows, tPtn, tMono)
      }
      println(s"SCALE-R16 merge one micro-batch ($Series grain rows) into a fact of N grain rows:")
      results.foreach { case (days, rows, tPtn, tMono) =>
        println(f"SCALE-R16 fact=${rows}%7d rows (${days}%4d days): " +
          f"partitioned=$tPtn%6.2f s monolithic=$tMono%6.2f s " +
          f"ratio=${tMono / tPtn}%.1fx")
      }
      val flat = results.last._3 / results.head._3
      println(f"SCALE-R16 partitioned growth 10→1000 days: ${flat}%.2fx " +
        "(FLAT expected; monolithic grows with |fact|)")
    }

    if (want("r16b")) {
      // sparse-HLL state (r16): re-measure SCALE-R15's streamingDistinct
      // key-axis points — the r15 grid recorded 5.6 GiB of state at 1M
      // keys because every key paid dense 4 KiB registers regardless of
      // cardinality. With the sparse encoding a key's state is O(ids
      // seen), so the same 2M-tick feed must land at a small fraction;
      // the skewed case (100 hot keys carrying 10% of ticks, 1M cold
      // keys the rest — the realistic long-tail shape) shows the mixed
      // regime: hot keys upgrade to dense, the tail stays tiny.
      import graft.streaming.StreamOps
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val totalTicks = 2000000
      val chunks = 4
      def run(label: String, keys: Int, measured: Boolean,
          keyOf: Int => String): Unit = {
        val mem = MemoryStream[StreamOps.DistinctTick]
        val q = StreamOps.streamingDistinct(mem.toDS()).writeStream
          .outputMode("update").format("noop").start()
        try {
          val per = totalTicks / chunks
          val t0 = System.nanoTime()
          (0 until chunks).foreach { c =>
            mem.addData((0 until per).map { i =>
              val n = c * per + i
              StreamOps.DistinctTick(keyOf(n), n.toLong,
                (n * 2654435761L) % 500000L)
            }: _*)
            q.processAllAvailable()
          }
          val so = q.lastProgress.stateOperators.head
          val tag = if (measured) "" else " (warm-up)"
          println(f"SCALE-R16B $label keys=$keys: " +
            f"total=${(System.nanoTime() - t0) / 1e9}%.2f s " +
            f"stateRows=${so.numRowsTotal} " +
            f"stateMem=${so.memoryUsedBytes / 1048576.0}%.1f MiB$tag")
        } finally q.stop()
      }
      run("uniform", 50000, measured = false, i => "k" + (i % 50000))
      for (k <- Seq(10000, 100000, 1000000))
        run("uniform", k, measured = true, i => "k" + (i % k))
      // skew: tick i goes to a hot key when i % 10 == 0 (10% of ticks
      // over 100 keys → ~2k ids/key, dense), else to the 1M-key tail
      // (~1.8 ids/key, sparse)
      run("skewed-hot100", 1000100, measured = true,
        i => if (i % 10 == 0) "h" + (i % 100) else "c" + (i % 1000000))
    }

    if (want("r16d")) {
      // commit-HISTORY depth: a year of hourly merge commits is ~9k
      // manifest swaps — commit latency must be flat in commit COUNT
      // (manifest size is O(buckets), not O(commits); superseded
      // manifests and their exclusive files gc away), and the on-disk
      // file count must stabilize at O(buckets × keep), not grow with
      // history. 300 sequential merge commits on a small fact, gc
      // every commit (the loader's own cadence).
      import graft.olap.{OlapEtl, PartitionedSnapshotStore, SnapshotStore}
      val dir = java.nio.file.Files.createTempDirectory("graft-r16d")
      try {
        val path = dir.toString + "/fact"
        import spark.implicits._
        def batch(i: Int) = (0 until 200).map { j =>
          ("s" + (j % 20), (i.toLong * 3600L + j) * 1000000L,
            j.toDouble, (i * 200 + j).toLong)
        }.toDF("k", "ts_us", "v", "uid")
          .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
        val times = (0 until 300).map { i =>
          val t0 = System.nanoTime()
          OlapEtl.loadFactSketches(spark, batch(i), "k", "ts", "v", "uid",
            3600000000L, path, mode = OlapEtl.MergeGrain)
          (System.nanoTime() - t0) / 1e9
        }
        def countFiles(p: java.nio.file.Path): Long = {
          val s = java.nio.file.Files.walk(p)
          try s.count() finally s.close()
        }
        val files = countFiles(java.nio.file.Paths.get(path))
        val manifests = new java.io.File(path).listFiles()
          .count(_.getName.startsWith("manifest-"))
        val m = PartitionedSnapshotStore.current(path).get
        def avg(xs: Seq[Double]) = xs.sum / xs.size
        println(f"SCALE-R16D 300 merge commits (20 series, hour grains): " +
          f"commit b0-9=${avg(times.take(10))}%.2f s " +
          f"b145-154=${avg(times.slice(145, 155))}%.2f s " +
          f"b290-299=${avg(times.takeRight(10))}%.2f s " +
          f"| on-disk: version=m${m.version} manifests=$manifests " +
          f"buckets=${m.parts.size} fs-entries=$files")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }

    if (want("r16c")) {
      // q123's lifecycle at ×100 (10M events): hour-grain ingest (the
      // one-time fine-grain cost), hour→day compaction (the rare
      // lifecycle op — O(|fact|) by design, it rewrites the table), and
      // the post-compaction range read (what every later question
      // costs; must stay in q122's read-path class). Uses q123's own
      // constants so a moved read range moves this probe with it.
      import graft.olap.{OlapEtl, SnapshotStore}
      if (!new java.io.File("/tmp/scale100/events.parquet").exists)
        replicate(100, "/tmp/scale100")
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // warm codegen on sf0.01 first
      SparkEntry.q123Ingest(spark, "/root/testdata/sf0.01")
      val dir = java.nio.file.Files.createTempDirectory("graft-r16c")
      try {
        val factPath = dir.toString + "/fact"
        val hourUs = SparkEntry.Q122GrainUs / 24L
        val tIngest = timed(OlapEtl.loadFactSketches(spark,
          graft.io.Sources.table(spark, "/tmp/scale100", "events"),
          "event_type", "ts", "value", "user_id", hourUs, factPath))
        val fineRows = SnapshotStore.read(spark, factPath).get.count()
        val tCompact = timed(OlapEtl.compactFactSketches(spark, factPath,
          hourUs, SparkEntry.Q122GrainUs))
        val dayRows = SnapshotStore.read(spark, factPath).get.count()
        // hour-unit bounds (r17: compaction preserves ingest units)
        val tRead = timed(SparkEntry.q123Estimate(spark, factPath)
          .write.mode("overwrite").format("noop").save())
        println(f"SCALE-R16C q123 lifecycle @10M events: " +
          f"hour-ingest(once)=$tIngest%.2f s ($fineRows rows) " +
          f"compact(hour→day)=$tCompact%.2f s (→ $dayRows rows) " +
          f"read-from-compacted=$tRead%.2f s")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }

    if (want("r17")) {
      // RECURRING lifecycle cost (r17): scoped compaction of a FIXED
      // 10-day aged window must stay flat as the TOTAL fact grows —
      // only the window's buckets restage; untouched files re-list
      // verbatim. The full-table compaction line is the contrast (every
      // bucket dirty by definition, O(|fact|)). Steady state simulated
      // by pre-compacting all history older than the measured window.
      import graft.olap.{OlapEtl, PartitionedSnapshotStore, SnapshotStore}
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val HourUs = 3600000000L
      val DayUs = 24L * HourUs
      val Series = 200
      def ev(dayLo: Int, dayHi: Int) = {
        val hours = (dayHi - dayLo + 1) * 24
        spark.range(hours.toLong * Series * 2)
          .select(
            concat(lit("s"), col("id") % Series).as("k"),
            timestamp_micros(lit(dayLo.toLong) * DayUs +
              floor(col("id") / (Series * 2)).cast("long") * HourUs +
              (col("id") % 3600L) * 1000000L).as("ts"),
            (col("id") % 1000L).cast("double").as("v"),
            (col("id") * 7L + dayLo).as("uid"))
      }
      val results = Seq(20, 100, 500).map { days =>
        val tmp = java.nio.file.Files.createTempDirectory(s"r17-$days")
        try {
          val path = s"$tmp/fact"
          OlapEtl.loadFactSketches(spark, ev(0, days - 1), "k", "ts", "v",
            "uid", HourUs, path,
            layout = PartitionedSnapshotStore.Layout(grainsPerBucket = 24L))
          // steady state: history beyond the aged window already coarse
          if (days > 20)
            OlapEtl.compactFactSketches(spark, path, HourUs, DayUs,
              upToGrain = Some((days - 20).toLong * 24L))
          val factRows = SnapshotStore.read(spark, path).get.count()
          // THE measured recurring op: age the next 10-day window
          val tScoped = timed(OlapEtl.compactFactSketches(spark, path,
            HourUs, DayUs, upToGrain = Some((days - 10).toLong * 24L)))
          // contrast: whole-table compaction at the same fact size
          val tFull = timed(OlapEtl.compactFactSketches(spark, path,
            HourUs, DayUs))
          (days, factRows, tScoped, tFull)
        } finally org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      }
      println(s"SCALE-R17 scoped compaction ($Series series, hour grains, " +
        "fixed 10-day aged window) as the fact grows:")
      results.foreach { case (d, rows, ts, tf) =>
        println(f"SCALE-R17 fact=$d%4d days ($rows%8d rows): " +
          f"scoped(10-day window)=$ts%6.2f s full-table=$tf%6.2f s " +
          f"ratio=${tf / ts}%.1fx")
      }
      val flat = results.last._3 / results.head._3
      println(f"SCALE-R17 scoped growth 20→500 days: ${flat}%.2fx " +
        "(FLAT expected; full-table grows with |fact|)")
    }

    if (want("r17b")) {
      // hot-bucket SKEW grid (r17): commitBuckets writes via
      // repartition(bucket) — one task per dirty bucket — so at
      // seriesBuckets=1 a grain-range's whole restage is single-task
      // and its file carries every series (one hot key set inflates
      // it). The grid measures ingest/merge commit latency, staged
      // file-size balance, and range-read cost at seriesBuckets ∈
      // {1, 4, 16} under a zipf-ish key law, backing the Layout
      // scaladoc's sizing sentence with numbers.
      import graft.olap.{OlapEtl, PartitionedSnapshotStore}
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val HourUs = 3600000000L
      val Rows = 1000000L
      // log-uniform ranks ≈ zipf: rank = floor(exp(u · ln 20k)); the
      // head rank carries ~8% of all rows, ranks are hash-derived so
      // the law is deterministic and part-disjoint ids stay mergeable
      def ev(part: Int) = spark.range(Rows)
        .select(
          concat(lit("s"), floor(exp(
            (pmod(xxhash64(col("id") + lit(part.toLong * Rows)), lit(1000000L))
              .cast("double") / 1e6) * lit(math.log(20000.0)))).cast("long")).as("k"),
          timestamp_micros((col("id") % 24L) * HourUs +
            (col("id") % 3600L) * 1000000L + lit(part.toLong)).as("ts"),
          (col("id") % 1000L).cast("double").as("v"),
          (col("id") * 3L + part).as("uid"))
      def dirBytes(p: java.nio.file.Path): Long = {
        val s = java.nio.file.Files.walk(p)
        try {
          var total = 0L
          val it = s.iterator()
          while (it.hasNext) {
            val f = it.next()
            if (java.nio.file.Files.isRegularFile(f))
              total += java.nio.file.Files.size(f)
          }
          total
        } finally s.close()
      }
      for (sb <- Seq(1, 4, 16)) {
        val tmp = java.nio.file.Files.createTempDirectory(s"r17b-$sb")
        try {
          val path = s"$tmp/fact"
          val lay = PartitionedSnapshotStore.Layout(
            grainsPerBucket = 8L, seriesBuckets = sb)
          val tIngest = timed(OlapEtl.loadFactSketches(spark, ev(0),
            "k", "ts", "v", "uid", HourUs, path, layout = lay))
          val tMerge = timed(OlapEtl.loadFactSketches(spark, ev(1),
            "k", "ts", "v", "uid", HourUs, path,
            mode = OlapEtl.MergeGrain))
          val m = PartitionedSnapshotStore.current(path).get
          val sizes = m.parts.map(e =>
            dirBytes(java.nio.file.Paths.get(path, e.relPath))).sorted
          val tRead = timed(
            PartitionedSnapshotStore.readRange(spark, path, 0L, 7L).get
              .agg(sum(col("n_rows"))).collect())
          println(f"SCALE-R17B sb=$sb%2d: ingest=$tIngest%6.2f s " +
            f"merge=$tMerge%6.2f s files=${m.parts.size}%3d " +
            f"fileKiB p50=${sizes(sizes.size / 2) / 1024}%6d " +
            f"max=${sizes.last / 1024}%6d " +
            f"read(grains 0-7)=$tRead%5.2f s")
        } finally org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      }
    }

    if (want("r17c")) {
      // MIGRATION lands legacy tables on the flat line (r17): rebuild
      // SCALE-R16's worst monolithic point (10M-row fact, constant 5k
      // grain-row merge batch), measure the legacy merge cost, migrate
      // with migrateFactToPartitioned, and re-measure the SAME batch
      // shape — the post-migration point must land in SCALE-R16's
      // partitioned band (~2.2–2.7 s), not on the monolithic slope.
      import graft.olap.{OlapEtl, PartitionedSnapshotStore, SnapshotStore}
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val GrainUs = 86400000000L
      val Series = 5000
      def ev(dayLo: Int, dayHi: Int, part: Int) = {
        val days = dayHi - dayLo + 1
        spark.range(days.toLong * Series * 10)
          .select(
            concat(lit("s"), (col("id") % Series)).as("series"),
            timestamp_micros(
              (lit(dayLo.toLong) + floor(col("id") / Series).cast("long") % days)
                * lit(GrainUs) +
                (col("id") % 86400L) * 1000000L + lit(part.toLong)).as("ts"),
            (col("id") % 1000L).cast("double").as("value"),
            (col("id") * 3L + part).as("event_id"))
      }
      val days = 2000
      val tmp = java.nio.file.Files.createTempDirectory("r17c")
      try {
        val ptnSeed = s"$tmp/seed"
        val monoPath = s"$tmp/mono"
        OlapEtl.loadFactSketches(spark, ev(0, days - 1, 0), "series", "ts",
          "value", "event_id", GrainUs, ptnSeed,
          layout = PartitionedSnapshotStore.Layout(grainsPerBucket = 32L))
        SnapshotStore.commit(SnapshotStore.read(spark, ptnSeed).get, monoPath)
        def mergeBatch(part: Int): Double = timed {
          OlapEtl.loadFactSketches(spark, ev(days - 1, days - 1, part),
            "series", "ts", "value", "event_id", GrainUs, monoPath,
            mode = OlapEtl.MergeGrain)
        }
        mergeBatch(1) // warmup
        val tMonoMerge = mergeBatch(2)
        val tMigrate = timed(OlapEtl.migrateFactToPartitioned(spark, monoPath))
        val tPtnMerge = mergeBatch(3)
        println(f"SCALE-R17C migrate a ${days.toLong * Series}%8d-row monolithic fact: " +
          f"legacy merge=$tMonoMerge%6.2f s migrate(once)=$tMigrate%6.2f s " +
          f"post-migration merge=$tPtnMerge%6.2f s " +
          f"(SCALE-R16 partitioned band: 2.2-2.7 s)")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
    }

    if (want("r13")) {
      // Replica LAYOUT matters as much as row count: replicated rows
      // compress so well that a naive write packs 600M rows into ~129MB
      // — one or two parquet input splits, so every "scaled" query
      // bottlenecks on a single decompressing core and measures the
      // file layout, not the kernel (observed: q83's 1000× point sat at
      // 100% of ONE core for 20+ min). A 100 TB table is never one
      // file; write the replicas with scan-parallel file counts
      // (ensureLiReplicas above — shared with r14b).
      ensureLiReplicas()
      replicateDocsSharded(100, 64, "/tmp/docs100r")
      replicateDocsSharded(1000, 512, "/tmp/docs1000")

      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def runQ(q: String, dir: String): Double = {
        val t = timed(SparkEntry.queries(q)(spark, dir)
          .write.mode("overwrite").format("noop").save())
        graft.dedup.Dedup.clearCaches()
        t
      }
      // warm code paths once at the tiny scale
      Seq("q55_count_distinct", "q83_range_join", "q95_substring_dedup",
        "q90_dsir_scores").foreach(q => runQ(q, "/root/testdata/sf0.01"))

      def exponent(q: String, dir100: String, dir1000: String): Unit = {
        val t1 = runQ(q, "/root/testdata/sf0.1")
        val t100 = runQ(q, dir100)
        val t1000 = runQ(q, dir1000)
        val exp = math.log10(t1000 / t100)
        println(f"SCALE-R13 $q: 1x=$t1%.2f s 100x=$t100%.2f s 1000x=$t1000%.2f s " +
          f"exponent(100x->1000x)=$exp%.2f")
      }
      exponent("q55_count_distinct", "/tmp/li100", "/tmp/li1000")
      exponent("q83_range_join", "/tmp/li100", "/tmp/li1000")
      exponent("q90_dsir_scores", "/tmp/docs100r", "/tmp/docs1000")
      exponent("q95_substring_dedup", "/tmp/docs100r", "/tmp/docs1000")

      // exact-first dedup composition at 5M docs (identical-copy groups
      // of 1000 — the shape where banding first would blow up)
      {
        val t100 = timed {
          graft.dedup.Dedup.dedupPipeline(
              spark.read.parquet("/tmp/docs100r/documents.parquet"),
              "text", "doc_id", 3, 2, 2, 0.5)
            .write.mode("overwrite").format("noop").save()
          graft.dedup.Dedup.clearCaches()
        }
        val t1000 = timed {
          graft.dedup.Dedup.dedupPipeline(
              spark.read.parquet("/tmp/docs1000/documents.parquet"),
              "text", "doc_id", 3, 2, 2, 0.5)
            .write.mode("overwrite").format("noop").save()
          graft.dedup.Dedup.clearCaches()
        }
        println(f"SCALE-R13 dedupPipeline(exact-first): 500k=$t100%.2f s " +
          f"5M=$t1000%.2f s exponent=${math.log10(t1000 / t100)}%.2f")
      }

      // CC round growth on a 10×-longer path
      {
        val chain = spark.range(999999)
          .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
        val t0 = System.nanoTime()
        val (labels, rounds) =
          graft.dedup.Dedup.connectedComponentsWithRounds(chain, maxIter = 40)
        val ok = labels.filter(col("component") === 0).count()
        println(f"SCALE-R13 CC 1M-node chain: rounds=$rounds " +
          f"labeled-to-min=$ok/1000000 ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          "(100k chain: 18 rounds, 13.9 s — PLANS.md)")
      }
    }


    if (want("docs")) {
    val docQueries = Seq("q32_exact_dup", "q33_minhash_sig", "q34_minhash_pairs",
      "q50_near_dedup", "q67_corpus_curation",
      // round-7: ExactSubstr — replica docs make every gram duplicated
      // corpus-wide (worst case for the dup-position join + span splice)
      "q95_substring_dedup")
    docQueries.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      .write.mode("overwrite").format("noop").save())
    graft.dedup.Dedup.clearCaches() // drain warm-up handles before timing
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/docs10", "/tmp/docs100")) {
      val times = docQueries.map { q =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
        val elapsed = (System.nanoTime() - t0) / 1e9
        // cache teardown is NOT part of the kernel time being reported
        graft.dedup.Dedup.clearCaches()
        f"$q=$elapsed%.2f"
      }
      println(s"SCALE-DOCS $dir: ${times.mkString(" ")}")
    }

    // The exact-first composition on the SAME adversarial 100×-replicated
    // corpus: exactDedup collapses the identical-copy groups in one
    // digest shuffle, so the near-dedup banding that follows never sees a
    // big dup group — this is the operator form of the contract above.
    {
      val t0 = System.nanoTime()
      graft.dedup.Dedup.dedupPipeline(
          spark.read.parquet("/tmp/docs100/documents.parquet"),
          "text", "doc_id", 3, 2, 2, 0.5)
        .write.mode("overwrite").format("noop").save()
      graft.dedup.Dedup.clearCaches()
      println(f"SCALE-DOCS dedupPipeline (exact-first) on 500k docs: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s (nearDedup alone: ~156 s)")
    }

    // Connected-components chain probe: a 100k-node PATH is the
    // adversarial shape (min-label propagation would need ~100k rounds);
    // large/small-star must close it in ~log2(100k) ≈ 17 rounds.
    {
      val chain = spark.range(99999)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      val t0 = System.nanoTime()
      val (labels, rounds) =
        graft.dedup.Dedup.connectedComponentsWithRounds(chain, maxIter = 30)
      val ok = labels.filter(col("component") === 0).count()
      println(f"SCALE-CC 100k-node chain: rounds=$rounds labeled-to-min=$ok/100000 " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    } // want(docs)

    // Round-8: q100 cluster balance on replicated embeddings dirs — the
    // resample itself is corpus-width map-only (cell assignment + md5
    // keep); the k-means fit reads the SAME bounded 1024-row sample at
    // every scale, so time must grow only with the corpus-width pass.
    if (want("balance")) {
      val emb8 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      for ((factor, dir) <- Seq((10, "/tmp/emb10"), (100, "/tmp/emb100"))) {
        val reps = spark.range(factor).withColumnRenamed("id", "rep")
        emb8.crossJoin(reps)
          .select((col("vec_id") + col("rep") * 10000000L).as("vec_id"),
            col("embedding"), col("label"))
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
      SparkEntry.queries("q100_cluster_balance")(spark, "/root/testdata/sf0.01")
        .write.mode("overwrite").format("noop").save() // warm
      for ((name, dir) <- Seq(("sf0.1", "/root/testdata/sf0.1"),
          ("x10", "/tmp/emb10"), ("x100", "/tmp/emb100"))) {
        val t0 = System.nanoTime()
        SparkEntry.queries("q100_cluster_balance")(spark, dir)
          .write.mode("overwrite").format("noop").save()
        graft.similarity.Similarity.clearCaches()
        println(f"SCALE-R8 q100_cluster_balance $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    if (want("baseline")) {
    // BASELINE NEAT-candidate anchor: ONE candidate evaluation = full
    // modelMetrics (lag features → 6 per-horizon head fits → val
    // metrics) at the reference's largest per-split scale (25,200 rows;
    // BASELINE.md reports ~25 min/candidate for the reference's
    // distributed-NEAT TCN at population 20).
    {
      def writeSplit(n: Int, x0: Double): String = {
        val f = java.nio.file.Files.createTempFile("baseline", ".csv")
        val xs = new Array[Double](n)
        xs(0) = x0
        (1 until n).foreach(i => xs(i) = 3.7 * xs(i - 1) * (1.0 - xs(i - 1)))
        val sb = new StringBuilder("DATE_TIME,CLOSE\n")
        var i = 0
        while (i < n) {
          val ts = java.time.LocalDateTime.of(2020, 1, 1, 0, 0)
            .plusMinutes(i.toLong)
          sb.append(ts.toString.replace('T', ' ')).append(',').append(xs(i)).append('\n')
          i += 1
        }
        java.nio.file.Files.writeString(f, sb.toString)
        f.toString
      }
      val cfg = graft.pipeline.ForecastPipeline.Config(
        splits = Map("train" -> writeSplit(25200, 0.5123), "val" -> writeSplit(25200, 0.317)),
        targetColumn = "CLOSE", horizons = 1 to 6)
      def v(rows: Array[org.apache.spark.sql.Row], m: String) =
        rows.find(r => r.getString(0) == "val" &&
          r.getString(1) == m && r.getInt(2) == 1).get.getDouble(3)
      // Champion selection across the FULL zoo at the reference's per-split
      // scale — the reference's `predictor_plugin` choice + optimizer
      // validation fitness (`README.md:117-120`). Routed through
      // `Forecaster.search`, the same dispatch `selectHead` delegates to,
      // so the per-head wall-clocks ARE the selection cost: each candidate
      // is a few distributed jobs and only the scalar val-MAE crosses the
      // driver.
      val perHead = scala.collection.mutable.ArrayBuffer.empty[String]
      val (champion, champMae) = graft.ml.Forecaster.search[String](
        Seq("linear", "gbt", "mlp", "cnn", "tcn", "lstm", "attention", "tft", "nbeats"), { head =>
          val t0 = System.nanoTime()
          val rows = graft.pipeline.ForecastPipeline.modelMetrics(spark, cfg,
            nLags = 3, head = head,
            mlpConf = graft.pipeline.ForecastPipeline.MlpConf(hidden = 8, epochs = 150, lr = 0.1))
            .collect()
          val sec = (System.nanoTime() - t0) / 1e9
          val line = f"head=$head%-9s ${sec}%6.1f s  val MAE H1=${v(rows, "MAE")}%.6f  " +
            f"fitness=${v(rows, "MAE") - v(rows, "Naive MAE")}%+.6f  R2=${v(rows, "R2")}%.4f"
          perHead += line
          println(s"SCALE-BASELINE candidate eval 25200 rows/split 6 horizons: $line")
          v(rows, "MAE")
        })
      perHead.foreach(l => println(s"SCALE-BASELINE-TABLE $l"))
      println(f"SCALE-BASELINE champion=$champion val MAE H1=$champMae%.6f " +
        "(reference: ~25 min/candidate, README champion fitness -1.22e-4)")
    }
    } // want(baseline)

    if (want("r4")) {
    // Round-4 operators on the replicated tables: the range join's point
    // side and heavy hitters' key stream grow 10×/100× while the
    // interval/candidate sides stay fixed — time must track the POINT
    // side (linear), or the bucketing/sketch story is wrong. Bloom
    // decontamination runs on the 100×-replicated docs (500k): the
    // filter is the same numBits/8 bytes at every scale.
    {
      // range-join inputs for the scale dirs: the POINT side (lineitem,
      // the two columns q83 reads) replicated 10×/100×, the interval
      // side (orders) copied unchanged — so measured growth isolates the
      // point-stream axis
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select(col("l_quantity"), col("l_shipdate"))
      val ord = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      for ((factor, dir) <- Seq((10, "/tmp/scale10"), (100, "/tmp/scale100"))) {
        val reps = spark.range(factor).withColumnRenamed("id", "rep")
        li.crossJoin(reps).drop("rep")
          .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
        ord.write.mode("overwrite").parquet(s"$dir/orders.parquet")
      }
      for ((name, dir) <- Seq(("sf0.1", "/root/testdata/sf0.1"),
          ("x10", "/tmp/scale10"), ("x100", "/tmp/scale100"))) {
        for (q <- Seq("q83_range_join", "q84_heavy_hitters")) {
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
          println(f"SCALE-R4 $name $q=${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
      for ((name, dir) <- Seq(("5k", "/root/testdata/sf0.1"),
          ("50k", "/tmp/docs10"), ("500k", "/tmp/docs100"))) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val t0 = System.nanoTime()
        graft.dedup.Dedup.decontaminateBloom(
            docs.filter(col("doc_id") % 10 =!= 0),
            docs.filter(col("doc_id") % 10 === 0),
            "text", "doc_id", 6, numBits = 1 << 22)
          .write.mode("overwrite").format("noop").save()
        println(f"SCALE-R4 decontaminateBloom $name docs: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      // PQ / IVF-PQ: index ONCE (the one-time corpus encode), then time
      // SEARCH against persisted codes — the serving shape. Flat ADC
      // search must grow with the code count; IVF-PQ search probes
      // nProbe/nCells of it.
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      for (factor <- Seq(1, 10, 100)) {
        val reps = spark.range(factor).withColumnRenamed("id", "rep")
        val corpus = emb.crossJoin(reps)
          .select((col("vec_id") + col("rep") * 10000000L).as("vec_id"), col("v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        corpus.count()
        val queries = corpus.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("qv"))
        val tIdx0 = System.nanoTime()
        val idx = graft.similarity.Similarity.buildIvfPqIndex(
          corpus, "vec_id", "v", nCells = 64, m = 8, ksub = 16)
        val codes = idx.codes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        codes.count() // materialize the index — the one-time cost
        val tIdx = (System.nanoTime() - tIdx0) / 1e9
        val t0 = System.nanoTime()
        graft.similarity.Similarity.knnPq(queries, codes,
            "qid", "vec_id", "qv", idx.codebooks, 10)
          .write.mode("overwrite").format("noop").save()
        val tFlat = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        graft.similarity.Similarity.searchIvfPq(idx, queries, "qid", "qv",
            nProbe = 8, k = 10)
          .write.mode("overwrite").format("noop").save()
        val tIvf = (System.nanoTime() - t1) / 1e9
        println(f"SCALE-R4 ANN ${factor}x (${5000 * factor} codes): " +
          f"index=$tIdx%.2f s flatPQsearch=$tFlat%.2f s ivfPQsearch=$tIvf%.2f s")
        codes.unpersist(); corpus.unpersist()
      }
    }
    } // want(r4)
    spark.stop()
  }
}
