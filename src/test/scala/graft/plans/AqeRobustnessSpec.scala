package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** A real 100 TB cluster runs AQE on (runtime re-planning, skew-join
  * splitting, partition coalescing) while the repo's sessions pin it to
  * Spark's default-off locally — so every plan shape PlanShapeSpec
  * relies on must SURVIVE adaptive execution, not depend on its
  * absence. These tests re-assert the load-bearing invariants
  * (broadcast sides, partial-agg-below-exchange, no nested loop, no
  * global sort) on the FINAL adaptive plan (`isFinalPlan=true`, i.e.
  * after runtime re-optimization), with skew-join thresholds cranked
  * low enough that AQE genuinely rewrites the hot-key join it can see.
  */
class AqeRobustnessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def withAqe[A](body: => A): A = {
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      body
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Execute (collect drives THIS DataFrame's queryExecution) and
    * return ONLY the final adaptive plan — the executed
    * AdaptiveSparkPlan stringifies as "== Final Plan ==" followed by
    * "== Initial Plan ==", and counting nodes across both would double
    * every count and leak pre-replan shapes into the assertions.
    */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AdaptiveSparkPlan isFinalPlan=true"),
      s"AQE did not finalize — test setup broken:\n${p.take(500)}")
    p.split("== Initial Plan ==").head
  }

  test("q108/q113/q115 keep partial-agg, broadcast, and fold shapes under AQE") {
    withAqe {
      val p108 = finalPlan(graft.SparkEntry.queries("q108_mc_welford")(spark, sf))
      assert("Generate".r.findAllIn(p108).size == 1, s"q108 Generate cloned:\n$p108")
      assert("HashAggregate".r.findAllIn(p108).size >= 2,
        s"q108 lost map-side partial aggregation:\n$p108")
      assert("Exchange hashpartitioning".r.findAllIn(p108).size == 1,
        s"q108 grew extra shuffles under AQE:\n$p108")

      val p113 = finalPlan(graft.SparkEntry.queries("q113_tdigest_values")(spark, sf))
      assert(p113.contains("BroadcastHashJoin"),
        s"q113 count relation stopped broadcasting under AQE:\n$p113")
      assert(!p113.contains("SortMergeJoin"), s"q113 sort-merged under AQE:\n$p113")
      assert(!p113.contains("Exchange rangepartitioning"),
        s"q113 grew a global sort under AQE:\n$p113")
      assert(p113.contains("MapPartitions") && !p113.contains("Window"),
        s"q113 fold shape changed under AQE:\n$p113")

      val p115 = finalPlan(graft.SparkEntry.queries("q115_tdigest_mergeable")(spark, sf))
      assert("ObjectHashAggregate".r.findAllIn(p115).size >= 2,
        s"q115 digest lost map-side partials under AQE:\n$p115")
      assert(p115.contains("BroadcastHashJoin") && !p115.contains("SortMergeJoin"),
        s"q115 sketch relation stopped broadcasting under AQE:\n$p115")

      val p119 = finalPlan(graft.SparkEntry.queries("q119_hll_rollup")(spark, sf))
      assert(p119.contains("partial_sketchagg") &&
        p119.contains("partial_mergesketchesagg"),
        s"q119 rollup lost map-side partials under AQE:\n$p119")
      assert(p119.contains("BroadcastHashJoin") && !p119.contains("SortMergeJoin"),
        s"q119 verdict join degraded under AQE:\n$p119")
    }
  }

  test("q117/q120/q122 sketch families keep partials and broadcasts under AQE") {
    withAqe {
      // q117: the two-level digest rollup — partials below BOTH
      // exchanges (values → per-grain digests, digests → per-key
      // quantiles), verdict relation broadcast, no global sort
      val p117 = finalPlan(graft.SparkEntry.queries("q117_tdigest_rollup")(spark, sf))
      assert(p117.contains("partial_digestagg") &&
        p117.contains("partial_mergedigestsagg"),
        s"q117 rollup lost map-side partials under AQE:\n$p117")
      assert(p117.contains("BroadcastHashJoin") && !p117.contains("SortMergeJoin"),
        s"q117 verdict join degraded under AQE:\n$p117")
      assert(!p117.contains("Exchange rangepartitioning") && !p117.contains("Window"),
        s"q117 grew a sort/window under AQE:\n$p117")

      // q120 (OPT-r17 single-scan sketch side): the pivoted 5-row
      // sketch relation stays broadcast, the exact side keeps its
      // Expand multi-distinct plan, and AQE must not degrade anything
      // to a nested loop
      val p120 = finalPlan(graft.SparkEntry.queries("q120_hll_setops")(spark, sf))
      assert(p120.contains("partial_sketchagg"),
        s"q120 side sketches lost map-side partials under AQE:\n$p120")
      assert("BroadcastHashJoin".r.findAllIn(p120).size == 1 &&
        !p120.contains("SortMergeJoin") &&
        !p120.contains("BroadcastNestedLoopJoin"),
        s"q120 joins degraded under AQE:\n$p120")
      assert(p120.contains("Expand"),
        s"q120 exact side lost the Expand multi-distinct plan under AQE:\n$p120")

      // q122: the warehouse READ face — grain pruning still reaches
      // the fact scan and the estimate side still never touches raw
      // events when AQE re-plans
      val factPath = graft.SparkEntry.q122Ingest(spark, sf)
      val p122 = finalPlan(graft.SparkEntry.q122Estimate(spark, factPath))
      assert(p122.contains("GreaterThanOrEqual(grain,") &&
        p122.contains("LessThanOrEqual(grain,") &&
        !p122.contains("events.parquet"),
        s"q122 grain pruning (both bounds) / fact isolation broke under AQE:\n$p122")
      assert(p122.contains("partial_mergedigestsagg") &&
        p122.contains("partial_mergesketchesagg"),
        s"q122 rollup lost map-side partials under AQE:\n$p122")

      // q123 (r16): the COMPACTED fact answers with the identical
      // pruned one-scan rollup shape when AQE re-plans
      val (compactPath, _) = graft.SparkEntry.q123Ingest(spark, sf)
      val p123 = finalPlan(graft.SparkEntry.q123Estimate(spark, compactPath))
      assert(p123.contains("GreaterThanOrEqual(grain,") &&
        p123.contains("LessThanOrEqual(grain,") &&
        !p123.contains("events.parquet"),
        s"q123 grain pruning / fact isolation broke under AQE:\n$p123")
      assert(p123.contains("partial_mergedigestsagg") &&
        p123.contains("partial_mergesketchesagg"),
        s"q123 rollup lost map-side partials under AQE:\n$p123")

      // q124 (r17): the MIXED-grain fact (scoped compaction, read
      // range straddling the boundary) keeps the same shape under AQE
      val (mixedPath, _) = graft.SparkEntry.q124Ingest(spark, sf)
      val p124 = finalPlan(graft.SparkEntry.q123Estimate(spark, mixedPath))
      assert(p124.contains("GreaterThanOrEqual(grain,") &&
        p124.contains("LessThanOrEqual(grain,") &&
        !p124.contains("events.parquet"),
        s"q124 grain pruning / fact isolation broke under AQE:\n$p124")
      assert(p124.contains("partial_mergedigestsagg") &&
        p124.contains("partial_mergesketchesagg"),
        s"q124 rollup lost map-side partials under AQE:\n$p124")
    }
  }

  test("fit-then-apply and fact-melt broadcasts survive AQE") {
    withAqe {
      val ev = graft.io.Sources.table(spark, sf, "events")
      val stats = ev.groupBy(col("event_type")).agg(avg(col("value")).as("mu"))
      val p = finalPlan(ev.join(broadcast(stats), "event_type"))
      assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
        s"stats join degraded under AQE:\n$p")

      val p110 = finalPlan(graft.SparkEntry.queries("q110_fact_predictions")(spark, sf))
      assert(p110.contains("BroadcastHashJoin") && !p110.contains("SortMergeJoin"),
        s"q110 dim join degraded under AQE:\n$p110")
    }
  }

  test("salted + range joins never degrade to nested loop under AQE skew optimization") {
    withAqe {
      // the SkewStressSpec shape: one giant key + a tail, low skew
      // thresholds so AQE's skew rewrite actually engages on what it
      // can see — the salted/bucketed joins must stay equi-joins
      val hot = ((1 to 30000).map(i => (1L, s"payload_$i")) ++
        (1 to 300).map(i => (i.toLong + 1, s"p$i"))).toDF("k", "lv").repartition(5)
      val dim = (1L to 301L).map(k => (k, s"r$k")).toDF("k", "rv")
      val pSalt = finalPlan(graft.joins.SkewJoin.saltedInner(hot, dim, Seq("k"), 8))
      assert(!pSalt.contains("BroadcastNestedLoopJoin") &&
        !pSalt.contains("CartesianProduct"),
        s"salted join degenerated under AQE:\n$pSalt")
      assert(pSalt.contains("__salt"), s"salt key dropped under AQE:\n$pSalt")

      val pts = (1 to 30000).map(i => (i.toLong, (i % 50).toLong)).toDF("pid", "p")
      val ivs = (0L to 60L).map(s => (s, s, s + 3)).toDF("iid", "s", "e")
      val pRange = finalPlan(graft.joins.RangeJoin.pointInInterval(
        pts, ivs, "p", "s", "e", 4L))
      assert(!pRange.contains("BroadcastNestedLoopJoin") &&
        !pRange.contains("CartesianProduct"),
        s"range join degenerated under AQE:\n$pRange")

      // and AQE's own skew handling on a plain sort-merge join still
      // fires in this session config (the JoinsSpec claim, re-asserted
      // here so the two suites cannot drift apart)
      val prevBc = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = hot.join(dim, Seq("k"))
        val pSkew = finalPlan(joined)
        assert(pSkew.contains("skew=true"),
          s"AQE skew split did not engage:\n${pSkew.take(2000)}")
      } finally prevBc match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }
}
