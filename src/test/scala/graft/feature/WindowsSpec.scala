package graft.feature

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ts.TS

class WindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def series(n: Int) =
    (0 until n).map(i => (1L, i.toLong, i.toDouble)).toDF("sid", "t", "v")

  private val w = TS.seriesWindow(Seq("sid"), Seq("t"))

  test("slidingInclusive: count n-ws+1, window includes t") {
    val out = Windows.slidingInclusive(series(10), Seq("v"), 4, w)
    assert(out.count() == 7)
    val first = out.orderBy("t").select("window").as[Seq[Seq[Double]]].head()
    assert(first.map(_.head) == Seq(0.0, 1.0, 2.0, 3.0)) // [t-3, t]
  }

  test("slidingCausal: excludes t, count n-ws") {
    val out = Windows.slidingCausal(series(10), Seq("v"), 4, w)
    assert(out.count() == 6)
    val first = out.orderBy("t").select($"t", $"window").head()
    assert(first.getLong(0) == 4)  // first full causal window is at t=4
    val win = first.getSeq[scala.collection.Seq[Double]](1).toSeq.map(_.head)
    assert(win == Seq(0.0, 1.0, 2.0, 3.0)) // [t-4, t)
  }

  test("short series yields zero windows, no error") {
    assert(Windows.slidingInclusive(series(3), Seq("v"), 5, w).count() == 0)
  }

  test("slidingLong: one row per (t, step), values in time order, no array column") {
    val df = series(6).withColumn("u", $"v" * 10)
    val out = Windows.slidingLong(df, Seq("v", "u"), 3, w)
    assert(!out.columns.contains("window"))
    assert(out.columns.toSeq == Seq("sid", "t", "v", "u", "step", "v_w", "u_w"))
    assert(out.count() == 4 * 3) // (n-ws+1) windows × ws steps
    val atT4 = out.filter($"t" === 4).orderBy("step")
      .select("step", "v_w", "u_w").as[(Int, Double, Double)].collect().toSeq
    assert(atT4 == Seq((0, 2.0, 20.0), (1, 3.0, 30.0), (2, 4.0, 40.0)))
    // causal: window for t excludes t
    val causal = Windows.slidingLong(df, Seq("v"), 3, w, causal = true)
      .filter($"t" === 4).orderBy("step").select("v_w").as[Double].collect().toSeq
    assert(causal == Seq(1.0, 2.0, 3.0))
    // long ≡ array form, re-grouped
    val arr = Windows.slidingInclusive(df, Seq("v", "u"), 3, w)
      .select($"t", $"window").as[(Long, Seq[Seq[Double]])].collect().toMap
    val regrouped = out.groupBy("t")
      .agg(sort_array(collect_list(struct($"step", $"v_w", $"u_w"))).as("xs"))
      .select($"t", expr("transform(xs, x -> array(x.v_w, x.u_w))"))
      .as[(Long, Seq[Seq[Double]])].collect().toMap
    assert(regrouped == arr)
  }

  test("strided keeps every k-th window") {
    val out = Windows.strided(Windows.slidingInclusive(series(10), Seq("v"), 2, w), w, 3)
    assert(out.select("t").as[Long].collect().sorted.toSeq == Seq(1L, 4L, 7L))
  }

  test("overlapAdd reconstructs the series from overlapping windows") {
    // windows of ws=3 over 0..9: windowId = start index
    val win = Windows.slidingInclusive(series(10), Seq("v"), 3, w)
      .select(($"t" - 2).as("wid"), flatten($"window").as("win"))
    val rec = Windows.overlapAdd(win, "wid", "win")
      .orderBy("pos").select("value").as[Double].collect()
    assert(rec.length == 10)
    rec.zipWithIndex.foreach { case (v, i) => assert(math.abs(v - i) < 1e-9) }
  }

  test("alignByTime inner-joins on the time key") {
    val x = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("t", "x")
    val y = Seq((2L, 20.0), (3L, 30.0), (4L, 40.0)).toDF("t", "y")
    assert(Windows.alignByTime(x, y, "t").count() == 2)
  }

  test("alignByRowNumber joins positionally after per-frame ordering") {
    val x = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("t", "x")
    val y = Seq((30L, 3.0), (10L, 1.0), (20L, 2.0)).toDF("u", "y")
    val out = Windows.alignByRowNumber(x, y, Seq("t"), Seq("u"))
      .orderBy("t").select("x", "y").as[(String, Double)].collect().toSeq
    assert(out == Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)))
  }

  test("reverseWindow flips the time axis of a materialized window") {
    val win = Windows.slidingInclusive(series(5), Seq("v"), 3, w)
      .orderBy("t").limit(1)
      .select(Windows.reverseWindow(flatten($"window")).as("r"))
      .as[Seq[Double]].head()
    assert(win == Seq(2.0, 1.0, 0.0))
  }

  test("alignByRowNumberKeyed: positional concat within each key, mismatched tails dropped") {
    // key 1: 3 x-rows vs 2 y-rows (tail dropped); key 2: 1 vs 1;
    // key 3: only x (no output) — and the per-key positions restart
    val x = Seq((1L, 30L, "c"), (1L, 10L, "a"), (1L, 20L, "b"),
      (2L, 10L, "k2a"), (3L, 10L, "k3a")).toDF("sid", "t", "x")
    val y = Seq((1L, 200L, 2.0), (1L, 100L, 1.0), (2L, 100L, 9.0))
      .toDF("sid", "u", "y")
    val out = Windows.alignByRowNumberKeyed(x, y, Seq("sid"), Seq("t"), Seq("u"))
      .orderBy("sid", "rn")
      .select($"sid", $"rn", $"x", $"y").as[(Long, Long, String, Double)]
      .collect().toSeq
    assert(out == Seq((1L, 1L, "a", 1.0), (1L, 2L, "b", 2.0), (2L, 1L, "k2a", 9.0)))
    // the plan must not contain a single-partition window: every window
    // operator is keyed by sid
    val plan = Windows.alignByRowNumberKeyed(x, y, Seq("sid"), Seq("t"), Seq("u"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-partition window in:\n$plan")
  }
}
