package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SeasonalRegressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("recovers trend + single-harmonic seasonality exactly per series") {
    // y = 3 + 0.5 t + 2 sin(2πt/12) — inside the model family ⇒ resid ≈ 0
    val df = Seq("a", "b").flatMap { k =>
      (0 until 96).map { t =>
        (k, t.toLong, 3.0 + 0.5 * t + 2.0 * math.sin(2 * math.Pi * t / 12))
      }
    }.toDF("k", "t", "y")
    val out = SeasonalRegression.fitPredict(df, Seq("k"), "t", "y", period = 12, harmonics = 2)
    assert(out.count() == 192)
    val maxResid = out.agg(max(abs($"resid"))).head().getDouble(0)
    assert(maxResid < 1e-6, s"maxResid=$maxResid")
    // independent identical series → identical fits
    val a = out.filter($"k" === "a").orderBy("t").select("fitted").as[Double].collect()
    val b = out.filter($"k" === "b").orderBy("t").select("fitted").as[Double].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("degenerate short series falls back to the mean") {
    val df = Seq(("s", 0L, 2.0), ("s", 1L, 4.0)).toDF("k", "t", "y")
    val out = SeasonalRegression.fitPredict(df, Seq("k"), "t", "y", 12)
    assert(out.select("fitted").as[Double].collect().forall(_ == 3.0))
  }

  test("solve: exact small-system solution") {
    val x = SeasonalRegression.solve(
      Array(Array(2.0, 1.0), Array(1.0, 3.0)), Array(5.0, 10.0))
    assert(math.abs(x(0) - 1.0) < 1e-12 && math.abs(x(1) - 3.0) < 1e-12)
  }

  test("holiday one-hots + last-step regressors enter the fit as design columns") {
    // y = 2 + 0.1 t + sin(2πt/24) + 5·holiday(t) + 0.7·reg(t): exactly in
    // the extended family, so residuals vanish WITH the extras and the
    // holiday coefficient is recovered; without them the spikes remain.
    val holidayTs = Set(20L, 50L, 80L)
    val df = (0 until 96).map { t =>
      val hol = if (holidayTs(t.toLong)) 1.0 else 0.0
      val reg = math.cos(t * 0.37) // arbitrary exogenous signal
      ("s", t.toLong, hol, reg,
        2.0 + 0.1 * t + math.sin(2 * math.Pi * t / 24) + 5.0 * hol + 0.7 * reg)
    }.toDF("k", "t", "hol", "reg", "y")
    val withExtras = SeasonalRegression.fitPredict(
      df, Seq("k"), "t", "y", period = 24, harmonics = 1,
      regressorCols = Seq("hol", "reg"))
    val maxResid = withExtras.agg(max(abs($"resid"))).head().getDouble(0)
    assert(maxResid < 1e-6, s"maxResid=$maxResid")
    val without = SeasonalRegression.fitPredict(
      df, Seq("k"), "t", "y", period = 24, harmonics = 1)
    val holidayResid = without.filter($"t".isin(holidayTs.toSeq: _*))
      .agg(min(abs($"resid"))).head().getDouble(0)
    assert(holidayResid > 1.0, s"holiday spikes should be unexplained: $holidayResid")
  }

  test("mirrorable fit recovers the same in-family signal despite rounded features") {
    // identical family as the pivoting fit; the 6-dp feature rounding
    // bounds the achievable residual at ~1e-4 rather than 1e-6
    val df = Seq("a", "b").flatMap { k =>
      (0 until 96).map { t =>
        (k, t.toDouble, 3.0 + 0.5 * t + 2.0 * math.sin(2 * math.Pi * t / 12))
      }
    }.toDF("k", "t", "y")
    val out = SeasonalRegression.fitPredictMirrorable(
      df, Seq("k"), "t", "y", period = 12, harmonics = 2)
    assert(out.count() == 192)
    val maxResid = out.agg(max(abs($"resid"))).head().getDouble(0)
    assert(maxResid < 1e-3, s"maxResid=$maxResid")
    // fully deterministic: two runs agree bitwise (the oracle contract)
    val again = SeasonalRegression.fitPredictMirrorable(
      df, Seq("k"), "t", "y", period = 12, harmonics = 2)
    val x = out.orderBy("k", "t").select("fitted").as[Double].collect().toSeq
    val y2 = again.orderBy("k", "t").select("fitted").as[Double].collect().toSeq
    assert(x == y2)
  }

  test("mirrorable degenerate short series falls back to the decimal-sum mean") {
    val df = Seq(("s", 0.0, 2.0), ("s", 1.0, 4.0)).toDF("k", "t", "y")
    val out = SeasonalRegression.fitPredictMirrorable(df, Seq("k"), "t", "y", 12)
    assert(out.select("fitted").as[Double].collect().forall(_ == 3.0))
  }

  test("solveNoPivot matches partial-pivoting solve on an SPD system") {
    // A = X'X + I is SPD, where no-pivot elimination is numerically safe
    val rnd = new scala.util.Random(42)
    val x = Array.fill(8, 4)(rnd.nextGaussian())
    val a = Array.tabulate(4, 4)((i, j) =>
      x.map(r => r(i) * r(j)).sum + (if (i == j) 1.0 else 0.0))
    val b = Array.tabulate(4)(i => x.map(r => r(i)).sum)
    val s1 = SeasonalRegression.solve(a.map(_.clone()), b.clone())
    val s2 = SeasonalRegression.solveNoPivot(a.map(_.clone()), b.clone())
    s1.zip(s2).foreach { case (u, v) => assert(math.abs(u - v) < 1e-10, s"$u vs $v") }
  }

  test("holidayIndicator marks exactly the listed dates") {
    val df = Seq("2026-12-24 10:00:00", "2026-12-25 00:30:00", "2027-01-01 23:59:59")
      .map(java.sql.Timestamp.valueOf).map(Tuple1(_)).toDF("ts")
    val out = df.select(SeasonalRegression.holidayIndicator(
      $"ts", Seq("2026-12-25", "2027-01-01")).as("h")).as[Double].collect().toSeq
    assert(out == Seq(0.0, 1.0, 1.0))
    val none = df.select(SeasonalRegression.holidayIndicator($"ts", Nil).as("h"))
      .as[Double].collect().toSeq
    assert(none == Seq(0.0, 0.0, 0.0))
  }
}
