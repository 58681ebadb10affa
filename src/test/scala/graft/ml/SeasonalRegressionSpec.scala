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
}
