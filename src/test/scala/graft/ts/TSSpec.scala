package graft.ts

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TSSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def series(vs: Double*) =
    vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("sid", "t", "v")

  private val w = TS.seriesWindow(Seq("sid"), Seq("t"))

  test("logReturn: first row and non-positive ratios are 0") {
    val got = series(1.0, 2.0, 0.0, 4.0)
      .select(round(TS.logReturn($"v", w), 9).as("r")).as[Double].collect()
    assert(got(0) == 0.0)                       // first row
    assert(got(1) == math.rint(math.log(2.0) * 1e9) / 1e9)
    assert(got(2) == 0.0)                       // current <= 0
    assert(got(3) == 0.0)                       // prev <= 0
  }

  test("firstDiff: 0 for first row then x_t - x_{t-1}") {
    val got = series(5.0, 7.0, 4.0)
      .select(TS.firstDiff($"v", w).as("d")).as[Double].collect()
    assert(got.toSeq == Seq(0.0, 2.0, -3.0))
  }

  test("cyclic encode period 24 wraps") {
    val df = Seq(0.0, 6.0, 12.0, 24.0).toDF("h")
    val got = df.select(round(TS.cyclicSin($"h", 24), 9).as("s")).as[Double].collect()
    assert(got(0) == 0.0)
    assert(got(1) == 1.0)
    assert(math.abs(got(2)) < 1e-8)
    assert(math.abs(got(3)) < 1e-8)
  }

  test("symLog1p is odd and log1pClamp floors at zero") {
    val df = Seq(-1.5, 0.0, 1.5).toDF("x")
    val s = df.select(TS.symLog1p($"x").as("y")).as[Double].collect()
    assert(s(0) == -s(2) && s(1) == 0.0)
    val c = df.select(TS.log1pClamp($"x").as("y")).as[Double].collect()
    assert(c(0) == 0.0 && c(1) == 0.0 && c(2) == math.log1p(1.5))
  }

  test("fitZScore: train-only stats, zero-std fallback to 1") {
    val train = Seq((1.0, 5.0), (3.0, 5.0)).toDF("a", "const")
    val stats = TS.fitZScore(train, Seq("a", "const"))
    assert(stats("a")._1 == 2.0 && stats("a")._2 == 1.0) // stddev_pop([1,3])=1
    assert(stats("const") == ((5.0, 1.0)))               // std 0 → 1
  }

  test("finiteOrZero maps NaN/Inf/null to 0") {
    val df = Seq(Some(Double.NaN), Some(Double.PositiveInfinity), None, Some(2.0))
      .toDF("x")
    val got = df.select(TS.finiteOrZero($"x").as("y")).as[Double].collect()
    assert(got.toSeq == Seq(0.0, 0.0, 0.0, 2.0))
  }

  test("zscore/minmax round-trips") {
    val df = Seq(1.0, 2.0, 4.0).toDF("x")
    val rt = df.select(TS.zDenorm(TS.zNorm($"x", 2.0, 1.5), 2.0, 1.5).as("y"))
      .as[Double].collect()
    assert(rt.toSeq == Seq(1.0, 2.0, 4.0))
    val mm = df.select(round(TS.minMaxDenorm(TS.minMaxNorm($"x", 1.0, 4.0), 1.0, 4.0), 9).as("y"))
      .as[Double].collect()
    assert(mm.toSeq == Seq(1.0, 2.0, 4.0))
  }
}
