package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class FftMagSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fft_mag: DC bin is the sum; pure tone concentrates in its bin") {
    GraftFunctions.register(spark)
    val n = 16
    val tone = (0 until n).map(i => math.cos(2 * math.Pi * 2 * i / n)) // freq 2
    val df = Seq(Tuple1(tone)).toDF("w")
    val mags = df.select(GraftFunctions.fft_mag($"w", lit(5)).as("m"))
      .as[Seq[Double]].head()
    assert(mags.length == 5)
    assert(math.abs(mags(0)) < 1e-9)              // zero-mean tone → DC ≈ 0
    assert(math.abs(mags(2) - n / 2.0) < 1e-9)    // bin 2 = n/2 for unit cosine
    assert(mags.zipWithIndex.filter(_._2 != 2).forall(m => math.abs(m._1) < 1e-9))
    // DC of a constant series = n * c
    val const = Seq(Tuple1((0 until n).map(_ => 3.0))).toDF("w")
    val m0 = const.select(GraftFunctions.fft_mag($"w", lit(1)).as("m"))
      .as[Seq[Double]].head()
    assert(math.abs(m0.head - 48.0) < 1e-9)
  }

  test("fft_mag usable from SQL and null-safe") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT fft_mag(array(1.0d, 0.0d, -1.0d, 0.0d), 2) AS m")
      .as[Seq[Double]].head()
    assert(got.length == 2 && math.abs(got(0)) < 1e-12 && math.abs(got(1) - 2.0) < 1e-12)
    val nullRow = spark.sql("SELECT fft_mag(CAST(NULL AS ARRAY<DOUBLE>), 3) AS m")
    assert(nullRow.head().isNullAt(0))
  }

  test("fft_mag_norm sums to 1; flat window → uniform 1/k (reference fallback)") {
    GraftFunctions.register(spark)
    val df = Seq(Tuple1((0 until 32).map(i => math.sin(0.3 * i) + 0.1 * i))).toDF("w")
    val m = df.select(GraftFunctions.fft_mag_norm($"w", lit(5)).as("m"))
      .as[Seq[Double]].head()
    assert(math.abs(m.sum - 1.0) < 1e-9)
    assert(m.forall(_ >= 0.0))
    val flat = Seq(Tuple1((0 until 16).map(_ => 0.0))).toDF("w")
      .select(GraftFunctions.fft_mag_norm($"w", lit(5)).as("m"))
      .as[Seq[Double]].head()
    assert(flat.forall(_ == 0.2))
  }

  test("k larger than window length truncates to n bins") {
    GraftFunctions.register(spark)
    val m = spark.sql("SELECT fft_mag(array(1.0d, 2.0d), 8) AS m").as[Seq[Double]].head()
    assert(m.length == 2)
  }
}
