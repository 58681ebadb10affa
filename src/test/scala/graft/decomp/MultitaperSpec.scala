package graft.decomp

import graft.TestSpark
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultitaperSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("D5: sine tapers are unit-energy and pairwise near-orthogonal") {
    val n = 16
    val tp = Multitaper.sineTapers(n, 3)
    tp.foreach { w =>
      val e = w.map(x => x * x).sum
      assert(math.abs(e - 1.0) < 1e-9, s"taper energy $e") // Σ sin² = (n+1)/2
    }
    for (a <- 0 until 3; b <- (a + 1) until 3) {
      val dot = tp(a).zip(tp(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) < 1e-9, s"tapers $a,$b dot $dot")
    }
  }

  test("D5: multitaper spectrum matches a brute-force reference") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(5)
    val xs = Array.fill(16)(rnd.nextDouble() * 2 - 1)
    val tapers = Multitaper.sineTapers(16, 3)
    // brute force: avg over tapers of |DFT(x·w)(j)|^2, j = 0..4
    def dftMag2(y: Array[Double], j: Int): Double = {
      var re = 0.0; var im = 0.0
      for (i <- 0 until 16) {
        re += y(i) * math.cos(-2 * math.Pi * j * i / 16)
        im += y(i) * math.sin(-2 * math.Pi * j * i / 16)
      }
      re * re + im * im
    }
    val want = (0 until 5).map(j =>
      tapers.map(w => dftMag2(xs.zip(w).map { case (x, t) => x * t }, j)).sum / 3)
    val df = Seq(Tuple1(xs.toSeq)).toDF("win")
    val mags = tapers.zipWithIndex.map { case (tp, i) =>
      GraftFunctions.fft_mag(Multitaper.tapered(col("win"), tp), lit(5)).as(s"m$i")
    }
    val got = df.select(explode(array(struct(mags: _*))).as("__m"))
      .select((0 until 5).map { j =>
        ((0 until 3).map(i =>
          pow(element_at(col("__m").getField(s"m$i"), j + 1), 2)).reduce(_ + _)
          / lit(3.0)).as(s"s$j")
      }: _*)
      .head()
    (0 until 5).foreach { j =>
      assert(math.abs(got.getDouble(j) - want(j)) < 1e-9,
        s"bin $j: ${got.getDouble(j)} vs ${want(j)}")
    }
  }

  test("D5: a pure in-bin sinusoid concentrates energy at its bin") {
    GraftFunctions.register(spark)
    val xs = Array.tabulate(16)(i => math.cos(2 * math.Pi * 2 * i / 16))
    val tapers = Multitaper.sineTapers(16, 3)
    val df = Seq(Tuple1(xs.toSeq)).toDF("win")
    val mags = tapers.zipWithIndex.map { case (tp, i) =>
      GraftFunctions.fft_mag(Multitaper.tapered(col("win"), tp), lit(5)).as(s"m$i")
    }
    val got = df.select(explode(array(struct(mags: _*))).as("__m"))
      .select((0 until 5).map { j =>
        ((0 until 3).map(i =>
          pow(element_at(col("__m").getField(s"m$i"), j + 1), 2)).reduce(_ + _)
          / lit(3.0)).as(s"s$j")
      }: _*)
      .head()
    val s = (0 until 5).map(got.getDouble)
    // sine tapers k=1..3 on a 16-point window have ~±2-bin bandwidth, so
    // the tone's energy lands in the {1,2,3} band; that band must
    // dominate the out-of-band bins {0,4} severalfold
    val inBand = (s(1) + s(2) + s(3)) / 3
    val outBand = (s(0) + s(4)) / 2
    assert(inBand > 3 * outBand, s"spectrum $s")
  }
}
