package graft.decomp

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WaveletSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seriesDf(vals: Seq[Double], sid: String = "s") =
    vals.zipWithIndex.map { case (v, i) => (sid, i, v) }.toDF("sid", "t", "v")

  test("D5: 4-point Haar matches the hand-computed pyramid") {
    val df = seriesDf(Seq(1.0, 3.0, 2.0, 2.0))
    val out = Wavelet.haarDwt(df, "v", Seq("sid"), Seq("t"), 4)
      .collect().map(r => (r.getString(1), r.getInt(2)) -> r.getDouble(3)).toMap
    // a1 = [4/√2, 4/√2]; d1 = [-2/√2, 0]; a2 = [(8/√2)/√2] = [4]; d2 = [0]
    assert(math.abs(out(("d1", 0)) - (-2.0 / math.sqrt(2.0))) < 1e-6)
    assert(math.abs(out(("d1", 1))) < 1e-12)
    assert(math.abs(out(("a2", 0)) - 4.0) < 1e-6)
    assert(math.abs(out(("d2", 0))) < 1e-12)
  }

  test("D5: Parseval — coefficient energy equals signal energy") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(32)(rnd.nextDouble() * 10 - 5)
    val out = Wavelet.haarDwt(seriesDf(xs), "v", Seq("sid"), Seq("t"), 32)
      .agg(sum(col("coef") * col("coef"))).head().getDouble(0)
    val e = xs.map(x => x * x).sum
    assert(math.abs(out - e) < 1e-3, s"coef energy $out vs signal $e")
  }

  test("D5: inverse reconstructs the original series (round-trip)") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(16)(rnd.nextDouble() * 4 - 2)
    val coefs = Wavelet.haarDwt(seriesDf(xs), "v", Seq("sid"), Seq("t"), 16)
      .collect().map(r => (r.getString(1), r.getInt(2)) -> r.getDouble(3)).toMap
    // pack [a4 | d4 | d3 | d2 | d1]
    val packed =
      Seq(coefs(("a4", 0)), coefs(("d4", 0))) ++
      (0 until 2).map(i => coefs(("d3", i))) ++
      (0 until 4).map(i => coefs(("d2", i))) ++
      (0 until 8).map(i => coefs(("d1", i)))
    val rec = Seq(packed).toDF("c")
      .select(Wavelet.inverseHaarColumn(col("c"), 16).as("r"))
      .head().getSeq[Double](0)
    xs.zip(rec).foreach { case (x, r) =>
      // coefs were rounded to 6 dp → reconstruction is exact to ~n·5e-7
      assert(math.abs(x - r) < 1e-4, s"$x vs $r")
    }
  }

  test("D5: series shorter than the dyadic window are dropped") {
    val df = seriesDf(Seq(1.0, 2.0, 3.0), "short")
      .union(seriesDf(Seq(1.0, 2.0, 3.0, 4.0), "full"))
    val sids = Wavelet.haarDwt(df, "v", Seq("sid"), Seq("t"), 4)
      .select("sid").distinct().as[String].collect().toSet
    assert(sids == Set("full"))
  }

  test("D5: band energy concentrates in the smooth band for a constant") {
    val df = seriesDf(Seq.fill(8)(3.0))
    val e = Wavelet.haarBandEnergy(df, "v", Seq("sid"), Seq("t"), 8)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(math.abs(e("a3") - 8 * 9.0) < 1e-3) // all energy in the DC band
    assert(e("d1") == 0.0 && e("d2") == 0.0 && e("d3") == 0.0)
  }
}
