package graft.decomp

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class StlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val period = 12
  // trend 0.5/step + clean seasonal of period 12, 10 cycles
  private def synthetic(n: Int): Array[Double] =
    (0 until n).map(i =>
      0.5 * i + 10.0 * math.sin(2 * math.Pi * i / period)).toArray

  test("decompose recovers trend + seasonal of a clean synthetic series") {
    val y = synthetic(120)
    val d = Stl.decompose(y, period)
    // exact reconstruction by construction
    (0 until y.length).foreach { i =>
      assert(math.abs(d.trend(i) + d.seasonal(i) + d.resid(i) - y(i)) < 1e-9)
    }
    // interior: trend close to the true line, resid small
    (period * 2 until y.length - period * 2).foreach { i =>
      assert(math.abs(d.trend(i) - 0.5 * i) < 1.5, s"trend off at $i: ${d.trend(i)}")
      assert(math.abs(d.resid(i)) < 1.5, s"resid big at $i: ${d.resid(i)}")
    }
    // seasonal carries most of the oscillation energy in the interior
    val interior = (period * 2) until (y.length - period * 2)
    val seasVar = interior.map(i => d.seasonal(i) * d.seasonal(i)).sum / interior.size
    assert(seasVar > 20.0) // true seasonal variance is 50
  }

  test("short series → degenerate decomposition (trend=y)") {
    val y = Array(1.0, 2.0, 3.0)
    val d = Stl.decompose(y, 12)
    assert(d.trend.toSeq == y.toSeq)
    assert(d.seasonal.forall(_ == 0.0) && d.resid.forall(_ == 0.0))
  }

  test("decomposeDF: per-key decomposition, additive identity, row count") {
    val df = (Seq("a", "b").flatMap { k =>
      synthetic(72).zipWithIndex.map { case (v, i) => (k, i.toLong, v) }
    }).toDF("k", "t", "v")
    val out = Stl.decomposeDF(df, Seq("k"), "t", "v", period)
    assert(out.count() == 144)
    val bad = out.filter(
      org.apache.spark.sql.functions.abs($"trend" + $"seasonal" + $"resid" - $"v") > 1e-9)
    assert(bad.count() == 0)
    // keys decompose independently and identically (same series)
    val a = out.filter($"k" === "a").orderBy("t").select("trend").as[Double].collect()
    val b = out.filter($"k" === "b").orderBy("t").select("trend").as[Double].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("recompose adds components back") {
    val df = Seq((1.0, 2.0, 0.5)).toDF("trend", "seasonal", "resid")
    assert(Stl.recompose(df).select("recomposed").as[Double].head() == 3.5)
    val u = Seq((3.0, 4.0)).toDF("u1", "u2")
    assert(Stl.recomposeUncertainty(u, Seq("u1", "u2"))
      .select("uncertainty").as[Double].head() == 5.0)
  }
}
