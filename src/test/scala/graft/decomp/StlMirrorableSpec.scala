package graft.decomp

import java.math.{BigDecimal => JBD, RoundingMode}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class StlMirrorableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val period = 24

  private def synthetic(n: Int): Array[Double] =
    (0 until n).map(i =>
      100.0 + 0.05 * i + 5.0 * math.sin(2 * math.Pi * i / period) +
        0.37 * math.sin(i * 12.9898)).toArray

  private def dec6(x: Double): JBD =
    JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP)

  test("weight table endpoints: center weight 1, edge weight 0") {
    assert(StlMirrorable.weightTable((1, 0)) == new JBD("1.000000000000"))
    assert(StlMirrorable.weightTable((1, 1)).signum == 0)
    assert(StlMirrorable.weightTable((46, 23)).doubleValue > 0 &&
      StlMirrorable.weightTable((46, 23)).doubleValue < 1)
  }

  test("exact identity: trend + seasonal + resid == round(y, 6)") {
    val y = synthetic(150).map(dec6)
    val d = StlMirrorable.decomposeM(y, period)
    (0 until y.length).foreach { i =>
      val sum = d.trend(i).add(d.seasonal(i)).add(d.resid(i))
      assert(sum.compareTo(y(i)) == 0, s"identity broken at $i: $sum vs ${y(i)}")
    }
  }

  test("mirrorable decomposition tracks the plain-double STL") {
    val raw = synthetic(200)
    val classic = Stl.decompose(raw, period)
    val m = StlMirrorable.decomposeM(raw.map(dec6), period)
    // stage quantization is 1e-6; ~10 bounded smoothing stages compound
    // to well under 1e-3 on an O(100) series
    (0 until raw.length).foreach { i =>
      assert(math.abs(m.trend(i).doubleValue - classic.trend(i)) < 1e-3,
        s"trend diverged at $i: ${m.trend(i)} vs ${classic.trend(i)}")
      assert(math.abs(m.seasonal(i).doubleValue - classic.seasonal(i)) < 1e-3,
        s"seasonal diverged at $i")
    }
  }

  test("short series → degenerate decomposition, still 6 dp decimals") {
    val y = Array(1.0000004, 2.0, 3.0).map(dec6)
    val d = StlMirrorable.decomposeM(y, period)
    assert(d.trend.toSeq == y.toSeq)
    assert(d.seasonal.forall(_.signum == 0) && d.resid.forall(_.signum == 0))
  }

  test("decomposeDF matches the array kernel series-by-series") {
    val raw = synthetic(120)
    val df = spark.createDataFrame(
      raw.zipWithIndex.flatMap { case (v, i) =>
        Seq((i.toLong, 7L, i.toLong * 1000, v), (i.toLong + 1000, 8L, i.toLong * 1000, v + 1.5))
      }.toSeq).toDF("event_id", "user_id", "ts", "value")
    val out = StlMirrorable.decomposeDF(df, Seq("user_id"), Seq("ts", "event_id"),
      "value", period).collect()
    val expected7 = StlMirrorable.decomposeM(raw.map(dec6), period)
    val u7 = out.filter(_.getAs[Long]("user_id") == 7L)
      .sortBy(_.getAs[Long]("ts"))
    assert(u7.length == raw.length)
    u7.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("trend") == expected7.trend(i).doubleValue)
      assert(r.getAs[Double]("seasonal") == expected7.seasonal(i).doubleValue)
      assert(r.getAs[Double]("resid") == expected7.resid(i).doubleValue)
    }
    // the shifted series decomposes to the same seasonal, shifted trend
    val u8 = out.filter(_.getAs[Long]("user_id") == 8L).sortBy(_.getAs[Long]("ts"))
    val exp8 = StlMirrorable.decomposeM(raw.map(v => dec6(v + 1.5)), period)
    u8.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("trend") == exp8.trend(i).doubleValue)
    }
  }

  test("loessM on a constant series is the identity") {
    val c = Array.fill(60)(dec6(42.125))
    assert(StlMirrorable.loessM(c, 47).forall(_.compareTo(dec6(42.125)) == 0))
  }

  test("loessL fast path equals the 128-bit slow path term-for-term") {
    val rnd = new scala.util.Random(91)
    // values spanning the full fast-path range incl. negatives and
    // exact rounding-tie magnitudes
    for (span <- Seq(2, 7, 47); trial <- 1 to 5) {
      val vals = Array.fill(120)((rnd.nextDouble() * 2 - 1) * 999.0)
        .map(v => dec6(v))
      val l = vals.map(_.unscaledValue().longValueExact())
      val fastOut = StlMirrorable.loessL(l, span)
      val slowOut = StlMirrorable.loessL(l, span, forceSlow = true)
      assert(fastOut.toSeq == slowOut.toSeq, s"span=$span trial=$trial diverged")
    }
    // beyond the fast bound the slow path engages and still agrees with
    // itself (sanity that the dispatch threshold is what changes, not
    // the answer shape)
    val big = Array.fill(60)(dec6(123456.789012))
      .map(_.unscaledValue().longValueExact())
    assert(StlMirrorable.loessL(big, 47).toSeq ==
      StlMirrorable.loessL(big, 47, forceSlow = true).toSeq)
  }

  test("oracle SQL generator emits the pinned weight constants") {
    val sql = graft.oracle.StlOracle.q44Sql(24, 7, 2)
    assert(sql.contains("(1,0,'1.000000000000')"))
    assert(sql.contains("wtab"))
    // two iterations chained: second trend CTE feeds the final select
    assert(sql.contains("tr2 ") || sql.contains("tr2\n"))
    assert(sql.contains("JOIN tr2 t"))
  }
}
