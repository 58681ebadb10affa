package graft.ts

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Technical indicators vs independent straight-line array
  * implementations of the same public formulas (Wilder 1978 RSI/ATR/ADX,
  * Appel MACD 12-26-9, Lane stochastic, Lambert CCI): the engine's
  * window-expression / streaming-kernel forms must reproduce a plain
  * sequential pass exactly.
  */
class TechIndicatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic OHLC random walk, two series
  private def series(sym: String, n: Int, seed: Long): Seq[(String, Long, Double, Double, Double)] = {
    val rnd = new scala.util.Random(seed)
    var c = 100.0
    (1 to n).map { i =>
      c += rnd.nextGaussian() * 0.5
      val h = c + math.abs(rnd.nextGaussian()) * 0.3
      val l = c - math.abs(rnd.nextGaussian()) * 0.3
      (sym, i.toLong, h, l, c)
    }
  }
  private val rowsA = series("a", 300, 7L)
  private val rowsB = series("b", 120, 13L)
  private lazy val df = (rowsA ++ rowsB).toDF("sym", "t", "high", "low", "close")
  private val w = Window.partitionBy("sym").orderBy("t")

  // ---- independent reference implementations (plain arrays) ----

  private def emaRef(x: Seq[Double], n: Int): Seq[Double] = {
    val a = 2.0 / (n + 1)
    var s = Double.NaN
    x.zipWithIndex.map { case (v, i) =>
      if (i < n - 1) { Double.NaN }
      else if (i == n - 1) { s = x.take(n).sum / n; s }
      else { s = s + a * (v - s); s }
    }
  }

  private def wilderRef(x: Seq[Double], n: Int): Seq[Double] = {
    var s = Double.NaN
    x.zipWithIndex.map { case (v, i) =>
      if (i < n - 1) Double.NaN
      else if (i == n - 1) { s = x.take(n).sum / n; s }
      else { s = s + (v - s) / n; s }
    }
  }

  test("EMA and MACD family match the array reference on the streaming kernel") {
    val out = TechIndicators.withRecursiveIndicators(df, Seq("sym"), Seq("t"),
      "high", "low", "close")
      .filter($"sym" === "a").orderBy("t")
      .select("close", "EMA", "MACD", "MACD_Signal", "MACD_Histogram")
      .collect()
    val closes = rowsA.map(_._5)
    val ema = emaRef(closes, 14)
    val fast = emaRef(closes, 12)
    val slow = emaRef(closes, 26)
    val macd = fast.zip(slow).map { case (f, s) => f - s }
    // signal smooths MACD from its first defined value
    val macdDef = macd.dropWhile(_.isNaN)
    val sig = Seq.fill(macd.length - macdDef.length)(Double.NaN) ++ emaRef(macdDef, 9)
    out.zipWithIndex.foreach { case (r, i) =>
      def got(j: Int): Double = if (r.isNullAt(j)) Double.NaN else r.getDouble(j)
      assert(got(1).isNaN == ema(i).isNaN && (ema(i).isNaN || math.abs(got(1) - ema(i)) < 1e-12), s"EMA row $i")
      assert(got(2).isNaN == macd(i).isNaN && (macd(i).isNaN || math.abs(got(2) - macd(i)) < 1e-12), s"MACD row $i")
      assert(got(3).isNaN == sig(i).isNaN && (sig(i).isNaN || math.abs(got(3) - sig(i)) < 1e-12), s"signal row $i")
      if (!sig(i).isNaN)
        assert(math.abs(got(4) - (macd(i) - sig(i))) < 1e-12, s"hist row $i")
    }
  }

  test("Wilder RSI / ATR / ADX match the array reference") {
    val out = TechIndicators.withRecursiveIndicators(df, Seq("sym"), Seq("t"),
      "high", "low", "close")
      .filter($"sym" === "a").orderBy("t")
      .select("RSI", "ATR", "ADX", "DI_plus", "DI_minus")
      .collect()
    val (h, l, c) = (rowsA.map(_._3), rowsA.map(_._4), rowsA.map(_._5))
    val n = rowsA.size
    val gains = (1 until n).map(i => math.max(c(i) - c(i - 1), 0.0))
    val losses = (1 until n).map(i => math.max(c(i - 1) - c(i), 0.0))
    val g = wilderRef(gains, 14); val lo = wilderRef(losses, 14)
    val rsi = Double.NaN +: g.zip(lo).map { case (a, b) =>
      if (a.isNaN) Double.NaN else if (b == 0.0) 100.0 else 100.0 - 100.0 / (1.0 + a / b)
    }
    val tr = (1 until n).map(i =>
      math.max(h(i) - l(i), math.max(math.abs(h(i) - c(i - 1)), math.abs(l(i) - c(i - 1)))))
    val atr = Double.NaN +: wilderRef(tr, 14)
    val pdm = (1 until n).map { i =>
      val up = h(i) - h(i - 1); val dn = l(i - 1) - l(i)
      if (up > dn && up > 0) up else 0.0
    }
    val mdm = (1 until n).map { i =>
      val up = h(i) - h(i - 1); val dn = l(i - 1) - l(i)
      if (dn > up && dn > 0) dn else 0.0
    }
    val sp = wilderRef(pdm, 14); val sm = wilderRef(mdm, 14)
    val dis = sp.indices.map { i =>
      if (sp(i).isNaN || atr(i + 1).isNaN || atr(i + 1) == 0.0) (Double.NaN, Double.NaN, Double.NaN)
      else {
        val dp = 100.0 * sp(i) / atr(i + 1)
        val dm = 100.0 * sm(i) / atr(i + 1)
        val dx = if (dp + dm == 0.0) 0.0 else 100.0 * math.abs(dp - dm) / (dp + dm)
        (dp, dm, dx)
      }
    }
    val adxSeq = {
      // ADX = Wilder smoothing of the DX stream from its first defined value
      val dxs = dis.map(_._3).dropWhile(_.isNaN)
      Double.NaN +: (Seq.fill(dis.length - dxs.length)(Double.NaN) ++ wilderRef(dxs, 14))
    }
    out.zipWithIndex.foreach { case (r, i) =>
      def got(j: Int): Double = if (r.isNullAt(j)) Double.NaN else r.getDouble(j)
      assert(got(0).isNaN == rsi(i).isNaN && (rsi(i).isNaN || math.abs(got(0) - rsi(i)) < 1e-12), s"RSI row $i: ${got(0)} vs ${rsi(i)}")
      assert(got(1).isNaN == atr(i).isNaN && (atr(i).isNaN || math.abs(got(1) - atr(i)) < 1e-12), s"ATR row $i")
      val dp = if (i == 0) Double.NaN else dis(i - 1)._1
      assert(got(3).isNaN == dp.isNaN && (dp.isNaN || math.abs(got(3) - dp) < 1e-12), s"DI+ row $i")
      assert(got(2).isNaN == adxSeq(i).isNaN && (adxSeq(i).isNaN || math.abs(got(2) - adxSeq(i)) < 1e-12), s"ADX row $i: ${got(2)} vs ${adxSeq(i)}")
    }
    // value-range sanity, the committed phase_3 stats' shape (RSI within
    // [0,100]; ADX/DI non-negative)
    out.foreach { r =>
      if (!r.isNullAt(0)) assert(r.getDouble(0) >= 0 && r.getDouble(0) <= 100)
      if (!r.isNullAt(2)) assert(r.getDouble(2) >= 0)
    }
  }

  test("series isolation: a second series' state never leaks into the first") {
    val both = TechIndicators.withRecursiveIndicators(df, Seq("sym"), Seq("t"),
      "high", "low", "close").filter($"sym" === "a").orderBy("t").select("EMA").collect()
    val alone = TechIndicators.withRecursiveIndicators(
      rowsA.toDF("sym", "t", "high", "low", "close"), Seq("sym"), Seq("t"),
      "high", "low", "close").orderBy("t").select("EMA").collect()
    assert(both.map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq ==
      alone.map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq)
  }

  test("bounded-window family matches brute force; CCI is partition-count invariant") {
    val out = df.filter($"sym" === "a")
      .withColumn("tr", TechIndicators.trueRange($"high", $"low", $"close", w))
      .select($"t", $"close", $"high", $"low",
        TechIndicators.momentum($"close", w, 6).as("mom"),
        TechIndicators.roc($"close", w, 6).as("roc"),
        TechIndicators.stochasticK($"close", $"high", $"low", w, 14).as("k"),
        TechIndicators.williamsR($"close", $"high", $"low", w, 14).as("wr"),
        TechIndicators.atrSma($"tr", w, 14).as("atr"),
        TechIndicators.cci($"high", $"low", $"close", w, 20).as("cci"))
      .orderBy("t").collect()
    val (h, l, c) = (rowsA.map(_._3), rowsA.map(_._4), rowsA.map(_._5))
    out.zipWithIndex.foreach { case (r, i) =>
      def got(n: String): Double = if (r.isNullAt(r.fieldIndex(n))) Double.NaN else r.getAs[Double](n)
      if (i >= 6) {
        assert(math.abs(got("mom") - (c(i) - c(i - 6))) < 1e-12)
        assert(math.abs(got("roc") - ((c(i) / c(i - 6) - 1) * 100)) < 1e-12)
      } else assert(got("mom").isNaN)
      if (i >= 13) {
        val hh = h.slice(i - 13, i + 1).max; val ll = l.slice(i - 13, i + 1).min
        assert(math.abs(got("k") - (c(i) - ll) / (hh - ll) * 100) < 1e-9)
        assert(math.abs(got("wr") - (hh - c(i)) / (hh - ll) * -100) < 1e-9)
        val trs = (i - 13 to i).map(j =>
          if (j == 0) h(0) - l(0)
          else math.max(h(j) - l(j), math.max(math.abs(h(j) - c(j - 1)), math.abs(l(j) - c(j - 1)))))
        assert(math.abs(got("atr") - trs.sum / 14) < 1e-9)
      } else assert(got("k").isNaN && got("wr").isNaN && got("atr").isNaN)
      if (i >= 19) {
        val tps = (i - 19 to i).map(j => (h(j) + l(j) + c(j)) / 3.0)
        val m = tps.sum / 20
        val md = tps.map(v => math.abs(v - m)).sum / 20
        val tp = (h(i) + l(i) + c(i)) / 3.0
        assert(math.abs(got("cci") - (tp - m) / (0.015 * md)) < 1e-6, s"CCI row $i")
      } else assert(got("cci").isNaN)
    }
    // partition invariance of the sort_array'd CCI fold
    val re = df.repartition(7).filter($"sym" === "a").select($"t",
      TechIndicators.cci($"high", $"low", $"close", w, 20).as("cci")).orderBy("t").collect()
    assert(out.map(r => if (r.isNullAt(r.fieldIndex("cci"))) null else r.getAs[Double]("cci")).toSeq ==
      re.map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq)
  }
}
