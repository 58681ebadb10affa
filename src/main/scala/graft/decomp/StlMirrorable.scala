package graft.decomp

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mirrorable STL decomposition (D1's oracle-exact face; reference
  * `target_plugins/stl_target.py:37-51`).
  *
  * [[Stl.decomposeDF]] is the production operator: plain-double LOESS,
  * fastest per series. This variant pins the SAME Cleveland inner loop
  * (cycle-subseries LOESS → 3×MA low-pass → seasonal, deseasonalized
  * LOESS → trend, `nInner` fixed iterations) to an arithmetic that a
  * SQL engine can replay bit-for-bit ([[graft.oracle.StlOracle]]):
  *
  *   - tricube weights are design CONSTANTS quantized to 12 dp
  *     ([[weightTable]]); the oracle inlines the same strings, so no
  *     engine ever computes a weight in floating point;
  *   - every cross-point sum (the weighted normal equations, the moving
  *     averages) runs in exact decimal space — order-free, so Spark's
  *     sequential loop and DuckDB's unordered SUM agree exactly;
  *   - sums are quantized to 7 dp before the double-space solve
  *     (keeping the decimal's scaled integer under 2^53, where both
  *     engines' decimal→double casts are correctly rounded), and the
  *     solve itself is straight-line IEEE ops in a pinned order;
  *   - each stage output rounds to 6 dp (the q10/q16 round contract)
  *     and re-enters decimal space, so divergence cannot compound.
  *
  * The result is a true STL up to 1e-6 stage quantization
  * (`StlMirrorableSpec` pins closeness to [[Stl.decompose]] and the
  * exact identity trend + seasonal + resid = round(y, 6)).
  *
  * Scale shape = [[Stl.decomposeDF]]: repartition by series key, sort
  * within partitions, stream one series at a time through the kernel.
  */
object StlMirrorable {

  /** Largest span any LOESS call can see (trend smoother for period 24
    * is 47); the weight table covers every reachable (dmax, k).
    */
  val MaxSpan = 64

  /** Tricube weights `((1-(k/dmax)^3)^3` quantized to 12 dp — shared
    * verbatim with the oracle SQL's inline VALUES table.
    */
  lazy val weightTable: Map[(Int, Int), JBD] = (for {
    dmax <- 1 to MaxSpan
    k <- 0 to dmax
  } yield {
    val d = k.toDouble / dmax.toDouble
    val t = 1.0 - d * d * d
    (dmax, k) -> JBD.valueOf(t * t * t).setScale(12, RoundingMode.HALF_UP)
  }).toMap

  private val Zero6 = JBD.ZERO.setScale(6)

  /** Weight table re-materialized as scale-12 unscaled longs, indexed
    * `(dmax)(k)` — the hot loop sums fixed-point longs, not BigDecimals
    * (the arithmetic is identical: a scale-12 decimal IS its unscaled
    * long; the first bench cut was 8.7 s cold / 19.8 s warm at sf0.1
    * from BigDecimal allocation churn alone).
    */
  private lazy val weightLong: Array[Array[Long]] =
    (0 to MaxSpan).map { dmax =>
      if (dmax == 0) Array.empty[Long]
      else (0 to dmax).map(k =>
        weightTable((dmax, k)).unscaledValue().longValueExact()).toArray
    }.toArray

  // The scale-12 weight split into two scale-6 halves (w = wh·10⁻⁶ +
  // wl·10⁻¹², wh/wl < 10⁶): the allocation-free fast path accumulates
  // Σ wh·y and Σ wl·y separately so every sum fits a signed long when
  // |y| ≤ 10³ — recombined exactly by [[roundDiv18to7]].
  private lazy val weightHi: Array[Array[Long]] =
    weightLong.map(_.map(_ / 1000000L))
  private lazy val weightLo: Array[Array[Long]] =
    weightLong.map(_.map(_ % 1000000L))

  /** |series value| bound (scale-6 unscaled) for the long-only fast
    * path: 10³·10⁶. Worst-case sums: |Σ x·wh·y| ≤ 47·47·10⁶·10⁹ ≈
    * 2.2e18 < 2⁶³.
    */
  private val FastMaxAbs = 1000000000L

  /** Exact half-away rounding of (SH·10⁶ + SL) / 10¹¹ — the scale-18 →
    * scale-7 quantization — in pure long arithmetic. SH/SL are the
    * split-weight partial sums; the floorDiv decomposition keeps every
    * intermediate in range and the remainder non-negative.
    */
  private def roundDiv18to7(sh: Long, sl: Long): Long = {
    val D = 100000000000L // 10^11
    val q1 = Math.floorDiv(sh, 100000L)
    val r1 = Math.floorMod(sh, 100000L) * 1000000L // < 10^11
    val u = r1 + sl
    val q2 = Math.floorDiv(u, D)
    val r2 = Math.floorMod(u, D)
    val qf = q1 + q2
    if (qf >= 0) { if (2 * r2 >= D) qf + 1 else qf }
    else { if (2 * (D - r2) >= D) qf else qf + 1 }
  }

  /** Signed 128-bit accumulator for Σ w·y and Σ w·x·y — scale-18
    * products of scale-12 weights and scale-6 values overflow a long.
    */
  private final class Acc128 {
    private var hi = 0L
    private var lo = 0L
    def add(a: Long, b: Long): Unit = {
      val pHi = Math.multiplyHigh(a, b)
      val pLo = a * b
      val nLo = lo + pLo
      val carry = ((lo & pLo) | ((lo | pLo) & ~nLo)) >>> 63
      hi += pHi + carry
      lo = nLo
    }
    def toBigInteger: java.math.BigInteger = {
      val loUnsigned = java.math.BigInteger.valueOf(lo >>> 1).shiftLeft(1)
        .or(java.math.BigInteger.valueOf(lo & 1L))
      java.math.BigInteger.valueOf(hi).shiftLeft(64).add(loUnsigned)
    }
  }

  /** Half-away-from-zero integer division (BigDecimal HALF_UP): for
    * a ≥ 0, (2a + d) / (2d) floored; sign-split for a < 0. `den` > 0.
    */
  private def halfAwayDivLong(num: Long, den: Long): Long =
    if (num >= 0) (2 * num + den) / (2 * den)
    else -((2 * -num + den) / (2 * den))

  private val Two = java.math.BigInteger.TWO

  private def halfAwayDivBig(num: java.math.BigInteger, den: java.math.BigInteger): Long = {
    val d2 = den.multiply(Two)
    (if (num.signum >= 0) num.multiply(Two).add(den).divide(d2)
     else num.multiply(Two).negate.add(den).divide(d2).negate).longValueExact()
  }

  private val E5 = 100000L
  private val E6 = 1000000L
  private val E11 = java.math.BigInteger.valueOf(100000000000L)

  /** scale-7 fixed-point long → double: the scaled integer is < 2^53,
    * so long/1e7 is correctly rounded — bit-identical to both engines'
    * decimal→double casts at scale 7.
    */
  private def s7ToDouble(v: Long): Double = v.toDouble / 1e7

  /** Spark `round(col, 6)` semantics (BigDecimal.valueOf = shortest
    * double repr, HALF_UP) → scale-6 unscaled long.
    */
  private def r6Long(x: Double): Long =
    JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP).unscaledValue().longValueExact()

  /** Reference trend-smoother span (Cleveland's default, odd-ified) —
    * same formula as [[Stl.decompose]].
    */
  def trendSmoother(period: Int, seasonalSmoother: Int): Int = {
    val t0 = math.ceil(1.5 * period / (1 - 1.5 / seasonalSmoother)).toInt
    if (t0 % 2 == 0) t0 + 1 else t0
  }

  /** Mirrorable local-linear LOESS over scale-6 fixed-point longs:
    * exact weighted sums (longs for Σw/Σwx/Σwx², 128-bit for the
    * value-carrying Σwy/Σwxy), 7 dp quantization, double-space solve,
    * 6 dp output. Arithmetic is identical to the BigDecimal reading in
    * the scaladoc above — a scale-s decimal IS its unscaled integer.
    */
  private[decomp] def loessL(vals: Array[Long], q: Int): Array[Long] =
    loessL(vals, q, forceSlow = false)

  private[decomp] def loessL(vals: Array[Long], q: Int, forceSlow: Boolean): Array[Long] = {
    val n = vals.length
    val out = new Array[Long](n)
    if (n == 0) return out
    val s = math.max(2, math.min(q, n))
    // Fast path: every value within |y| ≤ 10³ → the weighted sums fit
    // signed longs via the split-weight scheme, and the whole point
    // loop is allocation-free (32 concurrent kernels thrashed GC on the
    // BigInteger path: 71 s for 10M rows vs ~6 s of actual arithmetic).
    // Values and sums are identical on both paths — exact integer
    // arithmetic either way; the spec pins fast ≡ slow.
    var maxAbs = 0L
    var m0 = 0
    while (m0 < n) { val a = math.abs(vals(m0)); if (a > maxAbs) maxAbs = a; m0 += 1 }
    val fast = !forceSlow && maxAbs <= FastMaxAbs
    var i = 0
    while (i < n) {
      var lo = math.max(0, i - s / 2)
      val hi = math.min(n - 1, lo + s - 1)
      lo = math.max(0, hi - s + 1)
      val dmax = math.max(math.max(i - lo, hi - i), 1)
      val wt = weightLong(dmax)
      var sw = 0L; var swx = 0L; var swxx = 0L
      var swy7 = 0L; var swxy7 = 0L
      if (fast) {
        val wh = weightHi(dmax); val wl = weightLo(dmax)
        var shy = 0L; var sly = 0L; var shxy = 0L; var slxy = 0L
        var j = lo
        while (j <= hi) {
          val x = j - i
          val k = math.abs(x)
          val w = wt(k)
          val yv = vals(j)
          sw += w
          swx += w * x
          swxx += w * x * x
          val h = wh(k) * yv
          val l = wl(k) * yv
          shy += h; sly += l
          shxy += x * h; slxy += x * l
          j += 1
        }
        swy7 = roundDiv18to7(shy, sly)
        swxy7 = roundDiv18to7(shxy, slxy)
      } else {
        val accY = new Acc128; val accXY = new Acc128
        var j = lo
        while (j <= hi) {
          val x = j - i
          val w = wt(math.abs(x))
          sw += w
          swx += w * x
          swxx += w * x * x
          accY.add(w, vals(j))
          accXY.add(w * x, vals(j))
          j += 1
        }
        swy7 = halfAwayDivBig(accY.toBigInteger, E11) // scale 18 → 7
        swxy7 = halfAwayDivBig(accXY.toBigInteger, E11)
      }
      val sw7 = halfAwayDivLong(sw, E5) // scale 12 → 7
      val swx7 = halfAwayDivLong(swx, E5)
      val swxx7 = halfAwayDivLong(swxx, E5)
      val swD = s7ToDouble(sw7); val swxD = s7ToDouble(swx7)
      val swyD = s7ToDouble(swy7)
      val swxxD = s7ToDouble(swxx7); val swxyD = s7ToDouble(swxy7)
      val denom = swD * swxxD - swxD * swxD
      // The degenerate branch divides two exact 7 dp decimals — the
      // quotient is often EXACTLY on a 6 dp rounding midpoint (e.g. a
      // single-point window yields swy/sw = y), where double-space
      // ROUND diverges across engines. Divide in integer space with
      // half-away rounding instead (the oracle emulates the same). The
      // non-degenerate quotient is a full-precision double — midpoints
      // are measure-zero there.
      out(i) =
        if (math.abs(denom) < 1e-12) {
          if (fast) halfAwayDivLong(swy7 * E6, sw7) // |swy7·10⁶| ≤ 4.7e17
          else halfAwayDivBig(
            java.math.BigInteger.valueOf(swy7).multiply(java.math.BigInteger.valueOf(E6)),
            java.math.BigInteger.valueOf(sw7))
        } else {
          val slope = (swD * swxyD - swxD * swyD) / denom
          r6Long((swyD - slope * swxD) / swD)
        }
      i += 1
    }
    out
  }

  /** Mirrorable centered moving average: exact long sum, half-away
    * integer division by the clamped window count (a 6 dp sum over a
    * count like 2 or 16 lands exactly on 6 dp midpoints, where
    * double-space ROUND ties diverge across engines).
    */
  private[decomp] def maL(vals: Array[Long], p: Int): Array[Long] = {
    val n = vals.length
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - p / 2)
      val hi = math.min(n - 1, i + (p - 1) / 2)
      var s = 0L
      var j = lo
      while (j <= hi) { s += vals(j); j += 1 }
      out(i) = halfAwayDivLong(s, (hi - lo + 1).toLong)
      i += 1
    }
    out
  }

  /** Cycle-subseries LOESS: each phase's subseries smoothed
    * independently (subseries index k = i / period, length
    * (n-1-ph)/period + 1 — the oracle derives the same grouping with
    * integer division).
    */
  private[decomp] def cycleLoessL(vals: Array[Long], period: Int, q: Int): Array[Long] = {
    val n = vals.length
    val out = new Array[Long](n)
    var ph = 0
    while (ph < period) {
      val idx = Array.range(ph, n, period)
      val s = loessL(idx.map(vals), q)
      var j = 0
      while (j < idx.length) { out(idx(j)) = s(j); j += 1 }
      ph += 1
    }
    out
  }

  /** JBD face of [[loessL]], for specs and small callers. */
  private[decomp] def loessM(vals: Array[JBD], q: Int): Array[JBD] =
    loessL(vals.map(toL6), q).map(fromL6)

  private def toL6(v: JBD): Long = {
    val u = v.setScale(6, RoundingMode.HALF_UP).unscaledValue().longValueExact()
    require(math.abs(u) <= 1000000000000L,
      s"mirrorable STL expects |value| <= 1e6, got ${v}")
    u
  }
  private def fromL6(u: Long): JBD = JBD.valueOf(u, 6)

  final case class DecompM(trend: Array[JBD], seasonal: Array[JBD], resid: Array[JBD])

  /** One series (already 6 dp decimals) → mirrorable (trend, seasonal,
    * resid). Degenerate semantics = [[Stl.decompose]]: series shorter
    * than two periods decompose to trend = y, seasonal = resid = 0.
    */
  def decomposeM(y: Array[JBD], period: Int, seasonalSmoother: Int = 7,
      nInner: Int = 2): DecompM = {
    val n = y.length
    if (n < 2 * period || period < 2) {
      return DecompM(y.map(_.setScale(6, RoundingMode.HALF_UP)),
        Array.fill(n)(Zero6), Array.fill(n)(Zero6))
    }
    val ts = trendSmoother(period, seasonalSmoother)
    require(ts <= MaxSpan, s"trend smoother $ts exceeds weight table span $MaxSpan")
    val yL = y.map(toL6)
    var trend: Array[Long] = new Array[Long](n)
    var seasonal: Array[Long] = null
    var it = 0
    while (it < nInner) {
      val detr = Array.tabulate(n)(i => yL(i) - trend(i))
      val sub = cycleLoessL(detr, period, seasonalSmoother)
      val low = loessL(maL(maL(maL(sub, period), period), 3), ts)
      seasonal = Array.tabulate(n)(i => sub(i) - low(i))
      val des = Array.tabulate(n)(i => yL(i) - seasonal(i))
      trend = loessL(des, ts)
      it += 1
    }
    val resid = Array.tabulate(n)(i => yL(i) - trend(i) - seasonal(i))
    DecompM(trend.map(fromL6), seasonal.map(fromL6), resid.map(fromL6))
  }

  /** DataFrame form: per-key mirrorable STL ordered by `orderCols`
    * (ties must be fully broken — pass the row id last); appends
    * trend/seasonal/resid doubles. `valueCol` is rounded to 6 dp by
    * Spark's own `round` before entering the kernel, so the decimal the
    * kernel sees is the one the oracle's `ROUND(value, 6)` derives.
    */
  def decomposeDF(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, period: Int, seasonalSmoother: Int = 7,
      nInner: Int = 2): DataFrame = {
    val prepped = df.withColumn("__y6", round(col(valueCol), 6))
    val outSchema = StructType(prepped.schema.fields ++ Seq(
      StructField("trend", DoubleType), StructField("seasonal", DoubleType),
      StructField("resid", DoubleType)))
    val keyIdx = keyCols.map(prepped.schema.fieldIndex)
    val vIdx = prepped.schema.fieldIndex("__y6")
    val sorted = prepped
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    sorted.mapPartitions { rows =>
      new Iterator[Row] {
        private val buf = scala.collection.mutable.Queue.empty[Row]
        private var pendingRow: Row = null
        private def sameKey(a: Row, b: Row): Boolean =
          keyIdx.forall(i => a.get(i) == b.get(i))
        private def emitSeries(series: Seq[Row]): Unit = {
          val y = series.map(r =>
            JBD.valueOf(r.getDouble(vIdx)).setScale(6, RoundingMode.HALF_UP)).toArray
          val d = decomposeM(y, period, seasonalSmoother, nInner)
          series.zipWithIndex.foreach { case (r, i) =>
            buf.enqueue(Row.fromSeq(r.toSeq ++ Seq(
              d.trend(i).doubleValue, d.seasonal(i).doubleValue, d.resid(i).doubleValue)))
          }
        }
        private def fill(): Unit = {
          if (buf.nonEmpty) return
          if (pendingRow == null && !rows.hasNext) return
          val series = scala.collection.mutable.ArrayBuffer.empty[Row]
          if (pendingRow != null) { series += pendingRow; pendingRow = null }
          var done = false
          while (!done && rows.hasNext) {
            val r = rows.next()
            if (series.isEmpty || sameKey(series.head, r)) series += r
            else { pendingRow = r; done = true }
          }
          if (series.nonEmpty) emitSeries(series.toSeq)
        }
        override def hasNext: Boolean = { fill(); buf.nonEmpty }
        override def next(): Row = { fill(); buf.dequeue() }
      }
    }(enc).drop("__y6")
  }
}
