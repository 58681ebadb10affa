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

  /** Decimal → double via a 7 dp quantization: the scaled integer stays
    * under 2^53, where DuckDB's int128/10^scale cast and Java's
    * doubleValue are both correctly rounded — identical bits.
    */
  private def d7(x: JBD): Double = x.setScale(7, RoundingMode.HALF_UP).doubleValue

  /** Spark `round(col, 6)` semantics (BigDecimal.valueOf = shortest
    * double repr, HALF_UP) — the cross-engine-proven 6 dp contract.
    */
  private def r6(x: Double): JBD = JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP)

  /** Reference trend-smoother span (Cleveland's default, odd-ified) —
    * same formula as [[Stl.decompose]].
    */
  def trendSmoother(period: Int, seasonalSmoother: Int): Int = {
    val t0 = math.ceil(1.5 * period / (1 - 1.5 / seasonalSmoother)).toInt
    if (t0 % 2 == 0) t0 + 1 else t0
  }

  /** Mirrorable local-linear LOESS: exact-decimal weighted sums,
    * 7 dp-quantized double solve, 6 dp output.
    */
  private[decomp] def loessM(vals: Array[JBD], q: Int): Array[JBD] = {
    val n = vals.length
    val out = new Array[JBD](n)
    if (n == 0) return out
    val s = math.max(2, math.min(q, n))
    var i = 0
    while (i < n) {
      var lo = math.max(0, i - s / 2)
      val hi = math.min(n - 1, lo + s - 1)
      lo = math.max(0, hi - s + 1)
      val dmax = math.max(math.max(i - lo, hi - i), 1)
      var sw = JBD.ZERO; var swx = JBD.ZERO; var swy = JBD.ZERO
      var swxx = JBD.ZERO; var swxy = JBD.ZERO
      var j = lo
      while (j <= hi) {
        val w = weightTable((dmax, math.abs(j - i)))
        val x = JBD.valueOf((j - i).toLong)
        sw = sw.add(w)
        swx = swx.add(w.multiply(x))
        swy = swy.add(w.multiply(vals(j)))
        swxx = swxx.add(w.multiply(x.multiply(x)))
        swxy = swxy.add(w.multiply(x).multiply(vals(j)))
        j += 1
      }
      val sw7 = sw.setScale(7, RoundingMode.HALF_UP)
      val swy7 = swy.setScale(7, RoundingMode.HALF_UP)
      val swD = sw7.doubleValue; val swxD = d7(swx); val swyD = swy7.doubleValue
      val swxxD = d7(swxx); val swxyD = d7(swxy)
      val denom = swD * swxxD - swxD * swxD
      // The degenerate branch divides two exact 7 dp decimals — the
      // quotient is often EXACTLY on a 6 dp rounding midpoint (e.g. a
      // single-point window yields swy/sw = y), where double-space
      // ROUND diverges across engines. Divide in decimal space with
      // HALF_UP instead (the oracle emulates this with exact integer
      // arithmetic). The non-degenerate quotient is a full-precision
      // double — midpoints are measure-zero there.
      out(i) =
        if (math.abs(denom) < 1e-12) swy7.divide(sw7, 6, RoundingMode.HALF_UP)
        else {
          val slope = (swD * swxyD - swxD * swyD) / denom
          r6((swyD - slope * swxD) / swD)
        }
      i += 1
    }
    out
  }

  /** Mirrorable centered moving average: exact decimal sum, double
    * division by the clamped window count, 6 dp output.
    */
  private[decomp] def maM(vals: Array[JBD], p: Int): Array[JBD] = {
    val n = vals.length
    val out = new Array[JBD](n)
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - p / 2)
      val hi = math.min(n - 1, i + (p - 1) / 2)
      var s = JBD.ZERO
      var j = lo
      while (j <= hi) { s = s.add(vals(j)); j += 1 }
      // decimal-space division: a 6 dp sum over a clamped count (2, 16,
      // 20, …) lands exactly on 6 dp midpoints whenever the count is
      // 2^a·5^b — double-space ROUND ties diverge across engines there
      out(i) = s.divide(JBD.valueOf((hi - lo + 1).toLong), 6, RoundingMode.HALF_UP)
      i += 1
    }
    out
  }

  /** Cycle-subseries LOESS: each phase's subseries smoothed
    * independently (subseries index k = i / period, length
    * (n-1-ph)/period + 1 — the oracle derives the same grouping with
    * integer division).
    */
  private[decomp] def cycleLoessM(vals: Array[JBD], period: Int, q: Int): Array[JBD] = {
    val n = vals.length
    val out = new Array[JBD](n)
    var ph = 0
    while (ph < period) {
      val idx = Array.range(ph, n, period)
      val s = loessM(idx.map(vals), q)
      var j = 0
      while (j < idx.length) { out(idx(j)) = s(j); j += 1 }
      ph += 1
    }
    out
  }

  final case class DecompM(trend: Array[JBD], seasonal: Array[JBD], resid: Array[JBD])

  /** One series (already 6 dp decimals) → mirrorable (trend, seasonal,
    * resid). Degenerate semantics = [[Stl.decompose]]: series shorter
    * than two periods decompose to trend = y, seasonal = resid = 0.
    */
  def decomposeM(y: Array[JBD], period: Int, seasonalSmoother: Int = 7,
      nInner: Int = 2): DecompM = {
    val n = y.length
    if (n < 2 * period || period < 2) {
      return DecompM(y.clone(), Array.fill(n)(Zero6), Array.fill(n)(Zero6))
    }
    val ts = trendSmoother(period, seasonalSmoother)
    require(ts <= MaxSpan, s"trend smoother $ts exceeds weight table span $MaxSpan")
    var trend: Array[JBD] = Array.fill(n)(Zero6)
    var seasonal: Array[JBD] = null
    var it = 0
    while (it < nInner) {
      val detr = Array.tabulate(n)(i => y(i).subtract(trend(i)))
      val sub = cycleLoessM(detr, period, seasonalSmoother)
      val low = loessM(maM(maM(maM(sub, period), period), 3), ts)
      seasonal = Array.tabulate(n)(i => sub(i).subtract(low(i)))
      val des = Array.tabulate(n)(i => y(i).subtract(seasonal(i)))
      trend = loessM(des, ts)
      it += 1
    }
    val resid = Array.tabulate(n)(i => y(i).subtract(trend(i)).subtract(seasonal(i)))
    DecompM(trend, seasonal, resid)
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
