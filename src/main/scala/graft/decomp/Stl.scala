package graft.decomp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** STL decomposition (SURVEY §2.5 D1; reference
  * `target_plugins/stl_target.py:37-51` uses statsmodels STL).
  *
  * Scala implementation of the STL inner loop (Cleveland et al. 1990,
  * "STL: A Seasonal-Trend decomposition procedure based on Loess"):
  * cycle-subseries LOESS smoothing → low-pass (3×MA) → seasonal,
  * deseasonalized LOESS → trend. Robustness (outer) iterations are
  * omitted — the reference calls STL with default robust=False.
  *
  * Failure semantics mirror the reference: a series too short for the
  * period decomposes to trend=y, seasonal=0, resid=0 (`stl_target.py`
  * catches and zero-fills).
  *
  * Scale: sequential within a series (inherent — LOESS spans the whole
  * series), parallel across series via `repartition(keys)` +
  * `sortWithinPartitions` + `mapPartitions`, streaming one series at a
  * time; only a single series is ever held in memory.
  */
object Stl {

  final case class Decomposition(trend: Array[Double], seasonal: Array[Double],
      resid: Array[Double])

  /** Local linear LOESS smoother with tricube weights and span of `q`
    * nearest points, evaluated at every index.
    */
  private[decomp] def loess(y: Array[Double], q: Int): Array[Double] = {
    val n = y.length
    if (n == 0) return y
    val span = math.max(2, math.min(q, n))
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var lo = math.max(0, i - span / 2)
      var hi = math.min(n - 1, lo + span - 1)
      lo = math.max(0, hi - span + 1)
      val dmax = math.max(math.abs(i - lo), math.abs(hi - i)).toDouble.max(1.0)
      // weighted linear fit over [lo, hi]
      var sw = 0.0; var swx = 0.0; var swy = 0.0; var swxx = 0.0; var swxy = 0.0
      var j = lo
      while (j <= hi) {
        val d = math.abs(j - i) / dmax
        val t = 1.0 - d * d * d
        val wgt = t * t * t
        val x = (j - i).toDouble
        sw += wgt; swx += wgt * x; swy += wgt * y(j)
        swxx += wgt * x * x; swxy += wgt * x * y(j)
        j += 1
      }
      val denom = sw * swxx - swx * swx
      out(i) =
        if (math.abs(denom) < 1e-12) swy / sw
        else {
          val slope = (sw * swxy - swx * swy) / denom
          val icpt = (swy - slope * swx) / sw
          icpt // evaluated at x = 0 (the center point i)
        }
      i += 1
    }
    out
  }

  /** Centered moving average of width `p` (p even → the standard 2×MA). */
  private[decomp] def movingAvg(y: Array[Double], p: Int): Array[Double] = {
    val n = y.length
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - p / 2)
      val hi = math.min(n - 1, i + (p - 1) / 2)
      var s = 0.0
      var j = lo
      while (j <= hi) { s += y(j); j += 1 }
      out(i) = s / (hi - lo + 1)
      i += 1
    }
    out
  }

  /** One series → (trend, seasonal, resid). */
  def decompose(y: Array[Double], period: Int, seasonalSmoother: Int = 7,
      trendSmootherOpt: Int = -1, nInner: Int = 2): Decomposition = {
    val n = y.length
    if (n < 2 * period || period < 2) {
      // too short: degenerate decomposition, zero seasonal/resid
      return Decomposition(y.clone(), new Array[Double](n), new Array[Double](n))
    }
    val trendSmoother = {
      val t0 = if (trendSmootherOpt > 0) trendSmootherOpt
        else math.ceil(1.5 * period / (1 - 1.5 / seasonalSmoother)).toInt
      if (t0 % 2 == 0) t0 + 1 else t0
    }
    var trend = new Array[Double](n)
    var seasonal = new Array[Double](n)
    var it = 0
    while (it < nInner) {
      // 1. detrend
      val detr = new Array[Double](n)
      var i = 0
      while (i < n) { detr(i) = y(i) - trend(i); i += 1 }
      // 2. cycle-subseries LOESS
      val sub = new Array[Double](n)
      var ph = 0
      while (ph < period) {
        val idx = ph.until(n, period).toArray
        val s = loess(idx.map(detr), seasonalSmoother)
        var j = 0
        while (j < idx.length) { sub(idx(j)) = s(j); j += 1 }
        ph += 1
      }
      // 3. low-pass: MA(period) twice then MA(3), then LOESS — subtract to
      // keep the seasonal free of low-frequency drift
      val low = loess(movingAvg(movingAvg(movingAvg(sub, period), period), 3), trendSmoother)
      i = 0
      while (i < n) { seasonal(i) = sub(i) - low(i); i += 1 }
      // 4. deseasonalize and re-estimate trend
      val deseason = new Array[Double](n)
      i = 0
      while (i < n) { deseason(i) = y(i) - seasonal(i); i += 1 }
      trend = loess(deseason, trendSmoother)
      it += 1
    }
    val resid = new Array[Double](n)
    var i = 0
    while (i < n) { resid(i) = y(i) - trend(i) - seasonal(i); i += 1 }
    Decomposition(trend, seasonal, resid)
  }

  /** DataFrame form: per-key STL over the `valueCol` series ordered by
    * `orderCol`; appends trend/seasonal/resid columns. Physical pattern:
    * repartition by key, sort within partitions, stream series-at-a-time.
    */
  def decomposeDF(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCol: String, period: Int, seasonalSmoother: Int = 7): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("trend", DoubleType), StructField("seasonal", DoubleType),
      StructField("resid", DoubleType)))
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val vIdx = df.schema.fieldIndex(valueCol)
    val sorted = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols :+ orderCol).map(col): _*)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    sorted.mapPartitions { rows =>
      new Iterator[Row] {
        private val buf = scala.collection.mutable.Queue.empty[Row]
        private var pendingRow: Row = null
        private def sameKey(a: Row, b: Row): Boolean =
          keyIdx.forall(i => a.get(i) == b.get(i))
        private def emitSeries(series: Seq[Row]): Unit = {
          val d = decompose(series.map(_.getDouble(vIdx)).toArray, period, seasonalSmoother)
          series.zipWithIndex.foreach { case (r, i) =>
            buf.enqueue(Row.fromSeq(r.toSeq ++ Seq(d.trend(i), d.seasonal(i), d.resid(i))))
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
    }(enc)
  }

  /** D2 recomposition: pred = t+s+r, unc = √(Σ unc²)
    * (`stl_decomposition_pipeline.py:202-218`).
    */
  def recompose(df: DataFrame): DataFrame =
    df.withColumn("recomposed", col("trend") + col("seasonal") + col("resid"))

  def recomposeUncertainty(df: DataFrame, uncCols: Seq[String]): DataFrame =
    df.withColumn("uncertainty",
      sqrt(uncCols.map(c => col(c) * col(c)).reduce(_ + _)))
}
