package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Ordered time-series column kernel (SURVEY §2.3/§2.4).
  *
  * Every operator is a Catalyst expression over an explicit ordered window —
  * codegen'd, no UDFs. Windows are ALWAYS `partitionBy(seriesKeys)` so one
  * series never forces a single-partition global sort: at 100 TB the work
  * distributes across series (users/symbols), which is the scalable layout.
  */
object TS {

  /** Canonical per-series ordered window. A tie-break key keeps lag/lead
    * deterministic when timestamps collide.
    */
  def seriesWindow(partCols: Seq[String], orderCols: Seq[String]): WindowSpec = {
    val w =
      if (partCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(partCols.map(col): _*)
    w.orderBy(orderCols.map(col): _*)
  }

  /** F9 log return ln(x_t / x_{t-1}); 0 for the first row or any invalid
    * (non-positive / null) ratio — `anti_naive_lock.py:157-179`.
    */
  def logReturn(c: Column, w: WindowSpec): Column = {
    val prev = lag(c, 1).over(w)
    when(prev.isNull || prev <= 0.0 || c <= 0.0, 0.0)
      .otherwise(log(c / prev))
  }

  /** F10 first difference x_t − x_{t-1}; 0 for the first row
    * (`anti_naive_lock.py:181-197`).
    */
  def firstDiff(c: Column, w: WindowSpec): Column =
    coalesce(c - lag(c, 1).over(w), lit(0.0))

  /** F11 cyclic encodings sin/cos(2π·x/period) (`anti_naive_lock.py:132-155`). */
  def cyclicSin(c: Column, period: Double): Column =
    sin(c * (2.0 * math.Pi / period))
  def cyclicCos(c: Column, period: Double): Column =
    cos(c * (2.0 * math.Pi / period))

  /** F7 log1p with clamp: log1p(max(0, x)) (`phase2_6_preprocessor.py:334-336`). */
  def log1pClamp(c: Column): Column = log1p(greatest(lit(0.0), c))

  /** F8 symmetric log1p: sign(x)·log1p(|x|) (`stl_preprocessor.py:122-165`). */
  def symLog1p(c: Column): Column = signum(c) * log1p(abs(c))

  /** F3 z-score denormalize x·std + mean (`stl_norm.py:103-111`). */
  def zDenorm(c: Column, mean: Double, std: Double): Column =
    c * lit(std) + lit(mean)

  /** A1 z-score normalize (x − mean)/std with std<1e-8 → 1 fallback
    * (`anti_naive_lock.py:232-233`).
    */
  def zNorm(c: Column, mean: Double, std: Double): Column = {
    val s = if (std < 1e-8) 1.0 else std
    (c - lit(mean)) / lit(s)
  }

  /** F4 min-max denormalize x·(max−min) + min (`stl_norm.py:87-101`). */
  def minMaxDenorm(c: Column, min: Double, max: Double): Column =
    c * lit(max - min) + lit(min)

  /** F4 inverse: min-max normalize (x−min)/(max−min), zero-range → divide by 1. */
  def minMaxNorm(c: Column, min: Double, max: Double): Column = {
    val range = if (math.abs(max - min) < 1e-12) 1.0 else max - min
    (c - lit(min)) / lit(range)
  }

  /** F5 delta/uncertainty rescale — scale only, no offset (`stl_norm.py:119-170`). */
  def deltaDenorm(c: Column, std: Double): Column = c * lit(std)

  /** A1 fit: per-column (mean, stddev_pop) computed on the TRAIN split only
    * — single job, returned as plain literals so downstream transform
    * expressions constant-fold (no shuffle on the apply side).
    * Reference: `phase2_6_preprocessor.py:346-349` (train-only fit; std<1e-8→1).
    */
  def fitZScore(train: DataFrame, cols: Seq[String]): Map[String, (Double, Double)] = {
    if (cols.isEmpty) return Map.empty
    val aggs = cols.flatMap { c =>
      Seq(avg(col(c)).as(s"${c}__mean"), stddev_pop(col(c)).as(s"${c}__std"))
    }
    val row = train.agg(aggs.head, aggs.tail: _*).head()
    cols.map { c =>
      val m = Option(row.getAs[java.lang.Double](s"${c}__mean")).map(_.doubleValue).getOrElse(0.0)
      val s0 = Option(row.getAs[java.lang.Double](s"${c}__std")).map(_.doubleValue).getOrElse(0.0)
      c -> (m, if (s0 < 1e-8) 1.0 else s0)
    }.toMap
  }

  /** P5 finiteness guard: NaN / ±Inf → 0.0
    * (`phase2_6_preprocessor.py:829-832`).
    */
  def finiteOrZero(c: Column): Column =
    when(isnan(c) || c === Double.PositiveInfinity || c === Double.NegativeInfinity, 0.0)
      .otherwise(coalesce(c, lit(0.0)))

  /** F12 sinusoidal positional-encoding table
    * (`common/positional_encoding.py`): PE(pos, 2i) = sin(pos/10000^(2i/d)),
    * PE(pos, 2i+1) = cos(...). A literal table — built driver-side once,
    * joined or crossed in as needed.
    */
  def positionalEncoding(spark: org.apache.spark.sql.SparkSession,
      maxLen: Int, dModel: Int): DataFrame = {
    import spark.implicits._
    (0 until maxLen).map { pos =>
      val enc = (0 until dModel).map { j =>
        val angle = pos / math.pow(10000.0, (2 * (j / 2)).toDouble / dModel)
        if (j % 2 == 0) math.sin(angle) else math.cos(angle)
      }
      (pos.toLong, enc)
    }.toDF("pos", "encoding")
  }

  /** Sessionization: a new session starts when the gap to the previous
    * event exceeds `gapMicros`; session_id = running count of session
    * starts per series. Training-pipeline staple for event streams —
    * one window pass, shuffle on the series key only.
    */
  def sessionId(tsMicros: Column, w: WindowSpec, gapMicros: Long): Column = {
    val gap = tsMicros - lag(tsMicros, 1).over(w)
    val isStart = when(gap.isNull || gap > gapMicros, 1L).otherwise(0L)
    sum(isStart).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
  }

  /** W13 rolling stats over the trailing `n` rows (inclusive of t):
    * `stl_preprocessor.py:33-38` (`window_stats_periods`).
    */
  def rollingAvg(c: Column, w: WindowSpec, n: Int): Column =
    avg(c).over(w.rowsBetween(-(n - 1), 0))
  def rollingStd(c: Column, w: WindowSpec, n: Int): Column =
    stddev_pop(c).over(w.rowsBetween(-(n - 1), 0))
  /** Multi-scale return x_t − x_{t−p} (`stl_preprocessor.py:36-38`). */
  def periodReturn(c: Column, w: WindowSpec, p: Int): Column =
    c - lag(c, p).over(w)
}
