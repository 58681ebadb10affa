package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Normalization guards & output reconciliation (SURVEY §2.3 F6, §2.1 S7)
  * — reference decision rules preserved, not just the formulas.
  */
object Norm {

  /** F6 z-score double-denormalization guard (`stl_norm.py:46-63`): a
    * column is considered STILL NORMALIZED when its observed (mean, std)
    * sit closer to N(0,1) than to the stats-file N(mean, std). Denormalize
    * only in that case — denormalizing twice corrupts the series.
    */
  def looksZNormalized(df: DataFrame, c: String, mean: Double, std: Double): Boolean = {
    val row = df.agg(avg(col(c)).as("m"), stddev_pop(col(c)).as("s")).head()
    val m = row.getDouble(0)
    val s = Option(row.get(1)).map(_.asInstanceOf[Double]).getOrElse(0.0)
    val dNorm = math.abs(m) + math.abs(s - 1.0)
    val dDenorm = math.abs(m - mean) + math.abs(s - std)
    dNorm <= dDenorm
  }

  /** F6 min-max guard (`stl_norm.py:96-100`): ≥95% of values already
    * inside [min, max] ⇒ treat as denormalized (no-op).
    */
  def fractionInRange(df: DataFrame, c: String, min: Double, max: Double): Double = {
    val row = df.agg(
      avg(when(col(c).between(min, max), 1.0).otherwise(0.0)).as("frac")).head()
    row.getDouble(0)
  }

  def looksMinMaxDenormalized(df: DataFrame, c: String, min: Double, max: Double): Boolean =
    fractionInRange(df, c, min, max) >= 0.95

  /** Guarded z-denormalize: applies F3 only when the guard says the data
    * is still normalized (the reference's no-op path otherwise).
    */
  def safeZDenorm(df: DataFrame, c: String, mean: Double, std: Double): DataFrame =
    if (looksZNormalized(df, c, mean, std))
      df.withColumn(c, TS.zDenorm(col(c), mean, std))
    else df

  /** S7 length reconciliation (`stl_io.py:30-32`): truncate every frame
    * to the shortest count so horizontally-concatenated outputs align.
    * An explicit per-frame ordering is required — `limit` on an unordered
    * frame keeps an arbitrary subset, which would silently break the
    * positional alignment this function exists to guarantee.
    */
  def reconcileLengths(dfs: Seq[DataFrame], orderCols: Seq[String]): Seq[DataFrame] = {
    if (dfs.isEmpty) return dfs
    require(orderCols.nonEmpty, "reconcileLengths needs an ordering for determinism")
    val minLen = dfs.map(_.count()).min
    require(minLen <= Int.MaxValue, s"limit() cannot express $minLen rows")
    dfs.map(_.orderBy(orderCols.map(col): _*).limit(minLen.toInt))
  }
}
