package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped quantiles, two paths:
  *
  *  - [[approx]] / [[groupedApprox]] — the DEFAULT at scale. Spark's
  *    `approx_percentile` is a Greenwald-Khanna-style quantile sketch:
  *    bounded memory per group (O(accuracy)), mergeable across
  *    partitions (map-side partial aggregation works), rank error
  *    ≤ n/accuracy.
  *  - [[exact]] / [[groupedExact]] — linear-interpolation `percentile`,
  *    bit-comparable to DuckDB `quantile_cont` (the oracle path).
  *    WARNING: a sort-based aggregate that buffers EVERY value of a
  *    group on one reducer — at 100 TB a single hot group holds ~10⁹
  *    values and OOMs. Use only for oracle checks / small groups.
  */
object Quantiles {

  def exact(c: Column, p: Double): Column = percentile(c, lit(p))

  def approx(c: Column, p: Double, accuracy: Int = 10000): Column =
    approx_percentile(c, lit(p), lit(accuracy))

  private def grouped(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double], mk: (Column, Double) => Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(mk(col(valueCol), ps.head).as(s"p${(ps.head * 100).round}"),
        ps.tail.map(p => mk(col(valueCol), p).as(s"p${(p * 100).round}")): _*)

  /** Scale path: one sketch per (group, p). */
  def groupedApprox(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    grouped(df, groupCols, valueCol, ps, (c, p) => approx(c, p, accuracy))

  /** Oracle path — see the memory warning in the object scaladoc. */
  def groupedExact(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double]): DataFrame =
    grouped(df, groupCols, valueCol, ps, (c, p) => exact(c, p))
}
