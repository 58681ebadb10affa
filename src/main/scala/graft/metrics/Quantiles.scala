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

  /** Column label for quantile p: exact decimal, not a rounded percent —
    * `p${(p*100).round}` collapsed e.g. 0.995 and 1.0 both onto "p100"
    * and produced duplicate columns that fail the next by-name select
    * (r2 ADVICE). p=0.5 → "p50", p=0.995 → "p99_5", p=0.5512 → "p55_12".
    */
  private[graft] def label(p: Double): String = {
    // decimal-exact: BigDecimal(0.9 * 100) would carry the binary-float
    // artifact 90.00000000000001 into the label
    val s = (BigDecimal(p.toString) * 100).underlying.stripTrailingZeros.toPlainString
    "p" + s.replace("-", "m").replace(".", "_")
  }

  private def grouped(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double], mk: (Column, Double) => Column): DataFrame = {
    val labels = ps.map(label)
    require(labels.distinct.size == labels.size,
      s"duplicate quantile labels from ps=$ps")
    df.groupBy(groupCols.map(col): _*)
      .agg(mk(col(valueCol), ps.head).as(labels.head),
        ps.tail.zip(labels.tail).map { case (p, l) => mk(col(valueCol), p).as(l) }: _*)
  }

  /** Scale path: one sketch per (group, p). */
  def groupedApprox(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    grouped(df, groupCols, valueCol, ps, (c, p) => approx(c, p, accuracy))

  /** Oracle path — see the memory warning in the object scaladoc. */
  def groupedExact(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double]): DataFrame =
    grouped(df, groupCols, valueCol, ps, (c, p) => exact(c, p))
}
