package graft.decomp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D4: MTM feature re-grouping & correlation ordering (SURVEY §2.5;
  * reference `phase2_6_preprocessor.py:500-607`): group `{feat}_mtm_{k}`
  * columns by base feature, order the groups by mean |corr| with a
  * reference column computed on TRAIN ONLY, then re-project columns in
  * that order.
  *
  * All pairwise correlations run in ONE aggregation job (a single
  * `agg(corr…)` pass), not a per-column loop of actions.
  */
object MtmRegroup {

  private val MtmPattern = "^(.*)_mtm_(\\d+)$".r

  /** Partition columns named `{base}_mtm_{k}` into base → members (k-sorted). */
  def groupColumns(cols: Seq[String]): Map[String, Seq[String]] =
    cols.collect { case c @ MtmPattern(base, k) => (base, k.toInt, c) }
      .groupBy(_._1)
      .map { case (b, xs) => b -> xs.sortBy(_._2).map(_._3) }

  /** Mean |corr(member, ref)| per group, computed on `train` in one pass;
    * non-finite correlations are ignored (reference filters them).
    */
  def groupCorrelations(train: DataFrame, groups: Map[String, Seq[String]],
      refCol: String): Map[String, Double] = {
    val members = groups.values.flatten.toSeq.distinct
    if (members.isEmpty) return Map.empty
    val aggs = members.map(c => corr(col(c), col(refCol)).as(c))
    val row = train.agg(aggs.head, aggs.tail: _*).head()
    val corrByCol = members.map { c =>
      val v = Option(row.getAs[java.lang.Double](c)).map(_.doubleValue).getOrElse(Double.NaN)
      c -> v
    }.toMap
    groups.map { case (base, ms) =>
      val finite = ms.map(corrByCol).filter(v => !v.isNaN && !v.isInfinite).map(math.abs)
      base -> (if (finite.isEmpty) 0.0 else finite.sum / finite.size)
    }
  }

  /** Re-select the frame with MTM groups ordered by descending |corr|
    * (ties broken by name for determinism); non-MTM columns keep their
    * original positions at the front.
    */
  def reorderByCorrelation(df: DataFrame, train: DataFrame, refCol: String): DataFrame = {
    val groups = groupColumns(df.columns.toSeq)
    if (groups.isEmpty) return df
    val scores = groupCorrelations(train, groups, refCol)
    val orderedGroups = groups.keys.toSeq.sortBy(b => (-scores(b), b))
    val mtmCols = groups.values.flatten.toSet
    val front = df.columns.filterNot(mtmCols.contains)
    val ordered = front.toSeq ++ orderedGroups.flatMap(groups)
    df.select(ordered.map(col): _*)
  }
}
