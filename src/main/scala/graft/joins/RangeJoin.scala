package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval (range) join.
  *
  * Spark plans a bare non-equi predicate (`p >= start AND p < end`) as
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) comparisons, a
  * scale killer. Discretizing time into fixed-width buckets turns it
  * into an EQUI-join: each point lands in exactly one bucket, each
  * interval is exploded onto the buckets it overlaps, and the residual
  * range predicate runs only on same-bucket pairs. Cost:
  * O(|points| + Σ interval_len/width) join input rows, shuffled on the
  * bucket key like any equi-join (AQE handles bucket-population skew).
  *
  * Exactness: a qualifying (point, interval) pair shares exactly the
  * point's bucket — emitted once, no dedup needed. Non-qualifying
  * same-bucket pairs are removed by the residual filter.
  *
  * `bucketWidth` tuning: ≈ the typical interval length. Much smaller →
  * interval replication blows up; much larger → each bucket degenerates
  * toward the nested-loop all-pairs within it.
  */
object RangeJoin {

  /** Inner join of `points` to `intervals` where
    * `start <= point < end` (half-open). `pointCol`/`startCol`/`endCol`
    * must be integral and in the SAME unit (epoch days, epoch micros,
    * …). Output: point columns then interval columns, one row per
    * qualifying pair.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // exact floor-division for any sign: (c - pmod(c, w)) is a multiple
    // of w, so the double division is exact below 2^53 buckets
    def fdiv(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(bucketWidth))) / lit(bucketWidth)).cast("long")
    val p = points.withColumn("__b", fdiv(col(pointCol)))
    // end is exclusive: the last covered bucket holds end − 1. Empty
    // intervals (end <= start) match nothing and must be dropped BEFORE
    // the explode — sequence(a, b) with a > b would run DESCENDING and
    // fabricate buckets the interval does not cover.
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__b", explode(sequence(fdiv(col(startCol)), fdiv(col(endCol) - 1))))
    p.join(iv, Seq("__b"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__b")
  }
}
