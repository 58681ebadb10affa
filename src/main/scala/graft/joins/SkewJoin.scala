package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed build keys (SURVEY §2.7 scale note).
  *
  * A plain shuffle join sends every row of a hot key to ONE reducer; at
  * 100 TB a single hot key (the empty-text digest, a default user id, a
  * null-ish sentinel) turns one task into the job's critical path. AQE's
  * skew-join split handles sort-merge inputs it can observe, but not
  * skew introduced AFTER the last shuffle (exploded arrays, shingle
  * joins) and not hash aggregation — salting is the portable fix.
  *
  * Mechanics: the large side's rows get a deterministic salt in
  * [0, salts); the small side is replicated once per salt value; the
  * join key becomes (key, salt), spreading each hot key across `salts`
  * reducers. The result set is EXACTLY the plain join's: every left row
  * holds one salt value and the right side matches all of them.
  *
  * The salt is `xxhash64(all left columns, row position) mod salts`.
  * The positional component matters: the motivating hot keys (empty-text
  * digest, default/sentinel ids) often come from rows that are
  * byte-IDENTICAL, and a content-only salt would send all of them to one
  * reducer — degenerating to the plain shuffle for exactly the case
  * salting exists to fix. `monotonically_increasing_id` is
  * (partition-id << 33 | row-index), so it is deterministic under plain
  * task retry of a scan (same split ⇒ same ids, preserving shuffle-block
  * reuse) while spreading identical rows; only an upstream AQE re-plan
  * that changes partitioning changes the ids, and any salt value is
  * CORRECT regardless (each left row matches all `salts` right copies).
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right` on `keys`, with the left (large,
    * skewed) side salted across `salts` reducers. Output columns match
    * `left.join(right, keys)`: the key columns once, then the non-key
    * columns of both sides.
    */
  def saltedInner(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(keys.nonEmpty, "at least one join key required")
    val leftCols = left.columns.map(col).toSeq
    val salted = left.withColumn("__salt", saltExpr(leftCols, salts))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // shuffle_hash hint: salting exists for joins where the small side
    // does NOT fit a broadcast — without the hint Catalyst happily
    // broadcasts the ×salts-replicated build side (a hash table `salts`
    // times the size of the one it refused to build unsalted), which is
    // both slow and the wrong 100 TB shape. The hinted plan shuffles on
    // (keys, salt) — hot keys spread across `salts` reducers, as intended.
    salted.join(replicated.hint("shuffle_hash"), keys :+ "__salt").drop("__salt")
  }

  /** The salt assignment (see object scaladoc): content hash mixed with
    * row position, so byte-identical hot rows still spread across
    * reducers. Package-visible so the spread property is testable.
    */
  private[graft] def saltExpr(leftCols: Seq[org.apache.spark.sql.Column],
      salts: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(leftCols :+ monotonically_increasing_id(): _*),
      lit(salts.toLong)).cast("int")
}
