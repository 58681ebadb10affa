package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (SURVEY §2.7 J6): for each left row, attach the
  * latest right-side value with right.ts ≤ left.ts within the same key.
  *
  * Spark-first formulation: instead of a per-row lookup (the reference's
  * pandas `heuristic_strategy.py:111,123` does a dict lookup per bar), we
  * UNION the two sides, sort once per key, and propagate the right value
  * with `last(..., ignoreNulls).over(unboundedPreceding→current)`. One
  * shuffle on the key, one sort — the same cost as a sort-merge join, no
  * driver loop, skew-safe via the key partitioning.
  */
object AsOfJoin {

  /** @param left       left rows (kept 1:1 in the output)
    * @param right      right rows supplying `valueCol`
    * @param keyCols    equi-key (e.g. series / user id)
    * @param tsCol      event-time column present on both sides
    * @param valueCol   right column to carry (renamed `asofCol` in output)
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, valueCol: String, asofCol: String): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select((keyCols :+ tsCol).map(col) :+ col(valueCol).as("__rv"): _*)
      .withColumn("__side", lit(0))
    // At equal ts the right row sorts first (side 0 < 1) ⇒ inclusive ≤.
    val unioned = l.select((keyCols :+ tsCol).map(col) ++ Seq(col("__side"), col("__rv")) ++
      left.columns.filterNot(c => keyCols.contains(c) || c == tsCol).map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    // __rv as the final sort key: among right rows sharing a timestamp
    // the LARGEST payload deterministically wins (matches the native
    // AsOfJoinExec's tie-break: payload is its last sort key and the
    // merge keeps the last row consumed; nulls sort FIRST on both paths).
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry a STRUCT wrapper, not the bare value: `last(__rv, ignoreNulls)`
    // would skip a right row whose payload is NULL and resurrect a stale
    // non-null value, where the native exec (and DuckDB ASOF) return NULL
    // for that match. The wrapper is non-null for every right row, so a
    // newer NULL-payload row correctly overwrites the carried value.
    unioned
      .withColumn("__rw", when(col("__side") === 0, struct(col("__rv").as("v"))))
      .withColumn(asofCol, last(col("__rw"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__side") === 1)
      .drop("__side", "__rv", "__rw")
  }
}
