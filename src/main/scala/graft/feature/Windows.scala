package graft.feature

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Sliding-window featurization (SURVEY §2.4, W1–W5, W10–W12).
  *
  * Windows are built with `collect_list(...).over(w.rowsBetween(...))` —
  * Spark's sort-based WindowExec spills, so a series far longer than memory
  * still works; across series the work distributes by the window's
  * partition keys. At 100 TB the long format (one row per (t, step)) is
  * preferred over materialized arrays — `slidingLong` emits it; the
  * array form (`slidingInclusive`/`slidingCausal`) suits ws≲10³ tensors
  * handed to per-horizon heads.
  */
object Windows {

  /** W2 `_create_sliding_windows_single_df`: multivariate trailing windows
    * INCLUSIVE of t — `[t−ws+1, t]`, baseline = last element
    * (`sliding_windows.py:85-121`). Rows with fewer than `ws` trailing
    * elements are dropped (reference emits zero windows for short series,
    * `sliding_windows.py:42-44`).
    *
    * Output: input columns + `window` ArrayType(ArrayType(Double)) of shape
    * (ws, n_features) in time order.
    */
  def slidingInclusive(df: DataFrame, featureCols: Seq[String], ws: Int, w: WindowSpec): DataFrame =
    sliding(df, featureCols, w.rowsBetween(-(ws - 1), 0), ws)

  /** W3 strict-causal windows EXCLUSIVE of t — `[t−ws, t)`, prediction
    * timestamp = t (`phase2_6_preprocessor.py:120-198`). Trailing-horizon
    * trim is the target side's job (Targets.multiHorizon).
    */
  def slidingCausal(df: DataFrame, featureCols: Seq[String], ws: Int, w: WindowSpec): DataFrame =
    sliding(df, featureCols, w.rowsBetween(-ws, -1), ws)

  private def sliding(df: DataFrame, featureCols: Seq[String], frame: WindowSpec, ws: Int): DataFrame =
    df.withColumn("window", collect_list(array(featureCols.map(col): _*)).over(frame))
      .filter(size(col("window")) === ws)

  /** W1/W2-long (SURVEY §1.1's preferred form at scale): one row per
    * (prediction row, step) with a `{f}_w` column per feature — no wide
    * array column survives the plan's output, so downstream shuffles move
    * fixed-width rows and column pruning can drop unused features. `step`
    * runs 0..ws-1 in time order (step ws-1 = most recent). Same
    * short-series drop semantics as the array form.
    */
  def slidingLong(df: DataFrame, featureCols: Seq[String], ws: Int, w: WindowSpec,
      causal: Boolean = false): DataFrame = {
    val windowed =
      if (causal) slidingCausal(df, featureCols, ws, w)
      else slidingInclusive(df, featureCols, ws, w)
    val keep = df.columns.map(col).toSeq
    windowed
      .select(keep :+ posexplode(col("window")).as(Seq("step", "__vals")): _*)
      .select(keep ++ (col("step") +:
        featureCols.zipWithIndex.map { case (f, i) => col("__vals")(i).as(s"${f}_w") }): _*)
  }

  /** W4 strided windows: keep every `stride`-th window
    * (`data_processor copy.py:23-48`). Apply AFTER a sliding* call.
    */
  def strided(df: DataFrame, w: WindowSpec, stride: Int): DataFrame =
    df.withColumn("__rn", row_number().over(w))
      .filter((col("__rn") - 1) % stride === 0)
      .drop("__rn")

  /** W5 baseline: value of the target column at prediction time t — in the
    * declarative layout this is just the column itself
    * (`sliding_windows.py:124-163`).
    */
  def baseline(targetCol: String): Column = col(targetCol)

  /** W14 time-axis reversal of a materialized window (`stl_preprocessor.py:35`). */
  def reverseWindow(windowCol: Column): Column = reverse(windowCol)

  /** W12 overlap-add un-windowing: reconstruct a series from overlapping
    * single-feature windows — sum of shifted windows / coverage count
    * (`app/reconstruction.py:4-45`). Input: (windowId: Long ascending by
    * window start, window: Array[Double]). Output: (pos, value) where
    * pos = windowId + offset-in-window.
    *
    * Fully distributed: posexplode + hash aggregation, no driver loop.
    */
  def overlapAdd(df: DataFrame, windowIdCol: String, windowCol: String): DataFrame =
    df.select(col(windowIdCol), posexplode(col(windowCol)).as(Seq("pos", "v")))
      .groupBy((col(windowIdCol) + col("pos")).as("pos"))
      // decimal-cast sum: exact and order-independent, so the result is
      // deterministic under any partitioning (and oracle-comparable)
      .agg((sum(col("v").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
        .cast("double") / count("v")).as("value"))

  /** W11 index-intersection alignment: inner equi-join on the time key
    * (`data_processor copy.py:170-182`).
    */
  def alignByTime(x: DataFrame, y: DataFrame, tsCol: String): DataFrame =
    x.join(y, Seq(tsCol), "inner")

  /** J4 horizontal concat by row position (`app/data_processor.py:579-595`):
    * join frames on their ordered row index. Prefer building all columns
    * in one plan; this exists for the cases where two independently
    * produced frames must align positionally (the reference's
    * predictions ⊕ targets concat). Requires an explicit per-frame
    * ordering to be meaningful.
    */
  def alignByRowNumber(x: DataFrame, y: DataFrame,
      xOrder: Seq[String], yOrder: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wx = Window.orderBy(xOrder.map(col): _*)
    val wy = Window.orderBy(yOrder.map(col): _*)
    x.withColumn("__rn", row_number().over(wx))
      .join(y.withColumn("__rn", row_number().over(wy)), Seq("__rn"), "inner")
      .drop("__rn")
  }

  /** J4 horizontal concat, keyed (the at-scale form of
    * [[alignByRowNumber]]): align the k-th row of `x` with the k-th row
    * of `y` WITHIN each key group. The row numbers are computed under
    * `Window.partitionBy(keys)` — no single-partition window — and the
    * join is a plain shuffled equi-join on (keys, position), so the
    * operator scales with key cardinality like every other per-series
    * op. The position is exposed as `rn` (1-based, long).
    */
  def alignByRowNumberKeyed(x: DataFrame, y: DataFrame, keys: Seq[String],
      xOrder: Seq[String], yOrder: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wx = Window.partitionBy(keys.map(col): _*).orderBy(xOrder.map(col): _*)
    val wy = Window.partitionBy(keys.map(col): _*).orderBy(yOrder.map(col): _*)
    x.withColumn("rn", row_number().over(wx).cast("long"))
      .join(y.withColumn("rn", row_number().over(wy).cast("long")),
        keys :+ "rn", "inner")
  }
}
