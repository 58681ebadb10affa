package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column↔Expression converters — the
  * standard technique for extension libraries that ship custom Catalyst
  * expressions without forcing per-session function registration.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Plan barrier WITHOUT block-manager persistence (r18): the same
    * LogicalRDD leaf a lazy `localCheckpoint` would produce —
    * MultiInstanceRelation, so analyzer relation-dedup treats it like
    * any leaf — but the wrapped RDD is the child plan's `toRdd`
    * directly, NOT marked for checkpointing. `localCheckpoint(false)`
    * additionally materializes every partition into storage blocks on
    * first use; for an input consumed exactly once (e.g. each side of
    * a custom join node feeding one exchange) that write is pure
    * overhead and the blocks linger in the block manager until a
    * driver GC (guide §5: cache only what is REUSED). Stats and
    * constraints carry from the origin Dataset exactly as checkpoint's
    * own LogicalRDD construction does.
    */
  def planBarrier(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    classic.Dataset.ofRows(ds.sparkSession,
      execution.LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds,
        isStreaming = false))
  }

  /** New session over an existing SparkContext with the given extensions
    * applied — extensions normally bind only at builder time, which
    * `getOrCreate` skips when a session is already active.
    */
  def sessionWithExtensions(sc: org.apache.spark.SparkContext,
      configure: SparkSessionExtensions => Unit): SparkSession =
    classic.GraftSessionBridge.withExtensions(sc, configure)
}
