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

  /** New session over an existing SparkContext with the given extensions
    * applied — extensions normally bind only at builder time, which
    * `getOrCreate` skips when a session is already active.
    */
  def sessionWithExtensions(sc: org.apache.spark.SparkContext,
      configure: SparkSessionExtensions => Unit): SparkSession =
    classic.GraftSessionBridge.withExtensions(sc, configure)
}
