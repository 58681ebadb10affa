package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions
import graft.plans.AsOfJoinStrategy

/** Session extension for cluster deployment:
  *
  *   spark.sql.extensions=graft.GraftSparkExtensions
  *
  * injects the custom planner strategy (as-of join) and registers every
  * native expression from `GraftFunctions.registry` for SQL use — the
  * SparkSessionExtensions form of what `GraftFunctions.register` /
  * `AsOfJoinNative.register` do programmatically on an existing session.
  * Both paths consume the same registry, so they cannot drift.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // hint-driven non-equi→bucketed range-join rewrite (analysis time),
    // plus the advisory-hint guarantee: uncovered markers are stripped
    // so the hint can never break a query
    e.injectResolutionRule(_ => graft.plans.ResolveRangeJoinHint)
    e.injectOptimizerRule(_ => graft.plans.StripRangeJoinTags)
    GraftFunctions.registry.foreach { case (name, _, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftSparkExtensions].getName, name),
        builder))
    }
  }
}
