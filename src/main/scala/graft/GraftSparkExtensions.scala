package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{FftMag, MinhashShingleSigs, MinhashSigs, SimHash64}
import graft.plans.AsOfJoinStrategy

/** Session extension for cluster deployment:
  *
  *   spark.sql.extensions=graft.GraftSparkExtensions
  *
  * injects the custom planner strategy (as-of join) and registers the
  * native expressions for SQL use — the SparkSessionExtensions form of
  * what `GraftFunctions.register` / `AsOfJoinNative.register` do
  * programmatically on an existing session.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction((
      FunctionIdentifier("fft_mag"),
      new ExpressionInfo(classOf[FftMag].getName, "fft_mag"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FftMag(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinhashSigs].getName, "minhash_sigs"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinhashSigs(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("minhash_shingle_sigs"),
      new ExpressionInfo(classOf[MinhashShingleSigs].getName, "minhash_shingle_sigs"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinhashShingleSigs(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs.head)))
  }
}
