package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `bucket_search(x double, edges array<double>)` → int: the index of
  * the half-open bucket `x` falls into among the SORTED interior edges —
  * `edges.count(_ <= x)`, computed by binary search. With K-1 edges the
  * result ranges over 0..K-1: the rank-based (quantile-edge) bucketing
  * kernel of `Plots.downsampleQuantile`, where uniform value-bucketing
  * degenerates on clustered axes (r8 verdict "what's wrong" #2).
  *
  * The edges side is foldable in every caller (a collected quantile
  * array literal, ≤ maxPoints elements) and is copied into a primitive
  * double[] ONCE per operator instance — each row is then O(log K) with
  * no ArrayData re-walk, the shape that matters when the bucketing runs
  * under a full-corpus scan. CodegenFallback (repo precedent:
  * `CountInSet`): the surrounding plan stays codegen'd; this node's
  * per-row cost is the binary search itself.
  */
case class BucketSearch(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bucket_search"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bucket_search expects (double, array<double>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  private def toPrimitive(ad: ArrayData): Array[Double] = {
    val out = new Array[Double](ad.numElements())
    var i = 0
    while (i < out.length) { out(i) = ad.getDouble(i); i += 1 }
    out
  }

  @transient private lazy val staticEdges: Array[Double] =
    if (right.foldable) {
      val v = right.eval(null)
      if (v == null) null else toPrimitive(v.asInstanceOf[ArrayData])
    } else null

  /** Count of edges <= x in a sorted array, by binary search. */
  private def countLeq(edges: Array[Double], x: Double): Int = {
    var lo = 0
    var hi = edges.length // first index with edges(i) > x
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (edges(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def nullSafeEval(xAny: Any, edgesAny: Any): Any = {
    val edges =
      if (staticEdges != null) staticEdges
      else toPrimitive(edgesAny.asInstanceOf[ArrayData])
    java.lang.Integer.valueOf(countLeq(edges, xAny.asInstanceOf[Double]))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BucketSearch {
  /** Column façade — no session registration needed. */
  def apply(x: Column, edges: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BucketSearch(
        org.apache.spark.sql.GraftColumnBridge.expression(x),
        org.apache.spark.sql.GraftColumnBridge.expression(edges)))
}
