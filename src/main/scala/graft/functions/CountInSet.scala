package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `count_in_set(arr array<string>, set array<string>)` → int: how many
  * elements of `arr` (duplicates counted, nulls skipped) occur in `set`.
  *
  * Semantically `size(filter(arr, x -> x.isin(set:_*)))`, but that HOF
  * spelling never enters whole-stage codegen AND is O(|set|) per token
  * (isin is a linear In-list scan). Here the set side — foldable in every
  * caller (a stopword list literal) — is hashed ONCE per operator
  * instance, making each token O(1). This is the quality-scoring /
  * language-ID hot path of a 100 TB corpus scan (reference-class ops:
  * stopword ratio in C4/Gopher-style filters).
  */
case class CountInSet(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"count_in_set expects (array<string>, array<string>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  private def buildSet(ad: ArrayData): java.util.HashSet[UTF8String] = {
    val hs = new java.util.HashSet[UTF8String](ad.numElements() * 2)
    var i = 0
    while (i < ad.numElements()) {
      val u = ad.getUTF8String(i)
      if (u != null) hs.add(u.clone())
      i += 1
    }
    hs
  }

  // Foldable right side (the common case): evaluate and hash once.
  @transient private lazy val staticSet: java.util.HashSet[UTF8String] =
    if (right.foldable) {
      val v = right.eval(null)
      if (v == null) null else buildSet(v.asInstanceOf[ArrayData])
    } else null

  override def nullSafeEval(arrAny: Any, setAny: Any): Any = {
    val set =
      if (staticSet != null) staticSet
      else buildSet(setAny.asInstanceOf[ArrayData])
    val arr = arrAny.asInstanceOf[ArrayData]
    var c = 0
    var i = 0
    while (i < arr.numElements()) {
      val u = arr.getUTF8String(i)
      if (u != null && set.contains(u)) c += 1
      i += 1
    }
    java.lang.Integer.valueOf(c)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CountInSet {
  /** Column façade — no session registration needed. */
  def apply(arr: Column, set: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CountInSet(
        org.apache.spark.sql.GraftColumnBridge.expression(arr),
        org.apache.spark.sql.GraftColumnBridge.expression(set)))
}
