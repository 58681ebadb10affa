package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(tokens array<string>, n)` — word n-gram shingles in one
  * native pass. Bit-identical to the composable
  * `transform(sequence(0, size-n), i -> concat_ws(" ", tokens[i..i+n-1]))`
  * (short token lists collapse to one whole-text shingle, like
  * `TextAnalysis.shingles`), but without the interpreted higher-order
  * loop that dominates shingle-heavy plans (Jaccard verification,
  * fingerprinting).
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects (array<string>, int), got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(tokAny: Any, nAny: Any): Any = {
    val shingles = ShingleKernel.build(
      tokAny.asInstanceOf[ArrayData], nAny.asInstanceOf[Int])
    new GenericArrayData(
      shingles.map(UTF8String.fromString(_): Any))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordShingles {
  /** Column façade — no session registration needed. */
  def apply(tokens: Column, n: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      WordShingles(
        org.apache.spark.sql.GraftColumnBridge.expression(tokens),
        org.apache.spark.sql.GraftColumnBridge.expression(n)))
}
