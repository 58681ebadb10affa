package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `lsh_bucket(vec array<float|double>, planes array<array<double>>)` →
  * long: random-hyperplane LSH bucket id — bit p is set when
  * `dot(vec, planes[p]) >= 0`.
  *
  * Why native: the composable spelling projects the vector through each
  * plane with its own `zip_with`+`aggregate` pair — interpreted HOFs, one
  * full vector walk per plane per row (8 walks at q43's nPlanes=8; r2
  * verdict finding: 2.5 s where the bucket computation dominated). Here
  * the vector's elements are read ONCE into a primitive array and all
  * plane projections run as tight double loops — same IEEE sequential
  * fold order as the composable fold, so buckets are bit-identical.
  *
  * Semantics matched to the composable reference (spec-enforced):
  *  - NULL vector → NULL;
  *  - a NULL element nulls every projection (fold hits it in each plane)
  *    → bucket 0, same as `when(NULL >= 0, …).otherwise(0)` summed;
  *  - a NaN projection sets its bit (Spark comparison ordering puts NaN
  *    above every value, so `proj >= 0` is TRUE there — replicated);
  *  - length mismatch vs the plane dim → NULL bucket. This DIFFERS from
  *    the composable hazard, where zip_with's null-padding silently
  *    collapsed every mismatched vector into bucket 0 and degenerated the
  *    downstream equi-join into an accidental cross join (r2 ADVICE): a
  *    NULL key drops out of the join instead.
  */
case class LshBucket(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(ArrayType(DoubleType, _), _)) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("lsh_bucket expects a foldable plane literal")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lsh_bucket expects (array<float|double>, array<array<double>>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  @transient private lazy val planes: Array[Array[Double]] = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    require(ad != null && ad.numElements() > 0 && ad.numElements() <= 64,
      "lsh_bucket: 1..64 non-null planes required")
    val ps = Array.tabulate(ad.numElements()) { p =>
      val row = ad.getArray(p)
      require(row != null, s"lsh_bucket: plane $p is null")
      Array.tabulate(row.numElements())(row.getDouble)
    }
    // nullSafeEval indexes every plane by planes(0).length — a ragged
    // literal would read past a shorter inner array
    require(ps.forall(_.length == ps(0).length),
      s"lsh_bucket: ragged planes (lengths ${ps.map(_.length).distinct.mkString(",")})")
    ps
  }

  @transient private lazy val isFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(vecAny: Any, planesAny: Any): Any = {
    val arr = vecAny.asInstanceOf[ArrayData]
    val dim = planes(0).length
    if (arr.numElements() != dim) return null
    val xs = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return java.lang.Long.valueOf(0L)
      xs(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      var acc = 0.0
      var j = 0
      while (j < dim) { acc += xs(j) * w(j); j += 1 }
      if (acc >= 0 || java.lang.Double.isNaN(acc)) bucket |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LshBucket {
  /** Column façade — no session registration needed. */
  def apply(vec: Column, planes: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      LshBucket(
        org.apache.spark.sql.GraftColumnBridge.expression(vec),
        org.apache.spark.sql.GraftColumnBridge.expression(planes)))
}
