package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `quality_score(text string, stopwords array<string>)` → double: the
  * composite C4/Gopher-style quality heuristic in ONE pass over the text —
  *
  * {{{
  *   sw = |tokens ∩ stopwords| / |tokens|          (duplicates counted)
  *   tl = Σ numChars(token) / |tokens|
  *   pr = |punct chars .,;:!?| / numChars(text)
  *   greatest(0, least(1, 0.5·least(4·sw, 1)
  *                      + 0.3·[3 ≤ tl ≤ 10]
  *                      + 0.2·(1 − least(10·pr, 1))))
  * }}}
  *
  * Bit-identical to the composable `TextAnalysis.qualityScoreComposable`
  * spelling (spec-enforced): tokenization is `split(text, ' ')` with
  * limit −1 (single-space separator, empty fields kept — replicated here
  * as a byte scan, safe because 0x20 never occurs inside a multi-byte
  * UTF-8 sequence); least/greatest use Spark's NaN-is-largest ordering so
  * the empty-text 0/0 path agrees; the final arithmetic applies the same
  * IEEE operations in the same order.
  *
  * Why native: the composable spelling references the token array from
  * FOUR subtrees (count, size ×2, length-fold), and with CodegenFallback
  * `count_in_set` plus an interpreted `aggregate` HOF in the tree there is
  * no runtime CSE — the tokenizer ran ~4× per row. This is the corpus-scan
  * hot path at 100 TB (r2 verdict finding #4's "same review applies").
  */
case class QualityScoreExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("quality_score expects a foldable stopword literal")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"quality_score expects (string, array<string>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    val hs = new java.util.HashSet[UTF8String](ad.numElements() * 2)
    var i = 0
    while (i < ad.numElements()) {
      val u = ad.getUTF8String(i)
      if (u != null) hs.add(u.clone())
      i += 1
    }
    hs
  }

  // Spark Least/Greatest ordering: NaN is larger than any double.
  private def lst(a: Double, b: Double): Double =
    if (a.isNaN) b else if (b.isNaN) a else math.min(a, b)
  private def grt(a: Double, b: Double): Double =
    if (a.isNaN) a else if (b.isNaN) b else math.max(a, b)

  override def nullSafeEval(textAny: Any, swAny: Any): Any = {
    val text = textAny.asInstanceOf[UTF8String]
    val bytes = text.getBytes
    // one pass: split on 0x20 (limit -1: every field kept, incl. empties),
    // counting tokens, stopword hits, token chars, and punct bytes.
    var nTokens = 0
    var nStop = 0
    var sumLen = 0.0
    var punct = 0
    var fieldStart = 0
    var i = 0
    def endField(end: Int): Unit = {
      val tok = UTF8String.fromBytes(bytes, fieldStart, end - fieldStart)
      nTokens += 1
      sumLen += tok.numChars()
      if (stopSet.contains(tok)) nStop += 1
      fieldStart = end + 1
    }
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' ') endField(i)
      else if (b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?')
        punct += 1
      i += 1
    }
    endField(bytes.length)
    val sw = nStop.toDouble / nTokens
    val tl = sumLen / nTokens
    val pr = punct.toDouble / text.numChars()
    val score = grt(0.0, lst(1.0,
      0.5 * lst(sw * 4.0, 1.0) +
        0.3 * (if (tl >= 3.0 && tl <= 10.0) 1.0 else 0.0) +
        0.2 * (1.0 - lst(pr * 10.0, 1.0))))
    java.lang.Double.valueOf(score)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QualityScoreExpr {
  /** Column façade — no session registration needed. */
  def apply(text: Column, stopwords: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      QualityScoreExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(text),
        org.apache.spark.sql.GraftColumnBridge.expression(stopwords)))
}
