package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `gopher_stats(text string, stopwords array<string>)` →
  * `struct<n_words int, mean_word_len double, stop_hits int,
  * alpha_frac double>`: the per-document statistics behind the Gopher
  * repetition-free quality rules (Rae et al. 2021, table A1) in ONE
  * byte scan —
  *
  *  - n_words: `split(text, ' ', -1)` field count (empties kept,
  *    matching the engine-wide tokenizer contract)
  *  - mean_word_len: Σ numChars(token) / n_words
  *  - stop_hits: tokens ∈ stopwords, duplicates counted
  *  - alpha_frac: fraction of tokens containing an ASCII `[a-z]` byte
  *    (safe under UTF-8: continuation bytes are ≥ 0x80)
  *
  * Raw (unrounded) doubles — callers round at the query edge so the
  * oracle's ROUND sees the identical IEEE value. Why native instead of
  * four array-HOF columns: same reason as `quality_score` — interpreted
  * HOFs get no runtime CSE, so the tokenizer would run once PER STAT on
  * the 100 TB corpus-scan hot path.
  */
case class GopherStatsExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("alpha_frac", DoubleType, nullable = false)))

  override def prettyName: String = "gopher_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("gopher_stats expects a foldable stopword literal")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"gopher_stats expects (string, array<string>), got " +
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

  override def nullSafeEval(textAny: Any, swAny: Any): Any = {
    val bytes = textAny.asInstanceOf[UTF8String].getBytes
    var nTokens = 0
    var nStop = 0
    var nAlpha = 0
    var sumLen = 0.0
    var fieldStart = 0
    var hasAlpha = false
    var i = 0
    def endField(end: Int): Unit = {
      val tok = UTF8String.fromBytes(bytes, fieldStart, end - fieldStart)
      nTokens += 1
      sumLen += tok.numChars()
      if (stopSet.contains(tok)) nStop += 1
      if (hasAlpha) nAlpha += 1
      hasAlpha = false
      fieldStart = end + 1
    }
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' ') endField(i)
      else if (b >= 'a' && b <= 'z') hasAlpha = true
      i += 1
    }
    endField(bytes.length)
    new GenericInternalRow(Array[Any](
      nTokens, sumLen / nTokens, nStop, nAlpha.toDouble / nTokens))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GopherStatsExpr {
  /** Column façade — no session registration needed. */
  def apply(text: Column, stopwords: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      GopherStatsExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(text),
        org.apache.spark.sql.GraftColumnBridge.expression(stopwords)))
}
