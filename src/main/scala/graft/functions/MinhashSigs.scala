package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared word→shingle construction — the ONE implementation of the
  * n-gram semantics (short token lists collapse to a single whole-text
  * shingle) that `MinhashShingleSigs` and `WordShingles` both consume,
  * so the invariant with `TextAnalysis.shinglesComposable` cannot
  * desynchronize between the two expressions.
  */
private[functions] object ShingleKernel {
  def build(toks: ArrayData, n: Int): Array[String] = {
    val nt = toks.numElements()
    val words = new Array[String](nt)
    var i = 0
    while (i < nt) {
      val u = toks.getUTF8String(i)
      words(i) = if (u == null) "" else u.toString
      i += 1
    }
    if (nt >= n && n > 0)
      Array.tabulate(nt - n + 1)(j => words.slice(j, j + n).mkString(" "))
    else Array(words.mkString(" "))
  }
}

/** `minhash_sigs(shingles array<string>, k)` → array of k hex digests,
  * element i = min over shingles of md5("seed{i}:" ‖ shingle).
  *
  * Bit-identical to the composable form
  * `array_min(transform(sh, s -> md5(concat('seed{i}:', s))))` (the DuckDB
  * oracle keeps that spelling) but evaluated in ONE pass: higher-order
  * functions don't enter whole-stage codegen, so the k-column spelling
  * pays interpreted-eval overhead k times per row. This is the
  * SURVEY §2 preference-(b) move: a custom scalar Expression where the
  * built-in composition can't be made fast.
  */
case class MinhashSigs(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  // containsNull: an EMPTY shingle array yields k null elements, exactly
  // like the composable `array_min(transform([], ...))` → NULL spelling
  // (internal callers never pass empty arrays, but the function is
  // SQL-registered and must not silently diverge from the oracle form).
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs expects (array<string>, int), got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = hexChars(b >> 4)
      out(i * 2 + 1) = hexChars(b & 0x0f)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(arr: Any, kAny: Any): Any = {
    val shingles = arr.asInstanceOf[ArrayData]
    val k = kAny.asInstanceOf[Int]
    val n = shingles.numElements()
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[UTF8String](k)
    var i = 0
    while (i < k) {
      val seed = s"seed$i:".getBytes("UTF-8")
      var best: String = null
      var j = 0
      while (j < n) {
        val s = shingles.getUTF8String(j)
        if (s != null) {
          md.reset()
          md.update(seed)
          md.update(s.getBytes)
          val h = hex(md.digest())
          if (best == null || h.compareTo(best) < 0) best = h
        }
        j += 1
      }
      out(i) = if (best == null) null else UTF8String.fromString(best)
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `minhash_shingle_sigs(tokens array<string>, n, k)` — builds word
  * n-gram shingles AND the k-seed MinHash signature in one native pass.
  * Shingle semantics match `TextAnalysis.shingles` exactly (short token
  * lists collapse to one whole-text shingle), so results stay
  * bit-identical to the composable spelling the DuckDB oracle uses —
  * this exists purely because interpreted higher-order `transform`s are
  * the hot path's cost at scale.
  */
case class MinhashShingleSigs(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_shingle_sigs"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"minhash_shingle_sigs expects (array<string>, int, int), got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)}, ${c.simpleString(10)})")
    }

  private val hexChars = "0123456789abcdef".toCharArray
  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = hexChars(b >> 4)
      out(i * 2 + 1) = hexChars(b & 0x0f)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(tokAny: Any, nAny: Any, kAny: Any): Any = {
    val shingles = ShingleKernel.build(tokAny.asInstanceOf[ArrayData], nAny.asInstanceOf[Int])
    val k = kAny.asInstanceOf[Int]
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[UTF8String](k)
    var s = 0
    while (s < k) {
      val seed = ("seed" + s + ":").getBytes("UTF-8")
      var best: String = null
      var j = 0
      while (j < shingles.length) {
        md.reset()
        md.update(seed)
        md.update(shingles(j).getBytes("UTF-8"))
        val h = hex(md.digest())
        if (best == null || h.compareTo(best) < 0) best = h
        j += 1
      }
      out(s) = UTF8String.fromString(if (best == null) "" else best)
      s += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** `simhash64(tokens array<string>)` → 64-bit SimHash: per token take the
  * first 8 bytes of md5 (big-endian, engine-agnostic — reproducible from
  * SQL as `('0x' || substr(md5(t), 1, 16))::UBIGINT`), majority-vote each
  * bit. One native pass instead of 64 interpreted per-bit aggregates.
  */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects array<string>, got ${t.simpleString(10)}")
    }

  override def nullSafeEval(arr: Any): Any = {
    val toks = arr.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val counts = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    var total = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        md.reset()
        val d = md.digest(t.getBytes)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1
          bit += 1
        }
        total += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) * 2 > total) out |= (1L << bit)
      bit += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
