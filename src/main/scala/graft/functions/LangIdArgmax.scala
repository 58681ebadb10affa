package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `lang_id_argmax(tokens array<string>, profiles array<array<string>>,
  * langs array<string>)` → string: the language whose stopword profile
  * matches the most tokens, or NULL when no profile scores > 0 (callers
  * coalesce to 'und').
  *
  * Semantically `array_max(array(struct(count_in_set(tokens, p_i), lang_i)
  * ...))` — but that spelling references the `tokens` subtree once per
  * language, and since `count_in_set` is CodegenFallback there is no
  * runtime CSE: the tokenizer ran 5× per row (r2 finding #4; the q63/q45
  * expression-duplication trap, PLANS.md). Here ALL profiles are scored in
  * ONE pass over one tokens array: a single hash probe per token into a
  * token→profile-indices map built once per operator instance from the
  * foldable profile literals.
  *
  * Tie semantics replicate the struct-max exactly: higher score wins;
  * equal scores fall to the binary-larger language code (struct comparison
  * is field-ordered, strings compare bytewise in both Spark and DuckDB, so
  * the generated oracle SQL's `list_aggregate(..., 'max')` agrees).
  */
case class LangIdArgmax(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "lang_id_argmax"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _),
            ArrayType(ArrayType(StringType, _), _),
            ArrayType(StringType, _)) =>
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure(
            "lang_id_argmax expects foldable profile/lang literals")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"lang_id_argmax expects (array<string>, array<array<string>>, " +
          s"array<string>), got (${a.simpleString(10)}, ${b.simpleString(10)}, " +
          s"${c.simpleString(10)})")
    }

  /** token → indices of the profiles containing it, built once from the
    * foldable literals (a token may vote for several languages — e.g.
    * 'de'/'en' share none today, but the map supports overlap: 'la' is in
    * both es and fr).
    */
  @transient private lazy val (tokenVotes, langCodes) = {
    val profs = second.eval(null).asInstanceOf[ArrayData]
    val langs = third.eval(null).asInstanceOf[ArrayData]
    require(profs != null && langs != null &&
      profs.numElements() == langs.numElements(),
      "lang_id_argmax: profiles and langs must be equal-length non-null")
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    var i = 0
    while (i < profs.numElements()) {
      val words = profs.getArray(i)
      var j = 0
      while (j < words.numElements()) {
        val w = words.getUTF8String(j)
        if (w != null) {
          val prev = m.get(w)
          // set semantics per profile (a word listed twice in one profile
          // votes ONCE) — matches the composable count_in_set's HashSet,
          // keeping the bit-identical contract robust to profile edits
          if (prev == null) m.put(w.clone(), Array(i))
          else if (!prev.contains(i)) m.put(w.clone(), prev :+ i)
        }
        j += 1
      }
      i += 1
    }
    val codes = Array.tabulate(langs.numElements())(k => langs.getUTF8String(k).clone())
    (m, codes)
  }

  override def nullSafeEval(tokensAny: Any, profilesAny: Any, langsAny: Any): Any = {
    val toks = tokensAny.asInstanceOf[ArrayData]
    val counts = new Array[Int](langCodes.length)
    var i = 0
    while (i < toks.numElements()) {
      val u = toks.getUTF8String(i)
      if (u != null) {
        val votes = tokenVotes.get(u)
        if (votes != null) {
          var v = 0
          while (v < votes.length) { counts(votes(v)) += 1; v += 1 }
        }
      }
      i += 1
    }
    // struct-max replica: (score asc, lang asc) — iterate and keep the max
    var best = 0
    var k = 1
    while (k < counts.length) {
      if (counts(k) > counts(best) ||
          (counts(k) == counts(best) && langCodes(k).compareTo(langCodes(best)) > 0))
        best = k
      k += 1
    }
    if (counts(best) > 0) langCodes(best) else null
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LangIdArgmax {
  /** Column façade — no session registration needed. */
  def apply(tokens: Column, profiles: Column, langs: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      LangIdArgmax(
        org.apache.spark.sql.GraftColumnBridge.expression(tokens),
        org.apache.spark.sql.GraftColumnBridge.expression(profiles),
        org.apache.spark.sql.GraftColumnBridge.expression(langs)))
}
