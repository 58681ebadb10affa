package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** `fft_mag(array<double>, k)` → first k DFT magnitude bins (SURVEY §2.5
  * D3; reference `phase2_6_preprocessor.py:200-294` takes `|fft|[0:5]` of
  * each trailing window).
  *
  * A native Catalyst `Expression` (not a Scala UDF): no SerDe through the
  * UDF boundary, null-safe, usable from SQL after
  * `GraftFunctions.register`. Direct O(n·k) DFT — the reference keeps
  * k=5 bins of windows of a few hundred points, where the direct form
  * beats an FFT's bookkeeping and stays allocation-free per bin.
  */
case class FftMag(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "fft_mag"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"fft_mag expects (array<double>, int), got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(arr: Any, kAny: Any): Any = {
    val xs = arr.asInstanceOf[ArrayData].toDoubleArray()
    val k = kAny.asInstanceOf[Int]
    val n = xs.length
    // clamp at 0: the function is SQL-registered, so a user-supplied
    // negative k must yield an empty array, not a
    // NegativeArraySizeException on the executor
    val bins = math.max(0, math.min(k, n))
    val out = new Array[Double](bins)
    var j = 0
    while (j < bins) {
      var re = 0.0
      var im = 0.0
      var i = 0
      val base = -2.0 * math.Pi * j / math.max(n, 1)
      while (i < n) {
        val a = base * i
        re += xs(i) * math.cos(a)
        im += xs(i) * math.sin(a)
        i += 1
      }
      out(j) = math.sqrt(re * re + im * im)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration + Column façade for the custom expressions. */
object GraftFunctions {

  /** Single source of truth for (name, arity, builder) — consumed by both
    * `register` (temp functions on a live session) and
    * `GraftSparkExtensions` (spark.sql.extensions deployment), so the two
    * registration paths cannot drift. Builders validate arity up front:
    * a wrong-arity SQL call should fail with a named signature, not an
    * IndexOutOfBoundsException mid-analysis.
    */
  val registry: Seq[(String, Int, Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression)] = {
    def checked(name: String, arity: Int)(
        build: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
          org.apache.spark.sql.catalyst.expressions.Expression) =
      (name, arity,
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          if (exprs.length != arity)
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map("functionName" -> name,
                "expectedNum" -> arity.toString,
                "actualNum" -> exprs.length.toString,
                "docroot" -> ""))
          build(exprs)
        })
    Seq(
      checked("fft_mag", 2)(e => FftMag(e(0), e(1))),
      checked("minhash_sigs", 2)(e => MinhashSigs(e(0), e(1))),
      checked("minhash_shingle_sigs", 3)(e => MinhashShingleSigs(e(0), e(1), e(2))),
      checked("simhash64", 1)(e => SimHash64(e.head)),
      checked("word_shingles", 2)(e => WordShingles(e(0), e(1))),
      checked("cosine_sim", 2)(e => CosineSim(e(0), e(1))),
      checked("count_in_set", 2)(e => CountInSet(e(0), e(1))),
      checked("json_deep_flatten", 1)(e => JsonDeepFlatten(e.head)),
      checked("quality_score", 2)(e => QualityScoreExpr(e(0), e(1))),
      checked("gopher_stats", 2)(e => GopherStatsExpr(e(0), e(1))),
      checked("lsh_bucket", 2)(e => LshBucket(e(0), e(1))))
  }

  def register(spark: SparkSession): Unit =
    registry.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  /** 64-bit SimHash of a token array (md5-based, engine-agnostic).
    * Requires `register(spark)` once per session.
    */
  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)

  /** Shingle + k-seed MinHash signature in one native pass. Requires
    * `register(spark)` once per session.
    */
  def minhash_shingle_sigs(tokens: Column, n: Column, k: Column): Column =
    call_function("minhash_shingle_sigs", tokens, n, k)

  /** One-pass k-seed MinHash signature of a shingle array. Requires
    * `register(spark)` once per session.
    */
  def minhash_sigs(shingles: Column, k: Column): Column =
    call_function("minhash_sigs", shingles, k)

  /** First k DFT magnitude bins of an array<double> column. Requires
    * `register(spark)` once per session.
    */
  def fft_mag(arr: Column, k: Column): Column = call_function("fft_mag", arr, k)

  /** Recursive JSON-leaf flatten to `array<struct<path,value>>` (the
    * `jsonb_deep_each` analog). Requires `register(spark)` once per
    * session; typically wrapped in `explode(...)`.
    */
  def json_deep_flatten(json: Column): Column = call_function("json_deep_flatten", json)

  /** D3 composite: normalize the k bins to sum 1; an all-zero spectrum
    * (flat window) yields the UNIFORM 1/k vector, matching the
    * reference's no-signal fallback (`phase2_6_preprocessor.py:253-267`:
    * `np.ones(n)/n  # Uniform if no signal`).
    *
    * COST NOTE: two of this composite's `fft_mag` references sit INSIDE
    * the transform lambda (`s` and `size(m)`), and fft_mag is
    * CodegenFallback (no CSE) — so the DFT re-runs PER ARRAY ELEMENT,
    * ~(2k+1)× per row for k bins. Use only for one-off small-k columns;
    * any real path should materialize the RAW spectrum into a named
    * column / Generate barrier and normalize from the bound attribute
    * (see SparkEntry q45 and PLANS.md "one JSON parse" note).
    */
  def fft_mag_norm(arr: Column, k: Column): Column = {
    import org.apache.spark.sql.functions._
    val m = call_function("fft_mag", arr, k)
    val s = aggregate(m, lit(0.0), (acc, x) => acc + x)
    transform(m, x => when(s > 0.0, x / s).otherwise(lit(1.0) / size(m)))
  }
}
