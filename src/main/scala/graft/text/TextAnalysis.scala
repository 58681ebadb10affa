package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All pure Catalyst expressions (split / higher-order functions / regex) —
  * codegen'd, no UDFs, embarrassingly parallel per document, so they scale
  * to 100 TB corpora limited only by scan throughput.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word token estimate: word-boundary + punctuation regex —
    * counts runs of letters, digits, or single punctuation marks.
    */
  def bpeishTokenCount(text: Column): Column =
    size(split(text, "\\s+|(?=[^\\sA-Za-z0-9])"))

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0.0), (acc, x) => acc + length(x)) / size(t)
  }

  /** Punctuation ratio: punctuation chars / total chars. Zero-length text
    * yields IEEE 0/0 → NaN (which a downstream `least` absorbs — NaN sorts
    * largest in Spark AND DuckDB) via an explicit branch: ANSI mode raises
    * DIVIDE_BY_ZERO for any zero divisor, double included, and one empty
    * document must not fail a 100 TB corpus scan.
    */
  def punctRatio(text: Column): Column = {
    val n = length(text).cast("double")
    when(n === 0.0, lit(Double.NaN))
      .otherwise(length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") / n)
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  /** Stopword ratio: fraction of tokens in the stopword list. The count
    * is the native `count_in_set` (hash-set, one probe per token) — the
    * composable `size(filter(t, isin(...)))` HOF is interpreted and
    * O(|stopwords|) per token, which is real money on a corpus scan.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val t = tokens(text)
    graft.functions.CountInSet(t, array(stopwords.map(lit): _*)).cast("double") / size(t)
  }

  /** Composite quality score in [0,1]: rewards stopword presence and
    * moderate token length, penalizes punctuation excess — the shape of
    * C4/Gopher-style quality heuristics. One native single-pass expression
    * (`quality_score`): the composable spelling below references the token
    * array from four subtrees and re-tokenized per reference (no runtime
    * CSE across CodegenFallback/HOF nodes — the q63/q45 lesson), which is
    * real money on the 100 TB corpus-scan hot path.
    */
  def qualityScore(text: Column): Column =
    graft.functions.QualityScoreExpr(text, array(EnglishStopwords.map(lit): _*))

  /** The pure-built-ins spelling of [[qualityScore]], kept as the semantic
    * reference — spec-enforced bit-identical to the native expression.
    * NULL text is explicitly NULL quality: without the guard, Spark's
    * null-SKIPPING least/greatest would quietly score an unreadable
    * document 0.5 (least(NULL, 1.0) = 1.0), which is a curation-pipeline
    * footgun, not a meaning.
    */
  def qualityScoreComposable(text: Column): Column = {
    val sw = stopwordRatio(text)
    val pr = punctRatio(text)
    val tl = avgTokenLen(text)
    when(text.isNull, lit(null).cast("double")).otherwise(
      greatest(lit(0.0), least(lit(1.0),
        lit(0.5) * least(sw * 4.0, lit(1.0)) +
          lit(0.3) * when(tl.between(3.0, 10.0), 1.0).otherwise(0.0) +
          lit(0.2) * (lit(1.0) - least(pr * 10.0, lit(1.0))))))
  }

  /** Language-ID by stopword-profile voting: score the text against each
    * language's closed-class word list; arg-max wins, 'und' when nothing
    * matches. N-gram-free heuristic good enough for coarse routing.
    */
  val StopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "del", "las"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "den", "mit", "auf", "ein"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est", "que", "pour", "dans"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "他")
  )

  def langId(text: Column): Column = {
    val sorted = StopwordProfiles.toSeq.sortBy(_._1)
    coalesce(
      graft.functions.LangIdArgmax(
        tokens(text),
        array(sorted.map { case (_, ws) => array(ws.map(lit): _*) }: _*),
        array(sorted.map { case (l, _) => lit(l) }: _*)),
      lit("und"))
  }

  /** The struct-argmax spelling of [[langId]], kept as the semantic
    * reference — spec-enforced identical to the native expression. It
    * references `tokens(text)` once per language with no runtime CSE
    * (count_in_set is CodegenFallback), so the tokenizer ran 5× per row —
    * r2 verdict finding #4.
    */
  def langIdComposable(text: Column): Column = {
    val t = tokens(text)
    val scored = StopwordProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        graft.functions.CountInSet(t, array(words.map(lit): _*)).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Word n-gram shingles (native `word_shingles` expression; short token
    * lists collapse to one whole-text shingle). `shinglesComposable` is
    * the pure-built-ins spelling kept as the semantic reference — the
    * two are bit-identical, the native form skips the interpreted
    * higher-order loop.
    */
  def shingles(text: Column, n: Int): Column =
    // coalesce: the composable spelling yields [""] for NULL text
    // (concat_ws never returns null) — preserve that on the native path
    coalesce(graft.functions.WordShingles(tokens(text), lit(n)), array(lit("")))

  def shinglesComposable(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*))
    ).otherwise(array(concat_ws(" ", t)))
  }

  /** Document fingerprint: lexicographic min/max md5 over word shingles —
    * a deterministic rolling-hash analog that two engines can agree on.
    */
  def fingerprint(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(text, n), s => md5(s)))

  /** Intra-document repetition removal (the C4-style line/sentence dedup
    * filter): split on `sep`, keep each distinct segment's FIRST
    * occurrence, reassemble in original order. Boilerplate and scraped
    * repetition collapse; unique content is untouched.
    *
    * Spelled relationally (posexplode → min(pos) per distinct segment →
    * ordered reassembly) rather than `array_distinct` so the
    * order-preservation contract is explicit and engine-agnostic
    * (DuckDB's `list_distinct` does not guarantee order — the oracle
    * re-derives this exact spelling). Two aggregations, both partial
    * (map-side combine); the shuffle key is (doc, segment) then doc.
    */
  def dedupSegments(df: DataFrame, textCol: String, idCol: String,
      sep: String): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "seg")))
    lines.groupBy(col(idCol), col("seg")).agg(min(col("pos")).as("pos"))
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("seg")))),
          s => s.getField("seg")), sep).as("text_deduped"))
  }

  /** Sliding-window document chunking for training pipelines: split each
    * document into token windows of `chunkSize` starting every `stride`
    * tokens (overlap = chunkSize − stride; the trailing chunk may be
    * shorter). Output: one row per (doc, chunk_idx) with the chunk text
    * and its token count — the long-document → context-window prep step
    * before tokenizer/packing stages.
    *
    * Plan shape: tokenize once into a bound column, one Generate
    * (posexplode) fan-out, no shuffle — a 100 TB chunking sweep is pure
    * map-side work. The per-start chunk is built inside ONE transform
    * lambda emitting a struct, so the token array is walked once per
    * chunk, and the struct fields are bound attributes after the
    * Generate (no re-evaluation — the expression-duplication trap).
    */
  /** Streaming sequence packing (concat-and-cut): with chunks in a total
    * order inside each shard, running token counts are cut every `budget`
    * tokens — chunk-atomic (a chunk lands wholly in the sequence its
    * cumulative offset starts in, so a sequence can overflow by at most
    * one chunk), the standard greedy packing of LLM data prep. Adds a
    * `seq_id` column keyed within each `partitionCols` shard.
    *
    * Scale shape: ONE ordered window per shard — packing is inherently
    * sequential, so the parallelism axis is the shard key (language,
    * source, split …), exactly how production packers shard. The window
    * is a single cumulative sum, no join, no extra shuffle beyond the
    * shard partitioning. seq_id is computed with integer division
    * (`div`), not float floor — exact at any corpus size.
    */
  def packSequences(df: DataFrame, partitionCols: Seq[String],
      orderCols: Seq[String], nTokCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = (if (partitionCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(partitionCols.map(col): _*))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum_before",
        coalesce(sum(col(nTokCol)).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__cum_before div $budget"))
      .drop("__cum_before")
  }

  def chunkByTokens(df: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    val t = col("__t")
    val starts = sequence(lit(0), greatest(size(t) - 1, lit(0)), lit(stride))
    // explicit null filter: with NULL tokens the null-SKIPPING greatest()
    // would yield starts=[0] and emit one junk ("", n_tok 40) row where
    // the relational spelling (range over a NULL length) emits none
    df.select(col(idCol), tokens(col(textCol)).as("__t"))
      .filter(col("__t").isNotNull)
      .select(col(idCol),
        posexplode(transform(starts, st => struct(
          concat_ws(" ", slice(t, st + 1, lit(chunkSize))).as("chunk"),
          least(lit(chunkSize), size(t) - st).cast("int").as("n_tok")))))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        col("col.n_tok").as("n_tok"), col("col.chunk").as("chunk"))
  }
}
