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

  // Persisted intermediates the returned (lazy) plans still depend on
  // can't be unpersisted before the caller's action runs — the Dedup
  // registry pattern: entry points register handles here, hosts drop
  // them between rounds (Bench/Verify/TimeQuery call clearCaches on
  // every registry).
  private val cachedHandles =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private def track(df: DataFrame): DataFrame = { cachedHandles.add(df); df }

  /** Unpersist every intermediate this object has persisted. */
  def clearCaches(): Unit = {
    var h = cachedHandles.poll()
    while (h != null) { h.unpersist(blocking = false); h = cachedHandles.poll() }
  }

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

  /** TF-IDF top-k terms per document: score(term, doc) =
    * count(term in doc) · ln(N / df(term)), ties broken by term. The
    * classic corpus-statistics join: per-(doc, term) counts and
    * per-term document frequencies are both partial aggregations
    * (map-side combine) on compact keys, N rides in on a broadcast of a
    * one-row aggregate — no driver collect, no skew risk beyond the
    * term key itself (stopword-heavy terms have high df, low idf, and
    * rarely survive the top-k anyway).
    */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val terms = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    // OPT-r17 (guide §2.3/§2.4): document frequency is a plain count
    // over `tf` — one row per (doc, term) already — NOT a second
    // tokenize+explode scan with countDistinct. The union-of-lineage
    // spelling re-scanned and re-exploded the corpus and paid the
    // distinct-rewrite's (term, doc) expand exchange; this derives the
    // identical df from the relation the query already aggregates.
    // Kept as groupBy+join (not count-over-window by term): a stop-word
    // term at corpus scale would land its whole window partition on one
    // task, while the equi-join is the shape AQE skew-split handles.
    //
    // The `tf >= 1` filter is a REUSE ANCHOR, not a row filter (count
    // over a group is ≥ 1 by construction): without it the optimizer
    // prunes `tf` out of this branch's copy of the aggregate
    // (functions=[]), the two exchange subtrees stop being canonically
    // equal, and AQE stage reuse cannot fire — the corpus would be
    // tokenized and deduped twice. With it, the (doc, term) exchange is
    // ONE shared stage (final plan carries a single file scan —
    // pinned in PlanShapeSpec).
    val dfreq = tf.filter(col("tf") >= 1L)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(countDistinct(col(idCol)).as("__n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("__n").cast("double") / col("df")), 6))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score"), col("rank"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    * SIGMOD'03 — the MOSS local fingerprinting scheme): hash every
    * word k-gram, slide a window of `w` consecutive hashes, keep each
    * window's minimum; the distinct kept hashes are the document's
    * sketch. Guarantees a shared fingerprint for any shared run of
    * w+k−1 tokens, with sketch size ~2/(w+1) of the k-gram count.
    *
    * The hash is the engine-agnostic md5-prefix integer
    * ([[graft.ml.Splits.hashBucket]]'s spelling) so two engines agree
    * bit-for-bit. Documents shorter than w+k−1 tokens still emit ≥1
    * fingerprint (the min over what exists). Plan shape: one Generate
    * (posexplode) then ONE ordered window per document — map-side except
    * the doc_id shuffle, no join.
    */
  def winnowFingerprints(df: DataFrame, textCol: String, idCol: String,
      k: Int, w: Int): DataFrame = {
    require(k > 0 && w > 0, "k and w must be positive")
    val grams = df.select(col(idCol),
      posexplode(shingles(col(textCol), k)).as(Seq("pos", "g")))
    val slide = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(-(w - 1), Window.currentRow)
    val whole = Window.partitionBy(col(idCol))
    grams
      .withColumn("hv",
        conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long"))
      .withColumn("fp", min(col("hv")).over(slide))
      .withColumn("__n", count(lit(1)).over(whole))
      // first w−1 windows are partial duplicates of window w−1; keep them
      // only when the doc has fewer than w k-grams (then the last partial
      // window IS the full-document min)
      .filter(col("pos") >= least(lit(w - 1), col("__n") - 1))
      .select(col(idCol), col("fp"))
      .distinct()
  }

  /** Gopher-style intra-document repetition signals: the fraction of
    * `sep`-separated segments that are duplicates, the fraction of all
    * word bigrams taken by the single most frequent bigram, and the
    * keep/drop verdict at the given thresholds (Rae et al. 2021 use
    * 0.30 duplicate-line and 0.20 top-bigram caps). Segment stats are
    * pure map-side array ops; the bigram mode needs a real
    * (doc, bigram) aggregation — a per-doc HOF count would be O(len²)
    * per document, which is wrong for megabyte documents.
    */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String,
      sep: String = ". ", dupSegMax: Double = 0.30,
      topBigramMax: Double = 0.20): DataFrame = {
    val segs = split(col(textCol), java.util.regex.Pattern.quote(sep))
    // OPT-r17 measured and REVERTED: carrying dup_seg_frac through the
    // (doc, bigram) explode as a first() at both aggregation levels
    // removed this second scan + join but ran 1.07 → 2.00 s at sf0.1 —
    // the extra per-group first() buffer widens the partial-agg hash
    // map over the exploded gram rows, which costs more than the
    // map-only scan + broadcast join it saved. Two-scan shape kept.
    val segStats = df.select(col(idCol),
      round(lit(1.0) - size(array_distinct(segs)).cast("double") / size(segs), 6)
        .as("dup_seg_frac"))
    val bi = df.select(col(idCol), explode(shingles(col(textCol), 2)).as("bg"))
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(round(max(col("c")).cast("double") / sum(col("c")), 6).as("top_bigram_frac"))
    segStats.join(bi, idCol)
      .withColumn("keep",
        col("dup_seg_frac") <= dupSegMax && col("top_bigram_frac") <= topBigramMax)
  }

  /** Gopher quality rules (Rae et al. 2021, table A1 subset): per-doc
    * word count, mean word length, stopword hits, and alphabetic-word
    * fraction, plus the keep/drop verdict at the given bounds. The four
    * statistics come from ONE `gopher_stats` byte scan; the struct is
    * expanded behind an `explode(array(…))` Generate barrier so
    * CollapseProject cannot inline the scan once per projected field
    * (the q63/q45 expression-duplication lesson). Fractions are rounded
    * to 6 dp at the query edge for oracle exactness.
    */
  def gopherRules(df: DataFrame, textCol: String, idCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minStopHits: Int = 2, minAlphaFrac: Double = 0.80,
      stopwords: Seq[String] = EnglishStopwords): DataFrame =
    df.select(col(idCol), explode(array(graft.functions.GopherStatsExpr(
        col(textCol), array(stopwords.map(lit): _*)))).as("__gs"))
      .select(
        col(idCol),
        col("__gs.n_words").as("n_words"),
        round(col("__gs.mean_word_len"), 6).as("mean_word_len"),
        col("__gs.stop_hits").as("stop_hits"),
        round(col("__gs.alpha_frac"), 6).as("alpha_frac"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanLen, maxMeanLen) &&
          col("stop_hits") >= minStopHits &&
          col("alpha_frac") > minAlphaFrac)

  /** Duplicate n-gram fraction (Gopher table A1's remaining repetition
    * signal, complementing `repetitionStats`' duplicate-segment and
    * top-bigram fractions): the occurrence-weighted share of a doc's
    * n-grams that are repeats — Σ c_g over grams with c_g > 1, divided
    * by the total gram count. One explode + one (doc, gram) aggregation
    * + one per-doc aggregation; a per-doc HOF count would be O(len²).
    * Docs shorter than n contribute their whole text (one gram, frac 0).
    */
  def dupNgramFraction(df: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame =
    df.select(col(idCol), explode(shingles(col(textCol), n)).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(round(
        sum(when(col("__c") > 1, col("__c")).otherwise(lit(0L))).cast("double") /
          sum(col("__c")), 6).as("dup_ngram_frac"))

  /** DSIR-style importance scores (Xie et al., NeurIPS 2023): hashed
    * n-gram bucket counts stand in for the bag-of-ngrams features, each
    * bucket gets an add-1-smoothed log-ratio of target vs raw
    * probability, and a document's score is the exact-decimal sum of
    * its grams' bucket ratios — documents that "look like" the target
    * distribution score high. Selection (top-k / threshold) happens at
    * the query edge.
    *
    * Engine-agnostic by construction: md5 buckets (the q59 split idiom),
    * per-bucket ratios rounded once, per-doc DECIMAL sum — so the whole
    * scorer is DuckDB-oracle-exact. Plan shape: two gram-bucket
    * aggregations (B-bounded), a broadcast ratio join, one per-doc
    * aggregation — no corpus-proportional driver state.
    */
  def dsirScores(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, n: Int = 2, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val rawB = persistGrams(dsirBucketed(raw, textCol, idCol, n, buckets))
    val tgtB = dsirBucketed(target, textCol, idCol, n, buckets)
    val rawCnt = rawB.groupBy("__b").agg(count(lit(1)).as("__rc"))
    val tgtCnt = tgtB.groupBy("__b").agg(count(lit(1)).as("__tc"))
    val joined = rawCnt.join(tgtCnt, Seq("__b"), "full_outer")
      .na.fill(0L, Seq("__rc", "__tc"))
    dsirScored(rawB, joined, idCol, buckets)
  }

  /** Persist-vs-recompute for the DSIR gram stream (OPT-r17, guide §5):
    * the bucketed corpus feeds BOTH the counting pass and the scoring
    * pass, so persisting it trades one full re-tokenize+md5 of the
    * corpus for a ~13 B/gram (id, flag, int bucket) spill-to-local-disk
    * intermediate — the same tradeoff `Dedup.substringDedup` documents
    * for its gram table, and measured 2.2 → 1.6 s at sf0.1. Callers
    * drop the handle via [[clearCaches]].
    */
  private def persistGrams(df: DataFrame): DataFrame =
    track(df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** [[dsirScores]] when the target is a SUBSET of the scored corpus,
    * named by a boolean flag (the common curation shape: "score every
    * document against the high-quality slice"). Same rows, same scores
    * as `dsirScores(corpus, corpus.filter(flag), ...)` by construction —
    * per bucket, `count(when(flag))` over one pass IS the target count,
    * and a target-only bucket cannot exist — but the raw and target
    * bucket counts come from ONE tokenize+md5 scan instead of two
    * (OPT-r17, guide §2.3: the counting pass carries a 1-bit flag
    * instead of running twice; 3 corpus scans → 2, the floor for this
    * operator — one counting pass, one scoring pass).
    */
  def dsirScoresFlagged(corpus: DataFrame, targetFlag: Column,
      textCol: String, idCol: String, n: Int = 2,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val rawB = persistGrams(dsirBucketed(corpus.withColumn("__isT", targetFlag),
      textCol, idCol, n, buckets, extra = Seq("__isT")))
    val joined = rawB.groupBy("__b").agg(
      count(lit(1)).as("__rc"),
      count(when(col("__isT"), lit(1))).as("__tc"))
    dsirScored(rawB.drop("__isT"), joined, idCol, buckets)
  }

  private def dsirBucketed(df: DataFrame, textCol: String, idCol: String,
      n: Int, buckets: Int, extra: Seq[String] = Nil): DataFrame = df
    .select((col(idCol) +: extra.map(col)) :+
      explode(shingles(col(textCol), n)).as("__g"): _*)
    .withColumn("__b",
      (conv(substring(md5(col("__g")), 1, 8), 16, 10).cast("long") % buckets).cast("int"))
    .drop("__g")
    // no-op row-wise (grams are never null), but a REUSE ANCHOR like
    // q76's: the scoring join pushes isnotnull(__b) into ITS copy of
    // the counting subtree while the totals branch's copy has none —
    // making the filter explicit keeps every copy canonically equal so
    // AQE stage reuse runs the tokenize+count pass once, not twice
    // (runtime-pinned in PlanShapeSpec).
    .filter(col("__b").isNotNull)

  /** Shared DSIR tail: bucket counts → smoothed log-ratios (broadcast)
    * → per-doc exact-decimal score over the bucketed gram stream.
    * Gram totals come from the ≤`buckets`-row count relation (every
    * gram lands in exactly one bucket), NOT from re-tokenizing the
    * corpora (r12).
    */
  private def dsirScored(rawB: DataFrame, joined: DataFrame,
      idCol: String, buckets: Int): DataFrame = {
    val totals = joined.agg(sum(col("__rc")).as("__tr"), sum(col("__tc")).as("__tt"))
    val ratios = joined
      .crossJoin(broadcast(totals))
      .select(col("__b"), round(
        log((col("__tc") + 1.0) / (col("__tt") + buckets)) -
          log((col("__rc") + 1.0) / (col("__tr") + buckets)), 6).as("__lr"))
    rawB.join(broadcast(ratios), "__b")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        round(sum(col("__lr").cast(org.apache.spark.sql.types.DecimalType(18, 6))).cast("double"), 6)
          .as("dsir_score"))
  }

  /** Deterministic mixture resampling: downsample each group toward the
    * target corpus shares (language/domain balancing). Acceptance is a
    * pure function of the row key (md5 bucket vs a per-group threshold),
    * so the sample is stable across runs, engines, and partitionings —
    * the property `sampleBy` lacks. A group under its target keeps
    * everything (rate caps at 1; this resampler never upsamples).
    * Groups absent from `shares` are dropped. Plan shape: one count
    * aggregation, thresholds broadcast back, map-side filter.
    */
  def resampleMixture(df: DataFrame, groupCol: String, idCol: String,
      shares: Map[String, Double], resolution: Int = 10000): DataFrame = {
    require(shares.values.forall(s => s >= 0 && s <= 1), "shares must be in [0,1]")
    require(resolution > 0, "resolution must be positive")
    val shareExpr = shares.foldLeft(lit(0.0)) { case (acc, (g, s)) =>
      when(col(groupCol) === g, s).otherwise(acc)
    }
    val grouped = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
    // the corpus total is the sum of the per-group counts — derived from
    // the #groups-row relation, not a second full scan of df (r12)
    val thresholds = grouped
      .crossJoin(broadcast(grouped.agg(sum(col("__cnt")).as("__total"))))
      .withColumn("__thresh",
        floor(least(lit(1.0), shareExpr * col("__total") / col("__cnt"))
          * resolution).cast("long"))
      .select(col(groupCol), col("__thresh"))
    df.join(broadcast(thresholds), groupCol)
      .filter(graft.ml.Splits.hashBucket(col(idCol), resolution) < col("__thresh"))
      .drop("__thresh")
  }

  /** Unigram language model over the corpus: (term, logp) with MLE
    * probabilities, logp rounded to 6 dp so two engines agree bit-for-bit.
    * One partial aggregation over the token stream plus a broadcast
    * one-row total.
    */
  def unigramLm(df: DataFrame, textCol: String): DataFrame = {
    val terms = df.select(explode(tokens(col(textCol))).as("term"))
    val termCnt = terms.groupBy(col("term")).agg(count(lit(1)).as("c"))
    // token total = sum of the per-term counts — one tokenize pass over
    // the corpus, not two (r12)
    termCnt
      .crossJoin(broadcast(termCnt.agg(sum(col("c")).as("__total"))))
      .select(col("term"), round(log(col("c") / col("__total")), 6).as("logp"))
  }

  /** CCNet-style per-document cross-entropy under a unigram LM:
    * xent(doc) = −(1/n)·Σ logp(tok). Low = in-domain fluent text, high =
    * noise — the standard model-based quality signal, here with the LM
    * as a DataFrame so it can be fit on a clean reference corpus and
    * applied to a raw one. Tokens absent from the LM are dropped (score
    * over known mass); the Σ goes through an exact DECIMAL sum so the
    * result is independent of row order and partitioning. The LM
    * broadcasts (a unigram vocab is small even for a 100 TB corpus —
    * swap to a shuffle join only past ~100M terms).
    */
  def perplexityScore(df: DataFrame, textCol: String, idCol: String,
      lm: DataFrame): DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .join(broadcast(lm), "term")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        round(-sum(col("logp").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double") / count(lit(1)), 6).as("xent"))

  /** PII scrubbing: replace emails then long digit runs with typed
    * placeholders, and count each. Plain regexp_replace — codegen'd,
    * map-only, the shape of every production scrubbing pass (the regex
    * list is the policy knob; these two are the engine-portable core —
    * RE2 and java.util.regex agree on this character-class subset).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumberRe = "[0-9]{6,}"

  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), LongNumberRe, "<NUM>")

  def piiCounts(text: Column): (Column, Column) =
    (regexp_count(text, lit(EmailRe)),
      regexp_count(regexp_replace(text, EmailRe, "<EMAIL>"), lit(LongNumberRe)))

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
