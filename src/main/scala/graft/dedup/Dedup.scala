package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design: everything reduces to hash → groupBy/join on the hash —
  * the shuffle is on compact fixed-width keys, never on document text.
  * MinHash banding turns O(n²) similarity into an equi-join on band keys.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on content digest. Returns one surviving
    * row per digest (min orderCol wins — deterministic).
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Normalization key for "fuzzy-exact" dedup: lowercase, punctuation
    * stripped, whitespace runs collapsed, edges trimmed — the standard
    * canonicalization pipelines apply before hashing so trivially
    * reformatted copies (case, spacing, trailing punctuation) collapse
    * onto one digest. Pure codegen'd string expressions.
    */
  def normalizedKey(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[.,;:!?'\"()\\[\\]{}]", ""),
      "\\s+", " "))

  /** Exact dedup on the NORMALIZED text (keep lowest id per key) —
    * catches the reformatted-copy class byte-exact dedup misses while
    * staying a plain digest groupBy (same shuffle shape as
    * [[exactDedup]], WindowGroupLimit prunes map-side).
    */
  def normalizedExactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(normalizedKey(col(textCol)))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact-duplicate groups: digest → member count (>1 ⇒ duplicates). */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String = "doc_id"): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("min_doc_id"))
      .filter(col("n_docs") > 1)

  /** MinHash signature as `k` engine-agnostic hashes: permutation i is
    * simulated by md5(seed_i ‖ shingle); the signature element is the
    * lexicographic min digest. Deterministic and reproducible in any
    * engine with md5 — no JVM-specific hash in the contract.
    */
  def minhashSignature(text: Column, shingleN: Int, k: Int): Seq[Column] = {
    val sh = TextAnalysis.shingles(text, shingleN)
    minhashFromShingles(sh, k)
  }

  private def minhashFromShingles(sh: Column, k: Int): Seq[Column] =
    (0 until k).map { i =>
      array_min(transform(sh, s => md5(concat(lit(s"seed$i:"), s)))).as(s"sig$i")
    }

  /** DataFrame form: id + sig0..sig{k-1}, via the one-pass native
    * `minhash_sigs` expression (bit-identical to `minhashSignature` but
    * ~k× cheaper: higher-order functions don't codegen, so the per-seed
    * column spelling pays interpreted-eval overhead k times per row).
    */
  def withMinhashSignature(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val sigs = graft.functions.GraftFunctions
      .minhash_shingle_sigs(TextAnalysis.tokens(col(textCol)), lit(shingleN), lit(k))
    df.select(col(idCol), sigs.as("__sigs"))
      .select(col(idCol) +: (0 until k).map(i => element_at(col("__sigs"), i + 1).as(s"sig$i")): _*)
  }

  /** Standard b×r LSH band keys over a k = b·r element signature array:
    * band j is the md5 of signature elements [j·r, (j+1)·r) joined with
    * '|' — md5 keeps the shuffle key fixed-width (32 chars) instead of
    * r·32. Two docs collide on band j iff ALL r elements match, so the
    * candidate probability is 1−(1−s^r)^b: r>1 is what suppresses the
    * false-candidate flood at corpus scale (r=1 ORs whole-signature mins
    * and over-generates quadratically on common shingles).
    */
  private def bandKeys(b: Int, r: Int): Seq[Column] =
    (0 until b).map { j =>
      if (r == 1) col(s"sig${j}")
      else {
        // concat, NOT concat_ws: concat null-propagates, so a NULL
        // signature (null-text doc) yields a NULL band key that the
        // equi-join drops — concat_ws would collapse every null-sig doc
        // onto md5("") and pair them all with each other, diverging from
        // the r=1 path and the SQL oracles (NULL = no match).
        val parts = (j * r until (j + 1) * r)
          .flatMap(i => Seq(col(s"sig$i"), lit("|")))
        md5(concat(parts.dropRight(1): _*))
      }
    }

  /** MinHash+LSH candidate pairs with b bands of r signature rows each
    * (k = b·r signature elements); equi-join docs sharing any band key.
    * Output: distinct (doc_a, doc_b) with a < b.
    *
    * The banded signature relation is persisted before the self-join —
    * signature hashing is the dominant cost and a self-join would
    * evaluate it once per side; at scale this is also the relation you
    * bucket/write once and reuse across dedup rounds. The handle is
    * tracked; call [[clearCaches]] after the consuming action (see its
    * scaladoc) so long-lived sessions don't accumulate cached blocks.
    */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int, b: Int, r: Int): DataFrame = {
    val k = b * r
    val withSig = withMinhashSignature(df, textCol, idCol, shingleN, k)
    val banded = withSig.select(
      col(idCol),
      posexplode(array(bandKeys(b, r): _*)).as(Seq("band", "sig")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = banded.as("a")
    val bb = banded.as("b")
    val pairs = a.join(bb, col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
    track(banded)
    pairs
  }

  /** Legacy spelling: k independent bands of width 1 (b = k, r = 1). */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int, k: Int): DataFrame =
    minhashCandidatePairs(df, textCol, idCol, shingleN, k, 1)

  // Persisted intermediates the returned (lazy) plans still depend on
  // can't be unpersisted before the caller's action runs, so entry points
  // register their handles here and callers drop them between rounds.
  private val cachedHandles = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private def track(df: DataFrame): DataFrame = { cachedHandles.add(df); df }

  // Build-once / serve-many memo for corpus-side relations (the
  // embedding near-dup pair set): same contract as
  // Similarity.cachedRelation — key uniqueness is the caller's job, the
  // SparkContext identity is appended so a new context misses, and
  // clearCaches drops everything.
  private val dfMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def sessionTag(spark: org.apache.spark.sql.SparkSession): String =
    s"${spark.sparkContext.applicationId}@${spark.sparkContext.startTime}"
  private def cachedRelation(spark: org.apache.spark.sql.SparkSession,
      cacheKey: String)(build: => DataFrame): DataFrame =
    dfMemo.computeIfAbsent(s"${sessionTag(spark)}|$cacheKey", _ =>
      track(build.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))

  /** Unpersist every intermediate this object has persisted. Call after
    * the action consuming a dedup result completes (e.g. between dedup
    * rounds in a long-lived session); results already materialized are
    * unaffected, un-run plans recompute the signatures.
    */
  def clearCaches(): Unit = {
    dfMemo.clear()
    var h = cachedHandles.poll()
    while (h != null) { h.unpersist(blocking = false); h = cachedHandles.poll() }
  }

  /** SimHash (64-bit): per token take the first 8 bytes of md5
    * (engine-agnostic), majority-vote each bit position. Near-dups differ
    * in few bits (Hamming). Evaluated by the native `simhash64`
    * expression — the composable spelling would pay 64 interpreted
    * per-bit aggregate passes per row.
    *
    * NOTE: callers must have run `GraftFunctions.register(spark)`; the
    * DataFrame entry points in this object handle that.
    */
  def simhash64(text: Column): Column =
    graft.functions.GraftFunctions.simhash64(TextAnalysis.tokens(text))

  /** DataFrame form (handles function registration). */
  def withSimhash(df: DataFrame, textCol: String, outCol: String = "simhash"): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn(outCol, simhash64(col(textCol)))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs at corpus scale: Hamming(simhash) ≤ `maxDist`
    * found by CHUNK BANDING — the 64-bit hash splits into 4 × 16-bit
    * chunks; by pigeonhole, Hamming ≤ 3 ⇒ at least one chunk is equal,
    * so candidates come from an equi-join on (chunk index, chunk value)
    * and only candidates pay the exact bit_count verify. Never an
    * all-pairs comparison; shuffle keys are 16-bit values. Masking after
    * the shift makes arithmetic-vs-logical shift irrelevant, so the
    * chunks are engine-portable.
    */
  def simhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist < 4, "chunk banding guarantees recall only for maxDist <= 3")
    val hashed = df.select(col(idCol), col(textCol))
      .transform(withSimhash(_, textCol, "__sh"))
      .select(col(idCol), col("__sh"))
    val banded = hashed.select(col(idCol), col("__sh"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("__sh"), 16 * j).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk_idx", "chunk_val")))
    val a = banded.toDF("doc_a", "__sh_a", "chunk_idx", "chunk_val")
    val b = banded.toDF("doc_b", "__sh_b", "chunk_idx", "chunk_val")
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hamming64(col("__sh_a"), col("__sh_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Full near-dedup pipeline: MinHash+LSH candidates → n-gram Jaccard
    * verification → keep-best survivor selection → anti-join.
    *
    * Loser rule (deterministic, pairwise-greedy): for each verified pair
    * the shorter text loses; equal lengths → the higher id loses. Note
    * the rule is applied per PAIR, not per connected component — a doc
    * can lose to one near-dup while an unrelated doc survives; this
    * matches the SQL-expressible (oracle-checkable) semantics and is the
    * usual first pass before a transitive-closure round at scale.
    *
    * Plan shape: signature equi-join (no O(n²)), Jaccard only on
    * candidates, one broadcast-able anti-join at the end.
    */
  /** One pass per doc: text length, distinct shingle set, native minhash
    * signature — the per-document state every near-dedup variant (batch
    * and streaming store) builds on.
    */
  private[graft] def signatureBase(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(
      col(idCol),
      length(col(textCol)).as("__tlen"),
      array_distinct(TextAnalysis.shingles(col(textCol), shingleN)).as("__shd"),
      graft.functions.GraftFunctions
        .minhash_shingle_sigs(TextAnalysis.tokens(col(textCol)), lit(shingleN), lit(k))
        .as("__sigs"))
  }

  /** (id, band, sig) banded rows from a [[signatureBase]] frame. */
  private[graft] def bandedFrom(base: DataFrame, idCol: String, b: Int, r: Int): DataFrame = {
    val k = b * r
    val sigCols = (0 until k).map(i => element_at(col("__sigs"), i + 1).as(s"sig$i"))
    base.select(col(idCol) +: sigCols: _*)
      .select(col(idCol), posexplode(array(bandKeys(b, r): _*)).as(Seq("band", "sig")))
  }

  def nearDedup(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int, b: Int, r: Int, threshold: Double): DataFrame = {
    val k = b * r
    // persisted: every candidate pair reuses the signatures (the naive
    // spelling re-shingles both texts per pair: O(pairs·doclen)).
    val base = track(signatureBase(df, textCol, idCol, shingleN, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val banded = bandedFrom(base, idCol, b, r)
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
    val side = base.select(col(idCol), col("__tlen"), col("__shd"))
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
    val verified = pairs
      .join(side.toDF("doc_a", "len_a", "sa"), "doc_a")
      .join(side.toDF("doc_b", "len_b", "sb"), "doc_b")
      .withColumn("__inter", inter)
      .withColumn("jac",
        col("__inter") / (size(col("sa")) + size(col("sb")) - col("__inter")))
      .filter(col("jac") >= threshold)
    val losers = verified.select(
      when(col("len_a") > col("len_b"), col("doc_b"))
        .when(col("len_a") < col("len_b"), col("doc_a"))
        .otherwise(greatest(col("doc_a"), col("doc_b"))).as(idCol))
      .distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Legacy spelling: k width-1 bands (b = k, r = 1). */
  def nearDedup(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int, k: Int, threshold: Double): DataFrame =
    nearDedup(df, textCol, idCol, shingleN, k, 1, threshold)

  /** The 100 TB cleaning composition, as an operator: EXACT dedup first
    * (hash-groupBy on digest — removes whole identical-text groups, whose
    * candidate-PAIR count is quadratic in group size under ANY LSH
    * scheme), then banded near-dedup over the survivors, whose dup groups
    * are small by construction. This is the contract PLANS.md documents
    * from the scaling probe: on a corpus where every text has 100
    * identical copies, `nearDedup` alone spends minutes emitting ~100²/2
    * pairs per group while the composition collapses the groups in one
    * digest shuffle first. Survivor preference matches [[nearDedup]]:
    * exact groups keep the min id (equal lengths tie to the smaller id),
    * near groups keep the longer text.
    */
  def dedupPipeline(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int, b: Int, r: Int, threshold: Double): DataFrame =
    nearDedup(exactDedup(df, textCol, idCol), textCol, idCol, shingleN, b, r, threshold)

  /** Connected components over an undirected pair list (doc_a, doc_b):
    * each node's component label is the smallest id reachable from it.
    * This is the transitive-closure pass that turns pairwise near-dup
    * hits into whole clusters (one survivor per cluster at 100 TB).
    *
    * Algorithm: alternating LARGE-STAR / SMALL-STAR contraction (the
    * MapReduce CC algorithm of Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14) — each round rewires every node
    * toward the minimum of its neighborhood, roughly halving component
    * diameter, so convergence is O(log n) rounds on ANY edge shape. The
    * previous min-label propagation converged in O(diameter) rounds: fine
    * for tight dup clusters, but a chain-shaped cluster (every doc a
    * near-dup of its predecessor — common in serial crawls) of length d
    * needed d rounds, the true 100×-scale risk (r2 verdict #5).
    *
    * Each phase is a groupBy + equi-join on node id — no cross joins, no
    * driver-side state; per-round lineage is truncated with
    * localCheckpoint. Convergence = edge set unchanged, detected EXACTLY
    * inside the round's ONE materialization (r18): candidate and current
    * edges are tagged 1/2 and grouped once on (u,v) — a group whose
    * min tag equals its max is one-sided, so any such group means the
    * sets differ; groups with min = 1 ARE the next (deduped) edge set.
    *
    * Convergence is REQUIRED: labels are read off the fixed-point star
    * edges, and a not-yet-star edge set would yield duplicated ids with
    * conflicting components — silently wrong downstream dedup. On
    * `maxIter` exhaustion this THROWS instead. The default 50 is pure
    * headroom: O(log₂ n) rounds means even a 2⁴⁰-node single chain
    * converges in ~41 + 1 rounds, and converged inputs always exit early.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame =
    connectedComponentsWithRounds(pairs, maxIter)._1

  /** [[connectedComponents]] plus the number of star rounds actually run
    * (includes the final no-change round that proves convergence) — the
    * observable the O(log n) convergence spec pins down.
    */
  def connectedComponentsWithRounds(pairs: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    // canonical directed edges larger→smaller, no self loops
    var edges = pairs.select(
        greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var iter = 0
    var converged = edges.isEmpty
    while (iter < maxIter && !converged) {
      // LARGE-STAR: over the symmetric neighborhood of each node u with
      // m = min(Γ(u) ∪ {u}), connect every STRICTLY LARGER neighbor to m.
      // Output (v, m) is already canonical: v > u ≥ m.
      val sym = edges.select(col("u"), col("v"))
        .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val afterLarge = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // SMALL-STAR: over the larger→smaller edges, connect each node's
      // smaller neighbors (and itself) to m = min of them. v > m whenever
      // v ≠ m, so both outputs stay canonical.
      val dmins = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      val nextRaw = afterLarge.join(dmins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(dmins.select(col("u"), col("m").as("v")))
      // OPT-r18 (VERDICT r17 #8, guide §2.4): ONE materialization job
      // per round instead of two. The round previously checkpointed
      // next (distinct = shuffle #1) and then ran a SECOND full
      // shuffle+aggregation (union with edges, groupBy count) just to
      // detect convergence. Fused: tag the candidate rows 1 and the
      // current edges 2, group once on (u, v) — the group's min tag
      // says "in new", its max says "in old", so
      //   next       = groups with lo = 1   (the distinct is free)
      //   converged  = no group missing a side (lo = hi anywhere means
      //                new-only or old-only — the sets differ)
      // Tag min/max survive duplicate candidate rows, which a
      // sum-based tag would not. The checkpointed tagged relation is
      // the ONLY job; the converged probe and next round's reads are
      // cached-block scans over it. Labels, round counts and the
      // convergence predicate are unchanged
      // (ConnectedComponentsSpec's O(log n) pins still hold).
      val tagged = nextRaw.withColumn("__s", lit(1))
        .unionByName(edges.select(col("u"), col("v")).withColumn("__s", lit(2)))
        .groupBy("u", "v")
        .agg(min(col("__s")).as("__lo"), max(col("__s")).as("__hi"))
        .localCheckpoint(true)
      converged = tagged.filter(col("__lo") === col("__hi")).isEmpty
      edges = tagged.filter(col("__lo") === 1).select(col("u"), col("v"))
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — labels from a " +
        "non-star edge set would be silently malformed; raise maxIter " +
        "(O(log2 n) rounds suffice for any component)")
    // fixed point: every edge points a node at its component's minimum
    val labels = edges.select(col("u").as("id"), col("v").as("component"))
      .unionByName(
        edges.select(col("v").as("id"), col("v").as("component")).distinct())
    (labels, iter)
  }

  /** n-gram Jaccard similarity between two texts: |A∩B| / |A∪B| over
    * word-shingle sets. NOTE a single-Column spelling necessarily
    * references the shingle subtrees more than once, and `word_shingles`
    * is CodegenFallback (no runtime CSE) — fine for bounded comparisons
    * (q35 caps its input), but hot verify paths should materialize the
    * shingle sets into named columns first and compute Jaccard from the
    * bound attributes, exactly as [[nearDedup]] does with `__shd`.
    */
  /** Benchmark decontamination: drop every training document sharing at
    * least one word n-gram with the benchmark corpus — the GPT-3/PaLM
    * n-gram-overlap rule (13-grams there; `n` is the knob). The
    * benchmark side is tiny next to the training corpus, so its
    * distinct n-gram set broadcasts, the overlap probe is a map-side
    * BroadcastHashJoin, and the final anti-join broadcasts the (even
    * smaller) contaminated-id set — the 100 TB training scan is never
    * shuffled. At extreme benchmark sizes, swap the broadcast gram set
    * for a bloom filter built over it; the join shape is unchanged.
    */
  def decontaminate(train: DataFrame, benchmark: DataFrame, textCol: String,
      idCol: String, n: Int): DataFrame = {
    val benchGrams = benchmark
      .select(explode(array_distinct(TextAnalysis.shingles(col(textCol), n))).as("__g"))
      .distinct()
    val contaminated = train
      .select(col(idCol), explode(array_distinct(TextAnalysis.shingles(col(textCol), n))).as("__g"))
      .join(broadcast(benchGrams), "__g")
      .select(col(idCol))
      .distinct()
    train.join(broadcast(contaminated), Seq(idCol), "left_anti")
  }

  /** Bloom-prefiltered decontamination — the scale path `decontaminate`'s
    * doc promises: identical OUTPUT (the exact verify join removes every
    * bloom false positive), but the training-side gram stream is first
    * cut down by a broadcast bit array of `numBits` bits instead of
    * hash-joining every gram against the full benchmark set. At 100 TB
    * the filter kills ≥99.9% of the gram stream (sized ≥20 bits/gram)
    * before the only shuffle-free join the plan contains; the benchmark
    * side is scanned once to build the filter and once for the verify
    * set, both tiny by the decontamination contract.
    */
  def decontaminateBloom(train: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int,
      numBits: Int = 1 << 22, numHashes: Int = 5): DataFrame = {
    import graft.functions.BloomAgg
    val spark = train.sparkSession
    import spark.implicits._
    // localCheckpoint: the gram set is consumed TWICE (bloom build +
    // verify join) — without it the benchmark re-shingles per consumer
    val benchGrams = benchmark
      .select(explode(array_distinct(TextAnalysis.shingles(col(textCol), n))).as("__g"))
      .distinct()
      .localCheckpoint(true)
    // single-row fit-statistic pull: the finished filter is numBits/8
    // bytes regardless of benchmark size, then an executor broadcast
    val agg = new BloomAgg.BloomFilterAgg(numBits, numHashes)
    val bits = benchGrams.select(xxhash64(col("__g"))).as[Long]
      .select(agg.toColumn).head()
    val bcBits = spark.sparkContext.broadcast(bits)
    // the probe has no builtin expression form — a UDF over the
    // broadcast words is the documented exception (same as IVF cells)
    val mightContain = udf { h: Long =>
      BloomAgg.mightContain(bcBits.value, numHashes, h)
    }
    val contaminated = train
      .select(col(idCol), explode(array_distinct(TextAnalysis.shingles(col(textCol), n))).as("__g"))
      .filter(mightContain(xxhash64(col("__g"))))
      .join(broadcast(benchGrams), "__g") // exact verify: FPs die here
      .select(col(idCol))
      .distinct()
    train.join(broadcast(contaminated), Seq(idCol), "left_anti")
  }

  def ngramJaccard(textA: Column, textB: Column, n: Int): Column = {
    val a = array_distinct(TextAnalysis.shingles(textA, n))
    val b = array_distinct(TextAnalysis.shingles(textB, n))
    // |A∩B| / |A∪B| directly: the |A|+|B|−|A∩B| spelling would clone the
    // interpreted shingle subtrees 3× per side and the intersect twice
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))
  }

  /** Embedding-cosine near-dup pairs: (a, b, cos_sim) for every
    * same-block pair with rounded cosine ≥ `tau`. The self-join is an
    * EQUI-join on the block key — all-pairs only within a block, never
    * across the corpus. At test scale the block key is a given column
    * (cluster label); at 100 TB it is an IVF/LSH cell assignment
    * (`Similarity.knnIvf`'s cell or `lshBucket`), which bounds each
    * block to a cell's population. Rounding to 6 d.p. before the
    * threshold keeps the pair set engine-exact (the rank-on-rounded
    * pattern q40 uses).
    */
  /** Semantic dedup (SemDeDup, Abbas et al. 2023): drop all but one
    * representative of every embedding-cosine duplicate CLUSTER —
    * near-dup pairs from the blocked equi-join, transitive closure via
    * the star-contraction components, keep each component's minimum id.
    * Composition of three already-scale-shaped pieces: the only new
    * work is the final anti-join on the loser set.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, tau: Double, cacheKey: String = ""): DataFrame = {
    val pairs = blockPairs(
      pairsWithBlock(df, idCol, vecCol, blockCol, tau, cacheKey), blockCol)
    // the blocked equi-join can never emit a cross-block edge, so the
    // transitive closure is block-local — the one-pass grouped
    // union-find applies, not the iterative star-contraction
    val losers = blockLocalComponents(pairs, blockCol)
      .filter(col("component") =!= col("id"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Connected components of a BLOCK-LOCAL pair set (`doc_a`/`doc_b`
    * plus the block key; edges exist only WITHIN a block — the
    * [[semanticDedup]] shape, where pairs come from an equi-join on the
    * block): ONE shuffle groups each block's edges and an in-memory
    * min-root union-find labels them — no iteration, no convergence
    * rounds. Component label = the component's minimum id (min-root
    * union keeps every root the set minimum), identical to
    * [[connectedComponents]]' fixed point on the same input. Correct
    * ONLY under the block-local premise; general graphs whose edges
    * span blocking keys (minhash band pairs — q56) need the
    * star-contraction. Per-block edge count is bounded by the blocking
    * scheme (an IVF cell / cluster label population) — the SAME
    * contract that already bounds the pair equi-join itself, so this
    * holds wherever the pair generation does.
    */
  def blockLocalComponents(pairs: DataFrame, blockCol: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    // explicit encoders (no TypeTag reflection — REPL-classloader safe)
    pairs.select(col(blockCol).cast("string"),
        col("doc_a").cast("long"), col("doc_b").cast("long"))
      .groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
      .flatMapGroups { (_: String, it: Iterator[Row]) =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { row =>
          val a = row.getLong(1); val b = row.getLong(2)
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          // min-root union: the root IS the component minimum
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
        parent.keysIterator.map(id => (id, find(id))).toSeq.iterator
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .toDF("id", "component")
  }

  /** With a `cacheKey`, the pair relation is corpus-side index state
    * (the ANN-relations pattern): the blocked cosine self-join — the
    * data-proportional part — materializes once and every later call
    * (component relabels, different downstream consumers) reads the
    * persisted pairs instead of re-scoring the corpus.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, tau: Double, cacheKey: String = ""): DataFrame =
    pairsWithBlock(df, idCol, vecCol, blockCol, tau, cacheKey)
      .select(col("a_id"), col("b_id"), col("cos_sim"))

  private def pairsWithBlock(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, tau: Double, cacheKey: String): DataFrame = {
    def build = {
      val a = df.select(col(blockCol),
        col(idCol).as("a_id"), col(vecCol).as("__va"))
      val b = df.select(col(blockCol),
        col(idCol).as("b_id"), col(vecCol).as("__vb"))
      a.join(b, blockCol)
        .filter(col("a_id") < col("b_id"))
        .withColumn("cos_sim",
          round(graft.similarity.Similarity.cosine(col("__va"), col("__vb")), 6))
        .filter(col("cos_sim") >= tau)
        .select(col(blockCol), col("a_id"), col("b_id"), col("cos_sim"))
    }
    if (cacheKey.isEmpty) build
    else cachedRelation(df.sparkSession, s"$cacheKey|pairs")(build)
  }

  /** Renamed-column view used by [[semanticDedup]]'s component step. */
  private def blockPairs(pairs: DataFrame, blockCol: String): DataFrame =
    pairs.select(col(blockCol), col("a_id").as("doc_a"), col("b_id").as("doc_b"))

  /** Cross-document exact-substring dedup (the ExactSubstr pass of Lee
    * et al. 2021, arXiv:2107.06499, word-level): any run of `l`
    * consecutive words whose exact sequence occurs more than once in the
    * corpus — in another document or at a second offset of the same
    * one — is marked, overlapping marks merge into maximal spans, and
    * the spans are excised from the text. Complements the doc-level
    * family ([[exactDedup]]/[[nearDedup]]): those drop whole documents,
    * this removes the boilerplate *inside* otherwise-unique ones.
    *
    * The paper builds one corpus-wide suffix array — inherently
    * single-machine. The shuffle-native re-expression is positional
    * l-gram fingerprints: a position is inside a duplicated substring of
    * length ≥ l iff some l-gram covering it occurs ≥ 2× corpus-wide, so
    * marking duplicated l-gram offsets and merging overlaps reproduces
    * the suffix-array span set exactly.
    *
    * Plan shape (100 TB): posexplode to (doc, offset, gram-digest); a
    * count on the 16-byte digest (map-side partial agg ⇒ that shuffle
    * carries distinct-gram width, not corpus width); an equi-join back
    * on the digest keeping only duplicated offsets; per-doc windows for
    * island-merging (docs are bounded — partitions are not); clean text
    * is rebuilt by splicing the gaps between merged spans out of the
    * doc's own token array (`zip_with`/`slice`/`flatten`, one row per
    * doc) — duplicated-position rows are the only post-count shuffle;
    * the corpus text itself never travels as per-word rows. No driver
    * state, no all-pairs step, nothing proportional to corpus² anywhere.
    *
    * Docs shorter than `l` words contain no l-gram and are never marked
    * (the paper's minimum-match-length contract).
    *
    * Returns one row per input doc: `n_words`, `dup_span_words` (words
    * covered by ≥ 1 duplicated l-gram), `n_spans` (maximal merged
    * spans), `clean_text` ('' when fully covered).
    */
  def substringDedup(df: DataFrame, textCol: String, idCol: String,
      l: Int): DataFrame = {
    require(l >= 2, s"substring match length must be >= 2 words, got $l")
    // Both multi-consumer subtrees are persisted (tracked handles — see
    // [[clearCaches]]): `toks` feeds the gram branch AND the final splice
    // join, `grams` feeds the count aggregate AND the join-back probe.
    // Unpersisted, Spark rebuilds each subtree per consumer — the corpus
    // was tokenized 3x and gram-exploded 2x per run. Persist-vs-recompute
    // at 100 TB: `toks` is corpus-width but column-narrow (id + token
    // array ≈ the text itself) and MEMORY_AND_DISK degrades to a local
    // disk spill — cheaper than re-reading + re-tokenizing the corpus;
    // `grams` is ~words×(id, int, 16B digest) ≈ 3-4x the text. If
    // executor-local disk can't hold grams at the target scale, drop
    // ONLY the grams persist (the count-join shape stays valid) and pay
    // one re-explode of the cached toks instead.
    val toks = df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grams = toks
      .filter(size(col("__t")) >= l)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), size(col("__t")) - l),
          i => md5(concat_ws(" ", slice(col("__t"), i + 1, lit(l))))))
          .as(Seq("__p", "__g")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    track(toks); track(grams)
    // corpus-wide occurrence count via groupBy + join-back rather than a
    // count-over-partition window: the window pays one fewer shuffle on
    // mostly-unique corpora, but a boilerplate gram repeated billions of
    // times at 100 TB would land in ONE window partition — a straggler
    // nothing can split — whereas the equi-join probe is exactly the
    // shape AQE skew-join handles, and the agg side reduces map-side
    // wherever duplication exists
    val dupG = grams.groupBy(col("__g")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
    val dupPos = grams.join(dupG, "__g").select(col(idCol), col("__p"))
    val cov = dupPos
      .select(col(idCol),
        explode(sequence(col("__p"), col("__p") + (l - 1))).as("__cp"))
      .distinct()
    val wIsl = Window.partitionBy(col(idCol)).orderBy(col("__cp"))
    // merged maximal spans, one sorted (start, end) array per doc —
    // renamed id (`__sid`) so the toks join below is an unambiguous
    // equi-join despite the shared lineage
    val spans = cov
      .withColumn("__grp", col("__cp") - row_number().over(wIsl))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("__cp")).as("__s"), max(col("__cp")).as("__e"))
      .groupBy(col(idCol))
      .agg(sum(col("__e") - col("__s") + 1).cast("int").as("dup_span_words"),
        count(lit(1)).cast("int").as("n_spans"),
        array_sort(collect_list(struct(col("__s"), col("__e")))).as("__spans"))
      .withColumnRenamed(idCol, "__sid")
    // gap k lies between span k-1's end (sentinel -1 before the first)
    // and span k's start (sentinel n after the last): splice those
    // slices of the doc's own token array — O(words + spans) per doc,
    // no per-word rows
    val n = size(col("__t"))
    val prevEnds = concat(array(lit(-1)),
      transform(col("__spans"), x => x.getField("__e")))
    val nextStarts = concat(transform(col("__spans"), x => x.getField("__s")),
      array(n))
    val cleanToks = flatten(zip_with(prevEnds, nextStarts,
      (e, s) => slice(col("__t"), e + lit(2), s - e - lit(1))))
    toks
      .join(spans, col(idCol) === col("__sid"), "left")
      .select(col(idCol), n.cast("int").as("n_words"),
        coalesce(col("dup_span_words"), lit(0)).as("dup_span_words"),
        coalesce(col("n_spans"), lit(0)).as("n_spans"),
        coalesce(when(col("__spans").isNull, array_join(col("__t"), " "))
          .otherwise(array_join(cleanToks, " ")), lit("")).as("clean_text"))
  }
}
