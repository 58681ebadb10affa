package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over embedding columns.
  *
  * Baseline: brute-force cosine top-k — a broadcast cross join with a
  * codegen'd `zip_with`+`aggregate` dot product (no UDF). Scale path:
  * random-hyperplane LSH bucketing turns the cross join into an equi-join
  * on bucket keys; recall is tuned by the number of hyperplanes/tables.
  */
object Similarity {

  // Persisted intermediates the returned (lazy) plans still depend on —
  // same contract as Dedup.clearCaches: callers drop them between rounds.
  private val cachedHandles = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private def track(df: DataFrame): DataFrame = { cachedHandles.add(df); df }

  // Build-once / serve-many memos: a fitted codebook set / built index
  // keyed by a CALLER-SUPPLIED identity (input relation + parameters —
  // uniqueness is the caller's contract). An ANN index exists to be
  // built once and probed by many query batches; the memo is what makes
  // the steady-state cost of q53/q87/q88/q92-shaped serving the SEARCH,
  // not a refit per batch. Same lifecycle as the persisted handles:
  // `clearCaches` drops both.
  private val bookMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Double]]]]()
  private val indexMemo = new java.util.concurrent.ConcurrentHashMap[String, IvfPqIndex]()
  private val dfMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** SparkContext identity woven into every memo key: persisted
    * DataFrames (and broadcast-derived fits) die with their context, so
    * an entry built under a stopped context must MISS, not serve a
    * dead-session relation. applicationId + startTime is unique per
    * context incarnation; sessions sharing a context share cached RDDs,
    * so context granularity is exactly the validity domain.
    */
  private def sessionTag(spark: org.apache.spark.sql.SparkSession): String =
    s"${spark.sparkContext.applicationId}@${spark.sparkContext.startTime}"

  /** Memoize a persisted corpus-side relation (PQ codes, IVF cell
    * assignments) under the build-once contract: first call builds and
    * persists, later calls reuse the materialized relation. Key
    * uniqueness (input + parameters) is the caller's contract; the
    * SparkContext identity is appended automatically so a new context
    * never sees a dead context's entries. [[clearCaches]] drops and
    * unpersists.
    */
  def cachedRelation(spark: org.apache.spark.sql.SparkSession, cacheKey: String)(
      build: => DataFrame): DataFrame =
    dfMemo.computeIfAbsent(s"${sessionTag(spark)}|$cacheKey", _ =>
      track(build.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))

  /** Unpersist every intermediate this object has persisted and drop the
    * build-once memos. Call after the consuming action in long-lived
    * sessions.
    */
  def clearCaches(): Unit = {
    bookMemo.clear()
    indexMemo.clear()
    dfMemo.clear()
    var h = cachedHandles.poll()
    while (h != null) { h.unpersist(blocking = false); h = cachedHandles.poll() }
  }

  /** Hard bound on a driver-collected query batch: `knnPq`/`searchIvfPq`
    * build an m×ksub LUT per query on the driver and broadcast the lot,
    * so the batch size is a driver-memory contract, not a data-scale
    * knob (at 100k queries × 8×256 doubles the LUTs are ~1.6 GB —
    * already generous). A larger batch must be split by the caller;
    * exceeding the bound fails loudly instead of OOMing the driver.
    * Test-adjustable, not a tuning surface.
    */
  private[graft] var maxQueryBatch: Int = 100000

  /** Bounded driver pull of a PQ query batch: `take(max+1)` (never a
    * full collect), then a loud failure if the bound is exceeded.
    */
  private def collectQueryBatch(queries: DataFrame, qId: String,
      qVec: String): Array[(Long, Seq[Double])] = {
    val spark = queries.sparkSession
    import spark.implicits._
    val taken = queries.select(col(qId).cast("long"), col(qVec))
      .as[(Long, Seq[Double])].take(maxQueryBatch + 1)
    require(taken.length <= maxQueryBatch,
      s"PQ query batch exceeds maxQueryBatch=$maxQueryBatch — per-query " +
        s"LUTs are driver-built and broadcast; split the query set")
    taken.sortBy(_._1)
  }

  /** Dot product of two Array[Float|Double] columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision — native one-pass expression
    * (sequential fold order matches the composable spelling exactly).
    */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSim(a, b)

  /** Composable (pure built-ins) spelling; kept as the semantic
    * reference for `cosine` and for engines without the native expr.
    */
  def cosineComposable(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors. Queries are broadcast (small side); corpus streams — at
    * 100 TB this is one scan + a per-query bounded heap via window top-k.
    * Ties break on neighbor id for determinism.
    */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
      qVec: String, cVec: String, k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .withColumn("cos_sim", cosine(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos_sim").desc, col(cId).asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId).as("query_id"), col(cId).as("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** md5-based, ENGINE-AGNOSTIC plane weight (the q59 hash-split
    * pattern): first 8 hex chars of md5("p:d") → [0,1e6)/1e6 − 0.5.
    * xxhash64 would be Spark-private randomness; md5 makes the buckets —
    * and therefore the whole LSH ANN result — reproducible in any
    * engine, so q43 is oracle-checkable. Weights depend only on
    * (plane, dim): computed ONCE here and embedded as literals — an
    * in-lambda hash spelling would re-run 8×dim md5s per ROW inside the
    * interpreted HOF (measured 4× on q43).
    */
  private[similarity] def planeWeight(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$p:$d".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % 1000000L) / 1e6 - 0.5
  }

  /** Random-hyperplane LSH bucket id: `nPlanes` sign bits packed into a
    * long; `dim` MUST equal the vector length — a mismatched vector gets a
    * NULL bucket (and so drops out of the candidate equi-join) rather than
    * silently collapsing into bucket 0 and degenerating the join into a
    * cross join. One native expression: the composable spelling below
    * walks the vector once per plane through interpreted zip_with +
    * aggregate HOFs (8 walks/row at q43's settings — r2 perf finding).
    * Vectors in the same bucket are candidate neighbors; the downstream
    * join is an equi-join on (bucket), not a cross join.
    */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column =
    graft.functions.LshBucket(vec,
      array((0 until nPlanes).map(p =>
        array((0 until dim).map(d => lit(planeWeight(p, d))): _*)): _*))

  /** The pure-built-ins spelling of [[lshBucket]], kept as the semantic
    * reference — spec-enforced bit-identical on length-matched vectors.
    * (On a length MISMATCH this spelling exhibits the documented zip_with
    * null-padding hazard — every bucket collapses to 0 — which the native
    * expression deliberately replaces with a NULL bucket.)
    */
  def lshBucketComposable(vec: Column, nPlanes: Int, dim: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val weights = array((0 until dim).map(d => lit(planeWeight(p, d))): _*)
      val proj = aggregate(
        zip_with(vec, weights, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Seeded driver-local Lloyd's iteration — the coarse-quantizer fit.
    * The fit set is a BOUNDED sample (O(cells × samples-per-cell),
    * independent of corpus size), so fitting on the driver is the right
    * cost model: an MLlib KMeans run costs 2-3 Spark jobs per iteration,
    * which dominates wall-clock when k and d are small — the quantizer
    * itself is identical math.
    */
  private[similarity] def lloyd(points: Array[Array[Double]], k: Int,
      maxIter: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "empty fit sample")
    val rnd = new scala.util.Random(seed)
    val d = points.head.length
    val centroids = Array.tabulate(math.min(k, points.length))(
      i => points(rnd.nextInt(points.length)).clone())
    var iter = 0
    while (iter < maxIter) {
      val sums = Array.fill(centroids.length, d)(0.0)
      val counts = new Array[Long](centroids.length)
      points.foreach { p =>
        var best = 0; var bd = Double.MaxValue; var i = 0
        while (i < centroids.length) {
          var dist = 0.0; var j = 0
          while (j < d) { val t = centroids(i)(j) - p(j); dist += t * t; j += 1 }
          if (dist < bd) { bd = dist; best = i }
          i += 1
        }
        counts(best) += 1
        var j = 0
        while (j < d) { sums(best)(j) += p(j); j += 1 }
      }
      var i = 0
      while (i < centroids.length) {
        if (counts(i) > 0) {
          var j = 0
          while (j < d) { centroids(i)(j) = sums(i)(j) / counts(i); j += 1 }
        } else centroids(i) = points(rnd.nextInt(points.length)).clone()
        i += 1
      }
      iter += 1
    }
    centroids
  }

  /** IVF-style ANN: a seeded KMeans coarse quantizer (sample-fit on the
    * driver, centroids broadcast) assigns every vector to a cell; each
    * query probes its `nProbe` nearest cells and ranks exact cosine only
    * within them. The join is an equi-join on cell id — the 100 TB
    * shape: corpus shuffles once by cell, per-query work shrinks by
    * ~nCells/nProbe versus brute force. The assigned relation is
    * persisted (probed twice); call [[clearCaches]] between rounds in a
    * long-lived session.
    */
  def knnIvf(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int, nProbe: Int, k: Int,
      fitSample: Double = 1.0, maxIter: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fitData =
      if (fitSample >= 1.0) df else df.sample(fitSample, 42L)
    // bounded fit set: ~100 samples per cell is ample for a coarse
    // quantizer. orderBy(id) before limit: a bare limit() takes whatever
    // rows arrive first, which varies with partition layout — the fit
    // sample (and thus the centroids) must be deterministic across
    // environments for the "seeded" claim to hold.
    val sample = fitData.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(math.max(nCells * 100, 1000))
      .select(col(vecCol)).as[Seq[Double]].collect().map(_.toArray)
    val centroids = lloyd(sample, nCells, maxIter, seed = 42L)
    ivfSearch(df, idCol, vecCol, centroids, nProbe, k, round6 = false)
  }

  /** IVF ANN with an ORACLE-MIRRORABLE coarse fit: centroids from
    * [[kmeansMirrorable]] (m = 1) instead of the sampled driver-side
    * Lloyd's, and every similarity rounded to 6 dp with total tie-breaks
    * (cell id for probes, neighbor id for ranks) — the q40 determinism
    * contract. `PqOracle.q53Sql` re-derives the centroids, assignment,
    * probe set and ranking in DuckDB at any SF, so the result is
    * hash-exact, not rows-only. Search shape is identical to [[knnIvf]]:
    * corpus shuffles once by cell, per-query work ~ nProbe/nCells of
    * brute force.
    */
  def knnIvfMirrorable(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int, nProbe: Int, k: Int, iters: Int = 2,
      cacheKey: String = "", fitLimit: Int = 1024): DataFrame = {
    val centroids = kmeansMirrorable(
      df.orderBy(col(idCol)).limit(fitLimit), idCol, vecCol,
      m = 1, k = nCells, iters = iters, cacheKey = cacheKey)(0)
    ivfSearch(df, idCol, vecCol, centroids, nProbe, k, round6 = true,
      cacheKey = cacheKey)
  }

  /** Shared IVF search given fitted centroids: broadcast-UDF cell
    * assignment, per-query nProbe nearest cells by centroid cosine, exact
    * cosine top-k inside the probed cells (equi-join on cell id).
    * `round6` applies the 6-dp oracle rounding to BOTH the probe ranking
    * and the emitted similarity.
    */
  private def ivfSearch(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], nProbe: Int, k: Int,
      round6: Boolean, cacheKey: String = ""): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def sim(a: Column, b: Column): Column =
      if (round6) round(cosine(a, b), 6) else cosine(a, b)
    val bc = spark.sparkContext.broadcast(centroids)
    val assignUdf = udf((v: Seq[Double]) => {
      val cs = bc.value
      var best = 0; var bd = Double.MaxValue; var i = 0
      while (i < cs.length) {
        var dist = 0.0; var j = 0; val c = cs(i)
        while (j < c.length) { val t = c(j) - v(j); dist += t * t; j += 1 }
        if (dist < bd) { bd = dist; best = i }
        i += 1
      }
      best
    })
    // corpus-side cell assignment is index state, not per-search work —
    // with a cacheKey it materializes once and serves every later batch
    def buildAssigned = df.select(col(idCol), col(vecCol))
      .withColumn("cell", assignUdf(col(vecCol)))
    val assigned =
      if (cacheKey.nonEmpty) cachedRelation(spark, s"$cacheKey|cells")(buildAssigned)
      else track(buildAssigned.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // query → its nProbe nearest centroids (small: nQueries × nCells)
    val centDf = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("probe_cell", "centroid")
    val wProbe = Window.partitionBy(col(s"q.$idCol"))
      .orderBy(col("cent_sim").desc, col("probe_cell").asc)
    val probes = assigned.as("q").crossJoin(broadcast(centDf))
      .withColumn("cent_sim", sim(col(s"q.$vecCol"), col("centroid")))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nProbe)
      .select(col(s"q.$idCol").as("query_id"), col(s"q.$vecCol").as("qv"),
        col("probe_cell").as("cell"))
    val wK = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    probes.join(assigned.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("nv"), col("cell")), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim", sim(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** Symmetric per-vector int8 quantization: scale = max|x|/127, each
    * component → floor(x/scale + 0.5) ∈ [−127, 127] — the 4× (fp32) / 8×
    * (fp64) storage cut that makes a 100 TB embedding corpus fit its ANN
    * serving tier; dequantization error per dim ≤ scale/2 (spec-bounded).
    * Output: (id, scale, qvec array<int>). Engine-agnostic arithmetic
    * (max / divide / floor — no banker's-rounding ambiguity), so results
    * are oracle-exact.
    *
    * The absmax fold runs behind an `explode(array(struct(…)))` Generate
    * barrier: referenced from inside the per-element transform lambda, an
    * INLINED fold would re-walk the whole vector per element (O(d²) — the
    * expression-duplication trap, PLANS.md); after the barrier it is a
    * bound attribute read.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val folded = df.select(col(idCol), explode(array(struct(
      col(vecCol).as("v"),
      aggregate(col(vecCol), lit(0.0),
        (a, x) => greatest(a, abs(x.cast("double")))).as("am")))).as("__s"))
    val scale = greatest(col("__s.am"), lit(1e-12)) / 127.0
    folded.select(
      col(idCol),
      scale.as("scale"),
      transform(col("__s.v"),
        x => floor(x.cast("double") / scale + 0.5).cast("int")).as("qvec"))
  }

  /** LSH-bucketed ANN: equi-join on bucket, then exact cosine within
    * bucket, window top-k. Trades recall for a shuffle-on-key plan that
    * scales linearly with corpus size. `dim` is REQUIRED (no default): it
    * must equal the embedding length, and a silently-wrong default would
    * null every bucket via the mismatch guard (r2 ADVICE).
    */
  def knnLsh(df: DataFrame, idCol: String, vecCol: String, nPlanes: Int, k: Int,
      dim: Int): DataFrame = {
    val bucketed = df.select(col(idCol), col(vecCol), lshBucket(col(vecCol), nPlanes, dim).as("bucket"))
    val a = bucketed.as("a")
    val b = bucketed.as("b")
    // rank on the ROUNDED similarity (the q40 determinism contract):
    // unrounded float ties could rank differently across engines
    val w = Window.partitionBy(col(s"a.$idCol")).orderBy(col("cos_sim").desc, col(s"b.$idCol").asc)
    a.join(b, col("a.bucket") === col("b.bucket") && col(s"a.$idCol") =!= col(s"b.$idCol"))
      .withColumn("cos_sim", round(cosine(col(s"a.$vecCol"), col(s"b.$vecCol")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(s"a.$idCol").as("query_id"), col(s"b.$idCol").as("neighbor_id"),
        col("cos_sim"), col("rank"))
  }

  // ───────────────────── product quantization ─────────────────────

  /** Train PQ codebooks (Jégou, Douze & Schmid, TPAMI 2011): the vector
    * is cut into `m` contiguous subvectors and each subspace gets its
    * own `ksub`-centroid quantizer, fit by the same seeded driver-local
    * Lloyd's as the IVF coarse quantizer, on the same BOUNDED
    * deterministic sample (orderBy(id).limit — O(ksub·samples), never
    * corpus-proportional). Returns codebooks[m][ksub][d/m].
    */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, maxIter: Int = 10): Array[Array[Array[Double]]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(math.max(ksub * 100, 1000))
      .select(col(vecCol)).as[Seq[Double]].collect().map(_.toArray)
    pqTrainOn(sample, m, ksub, maxIter)
  }

  private def pqTrainOn(sample: Array[Array[Double]], m: Int, ksub: Int,
      maxIter: Int): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "pqTrain: empty fit sample")
    val d = sample.head.length
    require(d % m == 0, s"pqTrain: dim $d not divisible by m=$m")
    val dsub = d / m
    Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      lloyd(sub, ksub, maxIter, seed = 42L + s)
    }
  }

  /** Fixed-iteration, cross-engine re-derivable Lloyd's fit — the
    * oracle-exact sibling of [[pqTrain]]/[[lloyd]] (SURVEY determinism
    * contract). Every arithmetic step is chosen so an independent SQL
    * engine reproduces the centroids BIT-FOR-BIT from the same parquet:
    *
    *   - init: subvectors of the `k` smallest-id rows (pure data);
    *   - assignment: squared L2 as a fixed left-assoc fold over the
    *     `dsub` dims — IEEE ops in a fixed order are engine-independent;
    *     ties go to the lowest centroid index;
    *   - update: per-component mean via the dsum discipline —
    *     `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)` —
    *     order-independent exact decimal sums, so shuffle order can't
    *     perturb a bit; empty clusters keep their previous centroid;
    *   - exactly `iters` iterations, no convergence early-exit (an
    *     early-exit is a float comparison an oracle can't mirror).
    *
    * Runs as `iters` small Spark jobs (assignment UDF + decimal groupBy;
    * the collected stats are O(m·k·dsub), never data-proportional).
    * Bounding the FIT INPUT is the caller's job — at 100 TB pass a
    * deterministic sample (`orderBy(id).limit(n)`), same contract as
    * [[pqTrain]]'s internal sample. Every in-repo caller complies:
    * [[knnIvfMirrorable]] / [[buildIvfPqIndexMirrorable]] sample
    * internally via their `fitLimit`, and q87 passes
    * `orderBy(vec_id).limit(n)` directly — the oracle SQL mirrors the
    * same `ORDER BY vec_id LIMIT n`, so the sample (and the fit) stays
    * hash-exact.
    *
    * Returns codebooks[m][k][d/m]; with m=1 this is the coarse-quantizer
    * fit (`result(0)` = centroids[k][d]).
    */
  def kmeansMirrorable(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int,
      cacheKey: String = ""): Array[Array[Array[Double]]] = {
    val memoKey =
      if (cacheKey.isEmpty) "" else s"${sessionTag(df.sparkSession)}|$cacheKey"
    if (memoKey.nonEmpty) {
      val hit = bookMemo.get(memoKey)
      if (hit != null) return hit
    }
    val spark = df.sparkSession
    import spark.implicits._
    val initRows = df.select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol)).limit(k)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
    require(initRows.length == k,
      s"kmeansMirrorable: need >= $k rows to seed $k centroids, got ${initRows.length}")
    val d = initRows.head.length
    require(d % m == 0, s"kmeansMirrorable: dim $d not divisible by m=$m")
    val dsub = d / m
    var cent: Array[Array[Array[Double]]] = Array.tabulate(m, k)((s, c) =>
      java.util.Arrays.copyOfRange(initRows(c), s * dsub, (s + 1) * dsub))
    // subspace point rows (s, p), persisted across the `iters` passes —
    // without it every iteration re-scans the source and re-explodes
    // (the fit input is caller-bounded, so this cache is too)
    val subs = df.select(posexplode(array((0 until m).map(s =>
      slice(col(vecCol), s * dsub + 1, dsub)): _*)).as(Seq("s", "p")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(cent)
      val assign = udf { (s: Int, p: Seq[Double]) =>
        val book = bc.value(s)
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < book.length) {
          var dist = 0.0; var j = 0
          while (j < dsub) { val t = p(j) - book(c)(j); dist += t * t; j += 1 }
          if (dist < bd) { bd = dist; best = c }
          c += 1
        }
        best
      }
      val stats = subs.withColumn("c", assign(col("s"), col("p")))
        .select(col("s"), col("c"), posexplode(col("p")).as(Seq("j", "x")))
        .groupBy("s", "c", "j")
        .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double") / count(lit(1))).as("mj"))
        .collect()
      val next = Array.tabulate(m, k)((s, c) => cent(s)(c).clone())
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
      cent = next
      it += 1
    }
    subs.unpersist(blocking = false)
    if (memoKey.nonEmpty) bookMemo.put(memoKey, cent)
    cent
  }

  /** Cluster-balanced resampling weights — the embedding-space corpus
    * curation pass used by DataComp-style pipelines and SemDeDup §5
    * (Abbas et al. 2023) follow-ups: cluster the corpus, then cap each
    * cluster's expected mass so over-represented semantic regions stop
    * dominating the training mixture. keep_weight = min(1, cap/|cell|)
    * (clusters at-or-under `cap` survive whole; a 10×-over-cap cluster
    * keeps ~cap expected docs), and `keep` materializes the decision
    * with the repo's deterministic md5-uniform (the [[graft.ml.Splits]]
    * hash-split pattern — reproducible on any engine with md5).
    *
    * MIRRORABLE end to end: centroids via [[kmeansMirrorable]] on the
    * `fitLimit`-bounded deterministic sample, argmin-L2 assignment (ties
    * to the lower cell), weight rounded to 6 dp — `PqOracle.q100Sql`
    * replays it bit-for-bit (q100 hash-exact).
    *
    * 100 TB shape: one broadcast-UDF assignment scan (centroids are
    * k×d doubles), one tiny groupBy(cell) count, one broadcast join
    * back — no shuffle proportional to corpus width anywhere.
    */
  def clusterBalanceMirrorable(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int, cap: Double, iters: Int = 2, fitLimit: Int = 1024,
      cacheKey: String = ""): DataFrame = {
    require(cap > 0, s"clusterBalance: cap must be positive, got $cap")
    val spark = df.sparkSession
    val centroids = kmeansMirrorable(
      df.orderBy(col(idCol)).limit(fitLimit), idCol, vecCol,
      m = 1, k = nCells, iters = iters, cacheKey = cacheKey)(0)
    val bc = spark.sparkContext.broadcast(centroids)
    val assignUdf = udf((v: Seq[Double]) => {
      val cs = bc.value
      var best = 0; var bd = Double.MaxValue; var i = 0
      while (i < cs.length) {
        var dist = 0.0; var j = 0; val c = cs(i)
        while (j < c.length) { val t = c(j) - v(j); dist += t * t; j += 1 }
        if (dist < bd) { bd = dist; best = i }
        i += 1
      }
      best
    })
    val assigned = df.select(col(idCol), col(vecCol))
      .withColumn("cell", assignUdf(col(vecCol)))
    val counts = assigned.groupBy("cell")
      .agg(count(lit(1)).cast("int").as("cluster_n"))
    assigned.join(broadcast(counts), Seq("cell"))
      .withColumn("keep_weight",
        round(least(lit(1.0), lit(cap) / col("cluster_n")), 6))
      .withColumn("keep",
        (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long") / lit(4294967296.0)) < col("keep_weight"))
      .select(col(idCol), col("cell"), col("cluster_n"),
        col("keep_weight"), col("keep"))
  }

  /** Encode vectors to `m`-byte PQ codes: code(s) = argmin centroid of
    * subvector s (ties to the lowest index). 8-byte codes for a 64-dim
    * fp64 vector = 64× compression — the difference between an embedding
    * corpus that fits executor memory and one that doesn't.
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]],
      keep: Seq[String] = Nil): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(codebooks)
    val encode = udf { v: Seq[Double] =>
      val books = bc.value
      val m = books.length
      val dsub = books(0)(0).length
      val code = new Array[Int](m)
      var s = 0
      while (s < m) {
        val book = books(s)
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < book.length) {
          var dist = 0.0; var j = 0
          while (j < dsub) { val t = book(c)(j) - v(s * dsub + j); dist += t * t; j += 1 }
          if (dist < bd) { bd = dist; best = c }
          c += 1
        }
        code(s) = best
        s += 1
      }
      code.toSeq
    }
    df.select((col(idCol) +: keep.map(col)) :+ encode(col(vecCol)).as("pq_code"): _*)
  }

  /** PQ top-k by asymmetric distance computation (ADC): each query
    * builds an m×ksub lookup table of subvector inner products ONCE
    * (driver-side — the query set is bounded by the same contract that
    * lets `knnBruteForce` broadcast it), centroid norms² are
    * query-independent and precomputed from the codebooks, and every
    * corpus code then scores in 2m TABLE ADDS — no vector arithmetic on
    * the scan side, which is the entire point: the 100 TB corpus
    * contributes only (id, m-byte code) rows to the scan.
    *
    * Similarity = cosine(query, reconstructed vector), rounded to 6 dp;
    * rank ties break on neighbor id. Query ids must be integral.
    */
  def knnPq(queries: DataFrame, codes: DataFrame, qId: String, cId: String,
      qVec: String, codebooks: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val m = codebooks.length
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length
    // query-independent: ||x̂||² decomposes over subspaces
    val norms2 = Array.tabulate(m, ksub) { (s, c) =>
      var n = 0.0; var j = 0
      while (j < dsub) { n += codebooks(s)(c)(j) * codebooks(s)(c)(j); j += 1 }
      n
    }
    val qData = collectQueryBatch(queries, qId, qVec)
    val luts = qData.map { case (_, qv) =>
      Array.tabulate(m, ksub) { (s, c) =>
        var ip = 0.0; var j = 0
        while (j < dsub) { ip += qv(s * dsub + j) * codebooks(s)(c)(j); j += 1 }
        ip
      }
    }
    val qn2 = qData.map { case (_, qv) => qv.map(x => x * x).sum }
    val bcLuts = spark.sparkContext.broadcast(luts)
    val bcN2 = spark.sparkContext.broadcast(norms2)
    val bcQn2 = spark.sparkContext.broadcast(qn2)
    val score = udf { (qi: Int, code: Seq[Int]) =>
      val lut = bcLuts.value(qi)
      val n2s = bcN2.value
      var ip = 0.0; var n2 = 0.0
      var s = 0
      while (s < m) {
        val c = code(s)
        ip += lut(s)(c); n2 += n2s(s)(c)
        s += 1
      }
      val qq = bcQn2.value(qi)
      if (n2 == 0.0 || qq == 0.0) 0.0 else ip / math.sqrt(n2 * qq)
    }
    val qIdxDf = qData.map(_._1).zipWithIndex
      .map { case (id, i) => (id, i) }.toSeq.toDF("query_id", "__qi")
    val w = Window.partitionBy(col("query_id")).orderBy(col("pq_sim").desc, col("neighbor_id").asc)
    codes.select(col(cId).as("neighbor_id"), col("pq_code"))
      .crossJoin(broadcast(qIdxDf))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("pq_sim", round(score(col("__qi"), col("pq_code")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("pq_sim"), col("rank"))
  }

  /** IVF-PQ — the standard billion-scale composition (Jégou et al.
    * TPAMI'11 §V): the coarse quantizer prunes candidates to `nProbe`
    * cells per query, PQ codes make scoring those candidates 2m table
    * adds each. Versus `knnIvf`: the probed cells hold CODES, not raw
    * vectors (64× less memory/IO). Versus `knnPq`: the scan covers
    * ~nProbe/nCells of the corpus instead of all of it. The plan is an
    * EQUI-join of codes on the probed (query, cell) pairs — the 100 TB
    * corpus shuffles once by cell; per-query work is bounded by cell
    * population.
    *
    * With `nProbe = nCells` the candidate set is the full corpus and
    * the result equals `knnPq`'s exactly (spec-pinned) — the recall
    * knob degrades gracefully to the flat scan.
    *
    * The coarse fit reuses the IVF sample contract (orderBy(id).limit —
    * bounded, deterministic); PQ codebooks come from `pqTrain` on the
    * same corpus. Query ids must be integral.
    */
  /** A built IVF-PQ index: the codes relation (id, cell, pq_code — the
    * ONLY corpus-sized piece, m bytes + a cell id per vector), the PQ
    * codebooks, and the coarse centroids. Build once, search many —
    * persist `codes` for a serving workload; indexing cost (one corpus
    * scan + encode) is then paid once, not per query batch.
    */
  case class IvfPqIndex(codes: DataFrame, codebooks: Array[Array[Array[Double]]],
      centroids: Array[Array[Double]], idCol: String, residual: Boolean = false)

  /** Build the IVF-PQ index: coarse quantizer + PQ codebooks fit on the
    * bounded deterministic sample, then ONE corpus scan emits
    * (id, cell, code) — cell assignment rides the encode projection (a
    * join of two separate scans would shuffle the corpus on id for
    * nothing).
    */
  /** Broadcast nearest-centroid assignment, shared by the build and
    * append paths (the append path must reproduce build's assignment
    * bit-for-bit or appended codes would land in different cells).
    */
  private def assignCellUdf(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Double]]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bcCent = spark.sparkContext.broadcast(centroids)
    udf { v: Seq[Double] =>
      val cs = bcCent.value
      var best = 0; var bd = Double.MaxValue; var i = 0
      while (i < cs.length) {
        var dist = 0.0; var j = 0; val c = cs(i)
        while (j < c.length) { val t = c(j) - v(j); dist += t * t; j += 1 }
        if (dist < bd) { bd = dist; best = i }
        i += 1
      }
      best
    }
  }

  /** x − centroid(cell), for residual-mode encoding. */
  private def residualUdf(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Double]]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bcCent = spark.sparkContext.broadcast(centroids)
    udf { (v: Seq[Double], cell: Int) =>
      val c = bcCent.value(cell)
      Seq.tabulate(v.length)(j => v(j) - c(j))
    }
  }

  /** One corpus scan → (id, cell, code) under FROZEN centroids and
    * codebooks — the shared encode stage of build and append.
    */
  private def encodeWithIndexFits(rows: DataFrame, cId: String, cVec: String,
      centroids: Array[Array[Double]], books: Array[Array[Array[Double]]],
      residual: Boolean): DataFrame = {
    val spark = rows.sparkSession
    val assign = assignCellUdf(spark, centroids)
    if (!residual)
      pqEncode(rows.withColumn("cell", assign(col(cVec))), cId, cVec, books,
        keep = Seq("cell"))
    else
      pqEncode(
        rows.withColumn("cell", assign(col(cVec)))
          .withColumn("__resid", residualUdf(spark, centroids)(col(cVec), col("cell"))),
        cId, "__resid", books, keep = Seq("cell"))
  }

  def buildIvfPqIndex(corpus: DataFrame, cId: String, cVec: String,
      nCells: Int, m: Int, ksub: Int, maxIter: Int = 10,
      residual: Boolean = false): IvfPqIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample = corpus.select(col(cId), col(cVec))
      .orderBy(col(cId)).limit(math.max(nCells * 100, 1000))
      .select(col(cVec)).as[Seq[Double]].collect().map(_.toArray)
    val centroids = lloyd(sample, nCells, maxIter, seed = 42L)
    def nearest(v: Array[Double]): Int = {
      var best = 0; var bd = Double.MaxValue; var i = 0
      while (i < centroids.length) {
        var dist = 0.0; var j = 0; val c = centroids(i)
        while (j < c.length) { val t = c(j) - v(j); dist += t * t; j += 1 }
        if (dist < bd) { bd = dist; best = i }
        i += 1
      }
      best
    }
    val books =
      if (!residual) pqTrain(corpus, cId, cVec, m, ksub, maxIter)
      else {
        // residual mode (Jegou et al. SSVII): PQ encodes x - c(cell), which
        // is much tighter than x itself once the coarse quantizer has
        // absorbed the cluster structure - the books see only within-cell
        // spread. Books fit on the SAMPLE's residuals (same bound).
        pqTrainOn(sample.map { v =>
          val c = centroids(nearest(v))
          Array.tabulate(v.length)(j => v(j) - c(j))
        }, m, ksub, maxIter)
      }
    IvfPqIndex(encodeWithIndexFits(corpus, cId, cVec, centroids, books, residual),
      books, centroids, cId, residual)
  }

  /** Append new vectors to a BUILT index without refitting: cells come
    * from the frozen coarse centroids, codes from the frozen codebooks
    * (residual mode handled identically), unioned with the existing
    * code relation. This is the 100 TB serving-maintenance path — a
    * daily increment pays one encode scan over the NEW rows only, while
    * codebook refresh stays an explicit rebuild decision (the standard
    * IVFADC practice: quantizers are trained offline and held fixed as
    * the inverted lists grow). Search behavior over appended codes is
    * identical to having encoded those rows in the original build —
    * `SimilaritySpec` pins code-for-code equality.
    */
  def appendToIvfPqIndex(index: IvfPqIndex, newRows: DataFrame,
      cVec: String): IvfPqIndex = {
    val appended = encodeWithIndexFits(newRows, index.idCol, cVec,
      index.centroids, index.codebooks, index.residual)
    index.copy(codes = index.codes.unionByName(appended))
  }

  /** [[buildIvfPqIndex]] with every fit swapped for [[kmeansMirrorable]]
    * — same index structure and search path, but the coarse centroids
    * and PQ codebooks (and so the codes and every ADC score) are
    * bit-reproducible by an independent SQL engine, which is what lets
    * the driver's DuckDB oracle hash-check the whole IVF-PQ pipeline
    * instead of trusting rows-only. The coarse and book fits run on the
    * `fitLimit` smallest-id rows (a deterministic, oracle-mirrorable
    * `ORDER BY id LIMIT n` sample — at 100 TB the index build pays one
    * tiny fit plus ONE full-corpus encode scan, never `iters` corpus
    * explosions); residual mode trains books on the SAMPLE's residuals
    * `x − c(cell)` (exact IEEE subtraction — still mirrorable).
    */
  def buildIvfPqIndexMirrorable(corpus: DataFrame, cId: String, cVec: String,
      nCells: Int, m: Int, ksub: Int, iters: Int = 2,
      residual: Boolean = false, cacheKey: String = "",
      fitLimit: Int = 1024): IvfPqIndex = {
    require(fitLimit > 0, "buildIvfPqIndexMirrorable: fitLimit must be positive")
    val memoKey =
      if (cacheKey.isEmpty) "" else s"${sessionTag(corpus.sparkSession)}|$cacheKey"
    if (memoKey.nonEmpty) {
      val hit = indexMemo.get(memoKey)
      if (hit != null) return hit
    }
    // the corpus feeds the fit sample and the encode — persist once
    val corpus0 = track(corpus.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val spark = corpus0.sparkSession
    // deterministic bounded fit input (the kmeansMirrorable contract)
    val fitSample = corpus0.orderBy(col(cId)).limit(fitLimit)
    val centroids = kmeansMirrorable(fitSample, cId, cVec, 1, nCells, iters)(0)
    val bcCent = spark.sparkContext.broadcast(centroids)
    val assignUdf = udf { v: Seq[Double] =>
      val cs = bcCent.value
      var best = 0; var bd = Double.MaxValue; var i = 0
      while (i < cs.length) {
        var dist = 0.0; var j = 0; val c = cs(i)
        while (j < c.length) { val t = c(j) - v(j); dist += t * t; j += 1 }
        if (dist < bd) { bd = dist; best = i }
        i += 1
      }
      best
    }
    val idx = if (!residual) {
      val books = kmeansMirrorable(fitSample, cId, cVec, m, ksub, iters)
      val coded = pqEncode(
        corpus0.withColumn("cell", assignUdf(col(cVec))), cId, cVec, books,
        keep = Seq("cell"))
      IvfPqIndex(coded, books, centroids, cId)
    } else {
      val residUdf = udf { (v: Seq[Double], cell: Int) =>
        val c = bcCent.value(cell)
        Seq.tabulate(v.length)(j => v(j) - c(j))
      }
      val withRes = corpus0.withColumn("cell", assignUdf(col(cVec)))
        .withColumn("__resid", residUdf(col(cVec), col("cell")))
      // book fit on the fit sample's residuals only (same bound, same
      // determinism: the sample ids' cells/residuals are fixed by the
      // bounded coarse fit above)
      val books = kmeansMirrorable(
        withRes.orderBy(col(cId)).limit(fitLimit), cId, "__resid", m, ksub, iters)
      val coded = pqEncode(withRes, cId, "__resid", books, keep = Seq("cell"))
      IvfPqIndex(coded, books, centroids, cId, residual = true)
    }
    if (memoKey.isEmpty) idx
    else {
      // a memoized index serves many query batches: persist the compact
      // code relation so each search scans codes, not the build lineage
      val served = idx.copy(codes = track(idx.codes.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))
      indexMemo.put(memoKey, served)
      served
    }
  }

  def knnIvfPq(corpus: DataFrame, queries: DataFrame, cId: String, qId: String,
      cVec: String, qVec: String, nCells: Int, nProbe: Int,
      m: Int, ksub: Int, k: Int, maxIter: Int = 10): DataFrame =
    searchIvfPq(buildIvfPqIndex(corpus, cId, cVec, nCells, m, ksub, maxIter),
      queries, qId, qVec, nProbe, k)

  /** Search a built index: per-query probed cells + ADC LUTs are
    * driver-built and broadcast (bounded by the query-set contract,
    * same as knnPq/knnBruteForce); the scan side touches only the
    * probed cells' codes.
    */
  def searchIvfPq(index: IvfPqIndex, queries: DataFrame, qId: String,
      qVec: String, nProbe: Int, k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val books = index.codebooks
    val centroids = index.centroids
    val coded = index.codes
    val cId = index.idCol
    val m = books.length
    val ksub = books(0).length
    val dsub = books(0)(0).length
    val nCells = centroids.length
    // residual mode reconstructs x as c(cell) + r; the uniform scoring
    // below uses effective centroids = 0 in plain mode so one formula
    // covers both: ip = q.c + sum lut, |x|^2 = |c|^2 + 2 sum cross + sum n2
    val effCent: Array[Array[Double]] =
      if (index.residual) centroids
      else Array.fill(nCells)(new Array[Double](m * dsub))
    val norms2 = Array.tabulate(m, ksub) { (s, c) =>
      var n = 0.0; var j = 0
      while (j < dsub) { n += books(s)(c)(j) * books(s)(c)(j); j += 1 }
      n
    }
    val cNorm2 = effCent.map(c => c.map(x => x * x).sum)
    // cross[cell][s][e] = c(cell) restricted to subspace s, dot book[s][e]
    val cross = Array.tabulate(nCells, m, ksub) { (ci, s, e) =>
      var x = 0.0; var j = 0
      while (j < dsub) { x += effCent(ci)(s * dsub + j) * books(s)(e)(j); j += 1 }
      x
    }
    val qData = collectQueryBatch(queries, qId, qVec)
    val luts = qData.map { case (_, qv) =>
      Array.tabulate(m, ksub) { (s, c) =>
        var ip = 0.0; var j = 0
        while (j < dsub) { ip += qv(s * dsub + j) * books(s)(c)(j); j += 1 }
        ip
      }
    }
    // q . c(cell) for every (query, cell) - tiny matrix, driver-built
    val qDotC = qData.map { case (_, qv) =>
      effCent.map { c =>
        var ip = 0.0; var j = 0
        while (j < c.length) { ip += qv(j) * c(j); j += 1 }
        ip
      }
    }
    val qn2 = qData.map { case (_, qv) => qv.map(x => x * x).sum }
    // nProbe nearest cells per query by ROUNDED centroid cosine (ties:
    // lower cell) — the same 6-dp round Spark's `round` applies
    // (BigDecimal HALF_UP, never −0.0), so the probe ORDER is identical
    // to the oracle's `ROUND(...,6) + 0.0 DESC, cell`: an unrounded
    // Double sortBy would rank −0.0 below +0.0 where SQL ties them.
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val probes = qData.zipWithIndex.flatMap { case ((id, qv), qi) =>
      val sims = centroids.zipWithIndex.map { case (c, ci) =>
        var ip = 0.0; var cn = 0.0; var qn = 0.0; var j = 0
        while (j < c.length) { ip += c(j) * qv(j); cn += c(j) * c(j); qn += qv(j) * qv(j); j += 1 }
        (round6(if (cn == 0.0 || qn == 0.0) 0.0 else ip / math.sqrt(cn * qn)), ci)
      }
      sims.sortBy { case (sim, ci) => (-sim, ci) }.take(nProbe)
        .map { case (_, ci) => (id, qi, ci) }
    }.toSeq.toDF("query_id", "__qi", "cell")
    val bcLuts = spark.sparkContext.broadcast(luts)
    val bcN2 = spark.sparkContext.broadcast(norms2)
    val bcQn2 = spark.sparkContext.broadcast(qn2)
    val bcCross = spark.sparkContext.broadcast(cross)
    val bcCN2 = spark.sparkContext.broadcast(cNorm2)
    val bcQC = spark.sparkContext.broadcast(qDotC)
    val score = udf { (qi: Int, cell: Int, code: Seq[Int]) =>
      val lut = bcLuts.value(qi)
      val n2s = bcN2.value
      val cr = bcCross.value(cell)
      var ip = bcQC.value(qi)(cell)
      var n2 = bcCN2.value(cell)
      var s = 0
      while (s < m) {
        val c = code(s)
        ip += lut(s)(c); n2 += 2.0 * cr(s)(c) + n2s(s)(c)
        s += 1
      }
      val qq = bcQn2.value(qi)
      if (n2 <= 0.0 || qq == 0.0) 0.0 else ip / math.sqrt(n2 * qq)
    }
    val w = Window.partitionBy(col("query_id")).orderBy(col("pq_sim").desc, col("neighbor_id").asc)
    coded.select(col(cId).as("neighbor_id"), col("pq_code"), col("cell"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("pq_sim", round(score(col("__qi"), col("cell"), col("pq_code")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("pq_sim"), col("rank"))
  }
}
