package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0, 0.0, 0.0)),
    (1L, Seq(0.9, 0.1, 0.0)),   // close to 0
    (2L, Seq(0.0, 1.0, 0.0)),   // orthogonal to 0
    (3L, Seq(-1.0, 0.0, 0.0))   // opposite of 0
  ).toDF("vec_id", "v")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val self = vecs.as("a").join(vecs.as("b"), col("a.vec_id") === col("b.vec_id"))
      .select(Similarity.cosine(col("a.v"), col("b.v")).as("c")).as[Double].collect()
    assert(self.forall(c => math.abs(c - 1.0) < 1e-12))
    def cos(i: Long, j: Long) = vecs.as("a").join(vecs.as("b"),
        col("a.vec_id") === i && col("b.vec_id") === j)
      .select(Similarity.cosine(col("a.v"), col("b.v")).as("c")).as[Double].head()
    assert(math.abs(cos(0, 2)) < 1e-12)
    assert(math.abs(cos(0, 3) + 1.0) < 1e-12)
  }

  test("knnBruteForce: nearest neighbor of 0 is 1") {
    val q = vecs.filter($"vec_id" === 0L).select($"vec_id".as("qid"), $"v".as("qv"))
    val out = Similarity.knnBruteForce(q, vecs, "qid", "vec_id", "qv", "v", 2).collect()
    assert(out.length == 2)
    assert(out.find(_.getAs[Int]("rank") == 1).get.getAs[Long]("neighbor_id") == 1L)
  }

  test("knnIvf: high recall vs brute force on clustered vectors") {
    // two tight clusters far apart; nearest neighbors stay in-cluster
    val rnd = new scala.util.Random(7)
    val data = (0 until 40).map { i =>
      val base = if (i < 20) Seq(10.0, 0.0, 0.0) else Seq(0.0, 10.0, 0.0)
      (i.toLong, base.map(_ + rnd.nextGaussian() * 0.1))
    }.toDF("vec_id", "v")
    val ivf = Similarity.knnIvf(data, "vec_id", "v", nCells = 2, nProbe = 1, k = 3)
    assert(ivf.filter($"rank" === 1).count() == 40) // every vector got neighbors
    // neighbors come from the same cluster
    val cross = ivf.filter(($"query_id" < 20) =!= ($"neighbor_id" < 20)).count()
    assert(cross == 0)
    // top-1 matches brute force for a sample query
    val q0 = data.filter($"vec_id" === 0L).select($"vec_id".as("qid"), $"v".as("qv"))
    val bf = Similarity.knnBruteForce(q0, data, "qid", "vec_id", "qv", "v", 1)
      .select("neighbor_id").as[Long].head()
    val iv = ivf.filter($"query_id" === 0L && $"rank" === 1)
      .select("neighbor_id").as[Long].head()
    assert(bf == iv)
  }

  test("knnIvfMirrorable: probing all cells equals brute force (6-dp rounded)") {
    val rnd = new scala.util.Random(13)
    val data = (0 until 60).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian()))).toDF("vec_id", "v")
    val ivf = Similarity.knnIvfMirrorable(data, "vec_id", "v",
        nCells = 4, nProbe = 4, k = 3, iters = 2)
      .select($"query_id", $"neighbor_id", round($"cos_sim", 6).as("s"), $"rank")
      .orderBy("query_id", "rank").collect().toSeq
    val bf = Similarity.knnBruteForce(
        data.select($"vec_id".as("qid"), $"v".as("qv")), data,
        "qid", "vec_id", "qv", "v", 3)
      .select($"query_id", $"neighbor_id", round($"cos_sim", 6).as("s"), $"rank")
      .orderBy("query_id", "rank").collect().toSeq
    assert(ivf == bf) // nProbe = nCells prunes nothing ⇒ identical ranking
  }

  test("knnIvfMirrorable: pruned probe keeps in-cluster neighbors") {
    val rnd = new scala.util.Random(7)
    val data = (0 until 40).map { i =>
      val base = if (i < 20) Seq(10.0, 0.0, 0.0) else Seq(0.0, 10.0, 0.0)
      (i.toLong, base.map(_ + rnd.nextGaussian() * 0.1))
    }.toDF("vec_id", "v")
    val ivf = Similarity.knnIvfMirrorable(data, "vec_id", "v",
      nCells = 2, nProbe = 1, k = 3, iters = 2)
    assert(ivf.filter($"rank" === 1).count() == 40)
    assert(ivf.filter(($"query_id" < 20) =!= ($"neighbor_id" < 20)).count() == 0)
  }

  test("native lsh_bucket is bit-identical to the composable spelling") {
    val rnd = new scala.util.Random(11)
    val data = (0 until 200).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian()))).toDF("vec_id", "v")
    val rows = data.select(
      Similarity.lshBucket($"v", 8, 16).as("native"),
      Similarity.lshBucketComposable($"v", 8, 16).as("composable")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"bucket mismatch: native=${r.getLong(0)} composable=${r.getLong(1)}"))
  }

  test("lsh_bucket hazard semantics: mismatched dim nulls, null element zeroes, float ok") {
    // dim mismatch → NULL bucket (drops from the equi-join) — the native
    // fix for the zip_with null-padding collapse-to-0 hazard
    val bad = Seq((0L, Seq(1.0, 2.0))).toDF("vec_id", "v")
      .select(Similarity.lshBucket($"v", 4, 3).as("b")).collect()
    assert(bad.head.isNullAt(0))
    // composable reference on the same mismatch: the documented collapse to 0
    val badC = Seq((0L, Seq(1.0, 2.0))).toDF("vec_id", "v")
      .select(Similarity.lshBucketComposable($"v", 4, 3).as("b")).collect()
    assert(badC.head.getLong(0) == 0L)
    // a null ELEMENT nulls every projection → bucket 0 in both spellings
    val withNull = Seq((0L, Seq[java.lang.Double](1.0, null, 2.0))).toDF("vec_id", "v")
    assert(withNull.select(Similarity.lshBucket($"v", 4, 3).as("b"))
      .collect().head.getLong(0) == 0L)
    assert(withNull.select(Similarity.lshBucketComposable($"v", 4, 3).as("b"))
      .collect().head.getLong(0) == 0L)
    // float vectors widen exactly like the composable cast
    val f = Seq((0L, Seq(1.0f, -2.0f, 0.5f))).toDF("vec_id", "v")
    val both = f.select(Similarity.lshBucket($"v", 4, 3).as("n"),
      Similarity.lshBucketComposable($"v", 4, 3).as("c")).collect().head
    assert(both.getLong(0) == both.getLong(1))
  }

  test("quantizeInt8: components in [-127,127], dequant error <= scale/2, recall kept") {
    val rnd = new scala.util.Random(3)
    val data = (0 until 60).map { i =>
      val base = if (i < 30) Seq(5.0, 0.0, 0.0, 0.0) else Seq(0.0, 5.0, 0.0, 0.0)
      (i.toLong, base.map(_ + rnd.nextGaussian() * 0.3))
    }.toDF("vec_id", "v")
    val q = Similarity.quantizeInt8(data, "vec_id", "v").cache()
    try {
      val rows = q.join(data, "vec_id").collect()
      rows.foreach { r =>
        val scale = r.getAs[Double]("scale")
        val qv = r.getSeq[Int](r.fieldIndex("qvec"))
        val v = r.getSeq[Double](r.fieldIndex("v"))
        assert(qv.forall(x => x >= -127 && x <= 127))
        // max-magnitude component must use the full int8 range
        assert(qv.map(math.abs).max == 127)
        v.zip(qv).foreach { case (x, qi) =>
          assert(math.abs(x - qi * scale) <= scale / 2 + 1e-12,
            s"dequant error beyond scale/2: x=$x q=$qi scale=$scale")
        }
      }
      // cosine top-1 on DEQUANTIZED vectors matches full precision (the
      // clusters are far apart relative to the quantization noise)
      val deq = q.select(col("vec_id"),
        transform(col("qvec"), x => x * col("scale")).as("v"))
      val q0full = data.filter($"vec_id" === 0L).select($"vec_id".as("qid"), $"v".as("qv"))
      val q0deq = deq.filter($"vec_id" === 0L).select($"vec_id".as("qid"), $"v".as("qv"))
      val bfFull = Similarity.knnBruteForce(q0full, data, "qid", "vec_id", "qv", "v", 1)
        .select("neighbor_id").as[Long].head()
      val bfDeq = Similarity.knnBruteForce(q0deq, deq, "qid", "vec_id", "qv", "v", 1)
        .select("neighbor_id").as[Long].head()
      assert(bfFull == bfDeq, s"quantization changed top-1: full=$bfFull deq=$bfDeq")
    } finally { q.unpersist(); () }
  }

  test("lshBucket: identical vectors share buckets, opposite vectors differ") {
    val b = vecs.select($"vec_id", Similarity.lshBucket($"v", 8, 3).as("b"))
      .orderBy("vec_id").as[(Long, Long)].collect().map(_._2)
    val bAgain = vecs.select(Similarity.lshBucket($"v", 8, 3).as("b"))
      .orderBy("b").as[Long].collect()
    assert(b(0) != b(3))                       // opposite signs on every plane
    assert(b.toSet.size >= 2)                  // buckets actually discriminate
    // deterministic across evaluations
    val b2 = vecs.select($"vec_id", Similarity.lshBucket($"v", 8, 3).as("b"))
      .orderBy("vec_id").as[(Long, Long)].collect().map(_._2)
    assert(b.toSeq == b2.toSeq)
  }

  test("PQ lossless case: quantization-exact codes reproduce brute-force ranking") {
    // every subvector drawn from <= ksub distinct patterns => Lloyd's
    // recovers them exactly => reconstruction is lossless and knnPq's
    // cosine equals the true cosine bit-for-bit (both round to 6 dp)
    val patterns = Vector(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(3.0, 4.0), Seq(-1.0, 2.0))
    val rnd = new scala.util.Random(5)
    val data = (0 until 60).map { i =>
      (i.toLong, patterns(rnd.nextInt(4)) ++ patterns(rnd.nextInt(4)) ++ patterns(rnd.nextInt(4)))
    }.toDF("vec_id", "v")
    val books = Similarity.pqTrain(data, "vec_id", "v", m = 3, ksub = 4, maxIter = 20)
    val codes = Similarity.pqEncode(data, "vec_id", "v", books)
    assert(codes.select(size($"pq_code")).distinct().as[Int].head() === 3)
    val queries = data.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"v".as("qv"))
    val pq = Similarity.knnPq(queries, codes, "qid", "vec_id", "qv", books, k = 5)
      .select("query_id", "neighbor_id", "pq_sim", "rank")
    val bf = Similarity.knnBruteForce(queries, data, "qid", "vec_id", "qv", "v", 5)
      .select($"query_id", $"neighbor_id", round($"cos_sim", 6).as("cos_sim"), $"rank")
    val pqRows = pq.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    val bfRows = bf.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    assert(pqRows === bfRows)
  }

  test("kmeansMirrorable: deterministic, recovers clusters, keeps empty-cluster seeds") {
    val rnd = new scala.util.Random(13)
    val centers = Vector(Seq(10.0, 0.0), Seq(0.0, 10.0), Seq(-10.0, -10.0))
    val df = (0 until 90).map { i =>
      (i.toLong, centers(i % 3).map(_ + rnd.nextGaussian() * 0.3))
    }.toDF("id", "v")
    val b1 = Similarity.kmeansMirrorable(df, "id", "v", m = 1, k = 3, iters = 2)(0)
    val b2 = Similarity.kmeansMirrorable(df, "id", "v", m = 1, k = 3, iters = 2)(0)
    // bit-identical across runs — the whole point of the mirrorable fit
    assert(b1.map(_.toSeq).toSeq === b2.map(_.toSeq).toSeq)
    // every true cluster mean is near some centroid
    centers.foreach { c =>
      val d = b1.map(ct => math.hypot(ct(0) - c(0), ct(1) - c(1))).min
      assert(d < 1.0, s"no centroid near $c (min dist $d)")
    }
    // k > distinct clusters: seeds of never-assigned centroids survive
    val tiny = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0)), (3L, Seq(100.0, 100.0)))
      .toDF("id", "v")
    val b3 = Similarity.kmeansMirrorable(tiny, "id", "v", m = 1, k = 3, iters = 2)(0)
    assert(b3.length === 3) // centroid 1 (seeded from id=2) kept, not dropped
    // subspace split agrees with two independent 1-subspace fits
    val b4 = Similarity.kmeansMirrorable(df, "id", "v", m = 2, k = 3, iters = 2)
    assert(b4.length === 2 && b4(0)(0).length === 1)
  }

  test("build-once memo: cached fits/indexes are reused, clearCaches drops them") {
    val rnd = new scala.util.Random(29)
    val df = (0 until 64).map(i => (i.toLong, Seq.fill(4)(rnd.nextGaussian())))
      .toDF("id", "v")
    val a = Similarity.kmeansMirrorable(df, "id", "v", m = 1, k = 4, iters = 1,
      cacheKey = "memo-spec-a")
    val b = Similarity.kmeansMirrorable(df, "id", "v", m = 1, k = 4, iters = 1,
      cacheKey = "memo-spec-a")
    assert(a eq b, "same key must return the memoized array, not a refit")
    val idx1 = Similarity.buildIvfPqIndexMirrorable(df, "id", "v",
      nCells = 4, m = 2, ksub = 4, iters = 1, cacheKey = "memo-spec-idx")
    val idx2 = Similarity.buildIvfPqIndexMirrorable(df, "id", "v",
      nCells = 4, m = 2, ksub = 4, iters = 1, cacheKey = "memo-spec-idx")
    assert(idx1 eq idx2, "same key must return the memoized index")
    Similarity.clearCaches()
    val c = Similarity.kmeansMirrorable(df, "id", "v", m = 1, k = 4, iters = 1,
      cacheKey = "memo-spec-a")
    assert(!(a eq c), "clearCaches must drop the memo")
    // and the refit is bit-identical — memoization can never change results
    assert(a.map(_.map(_.toSeq).toSeq).toSeq === c.map(_.map(_.toSeq).toSeq).toSeq)
    Similarity.clearCaches()
  }

  test("PQ search rejects a query batch over the driver-memory bound") {
    // per-query LUTs are driver-built and broadcast: the batch size is a
    // hard contract, and misuse must fail loudly, not OOM the driver
    val data = (0 until 20).map(i => (i.toLong, Seq(i.toDouble, 1.0)))
      .toDF("vec_id", "v")
    val books = Similarity.pqTrain(data, "vec_id", "v", m = 1, ksub = 4, maxIter = 5)
    val codes = Similarity.pqEncode(data, "vec_id", "v", books)
    val queries = data.select($"vec_id".as("qid"), $"v".as("qv"))
    val saved = Similarity.maxQueryBatch
    try {
      Similarity.maxQueryBatch = 10
      val e = intercept[IllegalArgumentException] {
        Similarity.knnPq(queries, codes, "qid", "vec_id", "qv", books, k = 3)
      }
      assert(e.getMessage.contains("maxQueryBatch"))
      Similarity.maxQueryBatch = 20 // exactly at the bound: fine
      assert(Similarity.knnPq(queries, codes, "qid", "vec_id", "qv", books, k = 3)
        .count() > 0)
    } finally Similarity.maxQueryBatch = saved
  }

  test("PQ recall on clustered vectors; codes compress the corpus") {
    val rnd = new scala.util.Random(9)
    val centers = Vector(Seq(10.0, 0.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0, 0.0),
      Seq(0.0, 0.0, 10.0, 0.0))
    val data = (0 until 90).map { i =>
      (i.toLong, centers(i % 3).map(_ + rnd.nextGaussian() * 0.2))
    }.toDF("vec_id", "v")
    val books = Similarity.pqTrain(data, "vec_id", "v", m = 2, ksub = 8, maxIter = 15)
    val codes = Similarity.pqEncode(data, "vec_id", "v", books)
    val queries = data.filter($"vec_id" < 6).select($"vec_id".as("qid"), $"v".as("qv"))
    val pq = Similarity.knnPq(queries, codes, "qid", "vec_id", "qv", books, k = 5)
    // PQ's contract is COARSE retrieval: quantization collapses tight
    // clusters onto few codes, so fine intra-cluster ordering is lost
    // (ties, id-order) — but every retrieved neighbor must come from the
    // query's own cluster, and every query must get a full k
    val rows = pq.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === 6 * 5)
    assert(rows.forall { case (q, n) => q % 3 === n % 3 },
      s"cross-cluster neighbor: ${rows.filterNot { case (q, n) => q % 3 == n % 3 }.toSeq}")
  }

  test("IVF-PQ: nProbe=nCells equals flat PQ; pruned probes stay in-cluster") {
    val rnd = new scala.util.Random(21)
    val centers = Vector(Seq(10.0, 0.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0, 0.0),
      Seq(0.0, 0.0, 10.0, 0.0))
    val data = (0 until 90).map { i =>
      (i.toLong, centers(i % 3).map(_ + rnd.nextGaussian() * 0.2))
    }.toDF("vec_id", "v")
    val queries = data.filter($"vec_id" < 6).select($"vec_id".as("qid"), $"v".as("qv"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    // graceful degradation: probing every cell == the flat PQ scan
    val books = Similarity.pqTrain(data, "vec_id", "v", m = 2, ksub = 8, maxIter = 15)
    val flat = Similarity.knnPq(queries,
      Similarity.pqEncode(data, "vec_id", "v", books), "qid", "vec_id", "qv", books, k = 5)
    val full = Similarity.knnIvfPq(data, queries, "vec_id", "qid", "v", "qv",
      nCells = 3, nProbe = 3, m = 2, ksub = 8, k = 5, maxIter = 15)
    assert(rows(full) === rows(flat))
    // pruned: one probed cell still returns full k, all in-cluster
    val pruned = Similarity.knnIvfPq(data, queries, "vec_id", "qid", "v", "qv",
      nCells = 3, nProbe = 1, m = 2, ksub = 8, k = 5, maxIter = 15)
    val pr = pruned.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pr.length === 6 * 5)
    assert(pr.forall { case (q, n) => q % 3 === n % 3 })
  }

  test("residual IVF-PQ: reconstruction error below plain PQ; search works") {
    // clusters far from the origin with small spread: plain PQ books
    // must span the whole space, residual books only the within-cell
    // spread — reconstruction error drops sharply
    val rnd = new scala.util.Random(33)
    val centers = Vector(Seq(20.0, 0.0, 5.0, -10.0), Seq(0.0, 20.0, -5.0, 10.0),
      Seq(-20.0, -20.0, 0.0, 0.0))
    val data = (0 until 90).map { i =>
      (i.toLong, centers(i % 3).map(_ + rnd.nextGaussian() * 0.5))
    }.toDF("vec_id", "v")
    def mse(idx: Similarity.IvfPqIndex): Double = {
      val books = idx.codebooks
      val dsub = books(0)(0).length
      val truth = data.collect().map(r =>
        r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val rows = idx.codes.collect()
      rows.map { r =>
        val id = r.getLong(r.fieldIndex("vec_id"))
        val cell = r.getInt(r.fieldIndex("cell"))
        val code = r.getSeq[Int](r.fieldIndex("pq_code"))
        val base = if (idx.residual) idx.centroids(cell)
          else new Array[Double](books.length * dsub)
        val recon = Array.tabulate(books.length * dsub)(j =>
          base(j) + books(j / dsub)(code(j / dsub))(j % dsub))
        truth(id).zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum / rows.length
    }
    val plain = Similarity.buildIvfPqIndex(data, "vec_id", "v",
      nCells = 3, m = 2, ksub = 4, maxIter = 15)
    val resid = Similarity.buildIvfPqIndex(data, "vec_id", "v",
      nCells = 3, m = 2, ksub = 4, maxIter = 15, residual = true)
    val (eP, eR) = (mse(plain), mse(resid))
    assert(eR < eP / 2, s"residual MSE $eR not well below plain $eP")
    // residual search returns full k, in-cluster
    val queries = data.filter($"vec_id" < 6).select($"vec_id".as("qid"), $"v".as("qv"))
    val out = Similarity.searchIvfPq(resid, queries, "qid", "qv", nProbe = 1, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 6 * 5)
    assert(out.forall { case (q, n) => q % 3 === n % 3 })
  }

  test("appendToIvfPqIndex: appended codes equal a full re-encode under frozen fits") {
    val rnd = new scala.util.Random(57)
    val centers = Vector(Seq(20.0, 0.0, 5.0, -10.0), Seq(0.0, 20.0, -5.0, 10.0),
      Seq(-20.0, -20.0, 0.0, 0.0))
    val all = (0 until 120).map { i =>
      (i.toLong, centers(i % 3).map(_ + rnd.nextGaussian() * 0.5))
    }.toDF("vec_id", "v")
    for (residual <- Seq(false, true)) {
      val base = all.filter($"vec_id" < 90)
      val increment = all.filter($"vec_id" >= 90)
      val idx = Similarity.buildIvfPqIndex(base, "vec_id", "v",
        nCells = 3, m = 2, ksub = 4, maxIter = 15, residual = residual)
      val appended = Similarity.appendToIvfPqIndex(idx, increment, "v")
      // the appended rows' (cell, code) must be exactly what encoding the
      // full corpus under the SAME frozen fits produces — append is a
      // pure encode, never a refit
      def codeMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(r.fieldIndex("vec_id")) ->
          (r.getInt(r.fieldIndex("cell")), r.getSeq[Int](r.fieldIndex("pq_code")).toSeq)).toMap
      val fromAppend = codeMap(appended.codes)
      assert(fromAppend.keySet === (0L until 120L).toSet)
      assert(codeMap(idx.codes) === fromAppend.view.filterKeys(_ < 90).toMap)
      // fits are untouched by construction of copy(); searches over the
      // appended index retrieve the new vectors in-cluster (k must
      // exceed the per-cluster population: quantization collapses tight
      // clusters onto identical codes and the id tie-break favors old
      // ids — the coarse-retrieval contract, same as the PQ recall test)
      val queries = increment.limit(3).select($"vec_id".as("qid"), $"v".as("qv"))
      val out = Similarity.searchIvfPq(appended, queries, "qid", "qv", nProbe = 1, k = 45)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(out.nonEmpty)
      assert(out.forall { case (q, n) => q % 3 === n % 3 })
      assert(out.exists { case (_, n) => n >= 90 },
        "appended vectors never retrieved")
    }
  }

  test("clusterBalance: weights cap over-represented clusters, keep is the md5 uniform") {
    // two tight semantic regions of very different mass + a singleton:
    // the big region must be down-weighted to ~cap expected survivors
    val rnd = new java.util.Random(7L)
    def around(c: Seq[Double], n: Int, base: Long) =
      (0 until n).map(i => (base + i,
        c.map(x => x + rnd.nextGaussian() * 0.01)))
    val rows = around(Seq(10.0, 0.0, 0.0), 60, 0L) ++   // big cluster
      around(Seq(0.0, 10.0, 0.0), 8, 1000L) ++          // small cluster
      Seq((2000L, Seq(0.0, 0.0, 10.0)))                 // singleton
    val df = rows.toDF("vec_id", "v")
    val out = Similarity.clusterBalanceMirrorable(df, "vec_id", "v",
      nCells = 3, cap = 10.0, iters = 2, fitLimit = 1024).cache()
    try {
      assert(out.count() == rows.size) // every vector weighted exactly once
      val byN = out.select("cluster_n", "keep_weight").distinct().collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      // clusters at-or-under cap keep everything; the big one caps to 10/n
      byN.foreach { case (n, w) =>
        if (n <= 10) assert(w == 1.0, s"n=$n w=$w")
        else assert(math.abs(w - BigDecimal(10.0 / n).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12, s"n=$n w=$w")
      }
      // the keep decision is the deterministic md5 uniform: recompute it
      val kept = out.collect().map { r =>
        val id = r.getAs[Long]("vec_id")
        val u = java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString)
            .substring(0, 8), 16) / 4294967296.0
        (u < r.getAs[Double]("keep_weight")) == r.getAs[Boolean]("keep")
      }
      assert(kept.forall(identity))
      // weight-1 clusters keep every member
      val smallKept = out.filter($"cluster_n" <= 10)
        .select("keep").as[Boolean].collect()
      assert(smallKept.forall(identity))
    } finally { out.unpersist(); () }
  }
}
