package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),      // exact dup of 0
    (2L, "the quick brown fox leaps over the lazy dog"),      // near dup
    (3L, "completely different content about spark engines here")
  ).toDF("doc_id", "text")

  test("exactDedup keeps one row per digest, min id wins") {
    val out = Dedup.exactDedup(docs, "text", "doc_id")
    assert(out.count() == 3)
    assert(out.filter($"doc_id" === 1L).count() == 0)
  }

  test("exactDupGroups finds the duplicate pair") {
    val g = Dedup.exactDupGroups(docs, "text").collect()
    assert(g.length == 1 && g(0).getAs[Long]("n_docs") == 2 &&
      g(0).getAs[Long]("min_doc_id") == 0L)
  }

  test("minhash: identical docs share full signature; near-dups share some") {
    val k = 16 // k=16: the near-dup pair deterministically collides on 3 bands
    val sigs = docs.select(($"doc_id" +: Dedup.minhashSignature($"text", 3, k)): _*)
      .orderBy("doc_id").collect()
    val s0 = (1 to k).map(i => sigs(0).getString(i))
    val s1 = (1 to k).map(i => sigs(1).getString(i))
    val s2 = (1 to k).map(i => sigs(2).getString(i))
    val s3 = (1 to k).map(i => sigs(3).getString(i))
    assert(s0 == s1)
    assert(s0.zip(s2).count { case (a, b) => a == b } >= 2) // near-dup collides on some bands
    assert(s0.zip(s3).count { case (a, b) => a == b } == 0)
  }

  test("minhashCandidatePairs surfaces dup and near-dup pairs") {
    val pairs = Dedup.minhashCandidatePairs(docs, "text", "doc_id", 3, 16)
      .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("b×r banding: r>1 shrinks candidates on a corpus with common shingles," +
      " keeps exact dups") {
    // 12 docs sharing boilerplate shingles + one exact dup pair: width-1
    // banding (b=8, r=1) ORs whole-signature mins, so any shared rare
    // shingle can collide two docs; b=4×r=2 requires two simultaneous
    // matches per band.
    val boiler = (0 until 12).map { i =>
      (100L + i, s"shared legal disclaimer header for doc $i unique tail ${i * 37}")
    }
    val corpus = boiler ++ Seq(
      (200L, "identical duplicated body text content"),
      (201L, "identical duplicated body text content"))
    val df = corpus.toDF("doc_id", "text")
    val wide = Dedup.minhashCandidatePairs(df, "text", "doc_id", 3, 8).count()
    val banded = Dedup.minhashCandidatePairs(df, "text", "doc_id", 3, 4, 2)
    val bandedPairs = banded.as[(Long, Long)].collect().toSet
    assert(bandedPairs.contains((200L, 201L))) // exact dups always collide
    assert(bandedPairs.size < wide,
      s"b×r banding should shrink candidates: r=2 gave ${bandedPairs.size}, r=1 gave $wide")
    Dedup.clearCaches()
  }

  test("simhash: near-dups have small hamming distance, unrelated large") {
    val h = Dedup.withSimhash(docs, "text", "h").orderBy("doc_id")
      .select("h").as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0), h(1)) == 0)
    assert(ham(h(0), h(2)) < ham(h(0), h(3)))
  }

  test("ngramJaccard: 1 for identical, high for near-dup, low for unrelated") {
    val pairs = docs.toDF("doc_id", "text")
    val j01 = docs.as("a").join(docs.as("b"),
        col("a.doc_id") === 0L && col("b.doc_id") === 1L)
      .select(Dedup.ngramJaccard(col("a.text"), col("b.text"), 3).as("j"))
      .as[Double].head()
    val j02 = docs.as("a").join(docs.as("b"),
        col("a.doc_id") === 0L && col("b.doc_id") === 2L)
      .select(Dedup.ngramJaccard(col("a.text"), col("b.text"), 3).as("j"))
      .as[Double].head()
    val j03 = docs.as("a").join(docs.as("b"),
        col("a.doc_id") === 0L && col("b.doc_id") === 3L)
      .select(Dedup.ngramJaccard(col("a.text"), col("b.text"), 3).as("j"))
      .as[Double].head()
    assert(j01 == 1.0)
    assert(j02 > 0.3 && j02 < 1.0)
    assert(j03 == 0.0)
  }

  test("simhashNearDupPairs: identical texts at hamming 0; unrelated absent; recall = brute force") {
    val df = docs.toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(df, "text", "doc_id", maxDist = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // identical texts → hamming 0
    // chunk banding must find exactly the brute-force pair set (the
    // pigeonhole guarantee: hamming ≤ 3 over 4 chunks ⇒ a chunk matches)
    val hashed = Dedup.withSimhash(df, "text").select("doc_id", "simhash")
    val brute = hashed.toDF("a", "ha").crossJoin(hashed.toDF("b", "hb"))
      .filter($"a" < $"b")
      .filter(Dedup.hamming64($"ha", $"hb") <= 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == brute, s"banded=$pairs brute=$brute")
  }

  test("null-text docs never become candidate pairs (any r)") {
    val docs = Seq(
      (1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    for (r <- Seq(1, 2)) {
      val pairs = Dedup.minhashCandidatePairs(docs, "text", "doc_id", 3, 2, r)
        .as[(Long, Long)].collect().toSet
      Dedup.clearCaches()
      assert(pairs == Set((3L, 4L)),
        s"r=$r: null-sig docs must not pair, got $pairs")
    }
  }

  test("embeddingNearDupPairs: same-block high-cosine pairs only, a_id < b_id") {
    val vecs = Seq(
      (1L, 0, Seq(1.0, 0.0, 0.0)),   // block 0
      (2L, 0, Seq(0.999, 0.04, 0.0)), // ≈ vec 1 → near-dup pair (1,2)
      (3L, 0, Seq(0.0, 1.0, 0.0)),   // orthogonal — no pair
      (4L, 1, Seq(1.0, 0.0, 0.0)),   // identical to 1 but other block → excluded
      (5L, 1, Seq(1.0, 0.001, 0.0))  // ≈ vec 4 → pair (4,5)
    ).toDF("vec_id", "label", "v")
    val out = Dedup.embeddingNearDupPairs(vecs, "vec_id", "v", "label", 0.95)
      .orderBy("a_id", "b_id")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (4L, 5L)))
    val sims = Dedup.embeddingNearDupPairs(vecs, "vec_id", "v", "label", 0.95)
      .select("cos_sim").as[Double].collect()
    assert(sims.forall(s => s >= 0.95 && s <= 1.0))
  }

  test("normalizedExactDedup: reformatted copies collapse, distinct texts survive") {
    val docs = Seq(
      (1L, "The cat sat."),
      (2L, "the  cat   sat"),      // case + spacing + punctuation variant of 1
      (3L, "THE CAT SAT!?"),       // ditto
      (4L, "the cat stood."),      // genuinely different
      (5L, "  the cat sat  ")      // edge whitespace variant of 1
    ).toDF("doc_id", "text")
    val kept = Dedup.normalizedExactDedup(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L)) // lowest id per normalized key
    // byte-exact dedup keeps all 5 — the normalization is what collapses
    assert(Dedup.exactDedup(docs, "text", "doc_id").count() === 5L)
  }

  test("semanticDedup: keeps each cosine-cluster's minimum, transitively") {
    val vecs = Seq(
      // block 0: 1≈2≈6 form one TRANSITIVE cluster (1-2 and 2-6 edges);
      // 3 is orthogonal — its own cluster
      (1L, 0, Seq(1.0, 0.0, 0.0)),
      (2L, 0, Seq(0.999, 0.04, 0.0)),
      (6L, 0, Seq(0.995, 0.0798, 0.0)), // ≈2 (and ≈1 via 2)
      (3L, 0, Seq(0.0, 1.0, 0.0)),
      // block 1: pair 4≈5
      (4L, 1, Seq(1.0, 0.0, 0.0)),
      (5L, 1, Seq(1.0, 0.001, 0.0))
    ).toDF("vec_id", "label", "v")
    val kept = Dedup.semanticDedup(vecs, "vec_id", "v", "label", 0.995)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L))
  }

  test("blockLocalComponents ≡ star-contraction on block-local pair sets") {
    // random block-local graphs: edges only within a block, including
    // chains (transitivity) and multi-block id reuse patterns
    val rnd = new scala.util.Random(17L)
    val pairs = (0 until 6).flatMap { blk =>
      val ids = (0 until 12).map(i => (blk * 100 + i).toLong)
      (0 until 15).map { _ =>
        val a = ids(rnd.nextInt(ids.size)); val b = ids(rnd.nextInt(ids.size))
        (blk, math.min(a, b), math.max(a, b))
      }.filter { case (_, a, b) => a != b }
    }.toDF("blk", "doc_a", "doc_b")
    val fast = Dedup.blockLocalComponents(pairs, "blk")
      .as[(Long, Long)].collect().toSet
    val star = Dedup.connectedComponents(pairs.select("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toSet
    assert(fast == star)
  }

  test("substringDedup excises cross-doc duplicated runs, merges overlaps") {
    val corpus = Seq(
      (0L, "a b c d e f x y z"),              // shared 6-word run at 0..5
      (1L, "p q a b c d e f r"),              // same run at 2..7
      (2L, "m m m m m m m m"),                // intra-doc repeat: fully covered
      (3L, "totally unique words here nothing repeats at all"),
      (4L, "a b c d e f j k u v w zz yy a b c d e f"), // run twice: 2 spans
      (5L, "s1 s2 s3"), (6L, "s1 s2 s3")      // exact dups but < l words
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(corpus, "text", "doc_id", 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_words"), r.getAs[Int]("dup_span_words"),
          r.getAs[Int]("n_spans"), r.getAs[String]("clean_text")))).toMap
    assert(out(0L) == ((9, 6, 1, "x y z")))
    assert(out(1L) == ((9, 6, 1, "p q r")))
    assert(out(2L) == ((8, 8, 1, "")))        // overlapping marks merge to one span
    assert(out(3L) == ((8, 0, 0, "totally unique words here nothing repeats at all")))
    assert(out(4L) == ((19, 12, 2, "j k u v w zz yy")))
    assert(out(5L) == ((3, 0, 0, "s1 s2 s3"))) // below min match length: untouched
    assert(out(6L) == ((3, 0, 0, "s1 s2 s3")))
  }

  test("substringDedup: a corpus with no duplicated l-gram is untouched") {
    val corpus = Seq(
      (0L, "w0 w1 w2 w3 w4 w5 w6"),
      (1L, "v0 v1 v2 v3 v4 v5 v6")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(corpus, "text", "doc_id", 5)
      .orderBy("doc_id").collect()
    assert(out.forall(r => r.getAs[Int]("dup_span_words") == 0 &&
      r.getAs[Int]("n_spans") == 0))
    assert(out(0).getAs[String]("clean_text") == "w0 w1 w2 w3 w4 w5 w6")
  }
}
