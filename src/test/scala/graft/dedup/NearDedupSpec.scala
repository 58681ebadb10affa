package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class NearDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog today"),          // longer
    (1L, "the quick brown fox jumps over the lazy dog"),                // near-dup, shorter → loses
    (2L, "the quick brown fox jumps over the lazy dog"),                // exact dup of 1 (same len) → higher id loses
    (3L, "completely unrelated text about distributed query engines ok")
  ).toDF("doc_id", "text")

  test("nearDedup: shorter near-dups and equal-length higher ids are dropped") {
    val surv = Dedup.nearDedup(docs, "text", "doc_id", 3, 8, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(surv.contains(0L)) // longest survives
    assert(surv.contains(3L)) // unrelated survives
    assert(!surv.contains(2L)) // exact dup of 1, same length, higher id loses
    // doc 1: loses to 0 only if jaccard(0,1) >= 0.5; either way the rule is deterministic
    val again = Dedup.nearDedup(docs, "text", "doc_id", 3, 8, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(surv == again)
  }

  test("dedupPipeline: exact-first composition keeps the same survivors") {
    // corpus with BOTH kinds of redundancy: exact-copy groups (the
    // quadratic-pair hazard the composition exists for) and a near-dup
    val mixed = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox jumps over the lazy dog"),   // near-dup of 0, shorter
      (2L, "the quick brown fox jumps over the lazy dog"),   // exact copy of 1
      (3L, "the quick brown fox jumps over the lazy dog"),   // exact copy of 1
      (4L, "completely unrelated text about distributed query engines ok"),
      (5L, "completely unrelated text about distributed query engines ok") // exact copy of 4
    ).toDF("doc_id", "text")
    val surv = Dedup.dedupPipeline(mixed, "text", "doc_id", 3, 2, 2, 0.5)
      .select("doc_id").as[Long].collect().toSet
    // exact groups keep min id; the near-dup group keeps the longer text
    assert(surv == Set(0L, 4L), s"got $surv")
    // composition result equals running nearDedup alone on this corpus
    val direct = Dedup.nearDedup(mixed, "text", "doc_id", 3, 2, 2, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(surv == direct)
  }

  test("threshold 1.01 disables near-dedup except nothing (no pair reaches it)") {
    val surv = Dedup.nearDedup(docs, "text", "doc_id", 3, 8, 1.01)
    assert(surv.count() == 4)
  }
}
