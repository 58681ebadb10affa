package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chains collapse to the min id even when pairs only touch neighbors") {
    // 1-2, 2-3, 3-4 (a chain) + isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(cc == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("100-node chain converges in O(log n) star rounds, not O(n)") {
    // worst shape for label propagation: a pure path 0-1-2-…-99 (every doc
    // a near-dup of its predecessor, as in a serial crawl). Min-label
    // needed ~n rounds; alternating large/small star halves the diameter
    // per round → ⌈log₂ 100⌉ ≈ 7, +1 no-change round to prove stability.
    val pairs = (0 until 99).map(i => (i.toLong, (i + 1).toLong)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs)
    val cc = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 100)
    (0 to 99).foreach(i => assert(cc(i.toLong) == 0L, s"node $i"))
    assert(rounds <= 8, s"expected <= log2(100)+1 rounds, took $rounds")
  }

  test("reversed ids: chain rooted at its minimum regardless of edge order") {
    val pairs = (99 to 1 by -1).map(i => (i.toLong, (i - 1).toLong)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs)
    val cc = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 to 99).foreach(i => assert(cc(i.toLong) == 0L))
    assert(rounds <= 8)
  }

  test("empty pair list yields empty labels without iterating") {
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs)
    assert(labels.count() == 0 && rounds == 0)
  }

  test("two clusters stay separate; larger cluster converges") {
    val pairs = (
      (0 until 8).map(i => (i.toLong, (i + 1).toLong)) ++    // 0..8 chain
        Seq((100L, 101L), (101L, 102L))
    ).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 to 8).foreach(i => assert(cc(i.toLong) == 0L))
    Seq(100L, 101L, 102L).foreach(i => assert(cc(i) == 100L))
  }
}
