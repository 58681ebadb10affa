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
