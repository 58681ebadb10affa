package graft.ts

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("backward as-of: latest right value at ts <= left ts, inclusive") {
    val left = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 20L, "c"), (2L, 7L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 15L, 200.0), (2L, 99L, 300.0))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "v", "asof_v")
      .orderBy("k", "ts")
      .select($"tag", $"asof_v").as[(String, Option[Double])].collect()
    assert(out.toSeq == Seq(
      ("a", Some(100.0)),  // equal ts is inclusive
      ("b", Some(100.0)),
      ("c", Some(200.0)),
      ("d", None)          // no right row at ts <= 7 for key 2
    ))
  }

  test("left row count preserved") {
    val left = (0 until 50).map(i => (i % 3L, i.toLong, i)).toSeq.toDF("k", "ts", "x")
    val right = Seq((0L, 10L, 1.0)).toDF("k", "ts", "v")
    assert(AsOfJoin.backward(left, right, Seq("k"), "ts", "v", "av").count() == 50)
  }
}
