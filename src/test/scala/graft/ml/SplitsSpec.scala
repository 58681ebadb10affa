package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SplitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val df = (1 to 2000).map(i => (i.toLong, i * 1.5)).toDF("id", "v")

  test("hash split: deterministic, disjoint, exhaustive, ~80/10/10") {
    val splits = Splits.split(df, "id", 80, 10)
    val n = splits.view.mapValues(_.count()).toMap
    assert(n.values.sum == 2000)
    assert(n("train") > 1400 && n("train") < 1800)       // ~1600
    assert(n("validation") > 100 && n("validation") < 320)
    // deterministic: same assignment on re-evaluation
    val a = splits("test").select("id").as[Long].collect().toSet
    val b = Splits.split(df, "id", 80, 10)("test").select("id").as[Long].collect().toSet
    assert(a == b)
    // disjoint
    val train = splits("train").select("id").as[Long].collect().toSet
    assert(train.intersect(a).isEmpty)
  }

  test("sessionId: gaps above the threshold start new sessions") {
    import graft.ts.TS
    val rows = Seq( // user 1: gaps 10, 5000, 10 with threshold 1000
      (1L, 0L), (1L, 10L), (1L, 5010L), (1L, 5020L), (2L, 0L)
    ).toDF("uid", "aus")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"uid").orderBy($"aus")
    val out = rows.withColumn("sid", TS.sessionId($"aus", w, 1000L))
      .orderBy("uid", "aus").select("uid", "sid").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L)))
  }

  test("direction penalty and first-diff loss metrics") {
    import graft.metrics.Metrics
    val d = Seq((1.0, -1.0), (2.0, 2.0), (-3.0, 3.0), (0.5, 0.1))
      .toDF("pd", "td")
    val pen = d.agg(Metrics.directionPenalty($"pd", $"td")).head().getDouble(0)
    assert(pen == 0.5) // 2 of 4 disagree in sign
    val l = Seq((1.0, 1.5, 0.2, 0.4)).toDF("p", "t", "pd", "td")
      .agg(Metrics.firstDiffLoss($"p", $"t", $"pd", $"td", 2.0)).head().getDouble(0)
    assert(math.abs(l - (0.5 + 2.0 * 0.2)) < 1e-12)
  }
}
