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

  test("hashSample == the window-reference sample, at 1/4/32 partitions") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{row_number, md5}
    val df = (1L to 5000L).map(i => (s"g${i % 7}", i)).toDF("g", "id")
    // the oracle formulation: full shuffle + row_number (what the
    // aggregator must reproduce exactly, id tie-break included)
    val w = Window.partitionBy($"g")
      .orderBy(md5($"id".cast("string")), $"id")
    val expect = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"g", $"rn".cast("long"), $"id").as[(String, Long, Long)]
      .collect().toSeq.sorted
    for (parts <- Seq(1, 4, 32)) {
      val got = Splits.hashSample(df.repartition(parts), Seq("g"), "id", 5)
        .as[(String, Long, Long)].collect().toSeq.sorted
      assert(got == expect, s"parts=$parts")
    }
  }

  test("HashTopKAgg kernel: mergeable, duplicate-tolerant, k-capped") {
    val agg = new Splits.HashTopKAgg(3)
    def prio(i: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val rows = (1L to 200L).map(i => (prio(i), i))
    // sequential fold == split-fold-merge, any split point
    val whole = rows.foldLeft(agg.zero)(agg.reduce)
    for (cut <- Seq(1, 50, 199)) {
      val (l, r) = rows.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == agg.finish(whole), s"cut=$cut")
    }
    assert(agg.finish(whole).size == 3)
    // reference: smallest 3 priorities
    assert(agg.finish(whole) == rows.sortBy(r => (r._1, r._2)).take(3).map(_._2))
    // SET semantics: duplicate rows are one candidate — folding the
    // doubled multiset (or merging a buffer with itself) changes
    // nothing, which is what makes the streaming face idempotent under
    // at-least-once re-delivery
    assert(agg.finish((rows ++ rows).foldLeft(agg.zero)(agg.reduce)) ==
      agg.finish(whole))
    assert(agg.finish(agg.merge(whole, whole)) == agg.finish(whole))
    // fewer rows than k: all kept
    val tiny = rows.take(2).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(tiny).size == 2)
  }

  test("hashSample: null ids dropped, hostile column names survive") {
    // null identities are not sampleable (documented contract); group
    // columns named after the generator outputs must not collide
    val df = Seq(("col", Some(1L)), ("col", None), ("pos", Some(2L)),
        ("pos", Some(3L)), ("pos", None))
      .toDF("col", "id")
    val byCol = Splits.hashSample(df, Seq("col"), "id", 5)
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(byCol.map(_._1).count(_ == "col") == 1) // the null id dropped
    assert(byCol.map(_._1).count(_ == "pos") == 2)
    assert(byCol.forall(_._2 >= 1))
    // a group with ONLY null ids vanishes
    val allNull = Seq(("g", None: Option[Long])).toDF("g", "id")
    assert(Splits.hashSample(allNull, Seq("g"), "id", 3).count() == 0)
  }
}
