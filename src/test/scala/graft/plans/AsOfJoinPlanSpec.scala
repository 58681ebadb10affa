package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ts.AsOfJoin

class AsOfJoinPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native exec matches the hand-written case") {
    val left = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 20L, "c"), (2L, 7L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 15L, 200.0), (2L, 99L, 300.0))
      .toDF("k", "ts", "v")
    val out = AsOfJoinNative.backward(left, right, "k", "ts", "v", "asof_v")
      .orderBy("k", "ts")
      .select($"tag", $"asof_v").as[(String, Option[Double])].collect().toSeq
    assert(out == Seq(
      ("a", Some(100.0)), ("b", Some(100.0)), ("c", Some(200.0)), ("d", None)))
  }

  test("native exec ≡ composable union+window spelling on random data") {
    val rnd = new scala.util.Random(11)
    val left = (0 until 500).map(_ =>
      (rnd.nextInt(7).toLong, rnd.nextInt(10000).toLong, rnd.nextInt(100)))
      .toDF("k", "ts", "x")
      .dropDuplicates("k", "ts")
    val right = (0 until 300).map(_ =>
      (rnd.nextInt(7).toLong, rnd.nextInt(10000).toLong, rnd.nextDouble()))
      .toDF("k", "ts", "v")
      .dropDuplicates("k", "ts") // unique (k, ts) ⇒ both spellings deterministic
    val native = AsOfJoinNative.backward(left, right, "k", "ts", "v", "av")
      .select("k", "ts", "x", "av")
    val composed = AsOfJoin.backward(left, right, Seq("k"), "ts", "v", "av")
      .select("k", "ts", "x", "av")
    assert(native.count() == left.count())
    // compare sorted collects — exceptAll over two spellings sharing the
    // same deduplicated inputs trips a pre-existing Spark 4.1.2 optimizer
    // bug (dangling attribute from RewriteExceptAll + Deduplicate; it
    // reproduces with two COMPOSABLE spellings and no custom node at all)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k", "ts").collect().map(_.toSeq).toSeq
    assert(rows(native) == rows(composed))
  }

  test("NULL right payloads: newer NULL overwrites; native ≡ composable") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"))
      .toDF("k", "ts", "tag")
    // ts=5 non-null, ts=15 NULL payload, ts=25 non-null again
    val right = Seq((1L, 5L, Some(100.0)), (1L, 15L, None), (1L, 25L, Some(300.0)))
      .toDF("k", "ts", "v")
    val expected = Seq(
      ("a", Some(100.0)), // latest at ts=10 is the 5/100.0 row
      ("b", None),        // ts=15 NULL-payload row is the match — NOT stale 100.0
      ("c", Some(300.0)))
    val native = AsOfJoinNative.backward(left, right, "k", "ts", "v", "av")
      .orderBy("ts").select($"tag", $"av").as[(String, Option[Double])].collect().toSeq
    val composed = AsOfJoin.backward(left, right, Seq("k"), "ts", "v", "av")
      .orderBy("ts").select($"tag", $"av").as[(String, Option[Double])].collect().toSeq
    assert(native == expected)
    assert(composed == expected)
  }

  test("equal-(key,ts) right ties: largest non-null payload wins, all-null gives NULL") {
    val left = Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 10L, Some(7.0)), (1L, 10L, None), (1L, 10L, Some(9.0)), // mixed tie
      (2L, 10L, None), (2L, 10L, None))                            // all-null tie
      .toDF("k", "ts", "v")
    val expected = Seq(("a", Some(9.0)), ("b", None))
    val native = AsOfJoinNative.backward(left, right, "k", "ts", "v", "av")
      .orderBy("k").select($"tag", $"av").as[(String, Option[Double])].collect().toSeq
    val composed = AsOfJoin.backward(left, right, Seq("k"), "ts", "v", "av")
      .orderBy("k").select($"tag", $"av").as[(String, Option[Double])].collect().toSeq
    assert(native == expected)
    assert(composed == expected)
  }

  test("plan shape: one exchange + sort per side, no union/window") {
    val left = Seq((1L, 5L, 1.0)).toDF("k", "ts", "x")
    val right = Seq((1L, 5L, 100.0)).toDF("k", "ts", "v")
    val df = AsOfJoinNative.backward(left, right, "k", "ts", "v", "av")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(!plan.contains("Window") && !plan.contains("Union"))
  }

  test("works on real event data against the composable spelling") {
    val ev = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id".as("k"), unix_micros($"ts").as("ts"), $"value",
        $"event_type")
    val purchases = ev.filter($"event_type" === "purchase").select("k", "ts", "value")
    val errors = ev.filter($"event_type" === "error")
      .select($"k", $"ts", $"value".as("v"))
    val native = AsOfJoinNative.backward(purchases, errors, "k", "ts", "v", "last_err")
    val composed = AsOfJoin.backward(purchases, errors, Seq("k"), "ts", "v", "last_err")
      .select(native.columns.map(col): _*)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k", "ts").collect().map(_.toSeq).toSeq
    assert(rows(native) == rows(composed))
  }
}
