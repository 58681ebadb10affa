package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The hint-driven range-join rewrite: correctness vs the naive
  * nested-loop plan, the plan transformation itself, the flipped
  * condition spellings, and the advisory-hint fallback guarantee.
  */
class RangeJoinRuleSpec extends AnyFunSuite {
  lazy val base = TestSpark.spark
  lazy val s = org.apache.spark.sql.GraftColumnBridge.sessionWithExtensions(
    base.sparkContext, new graft.GraftSparkExtensions()(_))

  private def pts = {
    import s.implicits._
    val rnd = new scala.util.Random(3)
    (1 to 200).map(i => (i.toLong, rnd.nextInt(100).toLong)).toDF("pid", "p")
  }
  private def ivs = {
    import s.implicits._
    val rnd = new scala.util.Random(4)
    (1 to 40).map { i =>
      val st = rnd.nextInt(95).toLong
      (i.toLong, st, st + 1 + rnd.nextInt(12))
    }.toDF("iid", "st", "en")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("hinted non-equi join is rewritten to a bucketed equi-join, same rows") {
    val naive = pts.join(ivs, col("p") >= col("st") && col("p") < col("en"))
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"),
      s"baseline should be the nested loop:\n$naivePlan")
    val hinted = pts.hint("range_join", 8L)
      .join(ivs, col("p") >= col("st") && col("p") < col("en"))
    val plan = hinted.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"hint did not rewrite:\n$plan")
    assert(plan.contains("__rj_"), s"expected bucket attributes in:\n$plan")
    assert(rows(hinted) === rows(naive))
  }

  test("flipped spellings rewrite too") {
    val naive = pts.join(ivs, col("p") >= col("st") && col("p") < col("en"))
    val flipped = pts.hint("range_join", 4L)
      .join(ivs, col("st") <= col("p") && col("en") > col("p"))
    val plan = flipped.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"flipped form not rewritten:\n$plan")
    assert(rows(flipped) === rows(naive))
  }

  test("advisory fallback: unsupported shapes keep their semantics") {
    import s.implicits._
    // equality condition — not a range; the tag must strip cleanly
    val eq = pts.hint("range_join", 8L).join(ivs, col("p") === col("st"))
    val naiveEq = pts.join(ivs, col("p") === col("st"))
    assert(rows(eq) === rows(naiveEq))
    // point expression on BOTH sides — unsupported, falls back
    val both = pts.hint("range_join", 8L)
      .join(ivs, col("p") + col("st") >= col("st") && col("p") < col("en"))
    val naiveBoth = pts.join(ivs, col("p") + col("st") >= col("st") && col("p") < col("en"))
    assert(rows(both) === rows(naiveBoth))
    // outer join — v1 leaves it alone
    val outer = pts.hint("range_join", 8L)
      .join(ivs, col("p") >= col("st") && col("p") < col("en"), "left")
    assert(outer.count() >= 200) // every point survives a left join
  }

  test("non-integral coordinates fall back to the plain join") {
    import s.implicits._
    // end=5.5 with width 1: a bucketed rewrite would explode intervals
    // only up to fdiv(end-1)=4, dropping the qualifying point 5.2 in
    // bucket 5 — so the rule must refuse double coordinates entirely.
    val dp = Seq((1L, 5.2), (2L, 4.0), (3L, 5.6)).toDF("pid", "p")
    val div = Seq((1L, 5.0, 5.5), (2L, 0.0, 4.5)).toDF("iid", "st", "en")
    val hinted = dp.hint("range_join", 1L)
      .join(div, col("p") >= col("st") && col("p") < col("en"))
    val plan = hinted.queryExecution.executedPlan.toString
    assert(!plan.contains("__rj_"), s"double coordinates must not rewrite:\n$plan")
    val naive = dp.join(div, col("p") >= col("st") && col("p") < col("en"))
    assert(rows(hinted) === rows(naive))
    assert(rows(hinted).contains((1L, 1L)), "point 5.2 must match [5.0, 5.5)")
  }

  test("empty and inverted intervals match nothing through the rewrite") {
    import s.implicits._
    val p1 = Seq((1L, 10L), (2L, 19L), (3L, 20L)).toDF("pid", "p")
    val iv = Seq((1L, 10L, 20L), (2L, 15L, 15L), (3L, 30L, 20L)).toDF("iid", "st", "en")
    val out = p1.hint("range_join", 7L)
      .join(iv, col("p") >= col("st") && col("p") < col("en"))
    assert(rows(out) === Seq((1L, 1L), (2L, 1L)))
  }
}
