package graft.target

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ts.TS

/** SURVEY §2.4 W6–W9 target construction: direct, return, block and
  * daily faces, all sharing the reference's `len − max(horizon)` trim
  * (`default_target.py:63-70`).
  */
class TargetsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val w = TS.seriesWindow(Seq("sid"), Seq("t"))

  private def series(n: Int, sid: Long = 1L) =
    (0 until n).map(i => (sid, i.toLong, i.toDouble * 10)).toDF("sid", "t", "v")

  test("W6 multiHorizon: lead values per horizon, max-horizon trim") {
    val out = Targets.multiHorizon(series(10), "v", Seq(1, 3), w)
      .orderBy("t").collect()
    assert(out.length === 7) // n - maxH
    val first = out.head
    assert(first.getAs[Double]("target_h1") === 10.0) // v at t=1
    assert(first.getAs[Double]("target_h3") === 30.0) // v at t=3
    val last = out.last // t = 6; targets at 7 and 9 both exist
    assert(last.getAs[Double]("target_h3") === 90.0)
  }

  test("W6 trims per series independently") {
    val df = series(6).union(series(4, sid = 2L))
    val out = Targets.multiHorizon(df, "v", Seq(2), w)
    assert(out.filter($"sid" === 1L).count() === 4)
    assert(out.filter($"sid" === 2L).count() === 2)
  }

  test("W7 multiHorizonReturns: value[t+h] - value[t], trim on the lead") {
    val out = Targets.multiHorizonReturns(series(8), "v", Seq(1, 2), w)
      .orderBy("t").collect()
    assert(out.length === 6)
    assert(out.forall(r => r.getAs[Double]("ret_h1") === 10.0))
    assert(out.forall(r => r.getAs[Double]("ret_h2") === 20.0))
  }

  test("W7 trim follows the lead's nullness (q13 oracle semantics)") {
    // v NULL at t=1: the trim column lead(v,1) is NULL at t=0, so t=0 is
    // dropped exactly as the oracle's `WHERE lead IS NOT NULL` drops it;
    // t=1 survives (its lead exists) with a NULL return
    val df = Seq((1L, 0L, Some(0.0)), (1L, 1L, None: Option[Double]),
      (1L, 2L, Some(20.0)), (1L, 3L, Some(30.0))).toDF("sid", "t", "v")
    val out = Targets.multiHorizonReturns(df, "v", Seq(1), w).orderBy("t").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L))
    assert(out(0).isNullAt(out(0).fieldIndex("ret_h1")))
    assert(out(1).getAs[Double]("ret_h1") === 10.0)
  }

  test("W8 multiStepBlock: one array of steps t+1..t+h, complete rows only") {
    val out = Targets.multiStepBlock(series(6), "v", 3, w).orderBy("t").collect()
    assert(out.length === 3)
    assert(out.head.getAs[Seq[Double]]("target_block") === Seq(10.0, 20.0, 30.0))
    assert(out.last.getAs[Seq[Double]]("target_block") === Seq(30.0, 40.0, 50.0))
  }

  test("W9 dailySteps: step d at t + d*stepsPerDay") {
    val out = Targets.dailySteps(series(50), "v", days = 2, w, stepsPerDay = 24)
      .orderBy("t").collect()
    assert(out.length === 2) // rows t=0,1 have t+48 in range
    assert(out.head.getAs[Double]("target_d1") === 240.0) // v at t=24
    assert(out.head.getAs[Double]("target_d2") === 480.0) // v at t=48
  }

  test("W6/W7 reject non-positive horizons") {
    intercept[IllegalArgumentException] {
      Targets.multiHorizon(series(5), "v", Seq(0), w)
    }
    intercept[IllegalArgumentException] {
      Targets.multiHorizonReturns(series(5), "v", Seq.empty, w)
    }
  }
}
