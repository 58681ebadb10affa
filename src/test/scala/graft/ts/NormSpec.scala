package graft.ts

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class NormSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // z-scored sample (mean≈0, std≈1) vs denormalized (mean≈100, std≈10)
  private val normalized = (1 to 200).map(i => math.sin(i * 0.7) * 1.4).toDF("x")
  private val denormalized = (1 to 200).map(i => 100.0 + math.sin(i * 0.7) * 14).toDF("x")

  test("looksZNormalized distinguishes normalized from denormalized data") {
    assert(Norm.looksZNormalized(normalized, "x", 100.0, 10.0))
    assert(!Norm.looksZNormalized(denormalized, "x", 100.0, 10.0))
  }

  test("safeZDenorm applies once and then no-ops (double-denorm guard)") {
    val once = Norm.safeZDenorm(normalized, "x", 100.0, 10.0)
    val mean1 = once.agg(org.apache.spark.sql.functions.avg($"x")).head().getDouble(0)
    assert(math.abs(mean1 - 100.0) < 5.0)
    val twice = Norm.safeZDenorm(once, "x", 100.0, 10.0)
    val mean2 = twice.agg(org.apache.spark.sql.functions.avg($"x")).head().getDouble(0)
    assert(mean1 == mean2) // second application is a no-op
  }

  test("min-max guard: >=95% in range means already denormalized") {
    assert(Norm.looksMinMaxDenormalized(denormalized, "x", 80.0, 120.0))
    assert(!Norm.looksMinMaxDenormalized(normalized, "x", 80.0, 120.0))
    assert(Norm.fractionInRange(normalized, "x", -2.0, 2.0) == 1.0)
  }

  test("reconcileLengths truncates to the shortest frame, deterministically") {
    val a = (1 to 10).toDF("v")
    val b = (1 to 7).toDF("v")
    val rec = Norm.reconcileLengths(Seq(a, b), Seq("v"))
    assert(rec.map(_.count()).toSeq == Seq(7L, 7L))
    // ordered truncation keeps the FIRST 7 by the ordering
    assert(rec.head.orderBy("v").as[Int].collect().toSeq == (1 to 7))
  }
}
