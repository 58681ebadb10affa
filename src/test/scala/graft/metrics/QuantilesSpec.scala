package graft.metrics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two groups with known distributions: uniform 0..9999 and a skewed one
  private lazy val df = {
    val uniform = (0 until 10000).map(i => ("u", i.toDouble))
    val skewed = (0 until 10000).map(i => ("s", math.pow(i.toDouble / 100, 2)))
    (uniform ++ skewed).toDF("g", "v")
  }

  test("quantile labels are decimal-exact and collision-free") {
    // r2 ADVICE: p${(p*100).round} collapsed 0.995 and 1.0 onto "p100"
    assert(Quantiles.label(0.5) == "p50")
    assert(Quantiles.label(0.9) == "p90") // no 90.00000000000001 artifact
    assert(Quantiles.label(0.995) == "p99_5")
    assert(Quantiles.label(1.0) == "p100")
    assert(Quantiles.label(0.5512) == "p55_12")
    val out = Quantiles.groupedExact(df, Seq("g"), "v", Seq(0.995, 1.0))
    assert(out.columns.toSeq == Seq("g", "p99_5", "p100"))
    out.select("g", "p99_5", "p100").collect() // by-name select works
  }

  test("approx quantiles stay within the sketch's rank-error bound of exact") {
    val ps = Seq(0.5, 0.9, 0.99)
    val accuracy = 10000
    val ex = Quantiles.groupedExact(df, Seq("g"), "v", ps)
      .collect().map(r => r.getString(0) -> r).toMap
    val ap = Quantiles.groupedApprox(df, Seq("g"), "v", ps, accuracy)
      .collect().map(r => r.getString(0) -> r).toMap
    // rank error ≤ n/accuracy = 1 rank here; allow 2 ranks of slack.
    // In value space one rank ≈ the local inter-point gap.
    for (g <- Seq("u", "s"); (p, idx) <- ps.zipWithIndex) {
      val e = ex(g).getDouble(idx + 1)
      val a = ap(g).getDouble(idx + 1)
      val rankGap = if (g == "u") 1.0 else math.abs(
        math.pow((p * 10000 + 2) / 100, 2) - math.pow(p * 10000 / 100, 2))
      assert(math.abs(a - e) <= 2 * rankGap + 1e-9,
        s"group $g p$p: approx=$a exact=$e allowed=${2 * rankGap}")
    }
  }

  test("approx path is an aggregate with partial merge (no per-group buffering of rows)") {
    // plan-shape check: approx_percentile appears as partial+final aggregate
    val plan = Quantiles.groupedApprox(df, Seq("g"), "v", Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("approx_percentile"))
    assert(plan.contains("partial_approx_percentile") || plan.contains("Partial"),
      s"expected partial aggregation in plan:\n$plan")
  }
}
