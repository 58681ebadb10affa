package graft.decomp

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MtmRegroupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ref = i; groupA perfectly correlated, groupB anti-correlated weakly, noise
  private val df = (0 until 50).map { i =>
    val x = i.toDouble
    (x, x * 2 + 1, x * 2 + 3, math.sin(x * 1.3), x % 3, 99.0)
  }.toDF("ref", "a_mtm_1", "a_mtm_2", "b_mtm_1", "b_mtm_2", "plain")

  test("groupColumns: bases with k-sorted members; plain columns ignored") {
    val g = MtmRegroup.groupColumns(df.columns.toSeq)
    assert(g.keySet == Set("a", "b"))
    assert(g("a") == Seq("a_mtm_1", "a_mtm_2"))
  }

  test("groupCorrelations: one-pass scores, |corr| averaged per group") {
    val scores = MtmRegroup.groupCorrelations(df,
      MtmRegroup.groupColumns(df.columns.toSeq), "ref")
    assert(scores("a") > 0.99)
    assert(scores("b") < scores("a"))
  }

  test("reorderByCorrelation: stronger group first, non-MTM columns kept in front") {
    val out = MtmRegroup.reorderByCorrelation(df, df, "ref")
    assert(out.columns.toSeq ==
      Seq("ref", "plain", "a_mtm_1", "a_mtm_2", "b_mtm_1", "b_mtm_2"))
    // constant column 'plain' yields NaN corr → ignored, not crashed
    assert(out.count() == 50)
  }
}
