package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ts.TS

class LossMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("huberLoss: quadratic inside delta, linear outside") {
    val df = Seq((0.0, 0.5), (0.0, 3.0)).toDF("target", "pred") // errors .5, 3
    val got = df.agg(Metrics.huberLoss($"pred", $"target", 1.0)).head().getDouble(0)
    // (.5*.25 + 1*(3-.5)) / 2
    assert(math.abs(got - (0.125 + 2.5) / 2) < 1e-12)
  }

  test("pearsonStructural: 0 for perfect prediction, grows with decorrelation") {
    val perfect = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("target", "pred")
    val p = perfect.agg(Metrics.pearsonStructural($"pred", $"target", 0.5)).head().getDouble(0)
    assert(math.abs(p) < 1e-9)
    val anti = Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("target", "pred")
    val a = anti.agg(Metrics.pearsonStructural($"pred", $"target", 0.5)).head().getDouble(0)
    assert(a > 1.0) // MAE 4/3 + 0.5·(1−(−1)) = 4/3 + 1
  }

  test("positionalEncoding: shape and PE(0) = [0,1,0,1,...]") {
    val pe = TS.positionalEncoding(spark, maxLen = 16, dModel = 8)
    assert(pe.count() == 16)
    val r0 = pe.filter($"pos" === 0L).select("encoding").as[Seq[Double]].head()
    assert(r0.length == 8)
    r0.zipWithIndex.foreach { case (v, j) =>
      assert(v == (if (j % 2 == 0) 0.0 else 1.0))
    }
  }
}
