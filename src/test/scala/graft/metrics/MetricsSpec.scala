package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    (1.0, 1.5), (2.0, 2.0), (3.0, 2.5), (4.0, 4.5)
  ).toDF("target", "pred")

  test("mae") {
    val got = df.agg(Metrics.mae($"pred", $"target").as("m")).as[Double].head()
    assert(math.abs(got - 0.375) < 1e-12)
  }

  test("r2 matches sklearn formula") {
    // targets [1,2,3,4] mean 2.5, ssTot = 5; ssRes = .25*3 + 0 (pred 1.5,2,2.5,4.5)
    val got = df.agg(Metrics.r2($"pred", $"target").as("r")).as[Double].head()
    val ssRes = 0.25 + 0.0 + 0.25 + 0.25
    assert(math.abs(got - (1 - ssRes / 5.0)) < 1e-9)
  }

  test("perfect prediction r2 = 1, mae = 0") {
    val p = Seq((1.0, 1.0), (2.0, 2.0), (5.0, 5.0)).toDF("target", "pred")
    val r = p.agg(Metrics.r2($"pred", $"target").as("r"), Metrics.mae($"pred", $"target").as("m"))
      .as[(Double, Double)].head()
    assert(math.abs(r._1 - 1.0) < 1e-12 && r._2 == 0.0)
  }

  test("aggregateResults: stats per (split, metric, horizon), NaN filtered") {
    val rows = Seq(
      ("test", "mae", 1, 1.0), ("test", "mae", 1, 3.0),
      ("test", "mae", 1, Double.NaN), ("train", "mae", 1, 5.0)
    ).toDF("split", "metric", "horizon", "value")
    val out = Metrics.aggregateResults(rows, "split", "metric", "horizon", "value")
    val t = out.filter($"split" === "test").head()
    assert(t.getAs[Double]("avg_value") == 2.0)
    assert(t.getAs[Double]("std_dev") == 1.0)
    assert(t.getAs[Double]("min_value") == 1.0 && t.getAs[Double]("max_value") == 3.0)
    assert(out.count() == 2)
  }

  test("snr = mean(pred) / (mean|unc| + eps)") {
    val p = Seq((2.0, 0.5), (4.0, 1.5)).toDF("pred", "unc")
    val got = p.agg(Metrics.snr($"pred", $"unc").as("s")).as[Double].head()
    assert(math.abs(got - 3.0 / (1.0 + 1e-9)) < 1e-9)
  }
}
