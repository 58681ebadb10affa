package graft.olap

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class OlapEtlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val results = Seq(
    ("Train MAE H1", 0.1, 0.01, 0.09, 0.11),
    ("Validation Naive MAE H2", 0.2, 0.02, 0.18, 0.22),
    ("Test R2 H6", 0.99, 0.001, 0.989, 0.991),
    ("garbage row", 1.0, 0.0, 1.0, 1.0)
  ).toDF("Metric", "Average", "Std Dev", "Min", "Max")

  test("parseResults: regex split/metric/horizon, canonical keys, bad rows dropped") {
    val out = OlapEtl.parseResults(results).orderBy("split_key").collect()
    assert(out.length == 3)
    val test = out.find(_.getAs[String]("split_key") == "test").get
    assert(test.getAs[String]("metric_key") == "r2" && test.getAs[Int]("horizon_key") == 6)
    val valr = out.find(_.getAs[String]("split_key") == "validation").get
    assert(valr.getAs[String]("metric_key") == "naive_mae")
  }

  test("upsert: update wins on key collision, new keys appended, idempotent") {
    val existing = Seq(("e1", "train", "mae", 1, 0.5), ("e1", "test", "mae", 1, 0.6))
      .toDF("experiment_key", "split_key", "metric_key", "horizon_key", "avg_value")
    val updates = Seq(("e1", "train", "mae", 1, 0.4), ("e1", "train", "r2", 1, 0.9))
      .toDF("experiment_key", "split_key", "metric_key", "horizon_key", "avg_value")
    val keys = Seq("experiment_key", "split_key", "metric_key", "horizon_key")
    val merged = OlapEtl.upsert(Some(existing), updates, keys)
    assert(merged.count() == 3)
    val train = merged.filter($"split_key" === "train" && $"metric_key" === "mae").head()
    assert(train.getAs[Double]("avg_value") == 0.4) // update won
    val again = OlapEtl.upsert(Some(merged), updates, keys)
    assert(again.count() == 3) // idempotent
  }

  test("loadFactPerformance round-trips through parquet and re-upserts") {
    val path = Files.createTempDirectory("fact").toString + "/fact_performance"
    val first = OlapEtl.loadFactPerformance(spark, results, "exp1", path)
    assert(first.count() == 3)
    val second = OlapEtl.loadFactPerformance(spark, results, "exp1", path)
    assert(second.count() == 3) // same keys → still 3
    val other = OlapEtl.loadFactPerformance(spark, results, "exp2", path)
    assert(other.count() == 6) // new experiment appends
  }

  test("seeded dims and configKv flatten") {
    assert(OlapEtl.dimDatasetSplit(spark).count() == 3)
    assert(OlapEtl.dimHorizon(spark).count() == 6)
    assert(OlapEtl.dimMetric(spark).count() == 5)
    val exp = Seq(("e1", """{"window_size": "144", "batch_size": "128"}"""))
      .toDF("experiment_key", "config_json")
    val kv = OlapEtl.configKv(exp, "experiment_key", "config_json")
      .orderBy("conf_key").as[(String, String, String)].collect()
    assert(kv.toSeq == Seq(("e1", "batch_size", "128"), ("e1", "window_size", "144")))
  }
}
