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

  test("deepConfigKv flattens nested configs that configKv leaves opaque") {
    val nested = """{"model":{"learning_rate":0.001,"opt":{"sched":"cosine"}},"horizons":[1,2,3]}"""
    val exp = Seq(("e1", nested)).toDF("experiment_key", "config_json")
    // One-level MapType cast stops at top-level keys — nested objects
    // stay as opaque JSON blobs, unreachable by path…
    val shallow = OlapEtl.configKv(exp, "experiment_key", "config_json")
      .as[(String, String, String)].collect().map { case (_, k, v) => k -> v }.toMap
    assert(shallow.keySet == Set("model", "horizons"))
    assert(shallow("model").contains("learning_rate")) // raw blob, not a leaf
    // …the recursive flatten reaches every leaf.
    val kv = OlapEtl.deepConfigKv(exp, "experiment_key", "config_json")
      .orderBy("conf_path").as[(String, String, String)].collect().toSeq
    assert(kv == Seq(
      ("e1", "horizons", "[1,2,3]"),
      ("e1", "model.learning_rate", "0.001"),
      ("e1", "model.opt.sched", "cosine")))
  }

  test("meltPredictions: S7 wide shape → fact_predictions grain, uncertainties joined") {
    val ts1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    val wide = Seq(
      (ts1, 100.0, 101.0, 100.5, 103.0, 102.0),
      (ts2, 101.0, 102.0, 101.5, 104.0, 103.5)
    ).toDF("DATE_TIME", "test_CLOSE", "Target_H1", "Prediction_H1", "Target_H6", "Prediction_H6")
    val unc = Seq((ts1, 0.1, 0.6), (ts2, 0.2, 0.7))
      .toDF("DATE_TIME", "Uncertainty_H1", "Uncertainty_H6")
    val melted = OlapEtl.meltPredictions(wide, Some(unc), "exp1")
    assert(melted.count() == 4) // 2 ts × 2 horizons
    assert(melted.columns.toSeq == Seq("experiment_key", "horizon_key", "ts",
      "test_close", "target_value", "prediction_value", "uncertainty"))
    val h6 = melted.filter($"horizon_key" === 6 && $"ts" === ts1).head()
    assert(h6.getAs[Double]("target_value") == 103.0)
    assert(h6.getAs[Double]("prediction_value") == 102.0)
    assert(h6.getAs[Double]("uncertainty") == 0.6)
    // no uncertainties frame → NULL uncertainty, same grain
    val bare = OlapEtl.meltPredictions(wide, None, "exp1")
    assert(bare.count() == 4 && bare.filter($"uncertainty".isNull).count() == 4)
  }

  test("loadFactPredictions upserts on (experiment, horizon, ts) through snapshots") {
    val path = Files.createTempDirectory("factp").toString + "/fact_predictions"
    val ts1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val wide = Seq((ts1, 100.0, 101.0, 100.5))
      .toDF("DATE_TIME", "test_CLOSE", "Target_H1", "Prediction_H1")
    assert(OlapEtl.loadFactPredictions(spark, wide, None, "exp1", path).count() == 1)
    // same key re-load: prediction revised, no duplicate row
    val wide2 = Seq((ts1, 100.0, 101.0, 100.9))
      .toDF("DATE_TIME", "test_CLOSE", "Target_H1", "Prediction_H1")
    val after = OlapEtl.loadFactPredictions(spark, wide2, None, "exp1", path)
    assert(after.count() == 1)
    assert(after.head().getAs[Double]("prediction_value") == 100.9)
    // second experiment appends
    assert(OlapEtl.loadFactPredictions(spark, wide, None, "exp2", path).count() == 2)
  }

  test("tradeMetrics: fact_trade_metrics columns from a trades relation") {
    val trades = Seq(
      (20.0, 3.0), (-10.0, 12.0), (20.0, 5.0), (-10.0, 11.0)
    ).toDF("profit", "maxDrawdown")
    val m = OlapEtl.tradeMetrics(trades, "exp1", Some(1)).head()
    assert(m.getAs[String]("experiment_key") == "exp1")
    assert(m.getAs[Int]("horizon_key") == 1)
    assert(m.getAs[Double]("total_profit") == 20.0)
    assert(m.getAs[Double]("max_drawdown") == 12.0)
    assert(m.getAs[Double]("win_rate") == 0.5)
    assert(m.getAs[Double]("avg_trade_return") == 5.0)
    assert(m.getAs[Int]("trades_count") == 4)
    // sharpe = mean/stddev_pop = 5/15; sortino = mean/rms(downside) = 5/sqrt(50)
    assert(math.abs(m.getAs[Double]("sharpe") - 5.0 / 15.0) < 1e-12)
    assert(math.abs(m.getAs[Double]("sortino") - 5.0 / math.sqrt(50.0)) < 1e-12)
    // degenerate: all-equal profits → sharpe NULL, not Infinity
    val flat = OlapEtl.tradeMetrics(
      Seq((1.0, 0.0), (1.0, 0.0)).toDF("profit", "maxDrawdown"), "e", None).head()
    assert(flat.isNullAt(flat.fieldIndex("sharpe")))
    assert(flat.isNullAt(flat.fieldIndex("horizon_key")))
  }

  test("loadFactTradeMetrics upserts on (experiment, horizon) through snapshots") {
    val path = Files.createTempDirectory("factt").toString + "/fact_trade_metrics"
    val t1 = Seq((20.0, 3.0), (-10.0, 12.0)).toDF("profit", "maxDrawdown")
    assert(OlapEtl.loadFactTradeMetrics(spark, t1, "exp1", Some(1), path).count() == 1)
    val revised = OlapEtl.loadFactTradeMetrics(spark,
      t1.union(Seq((5.0, 1.0)).toDF("profit", "maxDrawdown")), "exp1", Some(1), path)
    assert(revised.count() == 1) // same key → replaced
    assert(revised.head().getAs[Int]("trades_count") == 3)
    assert(OlapEtl.loadFactTradeMetrics(spark, t1, "exp1", Some(6), path).count() == 2)
  }

  test("experimentMetrics pivots the five DDL metrics to the wide fact grain") {
    val res = Seq(
      ("Train MAE H1", 0.10, 0.0, 0.0, 0.0),
      ("Train Naive MAE H1", 0.20, 0.0, 0.0, 0.0),
      ("Train R2 H1", 0.90, 0.0, 0.0, 0.0),
      ("Train Uncertainty H1", 0.05, 0.0, 0.0, 0.0),
      ("Train SNR H1", 12.0, 0.0, 0.0, 0.0),
      ("Test MAE H6", 0.30, 0.0, 0.0, 0.0)
    ).toDF("Metric", "Average", "Std Dev", "Min", "Max")
    val wide = OlapEtl.experimentMetrics(res, "e1")
    assert(wide.columns.toSeq == Seq("experiment_key", "split_key",
      "horizon_key", "mae", "r2", "uncertainty", "snr", "naive_error"))
    assert(wide.count() == 2)
    val tr = wide.filter($"split_key" === "train").head()
    assert(tr.getAs[Double]("mae") == 0.10 && tr.getAs[Double]("naive_error") == 0.20)
    assert(tr.getAs[Double]("r2") == 0.90 && tr.getAs[Double]("snr") == 12.0)
    val te = wide.filter($"split_key" === "test").head()
    assert(te.getAs[Double]("mae") == 0.30)
    assert(te.isNullAt(te.fieldIndex("r2"))) // unreported metric → NULL
  }

  test("loadFactExperimentMetrics + loadFactStrategyParams upsert through snapshots") {
    val base = Files.createTempDirectory("factx").toString
    val res = Seq(("Train MAE H1", 0.10, 0.0, 0.0, 0.0))
      .toDF("Metric", "Average", "Std Dev", "Min", "Max")
    val fm = base + "/fact_experiment_metrics"
    assert(OlapEtl.loadFactExperimentMetrics(spark, res, "e1", fm).count() == 1)
    val res2 = Seq(("Train MAE H1", 0.15, 0.0, 0.0, 0.0))
      .toDF("Metric", "Average", "Std Dev", "Min", "Max")
    val after = OlapEtl.loadFactExperimentMetrics(spark, res2, "e1", fm)
    assert(after.count() == 1 && after.head().getAs[Double]("mae") == 0.15)
    assert(OlapEtl.loadFactExperimentMetrics(spark, res, "e2", fm).count() == 2)
    val fs = base + "/fact_strategy_params"
    val p1 = OlapEtl.loadFactStrategyParams(spark, "e1", "heuristic", "1h",
      """{"tp":20,"sl":10}""", fs)
    assert(p1.count() == 1)
    // params queryable through the JSONB flatten path like experiment configs
    val kv = OlapEtl.configKv(p1, "experiment_key", "params")
      .orderBy("conf_key").as[(String, String, String)].collect().toSeq
    assert(kv == Seq(("e1", "sl", "10"), ("e1", "tp", "20")))
    val p2 = OlapEtl.loadFactStrategyParams(spark, "e1", "heuristic", "4h",
      """{"tp":25}""", fs)
    assert(p2.count() == 1 && p2.head().getAs[String]("freq") == "4h") // replaced
    assert(OlapEtl.loadFactStrategyParams(spark, "e1", "ma_cross", "1h",
      "{}", fs).count() == 2) // new strategy appends
  }

  test("dimExperiment extracts typed config fields; missing/bad fields → NULL") {
    val cfg =
      """{"window_size":144,"batch_size":128,"learning_rate":0.0005,
        |"use_stl":true,"use_returns":false,"activation":"gelu",
        |"predictor_plugin":"tcn","predicted_horizons":[1,3,6],
        |"epochs":"not_a_number"}""".stripMargin.replace("\n", "")
    val exp = Seq(("e1", "p1", "phase1", cfg)).toDF("ek", "pk", "phk", "cfg")
    val dim = OlapEtl.dimExperiment(exp, "ek", "pk", "phk", "cfg")
    val row = dim.head()
    assert(row.getAs[String]("experiment_key") == "e1")
    assert(row.getAs[Int]("window_size") == 144)
    assert(row.getAs[Int]("batch_size") == 128)
    assert(row.getAs[Double]("learning_rate") == 0.0005)
    assert(row.getAs[Boolean]("use_stl") && !row.getAs[Boolean]("use_returns"))
    assert(row.getAs[String]("activation") == "gelu")
    assert(row.getAs[String]("predictor_plugin") == "tcn")
    assert(row.getAs[String]("predicted_horizons") == "[1,3,6]")
    assert(row.isNullAt(row.fieldIndex("epochs")))        // malformed → NULL
    assert(row.isNullAt(row.fieldIndex("mc_samples")))    // absent → NULL
    assert(row.getAs[String]("config_json") == cfg)       // full config kept
    assert(dim.columns.length == 4 + 13 + 5 + 6 + 5 + 1)  // keys+cfg+typed fields
    // upsert on experiment_key keeps the newest version (S9 contract)
    val v2 = OlapEtl.dimExperiment(
      Seq(("e1", "p1", "phase2", """{"window_size":288}"""))
        .toDF("ek", "pk", "phk", "cfg"), "ek", "pk", "phk", "cfg")
    val merged = OlapEtl.upsert(Some(dim), v2, Seq("experiment_key"))
    assert(merged.count() == 1)
    assert(merged.head().getAs[Int]("window_size") == 288)
  }
}
