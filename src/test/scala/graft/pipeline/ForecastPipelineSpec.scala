package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ForecastPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic synthetic normalized series: CLOSE_norm walks ±0.1. */
  private def writeSplit(n: Int, start: Double): String = {
    val f = Files.createTempFile("slice", ".csv")
    val rows = (0 until n).map { i =>
      val ts = f"2020-01-01 ${i / 60}%02d:${i % 60}%02d:00"
      val v = start + (if (i % 2 == 0) 0.1 else -0.1) * (i % 5)
      s"$ts,$v"
    }
    Files.writeString(f, "DATE_TIME,CLOSE\n" + rows.mkString("\n") + "\n")
    f.toString
  }

  test("naive slice end-to-end: results table with the reference's shape") {
    val cfg = ForecastPipeline.Config(
      splits = Map("train" -> writeSplit(120, 0.0), "test" -> writeSplit(80, 1.0)),
      targetColumn = "CLOSE",
      horizons = Seq(1, 3),
      normStats = Map("CLOSE" -> (1.2, 0.5)))
    val out = Files.createTempDirectory("res").toString + "/results"
    val results = ForecastPipeline.run(spark, cfg, Some(out))
    assert(results.columns.toSeq == Seq("Metric", "Average", "Std Dev", "Min", "Max"))
    // 2 splits × 3 metrics × 2 horizons
    assert(results.count() == 12)
    val metrics = results.select("Metric").as[String].collect().toSet
    assert(metrics.contains("Train MAE H1") && metrics.contains("Test Naive MAE H3")
      && metrics.contains("Train R2 H1"))
    // naive model: MAE == Naive MAE (prediction IS the baseline)
    val mae = results.filter($"Metric" === "Train MAE H1").select("Average").as[Double].head()
    val nmae = results.filter($"Metric" === "Train Naive MAE H1").select("Average").as[Double].head()
    assert(mae == nmae && mae > 0.0)
    // denormalization scales returns by std: recompute by hand for h=1
    // series alternates, |ret_h1| pattern deterministic — just sanity-check scale
    assert(mae < 1.0) // normalized steps ≤0.8 × std 0.5 → denorm |ret| ≤ 0.4
    // CSV sink exists
    val csv = spark.read.option("header", "true").csv(out)
    assert(csv.count() == 12)
  }

  test("modelMetrics end-to-end: linear and GBT heads beat naive on a trending series") {
    // trending series with structure a linear-on-lags model captures
    def writeTrend(n: Int, phase: Double): String = {
      val f = Files.createTempFile("trend", ".csv")
      val rows = (0 until n).map { i =>
        val ts = f"2020-01-01 ${i / 60}%02d:${i % 60}%02d:00"
        val v = 0.02 * i + math.sin(i * 0.3 + phase)
        s"$ts,$v"
      }
      Files.writeString(f, "DATE_TIME,CLOSE\n" + rows.mkString("\n") + "\n")
      f.toString
    }
    val cfg = ForecastPipeline.Config(
      splits = Map("train" -> writeTrend(300, 0.0), "test" -> writeTrend(120, 0.5)),
      targetColumn = "CLOSE", horizons = Seq(1, 3))
    val modelDir = Files.createTempDirectory("heads").toString
    val rows = ForecastPipeline.modelMetrics(spark, cfg, nLags = 3,
      head = "linear", modelDir = Some(modelDir))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    // 2 splits × 3 metrics × 2 horizons
    assert(rows.length == 12)
    def v(split: String, metric: String, h: Int) =
      rows.find(r => r._1 == split && r._2 == metric && r._3 == h).get._4
    // the fitted model must beat the naive last-value forecast out of sample
    assert(v("test", "MAE", 1) < v("test", "Naive MAE", 1))
    assert(v("test", "MAE", 3) < v("test", "Naive MAE", 3))
    assert(v("test", "R2", 1) > 0.9)
    // S11: saved per-horizon artifacts reload
    val m1 = org.apache.spark.ml.regression.LinearRegressionModel.load(s"$modelDir/h1")
    assert(m1.coefficients.size == 4)
    // GBT head runs the same contract
    val gbt = ForecastPipeline.modelMetrics(spark, cfg, nLags = 3, head = "gbt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    def g(split: String, metric: String, h: Int) =
      gbt.find(r => r._1 == split && r._2 == metric && r._3 == h).get._4
    assert(g("train", "MAE", 1) < g("train", "Naive MAE", 1))
  }

  test("selectHead picks the right plugin for the data (reference predictor selection)") {
    // clean linear trend: the exact-family normal-equation head must
    // beat the tree head out of sample, and selectHead must agree with
    // the individually computed fitnesses
    def writeTrend(n: Int, phase: Double): String = {
      val f = Files.createTempFile("seltrend", ".csv")
      val rows = (0 until n).map { i =>
        val ts = f"2020-01-01 ${i / 60}%02d:${i % 60}%02d:00"
        s"$ts,${0.02 * i + math.sin(i * 0.3 + phase)}"
      }
      Files.writeString(f, "DATE_TIME,CLOSE\n" + rows.mkString("\n") + "\n")
      f.toString
    }
    val cfg = ForecastPipeline.Config(
      splits = Map("train" -> writeTrend(300, 0.0), "test" -> writeTrend(120, 0.5)),
      targetColumn = "CLOSE", horizons = Seq(1))
    def fitness(head: String): Double =
      ForecastPipeline.modelMetrics(spark, cfg, nLags = 3, head = head)
        .filter("split = 'test' and metric = 'MAE' and horizon = 1")
        .head().getAs[Double]("value")
    val (winner, best) = ForecastPipeline.selectHead(
      spark, cfg, Seq("gbt", "linear"), horizon = 1, valSplit = "test")
    assert(winner == "linear", s"winner=$winner")
    assert(best == fitness("linear"))
    assert(best < fitness("gbt"))
  }

  test("all four deep heads run end-to-end through modelMetrics and beat naive") {
    def writeLogistic(n: Int, x0: Double): String = {
      val f = Files.createTempFile("logistic", ".csv")
      val xs = new Array[Double](n)
      xs(0) = x0
      (1 until n).foreach(i => xs(i) = 3.7 * xs(i - 1) * (1.0 - xs(i - 1)))
      val rows = xs.zipWithIndex.map { case (v, i) =>
        f"2020-01-01 ${i / 60}%02d:${i % 60}%02d:00,$v"
      }
      Files.writeString(f, "DATE_TIME,CLOSE\n" + rows.mkString("\n") + "\n")
      f.toString
    }
    val cfg = ForecastPipeline.Config(
      splits = Map("train" -> writeLogistic(220, 0.5123), "test" -> writeLogistic(80, 0.31)),
      targetColumn = "CLOSE", horizons = Seq(1))
    val conf = ForecastPipeline.MlpConf(hidden = 6, epochs = 80, lr = 0.1)
    Seq("mlp", "tcn", "lstm", "attention").foreach { h =>
      val rows = ForecastPipeline.modelMetrics(spark, cfg, nLags = 3, head = h,
          mlpConf = conf)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
      def v(metric: String) = rows.find(r => r._1 == "test" && r._2 == metric && r._3 == 1).get._4
      assert(v("MAE") < v("Naive MAE"),
        s"head=$h should beat naive out of sample: mae=${v("MAE")} naive=${v("Naive MAE")}")
    }
  }

  test("NEAT drives the MLP head end-to-end through modelMetrics (M10b + M8-NN + S11)") {
    // Chaotic logistic map: x' = 3.7·x·(1−x). The 1-step-ahead target is
    // an exact QUADRATIC function of the current value — inexpressible by
    // a linear-on-lags head, easy for a tanh MLP — and chaos means any
    // start point samples the same invariant distribution, so a test
    // split seeded differently is still in-distribution (a sine-map
    // fixture failed here: ± attractor symmetry put the test split in a
    // region the train split never visited and EVERY head scored garbage).
    def writeLogistic(n: Int, x0: Double): String = {
      val f = Files.createTempFile("logistic", ".csv")
      val xs = new Array[Double](n)
      xs(0) = x0
      (1 until n).foreach(i => xs(i) = 3.7 * xs(i - 1) * (1.0 - xs(i - 1)))
      val rows = xs.zipWithIndex.map { case (v, i) =>
        f"2020-01-01 ${i / 60}%02d:${i % 60}%02d:00,$v"
      }
      Files.writeString(f, "DATE_TIME,CLOSE\n" + rows.mkString("\n") + "\n")
      f.toString
    }
    val cfg = ForecastPipeline.Config(
      splits = Map("train" -> writeLogistic(200, 0.5123), "test" -> writeLogistic(80, 0.31)),
      targetColumn = "CLOSE", horizons = Seq(1))
    def fitness(rows: Array[(String, String, Int, Double)]): Double = {
      def v(metric: String) = rows.find(r => r._1 == "test" && r._2 == metric && r._3 == 1).get._4
      v("MAE") - v("Naive MAE") // the reference's optimizer objective
    }
    // NEAT genome = the MLP head's (hidden, DEPTH, log10 lr); each
    // candidate is a full modelMetrics run — the reference's "optimizer
    // drives the predictor plugin" loop, Spark-native. Depth is a gene:
    // NEAT searches the layer count, not just widths.
    def depthOf(params: Map[String, Double]): Int =
      math.min(2, math.max(1, math.round(params.getOrElse("depth", 1.0)).toInt))
    val result = graft.ml.NeatSearch.optimize(
      Seq("hidden" -> (2.0, 10.0), "depth" -> (1.0, 2.0), "log_lr" -> (-2.0, -0.3)),
      params => {
        val conf = ForecastPipeline.MlpConf(
          hidden = math.max(2, math.round(params.getOrElse("hidden", 6.0)).toInt),
          epochs = 60,
          lr = math.pow(10.0, params.getOrElse("log_lr", -1.0)),
          depth = depthOf(params))
        fitness(ForecastPipeline.modelMetrics(spark, cfg, nLags = 2, head = "mlp",
            mlpConf = conf)
          .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3))))
      },
      graft.ml.NeatSearch.Config(populationSize = 4, generations = 1, patience = 2, seed = 7L))
    assert(result.bestFitness < 0.0,
      s"NEAT champion MLP should beat naive out of sample: ${result.bestFitness}")
    // champion re-run with artifacts: S11 save + reload serves predictions
    val modelDir = Files.createTempDirectory("mlp_heads").toString
    val champConf = ForecastPipeline.MlpConf(
      hidden = math.max(2, math.round(result.bestParams.getOrElse("hidden", 6.0)).toInt),
      epochs = 60,
      lr = math.pow(10.0, result.bestParams.getOrElse("log_lr", -1.0)),
      depth = depthOf(result.bestParams))
    val rows = ForecastPipeline.modelMetrics(spark, cfg, nLags = 2, head = "mlp",
        modelDir = Some(modelDir), mlpConf = champConf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    assert(fitness(rows) < 0.0)
    val reloaded = graft.ml.MlpRegressor.load(spark, s"$modelDir/h1")
    assert(reloaded.layers.toSeq == Seq.fill(champConf.depth)(champConf.hidden))
    assert(!reloaded.predict(org.apache.spark.ml.linalg.Vectors.dense(0.2, 0.1, -0.4)).isNaN)
  }

  test("R2 of the naive zero-return forecast relates to return variance") {
    val cfg = ForecastPipeline.Config(
      splits = Map("train" -> writeSplit(60, 0.0)),
      targetColumn = "CLOSE", horizons = Seq(1))
    val r2 = ForecastPipeline.naiveMetrics(spark, cfg)
      .filter($"metric" === "R2").select("value").as[Double].head()
    // R2 = 1 - Σr²/Σ(r-mean r)² ≤ small for zero-centered returns
    assert(r2 <= 1.0 + 1e-9)
  }
}
