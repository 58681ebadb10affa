package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.metrics.Metrics
import graft.ml.Forecaster
import graft.target.Targets

/** SURVEY §5(b) golden end-to-end parity artifact: run the full forecast
  * pipeline on the reference's committed phase-1 input schema and emit
  * the reference's exact output-file formats —
  *
  *   - results CSV `Metric,Average,Std Dev,Min,Max` with rows
  *     `<Split> <Name> H<h>` in the reference's loop order
  *     data_sets × metric_names × horizons
  *     (`pipeline_plugins/stl_metrics.py:164-201`);
  *   - predictions CSV `DATE_TIME,test_CLOSE,Target_H{h},Prediction_H{h}…`
  *     (`pipeline_plugins/stl_io.py:37-81`);
  *   - uncertainties CSV `DATE_TIME,Uncertainty_H{h}…`
  *     (`stl_io.py:91-103`).
  *
  * A user of the reference pointing their downstream tooling at these
  * files sees the same headers, the same metric-row grid, the same
  * date/float formats. `main` writes the committed `golden/phase_1/`
  * artifact from the FIXTURES.md §1 seed-fixed random-walk OHLC splits;
  * `GoldenParitySpec` diffs the committed files' header sets against the
  * reference goldens.
  *
  * Aggregation across `iterations` re-fits (different seeds) happens in
  * ONE Spark plan over the stacked (iteration, split, metric, horizon,
  * value) rows; only the fitted weights cross the driver, as everywhere
  * else in the pipeline.
  */
object GoldenRun {

  /** Reference metric grid (`stl_metrics.py:166-167`). */
  val MetricNames: Seq[String] = Seq("MAE", "Naive MAE", "R2", "Uncertainty", "SNR")
  val DataSets: Seq[String] = Seq("Train", "Validation", "Test")

  /** Reference split keys → golden display names: config splits are named
    * train/validation/test (`app/config.py` x_{train,validation,test}_file).
    */
  private val SplitDisplay =
    Map("train" -> "Train", "validation" -> "Validation", "test" -> "Test")

  /** One iteration's metric rows (split, metric, horizon, value) for all
    * five golden metrics. Fits per-horizon heads on `train`, scores every
    * split with MC-dropout uncertainty (M7), computes MAE / Naive MAE /
    * R² / Uncertainty / SNR per split×horizon — the `stl_metrics.py`
    * iteration grain with the reference's formulas (`:72-81`: MAE on
    * prices, naive baseline = current price, `:74-75`: Uncertainty =
    * mean|unc|, SNR = mean(pred)/(mean|unc|+1e-9)).
    */
  def iterationMetrics(spark: SparkSession, config: ForecastPipeline.Config,
      nLags: Int, head: String, mlpConf: ForecastPipeline.MlpConf,
      mcPasses: Int = 8, mcRate: Double = 0.1): DataFrame = {
    require(config.splits.contains("train"), "golden run needs a 'train' split")
    val w = Window.orderBy(col("ts"))
    def featurized(path: String, split: String): DataFrame = {
      val raw = Sources.loadCsv(spark, path, maxRows = config.maxSteps.get(split))
      Forecaster.withLagFeatures(
        Targets.multiHorizon(raw, config.targetColumn, config.horizons, w),
        config.targetColumn, nLags, Nil, Seq("ts"))
    }
    val featureCols = config.targetColumn +: (1 to nLags).map(i => s"lag_$i")
    val train = featurized(config.splits("train"), "train").cache()
    val models =
      try ForecastPipeline.fitHead(train, featureCols, config.horizons, head, mlpConf)
      finally train.unpersist()
    val perSplit = config.splits.toSeq.sortBy(_._1).map { case (split, path) =>
      val scored = Forecaster.predictWithUncertainty(models,
        featurized(path, split), "ts", featureCols,
        passes = mcPasses, rate = mcRate, seed = mlpConf.seed)
      val aggs = config.horizons.flatMap { h =>
        Seq(
          Metrics.mae(col(s"pred_h$h"), col(s"target_h$h")).as(s"mae_h$h"),
          Metrics.naiveMae(col(config.targetColumn), col(s"target_h$h")).as(s"naive_mae_h$h"),
          Metrics.r2(col(s"pred_h$h"), col(s"target_h$h")).as(s"r2_h$h"),
          avg(abs(col(s"unc_h$h"))).as(s"uncertainty_h$h"),
          Metrics.snr(col(s"pred_h$h"), col(s"unc_h$h")).as(s"snr_h$h"))
      }
      scored.filter(config.horizons.map(h => col(s"target_h$h").isNotNull).reduce(_ && _))
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("split", lit(SplitDisplay.getOrElse(split, split.capitalize)))
    }
    val wide = perSplit.reduce(_.unionByName(_))
    config.horizons.flatMap { h =>
      Seq(s"mae_h$h" -> ("MAE", h), s"naive_mae_h$h" -> ("Naive MAE", h),
        s"r2_h$h" -> ("R2", h), s"uncertainty_h$h" -> ("Uncertainty", h),
        s"snr_h$h" -> ("SNR", h))
    }.map { case (c, (name, h)) =>
      wide.select(col("split"), lit(name).as("metric"), lit(h).as("horizon"),
        col(c).as("value"))
    }.reduce(_.unionByName(_))
  }

  /** Cross-iteration golden results table, rows in the reference's exact
    * order (data_sets → metric_names → horizons) and `%.6f` float format
    * (`stl_metrics.py:197`: `float_format="%.6f"`). Std Dev is population
    * (numpy `np.std` default ddof=0).
    */
  def resultsGolden(iterRows: DataFrame): DataFrame = {
    val agg = Metrics.aggregateResults(iterRows, "split", "metric", "horizon", "value")
    val dsRank = DataSets.zipWithIndex
      .map { case (s, i) => (s, i) }
      .foldLeft(lit(99)) { case (acc, (s, i)) => when(col("split") === s, lit(i)).otherwise(acc) }
    val mnRank = MetricNames.zipWithIndex
      .foldLeft(lit(99)) { case (acc, (m, i)) => when(col("metric") === m, lit(i)).otherwise(acc) }
    agg
      .orderBy(dsRank, mnRank, col("horizon"))
      .select(
        concat(col("split"), lit(" "), col("metric"), lit(" H"), col("horizon")).as("Metric"),
        format_string("%.6f", col("avg_value")).as("Average"),
        format_string("%.6f", col("std_dev")).as("Std Dev"),
        format_string("%.6f", col("min_value")).as("Min"),
        format_string("%.6f", col("max_value")).as("Max"))
  }

  /** Predictions CSV frame for the test split:
    * `DATE_TIME,test_CLOSE,Target_H{h},Prediction_H{h}…` (`stl_io.py:37-81`)
    * — DATE_TIME formatted as the reference writes it, target column
    * surfaced as `test_<name>`.
    */
  def predictionsGolden(scoredTest: DataFrame, targetColumn: String,
      horizons: Seq[Int]): DataFrame = {
    val cols = Seq(
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("DATE_TIME"),
      col(targetColumn).as(s"test_$targetColumn")) ++
      horizons.flatMap(h => Seq(
        col(s"target_h$h").as(s"Target_H$h"),
        col(s"pred_h$h").as(s"Prediction_H$h")))
    scoredTest.filter(horizons.map(h => col(s"target_h$h").isNotNull).reduce(_ && _))
      .select(cols: _*)
  }

  /** Uncertainties CSV frame: `DATE_TIME,Uncertainty_H{h}…` (`stl_io.py:91-103`). */
  def uncertaintiesGolden(scoredTest: DataFrame, horizons: Seq[Int]): DataFrame = {
    val cols = date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("DATE_TIME") +:
      horizons.map(h => abs(col(s"unc_h$h")).as(s"Uncertainty_H$h"))
    scoredTest.filter(horizons.map(h => col(s"target_h$h").isNotNull).reduce(_ && _))
      .select(cols: _*)
  }

  /** FIXTURES.md §1 seed-fixed random-walk OHLC split (base_d schema:
    * DATE_TIME,OPEN,LOW,HIGH,CLOSE hourly bars) — deterministic, no
    * wall-clock anywhere, so the committed golden artifact reproduces
    * bit-for-bit.
    */
  def writeFixtureSplit(path: String, n: Int, seed: Long,
      startIso: String = "2017-01-02T00:00:00"): Unit = {
    val rnd = new java.util.Random(seed)
    val sb = new StringBuilder("DATE_TIME,OPEN,LOW,HIGH,CLOSE\n")
    var close = 1.10
    var i = 0
    val t0 = java.time.LocalDateTime.parse(startIso)
    while (i < n) {
      val open = close
      close = close + 0.0008 * rnd.nextGaussian() + 0.00002 * math.sin(i / 24.0)
      val hi = math.max(open, close) + 0.0004 * math.abs(rnd.nextGaussian())
      val lo = math.min(open, close) - 0.0004 * math.abs(rnd.nextGaussian())
      val ts = t0.plusHours(i.toLong).toString.replace('T', ' ') + ":00"
      // Locale.ROOT: the f-interpolator formats %.5f with the DEFAULT
      // locale — a comma-decimal host would write "1,10000" and corrupt
      // the CSV fixture
      sb.append(String.format(java.util.Locale.ROOT,
        "%s,%.5f,%.5f,%.5f,%.5f\n",
        ts.take(19), Double.box(open), Double.box(lo), Double.box(hi),
        Double.box(close)))
      i += 1
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }

  /** Produce the committed `golden/phase_1/` artifact:
    *   runMain graft.pipeline.GoldenRun [outDir]
    * CNN head (the golden example's `phase_1_cnn_6300_1h` plugin), 6
    * horizons, 3 iterations, MC-dropout uncertainty.
    */
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("golden/phase_1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val tmp = java.nio.file.Files.createTempDirectory("golden_in").toString
    // three date-disjoint splits, reference role sizes scaled down
    writeFixtureSplit(s"$tmp/base_train.csv", 1600, seed = 101L, "2017-01-02T00:00:00")
    writeFixtureSplit(s"$tmp/base_validation.csv", 400, seed = 202L, "2017-03-10T16:00:00")
    writeFixtureSplit(s"$tmp/base_test.csv", 400, seed = 303L, "2017-03-27T08:00:00")
    val horizons = 1 to 6
    val cfg = ForecastPipeline.Config(
      splits = Map("train" -> s"$tmp/base_train.csv",
        "validation" -> s"$tmp/base_validation.csv",
        "test" -> s"$tmp/base_test.csv"),
      targetColumn = "CLOSE", horizons = horizons)
    val nLags = 3
    val iterations = 3
    val mlp = ForecastPipeline.MlpConf(hidden = 8, epochs = 120, lr = 0.05)
    val iterRows = (1 to iterations).map { it =>
      iterationMetrics(spark, cfg, nLags, head = "cnn",
        mlp.copy(seed = mlp.seed + 1000L * it))
        .withColumn("iteration", lit(it))
    }.reduce(_.unionByName(_))
    Sources.writeCsv(resultsGolden(iterRows), s"$outDir/results_csv", Nil)

    // score the test split once more with the iteration-1 models for the
    // prediction/uncertainty files (the reference writes the last
    // iteration's predictions; any single fit is representative)
    val w = Window.orderBy(col("ts"))
    val featureCols = cfg.targetColumn +: (1 to nLags).map(i => s"lag_$i")
    val train = Forecaster.withLagFeatures(
      Targets.multiHorizon(Sources.loadCsv(spark, cfg.splits("train")),
        cfg.targetColumn, horizons, w),
      cfg.targetColumn, nLags, Nil, Seq("ts")).cache()
    // same dispatch as ForecastPipeline.fitHead("cnn", …) but with a
    // History attached per horizon so the loss-plot artifact comes from
    // the SAME fit that produces the prediction file (callbacks only
    // observe — the weight trajectory, hence the CSVs, are unchanged)
    val histories = horizons.map(h => h -> new graft.ml.Callbacks.History).toMap
    val predConf = mlp.copy(seed = mlp.seed + 1000L)
    val models =
      try Forecaster.fitPerHorizonCnn(train, featureCols, horizons,
        graft.ml.CnnRegressor.CnnConfig(channels = predConf.hidden,
          epochs = predConf.epochs, lr = predConf.lr, seed = predConf.seed,
          activation = predConf.activation),
        dropout = predConf.dropout, callbacks = h => Seq(histories(h)),
        opt = predConf.opt)
      finally train.unpersist()
    val scoredTest = Forecaster.predictWithUncertainty(models,
      Forecaster.withLagFeatures(
        Targets.multiHorizon(Sources.loadCsv(spark, cfg.splits("test")),
          cfg.targetColumn, horizons, w),
        cfg.targetColumn, nLags, Nil, Seq("ts")),
      "ts", featureCols, passes = 8, rate = 0.1, seed = mlp.seed + 1000L)
      .cache()
    Sources.writeCsv(predictionsGolden(scoredTest, cfg.targetColumn, horizons),
      s"$outDir/prediction_csv", Seq("DATE_TIME"))
    Sources.writeCsv(uncertaintiesGolden(scoredTest, horizons),
      s"$outDir/uncertainties_csv", Seq("DATE_TIME"))
    // the `*_predictions_plot.png` analog (stl_plots.py:30): H1 target vs
    // prediction with the ±uncertainty envelope, SVG (see graft.io.Plots)
    graft.io.Plots.predictionPlot(
      scoredTest.filter(col("target_h1").isNotNull), "ts",
      "target_h1", "pred_h1", "unc_h1",
      s"$outDir/graft_phase_1_cnn_1h_predictions_plot.svg")
    // the `*_loss_plot.png` analog (`data_processor.py:383-391`): H1
    // epoch-loss curve from the prediction fit's History (train loss —
    // this fit monitors no validation split, so one curve)
    graft.io.Plots.lossPlot(
      Seq("loss" -> histories(1).rows.map(r => (r._1, r._2))),
      s"$outDir/graft_phase_1_cnn_1h_loss_plot.svg",
      title = "Model Loss for CNN - 1")
    scoredTest.unpersist()
    // single-file rename: writeCsv emits a directory with one part file
    for ((d, f) <- Seq("results_csv" -> "graft_phase_1_cnn_1h_results.csv",
        "prediction_csv" -> "graft_phase_1_cnn_1h_prediction.csv",
        "uncertainties_csv" -> "graft_phase_1_cnn_1h_uncertainties.csv")) {
      val dir = new java.io.File(s"$outDir/$d")
      val part = dir.listFiles().find(_.getName.startsWith("part-")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$outDir/$f"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
    println(s"golden artifact written to $outDir")
    spark.stop()
  }
}
