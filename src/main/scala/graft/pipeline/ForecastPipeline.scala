package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.metrics.Metrics
import graft.target.Targets
import graft.ts.TS

/** SURVEY §7 minimum end-to-end slice — the reference's flagship dataflow
  * with a naive predictor and zero ML:
  *
  *   read (S1) → z-denormalize target (F3/S4) → log-return feature (F9)
  *   → multi-horizon return targets (W7) → naive forecast (W16)
  *   → metrics MAE / naive MAE / R² per split×horizon (A2-A4)
  *   → results rows `Metric,Average,Std Dev,Min,Max` (S8 shape).
  *
  * One Catalyst plan per split: scan → project → one ordered window (all
  * leads collapse into a single WindowExec) → aggregate. The per-split
  * frames never hit the driver.
  */
object ForecastPipeline {

  case class Config(
      splits: Map[String, String],           // split name → csv path
      targetColumn: String,
      horizons: Seq[Int],
      normStats: Map[String, (Double, Double)] = Map.empty, // col → (mean, std)
      // per-split row caps, reference max_steps_{train,val,test}
      // semantics (`app/config.py:42-44`) — each split has its own limit
      maxSteps: Map[String, Int] = Map.empty)

  /** Per-split naive-forecast metrics on the denormalized target.
    * Output: one row per (split, metric, horizon) with the metric value —
    * the "iteration" grain of `stl_metrics.py:18-110` for the naive model.
    *
    * Parity face, SINGLE series by contract (one series per input file,
    * like the reference) — it uses an unpartitioned `Window.orderBy(ts)`
    * and is deliberately not a driver query. For multi-series data use
    * the keyed forms the driver measures instead:
    * `Metrics.naiveMae` / q18/q25's per-symbol windows partition by the
    * series key and scale across executors.
    */
  def naiveMetrics(spark: SparkSession, config: Config): DataFrame = {
    val perSplit = config.splits.toSeq.sortBy(_._1).map { case (split, path) =>
      val raw = Sources.loadCsv(spark, path, maxRows = config.maxSteps.get(split))
      val denorm = config.normStats.get(config.targetColumn) match {
        case Some((mean, std)) =>
          raw.withColumn(config.targetColumn,
            TS.zDenorm(col(config.targetColumn), mean, std))
        case None => raw
      }
      val w = Window.orderBy(col("ts")) // single series per file, like the reference
      val targets = Targets.multiHorizonReturns(denorm, config.targetColumn, config.horizons, w)
      // naive forecast of returns = 0 ⇒ MAE_naive = mean|ret|; predictions
      // equal baseline ⇒ pred_return = 0 as well for the naive model
      val aggs = config.horizons.flatMap { h =>
        Seq(
          Metrics.naiveMae(lit(0.0), col(s"ret_h$h")).as(s"naive_mae_h$h"),
          Metrics.mae(lit(0.0), col(s"ret_h$h")).as(s"mae_h$h"),
          Metrics.r2(lit(0.0), col(s"ret_h$h")).as(s"r2_h$h"))
      }
      val row = targets.agg(aggs.head, aggs.tail: _*)
        .withColumn("split", lit(split))
      row
    }
    val wide = perSplit.reduce(_.unionByName(_))
    // unpivot to (split, metric, horizon, value)
    val metricCols = config.horizons.flatMap { h =>
      Seq(s"mae_h$h" -> ("MAE", h), s"naive_mae_h$h" -> ("Naive MAE", h),
        s"r2_h$h" -> ("R2", h))
    }
    val stacked = metricCols.map { case (c, (name, h)) =>
      wide.select(col("split"), lit(name).as("metric"), lit(h).as("horizon"),
        col(c).as("value"))
    }.reduce(_.unionByName(_))
    stacked
  }

  /** S8 results sink shape: aggregate the (split, metric, horizon, value)
    * rows across iterations into `Metric,Average,Std Dev,Min,Max` with
    * the reference's metric-string format `<Split> <Name> H<h>`
    * (`stl_metrics.py:164-201`).
    */
  def resultsTable(metricRows: DataFrame): DataFrame =
    Metrics.aggregateResults(metricRows, "split", "metric", "horizon", "value")
      .select(
        concat(initcap(col("split")), lit(" "), col("metric"), lit(" H"), col("horizon"))
          .as("Metric"),
        col("avg_value").as("Average"),
        col("std_dev").as("Std Dev"),
        col("min_value").as("Min"),
        col("max_value").as("Max"))

  /** Full slice: metrics → results rows → optional CSV sink. */
  def run(spark: SparkSession, config: Config, outCsv: Option[String] = None): DataFrame = {
    val results = resultsTable(naiveMetrics(spark, config))
    outCsv.foreach(p => Sources.writeCsv(results, p, Seq("Metric")))
    results
  }

  /** MLP-head hyperparameters — the NEAT-searchable genome surface. */
  /** `depth` stacked hidden layers of width `hidden` — the reference's
    * dense heads are 2-3 stacked layers (`predictor_plugin_ann_best.py:222-226`);
    * `dropout` enables the train-time Dropout (epoch-resampled
    * deterministic masks): the dense-branch masks for the MLP head
    * (`MlpRegressor.fitLayers`), the head-input masks for the
    * TCN/LSTM/attention heads.
    */
  /** `opt`: the [[graft.ml.Optimizer]] face — defaults to the original
    * full-batch GD; e.g. `OptConfig("adamw", batches = 8)` trains the
    * MLP head with the reference's AdamW mini-batch regime.
    *
    * Architecture-fidelity knobs (each defaults to the former path
    * bit-for-bit): `activation` routes the MLP (tanh|elu) and the
    * CNN/TCN conv family (tanh|relu|elu — reference default relu,
    * `predictor_plugin_cnn.py:27`); `layerNorm` enables the reference's
    * LayerNormalization sites in the TFT and attention heads
    * (`predictor_plugin_tft.py:85,127`,
    * `predictor_plugin_transformer.py:74`); `lstmLayers` stacks the
    * TFT encoder (`predictor_plugin_tft.py:113-116`, reference default
    * 2); `bidirectional` wraps the LSTM head's cell
    * (`predictor_plugin_lstm.py:506-510`).
    */
  case class MlpConf(hidden: Int = 8, epochs: Int = 300, lr: Double = 0.1,
      seed: Long = 42L, depth: Int = 1, dropout: Double = 0.0,
      opt: graft.ml.Optimizer.OptConfig = graft.ml.Optimizer.FullBatchGd,
      activation: String = "tanh", layerNorm: Boolean = false,
      lstmLayers: Int = 1, bidirectional: Boolean = false)

  /** Head-name dispatch shared by [[modelMetrics]] and
    * [[graft.pipeline.GoldenRun]] — the reference's `predictor_plugin`
    * selector mapped to the per-horizon fit for each native head.
    */
  def fitHead(train: DataFrame, featureCols: Seq[String], horizons: Seq[Int],
      head: String, mlpConf: MlpConf): Map[Int, graft.ml.Forecaster.HorizonModel] = {
    import graft.ml.Forecaster
    head match {
      case "gbt" => Forecaster.fitPerHorizonGbt(train, featureCols, horizons)
      case "mlp" => Forecaster.fitPerHorizonDeepMlp(train, featureCols, horizons,
        layers = Seq.fill(mlpConf.depth)(mlpConf.hidden), epochs = mlpConf.epochs,
        lr = mlpConf.lr, seed = mlpConf.seed, dropout = mlpConf.dropout,
        opt = mlpConf.opt, activation = mlpConf.activation)
      case "tcn" => Forecaster.fitPerHorizonTcn(train, featureCols, horizons,
        graft.ml.TcnRegressor.TcnConfig(epochs = mlpConf.epochs, lr = mlpConf.lr,
          seed = mlpConf.seed, activation = mlpConf.activation),
        dropout = mlpConf.dropout, opt = mlpConf.opt)
      case "cnn" => Forecaster.fitPerHorizonCnn(train, featureCols, horizons,
        graft.ml.CnnRegressor.CnnConfig(channels = mlpConf.hidden,
          epochs = mlpConf.epochs, lr = mlpConf.lr, seed = mlpConf.seed,
          activation = mlpConf.activation),
        dropout = mlpConf.dropout, opt = mlpConf.opt)
      case "lstm" => Forecaster.fitPerHorizonLstm(train, featureCols, horizons,
        graft.ml.LstmRegressor.LstmConfig(units = mlpConf.hidden,
          epochs = mlpConf.epochs, lr = mlpConf.lr, seed = mlpConf.seed,
          bidirectional = mlpConf.bidirectional),
        dropout = mlpConf.dropout, opt = mlpConf.opt)
      case "nbeats" => Forecaster.fitPerHorizonNBeats(train, featureCols,
        horizons, graft.ml.NBeatsRegressor.NBeatsConfig(
          units = mlpConf.hidden, epochs = mlpConf.epochs, lr = mlpConf.lr,
          seed = mlpConf.seed), dropout = mlpConf.dropout, opt = mlpConf.opt)
      case "attention" => Forecaster.fitPerHorizonAttention(train, featureCols,
        horizons, graft.ml.AttentionRegressor.AttnConfig(
          epochs = mlpConf.epochs, lr = mlpConf.lr, seed = mlpConf.seed,
          layerNorm = mlpConf.layerNorm),
        dropout = mlpConf.dropout, opt = mlpConf.opt)
      case "tft" => Forecaster.fitPerHorizonTft(train, featureCols,
        horizons, graft.ml.TftRegressor.TftConfig(
          // rounded to an even width so the default 2 heads divide it
          units = math.max(2, mlpConf.hidden / 4 * 2),
          epochs = mlpConf.epochs, lr = mlpConf.lr, seed = mlpConf.seed,
          lstmLayers = mlpConf.lstmLayers, layerNorm = mlpConf.layerNorm),
        dropout = mlpConf.dropout, opt = mlpConf.opt)
      case _ => Forecaster.fitPerHorizon(train, featureCols, horizons)
        .asInstanceOf[Map[Int, Forecaster.HorizonModel]]
    }
  }

  /** MODEL-based slice (M8 end-to-end): lag features → per-horizon heads
    * fit on the `train` split — `head` = "linear" (normal-equation),
    * "gbt", or a native deep head: "mlp" (multi-layer tanh), "tcn"
    * (dilated causal conv), "cnn" (strided causal conv),
    * "lstm" (recurrent), "attention" (single-head
    * self-attention) — shared hyperparameters via `mlpConf` — → per-split MAE / Naive
    * MAE / R² rows, same grain as [[naiveMetrics]]. `modelDir` saves
    * each horizon's fitted model (S11 artifact sink); reload with the
    * matching MLlib loader (`MlpRegressor.load` for the MLP head). The
    * per-split frames stay distributed; only the fitted
    * coefficients/trees/weights cross the driver.
    */
  /** Lag-featurized split frame — shared by [[modelMetrics]] (fit +
    * evaluate) and [[evaluateSavedMetrics]] (the `load_model` branch),
    * so both paths featurize identically by construction.
    */
  private def featurizedSplit(spark: SparkSession, config: Config,
      nLags: Int)(path: String, split: String): DataFrame = {
    import graft.ml.Forecaster
    val w = Window.orderBy(col("ts"))
    val raw = Sources.loadCsv(spark, path, maxRows = config.maxSteps.get(split))
    val denorm = config.normStats.get(config.targetColumn) match {
      case Some((mean, std)) =>
        raw.withColumn(config.targetColumn,
          TS.zDenorm(col(config.targetColumn), mean, std))
      case None => raw
    }
    Forecaster.withLagFeatures(
      Targets.multiHorizon(denorm, config.targetColumn, config.horizons, w),
      config.targetColumn, nLags, Nil, Seq("ts"))
  }

  def modelMetrics(spark: SparkSession, config: Config, nLags: Int = 3,
      head: String = "linear", modelDir: Option[String] = None,
      mlpConf: MlpConf = MlpConf()): DataFrame = {
    require(config.splits.contains("train"), "modelMetrics needs a 'train' split")
    def featurized(path: String, split: String): DataFrame =
      featurizedSplit(spark, config, nLags)(path, split)
    val featureCols = config.targetColumn +: (1 to nLags).map(i => s"lag_$i")
    val train = featurized(config.splits("train"), "train").cache()
    val models =
      try fitHead(train, featureCols, config.horizons, head, mlpConf)
      finally train.unpersist()
    modelDir.foreach { dir =>
      models.toSeq.sortBy(_._1).foreach {
        case (h, m: graft.ml.MlpRegressor.MlpRegressionModel) =>
          graft.ml.MlpRegressor.save(m, s"$dir/h$h")
        case (h, m: graft.ml.TcnRegressor.TcnRegressionModel) =>
          graft.ml.TcnRegressor.save(m, s"$dir/h$h")
        case (h, m: graft.ml.CnnRegressor.CnnRegressionModel) =>
          graft.ml.CnnRegressor.save(m, s"$dir/h$h")
        case (h, m: graft.ml.LstmRegressor.LstmRegressionModel) =>
          graft.ml.LstmRegressor.save(m, s"$dir/h$h")
        case (h, m: graft.ml.AttentionRegressor.AttentionRegressionModel) =>
          graft.ml.AttentionRegressor.save(m, s"$dir/h$h")
        case (h, m: graft.ml.TftRegressor.TftRegressionModel) =>
          graft.ml.TftRegressor.save(m, s"$dir/h$h")
        case (h, m: graft.ml.NBeatsRegressor.NBeatsRegressionModel) =>
          graft.ml.NBeatsRegressor.save(m, s"$dir/h$h")
        case (h, m) =>
          m.asInstanceOf[org.apache.spark.ml.util.MLWritable]
            .write.overwrite().save(s"$dir/h$h")
      }
    }
    headMetricRows(config, models, featureCols, featurized)
  }

  /** Per-split (split, metric, horizon, value) rows for an already-built
    * model map — the evaluate half [[modelMetrics]] and
    * [[evaluateSavedMetrics]] share.
    */
  private def headMetricRows(config: Config,
      models: Map[Int, graft.ml.Forecaster.HorizonModel],
      featureCols: Seq[String],
      featurized: (String, String) => DataFrame): DataFrame = {
    val perSplit = config.splits.toSeq.sortBy(_._1).map { case (split, path) =>
      val pred = graft.ml.Forecaster.predict(models, featurized(path, split), featureCols)
      val aggs = config.horizons.flatMap { h =>
        Seq(
          Metrics.mae(col(s"pred_h$h"), col(s"target_h$h")).as(s"mae_h$h"),
          Metrics.naiveMae(col(config.targetColumn), col(s"target_h$h")).as(s"naive_mae_h$h"),
          Metrics.r2(col(s"pred_h$h"), col(s"target_h$h")).as(s"r2_h$h"))
      }
      pred.filter(config.horizons.map(h => col(s"target_h$h").isNotNull).reduce(_ && _))
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("split", lit(split))
    }
    val wide = perSplit.reduce(_.unionByName(_))
    config.horizons.flatMap { h =>
      Seq(s"mae_h$h" -> ("MAE", h), s"naive_mae_h$h" -> ("Naive MAE", h),
        s"r2_h$h" -> ("R2", h))
    }.map { case (c, (name, h)) =>
      wide.select(col("split"), lit(name).as("metric"), lit(h).as("horizon"),
        col(c).as("value"))
    }.reduce(_.unionByName(_))
  }

  /** S11 read side: load each horizon's saved artifact back into a
    * [[graft.ml.Forecaster.HorizonModel]] — the inverse of
    * [[modelMetrics]]' `modelDir` sink, dispatched by the same head
    * names as [[fitHead]].
    */
  def loadHead(spark: SparkSession, head: String, dir: String,
      horizons: Seq[Int]): Map[Int, graft.ml.Forecaster.HorizonModel] =
    horizons.map { h =>
      val p = s"$dir/h$h"
      val m: graft.ml.Forecaster.HorizonModel = head match {
        case "mlp" => graft.ml.MlpRegressor.load(spark, p)
        case "tcn" => graft.ml.TcnRegressor.load(spark, p)
        case "cnn" => graft.ml.CnnRegressor.load(spark, p)
        case "lstm" => graft.ml.LstmRegressor.load(spark, p)
        case "attention" => graft.ml.AttentionRegressor.load(spark, p)
        case "tft" => graft.ml.TftRegressor.load(spark, p)
        case "nbeats" => graft.ml.NBeatsRegressor.load(spark, p)
        case "linear" => org.apache.spark.ml.regression.LinearRegressionModel.load(p)
        case "gbt" => org.apache.spark.ml.regression.GBTRegressionModel.load(p)
        case other => throw new IllegalArgumentException(
          s"loadHead: unknown head '$other'")
      }
      h -> m
    }.toMap

  /** The `load_model` → evaluate branch (`app/main.py:265-272`): load a
    * saved per-horizon model and emit the SAME per-split metric rows as
    * [[modelMetrics]], with no fit — both paths share
    * [[featurizedSplit]] and [[headMetricRows]], so a save → load →
    * evaluate round-trip reproduces the training run's evaluation
    * exactly (spec-pinned in `CliMainSpec`).
    */
  def evaluateSavedMetrics(spark: SparkSession, config: Config, head: String,
      modelDir: String, nLags: Int = 3): DataFrame = {
    val featureCols = config.targetColumn +: (1 to nLags).map(i => s"lag_$i")
    val models = loadHead(spark, head, modelDir, config.horizons)
    headMetricRows(config, models, featureCols,
      featurizedSplit(spark, config, nLags))
  }

  /** Reference predictor-plugin selection (the `predictor_plugin` config
    * knob + the optimizer's validation fitness): run each candidate head
    * end-to-end through [[modelMetrics]] and keep the lowest
    * out-of-sample MAE at `horizon`. Dispatch shape =
    * `Forecaster.search`: each candidate is a few distributed Spark jobs
    * (fit + metrics) and only the scalar fitness crosses the driver, so
    * selection scales exactly as far as the heads themselves do.
    */
  def selectHead(spark: SparkSession, config: Config, candidates: Seq[String],
      horizon: Int, valSplit: String, nLags: Int = 3,
      mlpConf: MlpConf = MlpConf()): (String, Double) =
    graft.ml.Forecaster.search[String](candidates, head =>
      modelMetrics(spark, config, nLags, head, None, mlpConf)
        .filter(col("split") === valSplit && col("metric") === "MAE" &&
          col("horizon") === horizon)
        .head().getAs[Double]("value"))
}
