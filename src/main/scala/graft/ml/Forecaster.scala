package graft.ml

import org.apache.spark.ml.PredictionModel
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.metrics.Metrics

/** ML-boundary operators (SURVEY §2.9): per-horizon estimators (M8),
  * bootstrap-ensemble uncertainty (M7 ≙ MC-dropout variance, aggregated
  * with the A8 groupBy pattern), naive-relative fitness (the optimizer's
  * objective, `default_optimizer.py` fitness = val MAE − naive MAE).
  *
  * Spark-first: features assemble into MLlib vectors, one distributed
  * `LinearRegression` fit per horizon (normal-equation solver — one pass
  * over the data per fit), predictions stay in the same plan for metric
  * aggregation. The reference's Keras heads become pluggable Estimators.
  */
object Forecaster {

  /** Lagged-feature builder: lag 1..nLags of the target as feature
    * columns (the declarative analog of the W2 window tensor for
    * regression-style models).
    */
  def withLagFeatures(df: DataFrame, targetCol: String, nLags: Int,
      partCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w =
      (if (partCols.isEmpty) Window.partitionBy() else Window.partitionBy(partCols.map(col): _*))
        .orderBy(orderCols.map(col): _*)
    val withL = (1 to nLags).foldLeft(df) { (d, i) =>
      d.withColumn(s"lag_$i", lag(col(targetCol), i).over(w))
    }
    withL.na.drop((1 to nLags).map(i => s"lag_$i"))
  }

  /** Any MLlib regression model usable as a per-horizon head. */
  type HorizonModel = PredictionModel[Vector, _ <: PredictionModel[Vector, _]]

  /** M8 generalized: one fitted model per horizon (label = `target_h{h}`),
    * estimator supplied by the caller — the Spark-native analog of the
    * reference's pluggable predictor heads (`predictor_plugins/` ships a
    * model zoo behind one `build_model/train` contract; here any MLlib
    * regressor slots in behind `fit(assembled, labelCol)`).
    */
  def fitPerHorizonWith(train: DataFrame, featureCols: Seq[String],
      horizons: Seq[Int])(fit: (DataFrame, String) => HorizonModel): Map[Int, HorizonModel] = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val assembled = assembler.transform(train).cache()
    try {
      horizons.map { h =>
        val label = s"target_h$h"
        h -> fit(assembled.filter(col(label).isNotNull), label)
      }.toMap
    } finally assembled.unpersist()
  }

  /** [[fitPerHorizonWith]] + M11: `callbacks(h)` builds a FRESH callback
    * set per horizon fit — callbacks are stateful (patience counters),
    * so sharing one instance across the per-horizon fits would leak
    * early-stopping state between heads. */
  def fitPerHorizonWith(train: DataFrame, featureCols: Seq[String],
      horizons: Seq[Int], callbacks: Int => Seq[Callbacks.TrainingCallback])(
      fit: (DataFrame, String, Seq[Callbacks.TrainingCallback]) => HorizonModel): Map[Int, HorizonModel] = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val assembled = assembler.transform(train).cache()
    try {
      horizons.map { h =>
        val label = s"target_h$h"
        h -> fit(assembled.filter(col(label).isNotNull), label, callbacks(h))
      }.toMap
    } finally assembled.unpersist()
  }

  /** [[fitPerHorizonWith]] + a per-horizon VALIDATION split: `fit` also
    * receives the assembled val rows for its horizon (label non-null),
    * for heads that monitor val loss (the reference's
    * `EarlyStopping(monitor='val_loss')` contract — every Keras plugin
    * fits with `validation_data`, e.g. `predictor_plugin_ann.py`'s
    * `model.fit(..., validation_data=(x_val, y_val))`). */
  def fitPerHorizonWithVal(train: DataFrame, valDf: DataFrame,
      featureCols: Seq[String], horizons: Seq[Int],
      callbacks: Int => Seq[Callbacks.TrainingCallback])(
      fit: (DataFrame, String, Seq[Callbacks.TrainingCallback], DataFrame) => HorizonModel): Map[Int, HorizonModel] = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val assembled = assembler.transform(train).cache()
    val assembledVal = assembler.transform(valDf).cache()
    try {
      horizons.map { h =>
        val label = s"target_h$h"
        h -> fit(assembled.filter(col(label).isNotNull), label, callbacks(h),
          assembledVal.filter(col(label).isNotNull))
      }.toMap
    } finally { assembled.unpersist(); assembledVal.unpersist() }
  }

  /** M8: one linear model per horizon (normal-equation solver — one
    * distributed pass per fit).
    */
  def fitPerHorizon(train: DataFrame, featureCols: Seq[String],
      horizons: Seq[Int], regParam: Double = 0.0): Map[Int, LinearRegressionModel] =
    fitPerHorizonWith(train, featureCols, horizons) { (df, label) =>
      new LinearRegression()
        .setFeaturesCol("features").setLabelCol(label)
        .setRegParam(regParam).setSolver("normal")
        .fit(df)
    }.view.mapValues(_.asInstanceOf[LinearRegressionModel]).toMap

  /** M8 non-linear head: gradient-boosted trees per horizon — the honest
    * Spark-native analog of the reference's CNN/LSTM/TCN/Transformer
    * plugins (nonlinear capacity, distributed fit, same save/load
    * contract as S11).
    */
  def fitPerHorizonGbt(train: DataFrame, featureCols: Seq[String], horizons: Seq[Int],
      maxDepth: Int = 5, maxIter: Int = 20, seed: Long = 42L): Map[Int, HorizonModel] =
    fitPerHorizonWith(train, featureCols, horizons) { (df, label) =>
      new GBTRegressor()
        .setFeaturesCol("features").setLabelCol(label)
        .setMaxDepth(maxDepth).setMaxIter(maxIter).setSeed(seed)
        .fit(df)
    }

  /** M8 neural head: one 1-hidden-layer tanh MLP per horizon — the
    * nonlinear-NN step past GBT toward the reference's Keras zoo, within
    * public Spark (distributed treeAggregate gradient descent; see
    * [[MlpRegressor]]).
    */
  def fitPerHorizonMlp(train: DataFrame, featureCols: Seq[String], horizons: Seq[Int],
      hidden: Int = 8, epochs: Int = 300, lr: Double = 0.1,
      seed: Long = 42L): Map[Int, HorizonModel] =
    fitPerHorizonWith(train, featureCols, horizons) { (df, label) =>
      MlpRegressor.fit(df, label, hidden = hidden, epochs = epochs, lr = lr, seed = seed)
    }

  /** M8 deep variant: one multi-layer tanh MLP per horizon (the
    * reference dense heads stack 2-3 layers per branch,
    * `predictor_plugin_ann_best.py:222-226`); `layers` are the hidden
    * widths, e.g. `Seq(16, 8)`.
    */
  def fitPerHorizonDeepMlp(train: DataFrame, featureCols: Seq[String], horizons: Seq[Int],
      layers: Seq[Int], epochs: Int = 300, lr: Double = 0.1,
      seed: Long = 42L, dropout: Double = 0.0,
      callbacks: Int => Seq[Callbacks.TrainingCallback] = _ => Nil,
      opt: Optimizer.OptConfig = Optimizer.FullBatchGd,
      activation: String = "tanh",
      valData: Option[DataFrame] = None): Map[Int, HorizonModel] = valData match {
    case Some(v) => fitPerHorizonWithVal(train, v, featureCols, horizons, callbacks) {
      (df, label, cbs, vdf) =>
        MlpRegressor.fitLayers(df, label, layers, epochs = epochs, lr = lr, seed = seed,
          dropout = dropout, callbacks = cbs, opt = opt, activation = activation,
          valData = Some(vdf))
    }
    case None => fitPerHorizonWith(train, featureCols, horizons, callbacks) { (df, label, cbs) =>
      MlpRegressor.fitLayers(df, label, layers, epochs = epochs, lr = lr, seed = seed,
        dropout = dropout, callbacks = cbs, opt = opt, activation = activation)
    }
  }

  /** M8 temporal-conv head: one dilated causal Conv1D net per horizon
    * (the reference's champion TCN architecture re-expressed, see
    * [[TcnRegressor]]); the assembled lag window is read as the input
    * sequence.
    */
  def fitPerHorizonTcn(train: DataFrame, featureCols: Seq[String], horizons: Seq[Int],
      conf: TcnRegressor.TcnConfig = TcnRegressor.TcnConfig(),
      dropout: Double = 0.0,
      callbacks: Int => Seq[Callbacks.TrainingCallback] = _ => Nil,
      opt: Optimizer.OptConfig = Optimizer.FullBatchGd): Map[Int, HorizonModel] =
    fitPerHorizonWith(train, featureCols, horizons, callbacks) { (df, label, cbs) =>
      TcnRegressor.fit(df, label, conf, dropout = dropout, callbacks = cbs, opt = opt)
    }

  /** M8 CNN head: one strided causal Conv1D net per horizon (the
    * reference's largest plugin family — `predictor_plugin_cnn.py` and
    * its six siblings — re-expressed, see [[CnnRegressor]]); the
    * assembled lag window is read as the input sequence.
    */
  def fitPerHorizonCnn(train: DataFrame, featureCols: Seq[String], horizons: Seq[Int],
      conf: CnnRegressor.CnnConfig = CnnRegressor.CnnConfig(),
      dropout: Double = 0.0,
      callbacks: Int => Seq[Callbacks.TrainingCallback] = _ => Nil,
      opt: Optimizer.OptConfig = Optimizer.FullBatchGd,
      valData: Option[DataFrame] = None): Map[Int, HorizonModel] = valData match {
    case Some(v) => fitPerHorizonWithVal(train, v, featureCols, horizons, callbacks) {
      (df, label, cbs, vdf) =>
        CnnRegressor.fit(df, label, conf, dropout = dropout, callbacks = cbs,
          opt = opt, valData = Some(vdf))
    }
    case None => fitPerHorizonWith(train, featureCols, horizons, callbacks) { (df, label, cbs) =>
      CnnRegressor.fit(df, label, conf, dropout = dropout, callbacks = cbs, opt = opt)
    }
  }

  /** M8 recurrent head: one LSTM per horizon (the reference's LSTM
    * predictors re-expressed, see [[LstmRegressor]]); the assembled lag
    * window is walked as the input sequence.
    */
  def fitPerHorizonLstm(train: DataFrame, featureCols: Seq[String], horizons: Seq[Int],
      conf: LstmRegressor.LstmConfig = LstmRegressor.LstmConfig(),
      dropout: Double = 0.0,
      callbacks: Int => Seq[Callbacks.TrainingCallback] = _ => Nil,
      opt: Optimizer.OptConfig = Optimizer.FullBatchGd,
      valData: Option[DataFrame] = None): Map[Int, HorizonModel] = valData match {
    case Some(v) => fitPerHorizonWithVal(train, v, featureCols, horizons, callbacks) {
      (df, label, cbs, vdf) =>
        LstmRegressor.fit(df, label, conf, dropout = dropout, callbacks = cbs,
          opt = opt, valData = Some(vdf))
    }
    case None => fitPerHorizonWith(train, featureCols, horizons, callbacks) { (df, label, cbs) =>
      LstmRegressor.fit(df, label, conf, dropout = dropout, callbacks = cbs, opt = opt)
    }
  }

  /** M8 N-BEATS head: one generic-basis doubly-residual stack per
    * horizon (the reference's `predictor_plugin_n_beats.py` re-expressed,
    * see [[NBeatsRegressor]]).
    */
  def fitPerHorizonNBeats(train: DataFrame, featureCols: Seq[String],
      horizons: Seq[Int],
      conf: NBeatsRegressor.NBeatsConfig = NBeatsRegressor.NBeatsConfig(),
      dropout: Double = 0.0,
      callbacks: Int => Seq[Callbacks.TrainingCallback] = _ => Nil,
      opt: Optimizer.OptConfig = Optimizer.FullBatchGd): Map[Int, HorizonModel] =
    fitPerHorizonWith(train, featureCols, horizons, callbacks) { (df, label, cbs) =>
      NBeatsRegressor.fit(df, label, conf, dropout = dropout, callbacks = cbs, opt = opt)
    }

  /** M8 TFT head: one gated-residual LSTM + attention fusion net per
    * horizon (the reference's `predictor_plugin_tft.py` re-expressed,
    * see [[TftRegressor]]).
    */
  def fitPerHorizonTft(train: DataFrame, featureCols: Seq[String],
      horizons: Seq[Int],
      conf: TftRegressor.TftConfig = TftRegressor.TftConfig(),
      dropout: Double = 0.0,
      callbacks: Int => Seq[Callbacks.TrainingCallback] = _ => Nil,
      opt: Optimizer.OptConfig = Optimizer.FullBatchGd,
      valData: Option[DataFrame] = None): Map[Int, HorizonModel] = valData match {
    case Some(v) => fitPerHorizonWithVal(train, v, featureCols, horizons, callbacks) {
      (df, label, cbs, vdf) =>
        TftRegressor.fit(df, label, conf, dropout = dropout, callbacks = cbs,
          opt = opt, valData = Some(vdf))
    }
    case None => fitPerHorizonWith(train, featureCols, horizons, callbacks) { (df, label, cbs) =>
      TftRegressor.fit(df, label, conf, dropout = dropout, callbacks = cbs, opt = opt)
    }
  }

  /** M8 attention head: one multi-head self-attention net per horizon
    * (the reference's Transformer predictors re-expressed, see
    * [[AttentionRegressor]]).
    */
  def fitPerHorizonAttention(train: DataFrame, featureCols: Seq[String],
      horizons: Seq[Int],
      conf: AttentionRegressor.AttnConfig = AttentionRegressor.AttnConfig(),
      dropout: Double = 0.0,
      callbacks: Int => Seq[Callbacks.TrainingCallback] = _ => Nil,
      opt: Optimizer.OptConfig = Optimizer.FullBatchGd,
      valData: Option[DataFrame] = None): Map[Int, HorizonModel] = valData match {
    case Some(v) => fitPerHorizonWithVal(train, v, featureCols, horizons, callbacks) {
      (df, label, cbs, vdf) =>
        AttentionRegressor.fit(df, label, conf, dropout = dropout, callbacks = cbs,
          opt = opt, valData = Some(vdf))
    }
    case None => fitPerHorizonWith(train, featureCols, horizons, callbacks) { (df, label, cbs) =>
      AttentionRegressor.fit(df, label, conf, dropout = dropout, callbacks = cbs, opt = opt)
    }
  }

  /** Apply the per-horizon models: adds `pred_h{h}` columns. */
  def predict(models: Map[Int, _ <: HorizonModel], df: DataFrame,
      featureCols: Seq[String]): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(df)
    models.toSeq.sortBy(_._1).foldLeft(assembled) { case (d, (h, m)) =>
      m.set(m.predictionCol, s"pred_h$h").asInstanceOf[org.apache.spark.ml.Transformer].transform(d)
    }
  }

  /** Per-forward-pass MC-dropout across the per-horizon model zoo
    * (the reference's Bayesian mode applied to whichever head won
    * selection): adds `pred_h{h}` / `unc_h{h}` per horizon via the
    * head-appropriate [[McDropout]] overload. Seeds are offset by the
    * horizon so two horizons' masks are independent. Heads without a
    * stochastic forward (linear, GBT) have no dropout semantics — use
    * [[ensembleUncertainty]] for those; asking for MC-dropout on them
    * fails loudly rather than returning a silent zero uncertainty.
    */
  def predictWithUncertainty(models: Map[Int, _ <: HorizonModel], df: DataFrame,
      idCol: String, featureCols: Seq[String], passes: Int = 30,
      rate: Double = 0.1, seed: Long = 42L): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(df)
    models.toSeq.sortBy(_._1).foldLeft(assembled) { case (d, (h, m)) =>
      val scored = m match {
        case mm: MlpRegressor.MlpRegressionModel =>
          McDropout.predictWithUncertainty(mm, d, idCol, "features", passes, rate, seed + h)
        case mm: TcnRegressor.TcnRegressionModel =>
          McDropout.predictWithUncertainty(mm, d, idCol, "features", passes, rate, seed + h)
        case mm: CnnRegressor.CnnRegressionModel =>
          McDropout.predictWithUncertainty(mm, d, idCol, "features", passes, rate, seed + h)
        case mm: LstmRegressor.LstmRegressionModel =>
          McDropout.predictWithUncertainty(mm, d, idCol, "features", passes, rate, seed + h)
        case mm: AttentionRegressor.AttentionRegressionModel =>
          McDropout.predictWithUncertainty(mm, d, idCol, "features", passes, rate, seed + h)
        case mm: TftRegressor.TftRegressionModel =>
          McDropout.predictWithUncertainty(mm, d, idCol, "features", passes, rate, seed + h)
        case mm: NBeatsRegressor.NBeatsRegressionModel =>
          McDropout.predictWithUncertainty(mm, d, idCol, "features", passes, rate, seed + h)
        case other => throw new IllegalArgumentException(
          s"predictWithUncertainty: no MC-dropout forward for ${other.getClass.getSimpleName}; " +
            "use ensembleUncertainty for deterministic heads")
      }
      scored.withColumnRenamed("pred_mean", s"pred_h$h")
        .withColumnRenamed("pred_unc", s"unc_h$h")
    }
  }

  /** M7: bootstrap-ensemble uncertainty — K models on seeded resamples;
    * per-row ensemble mean/std via the A8 groupBy pattern (exploded
    * sample → avg/stddev_pop), the distributed analog of MC-dropout
    * (`common/bayesian.py:70-134`).
    */
  def ensembleUncertainty(train: DataFrame, score: DataFrame, featureCols: Seq[String],
      labelCol: String, idCol: String, k: Int, seed: Long = 42L): DataFrame = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val assembledTrain = assembler.transform(train).cache()
    val assembledScore = assembler.transform(score).cache()
    try {
      val preds = (0 until k).map { i =>
        val boot = assembledTrain.sample(withReplacement = true, 1.0, seed + i)
        val m = new LinearRegression()
          .setFeaturesCol("features").setLabelCol(labelCol).setSolver("normal")
          .fit(boot)
        m.setPredictionCol("sample_pred").transform(assembledScore)
          .select(col(idCol), col("sample_pred"))
      }
      val all = preds.reduce(_.unionByName(_))
      Metrics.mcStats(all, Seq(idCol), "sample_pred")
        .withColumnRenamed("mc_mean", "pred_mean")
        .withColumnRenamed("mc_std", "pred_unc")
    } finally { assembledTrain.unpersist(); assembledScore.unpersist() }
  }

  /** Optimizer objective (M10 fitness): val MAE − val naive MAE on a
    * horizon (`optimization_stats.json` semantics: negative = beats
    * naive).
    */
  def naiveRelativeFitness(pred: DataFrame, predCol: String, targetCol: String,
      baselineCol: String): Double = {
    val row = pred.agg(
      Metrics.mae(col(predCol), col(targetCol)).as("mae"),
      Metrics.naiveMae(col(baselineCol), col(targetCol)).as("naive")).head()
    row.getDouble(0) - row.getDouble(1)
  }

  /** M10: driver-side hyper-parameter search — each candidate evaluated
    * by a Spark job, best (lowest fitness) wins. The GA loop of the
    * reference reduces to this dispatch shape; generations = repeated
    * calls with a mutated candidate set.
    */
  def search[C](candidates: Seq[C], evaluate: C => Double): (C, Double) =
    candidates.map(c => c -> evaluate(c)).minBy(_._2)
}
