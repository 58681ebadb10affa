package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.metrics.Metrics
import graft.ml.{Forecaster, Optimizer}
import graft.target.Targets

/** SURVEY §5(b) QUANTITATIVE golden parity: run the forecast pipeline on
  * the reference's own committed phase-1 EURUSD hourly bars and emit the
  * reference's results-CSV grid with metrics in DENORMALIZED PRICE space
  * (`pipeline_plugins/stl_metrics.py:66-90`: MAE/R² on
  * `denormalize(pred)` vs `denormalize(target)`, Uncertainty =
  * `mean|denormalize_returns(unc)|`, SNR = `mean(pred_price)/(unc+1e-9)`)
  * so the committed artifact's magnitudes are directly comparable to
  * `examples/results/phase_1/phase_1_ann_12600_1h_results.csv` and
  * `…_1575_…` — the quality-parity evidence `QuantParitySpec` asserts.
  *
  * Input reconstruction (the experiment's exact train file is not in the
  * reference's committed data):
  *   - the reference trains on `normalized_d4.csv` (hourly EURUSD
  *     2012-09→2017-09, z-scored per `normalization_config_b.json`),
  *     validates on `normalized_d5`, tests on `normalized_d6`
  *     (`examples/config/phase_1/phase_1_ann_12600_1h_config.json`).
  *     NONE of the run's exact split files are committed: the committed
  *     `base_d2/d3/d5/d6` are a LATER RE-CUT of the same EURUSD hourly
  *     series — the run's own prediction CSV
  *     (`phase_1_ann_1575_1h_prediction.csv`) spans 2017-05→2018-05 and
  *     its `test_CLOSE` values differ from the committed bars at shared
  *     timestamps by a consistent ~100-140 pips (different feed cut).
  *   - so: train = first `maxStepsTrain` rows of base_d2 ⧺ base_d3
  *     (chronological), validation = base_d5, test = first 6300 rows of
  *     base_d6 (`max_steps_test`), every column z-scored with the
  *     committed `normalization_config_b.json` stats — the same
  *     instrument, frequency, schema, normalization, and experiment
  *     shape, on the data the reference actually commits (the spec's
  *     tolerance justification accounts for the period/feed gap).
  *
  * Faithful-by-construction pieces: first-N row truncation
  * (`default_preprocessor.py:144`, our `Sources.loadCsv(maxRows)`),
  * z-normalization from the committed stats JSON (S4), tanh MLP
  * [48, 24] (`intermediate_layers: 2`, `initial_layer_size: 48`,
  * `layer_size_divisor: 2`, `activation: "tanh"`), mc_samples 20,
  * horizons 1–6, population Std Dev across re-fit iterations.
  * The model predicts h-step RETURNS (`use_returns: true` in the
  * producing configs) with metrics reconstructed in price space.
  * Documented re-expressions: 4 band columns + 24 CLOSE lag deltas
  * instead of the 144-step flattened level window (the
  * per-horizon-head boundary, SURVEY §2.9; see the feature-map comment
  * in `main`), and the repo's r8 OptProbe-tuned AdamW regime (b8, lr
  * 0.03, wd 1e-4) instead of Adam lr 1e-3 × batch 128 × 400 epochs +
  * early stopping — fewer, curvature-adaptive steps reaching the same
  * loss basin (PLANS.md round-8 table).
  *
  * Row-for-row diffable: the emitted grid carries the same metric set
  * and order as the reference artifact (MAE, R2, Uncertainty, SNR —
  * the committed runs' `metric_names`; Naive MAE is absent there
  * because their `baseline` was None).
  */
object ParityRun {

  val RefData = "/root/reference/examples/data/phase_1"
  val RefData21 = "/root/reference/examples/data/phase_2_1"

  /** One reference experiment family whose committed inputs + results
    * grid this runner reconstructs. `minMax` selects the normalization
    * regime (`stl_norm.py` supports both forms under the CLOSE entry):
    * phase_1 is z-score (`normalization_config_b.json` mean/std),
    * phase_2_1 is min-max (`phase_2_1_debug_out.json`,
    * `normalization_range [0,1]`). `trainFiles` are absolute — the
    * phase_2_1 run's train period (≈2010-03→2014-03, 25,200 rows,
    * uncommitted) CONTAINS phase_1's committed base_d2⧺d3 (2010-04→
    * 2012-09), so its reconstruction trains on an actual SUBSET of the
    * true train window. `bandCols`: phase_2_1's schema is bare OHLC (no
    * intra-bar band columns), so its ann features are the lag deltas
    * alone. */
  case class PhaseData(normJsonPath: String, minMax: Boolean,
      trainFiles: Seq[String], valFile: String, testFile: String,
      testMax: Int, bandCols: Seq[String], artifactPrefix: String,
      targetCol: String = "CLOSE", horizons: Seq[Int] = 1 to 6,
      suffix: String = "1h", preNormalized: Boolean = false,
      // derive the intra-bar band columns from OHLC (cuts whose files
      // are bare OHLC; the bands are exact OHLC differences — see
      // [[ExtendedCuts]]) and/or compute the phase_3 TA-indicator
      // feature chain before normalization
      deriveBands: Boolean = false, indicators: Boolean = false,
      // decoupled weight decay: the runner's substitute for the
      // reference's val-loss early stopping. The 1d family's long
      // horizons (24-144 bars = 4-24 days) are mostly UNpredictable —
      // the reference's own committed grid shows its net learned ≈
      // nothing beyond naive there (its Train R2 H144 is NEGATIVE,
      // -0.218, with Train MAE ≈ the naive level) and early stopping is
      // what kept it that way on val/test; without stopping, a lightly
      // decayed head overfits train residual noise and transfers it as
      // systematic test error. Heavier decay prices in the same
      // capacity control.
      weightDecay: Double = 1e-4)

  val RefData1d = "/root/reference/examples/data_downsampled/phase_1"
  val RefData3 = "/root/reference/examples/data/phase_3"

  /** Every committed hourly cut of the EURUSD series usable as phase_1
    * TRAIN data — the r9 verdict's open question ("does phase_3 extend
    * the phase_1 pool?") answered by period analysis: the cuts agree
    * EXACTLY (0 value diffs at every shared timestamp — same feed), and
    * together the pre-validation bars number 37,141 distinct hours:
    *   phase_1 d2⧺d3   2010-04→2012-09 (15,424)
    *   phase_3 d2⧺d3   2010-03→2012-09 (+262 new at the start)
    *   phase_2_1 d2    2014-03→2017-03 (18,439 — the missing middle)
    *   phase_2_1 d3    2017-03→2020-03 (3,016 pre-validation rows)
    *   phase_3 d5      2017-08→2018-11 (619 pre-val rows, all shared
    *                   with phase_2_1 d3)
    * so the 25200 data-scale cell IS reachable from committed data
    * (`QuantParitySpec` pins the cross-cut agreement). phase_2_1/3
    * files carry bare OHLC; the band columns are derived — they are
    * exact OHLC differences (BC-BO = CLOSE−OPEN, BH-BL = HIGH−LOW,
    * BH-BO = HIGH−OPEN, BO-BL = OPEN−LOW; verified 0 mismatches on
    * the committed phase_1 files), so derivation is applied uniformly
    * to every cut for bitwise determinism of the union.
    */
  val ExtendedCuts: Seq[String] = Seq(
    s"$RefData/base_d2.csv", s"$RefData/base_d3.csv",
    s"$RefData3/base_d2.csv", s"$RefData3/base_d3.csv", s"$RefData3/base_d5.csv",
    s"$RefData21/base_d2.csv", s"$RefData21/base_d3.csv")

  val Phases: Map[String, PhaseData] = Map(
    "1" -> PhaseData(s"$RefData/normalization_config_b.json", minMax = false,
      Seq(s"$RefData/base_d2.csv", s"$RefData/base_d3.csv"),
      s"$RefData/base_d5.csv", s"$RefData/base_d6.csv", 6300,
      Seq("BC-BO", "BH-BL", "BH-BO", "BO-BL"), "graft_phase_1"),
    "2_1" -> PhaseData(s"$RefData21/phase_2_1_debug_out.json", minMax = true,
      Seq(s"$RefData/base_d2.csv", s"$RefData/base_d3.csv"),
      s"$RefData21/base_d2.csv", s"$RefData21/base_d3.csv", 6300,
      Nil, "graft_phase_2_1"),
    // phase_3_1 (`examples/config/phase_3_1/phase_3_1_ann_25200_1h_
    // config.json`): the stl_pipeline + stl_preprocessor family whose
    // feature schema (`phase_3_debug_out.json`) carries the TA
    // indicator columns — RSI, MACD family, EMA, stochastic, ADX/DI±,
    // ATR, CCI, WilliamsR, Momentum, ROC — min-max normalized. The
    // train file (`normalized_d4`, 25,200 rows) is uncommitted like
    // phase_1's; the committed phase_3 bars are bare OHLC, so bands AND
    // indicators are computed here from the standard public formulas
    // (`graft.ts.TechIndicators`; the reference repo commits no
    // indicator code — the columns arrive precomputed in its data
    // files) and normalized with the committed per-indicator min/max
    // stats. Features excluded as UNRECONSTRUCTABLE from committed
    // data: S&P500_Close, vix_close (external feeds), CLOSE_15m/30m
    // sub-bar ticks (no committed sub-hourly bars); calendar columns
    // excluded for the documented phase_1 drift-memorization reason.
    "3_1" -> PhaseData(s"$RefData3/phase_3_debug_out.json", minMax = true,
      Seq(s"$RefData3/base_d2.csv", s"$RefData3/base_d3.csv"),
      s"$RefData3/base_d5.csv", s"$RefData3/base_d6.csv", 6300,
      Seq("BC-BO", "BH-BL", "BH-BO", "BO-BL"), "graft_phase_3_1",
      deriveBands = true, indicators = true),
    // The downsampled (4-hour-bar) family: the one experiment whose
    // train/validation/test files are all committed verbatim
    // (`normalized_d4/d5/d6.csv`, consumed untouched). Target
    // `typical_price`; horizons from the committed grid's own labels
    // (H24…H144 bar leads); levels regime reached via the residual
    // reparameterization label = lead − current (bijective; under it
    // `stl_metrics.py`'s level-space formulas reduce exactly to
    // [[priceMetricRows]]). NO PARITY ARTIFACT IS COMMITTED for this
    // family: the committed grid is PROVABLY not a product of the
    // committed data — its Test MAE H144 (0.012831 price = 0.1128 z)
    // forces MSE ≥ MAE² = 0.01273 z² (Jensen), but the committed
    // normalized_d6's H144 target variance is only 0.01844 z², capping
    // R² at 0.310 where the grid reports +0.778 (H24: cap 0.741 vs
    // reported 0.865). `QuantParitySpec` pins this bound so the
    // exclusion is machine-checked rather than asserted. The runner
    // path is kept working for users with consistent daily data.
    "1d" -> PhaseData(s"$RefData1d/normalization_config_b.json", minMax = false,
      Seq(s"$RefData1d/normalized_d4.csv"),
      s"$RefData1d/normalized_d5.csv", s"$RefData1d/normalized_d6.csv", 6300,
      // hod/dow cyclics generalize (session/week effects); dom/moy are
      // EXCLUDED — over a 1575-bar (~9-month) train slice, month-of-year
      // is a pure drift-memorization channel whose seasonal residuals
      // transfer as systematic test error (the role the reference's
      // val-loss early stopping polices in its run)
      Seq("hod_sin", "hod_cos", "dow_sin", "dow_cos",
        "rolling_std_24", "price_minus_ema"),
      "graft_phase_1", targetCol = "typical_price",
      horizons = Seq(24, 48, 72, 96, 120, 144), suffix = "1d",
      preNormalized = true, weightDecay = 1e-2))

  /** The phase_3 feature schema's indicator column names, spelled as the
    * committed `phase_3_debug_out.json` normalization keys spell them. */
  val IndicatorCols: Seq[String] = Seq("EMA", "RSI", "ATR", "ADX", "DI+", "DI-",
    "MACD", "MACD_Signal", "MACD_Histogram", "Momentum", "ROC",
    "Stochastic_%K", "Stochastic_%D", "WilliamsR", "CCI")

  /** The band columns as OHLC differences (exact on the committed
    * phase_1 files — see [[ExtendedCuts]]). */
  val BandExprs: Seq[(String, Column)] = Seq(
    "BC-BO" -> (col("CLOSE") - col("OPEN")), "BH-BL" -> (col("HIGH") - col("LOW")),
    "BH-BO" -> (col("HIGH") - col("OPEN")), "BO-BL" -> (col("OPEN") - col("LOW")))

  def withBands(df: DataFrame): DataFrame =
    BandExprs.foldLeft(df) { case (d, (n, e)) => d.withColumn(n, e) }

  /** The TA feature chain on RAW OHLC (indicators are computed in price
    * units, then min-max normalized with the committed per-indicator
    * stats — RSI's committed range [7.04, 94.04] is a raw-RSI range).
    * Standard public periods: Wilder 14 for RSI/ATR/ADX, MACD 12-26-9,
    * Momentum/ROC 10, stochastic 14/3, CCI 20 (the reference commits no
    * indicator code or periods — only the columns' min/max stats). */
  def withIndicators(df: DataFrame): DataFrame = {
    import graft.ts.TechIndicators
    val w = Window.orderBy(col("ts"))
    TechIndicators.withRecursiveIndicators(df, Nil, Seq("ts"), "HIGH", "LOW", "CLOSE")
      .withColumnRenamed("DI_plus", "DI+")
      .withColumnRenamed("DI_minus", "DI-")
      .withColumn("Momentum", TechIndicators.momentum(col("CLOSE"), w, 10))
      .withColumn("ROC", TechIndicators.roc(col("CLOSE"), w, 10))
      .withColumn("Stochastic_%K",
        TechIndicators.stochasticK(col("CLOSE"), col("HIGH"), col("LOW"), w, 14))
      .withColumn("Stochastic_%D",
        TechIndicators.stochasticD(col("Stochastic_%K"), w))
      .withColumn("WilliamsR",
        TechIndicators.williamsR(col("CLOSE"), col("HIGH"), col("LOW"), w, 14))
      .withColumn("CCI",
        TechIndicators.cci(col("HIGH"), col("LOW"), col("CLOSE"), w, 20))
  }

  /** The phase-family featurization (shared with
    * [[ParityOptimizationRun]]): h-step return targets in normalized
    * units (`use_returns: true`, named `target_h*` for the Forecaster
    * faces' contract) + `nLags` CLOSE lag DELTAS `lag_i − CLOSE` — the
    * level-invariant feature map documented in [[main]].
    */
  def featurize(df: DataFrame, targetCol: String, horizons: Seq[Int],
      nLags: Int): DataFrame = {
    val w = Window.orderBy(col("ts"))
    val ret = Targets.multiHorizonReturns(df, targetCol, horizons, w)
    val named = horizons.foldLeft(ret)((d, h) =>
      d.withColumnRenamed(s"ret_h$h", s"target_h$h"))
    val lagged = Forecaster.withLagFeatures(named, targetCol, nLags,
      Nil, Seq("ts"))
    (1 to nLags).foldLeft(lagged)((d, i) =>
      d.withColumn(s"lagd_$i", col(s"lag_$i") - col(targetCol)))
  }

  /** Normalize every column that has stats; leaves ts/DATE_TIME alone.
    * Mirrors the reference preprocessor's per-column standardization —
    * z-score `(x − mean)/std` or min-max `(x − min)/(max − min)`
    * (`normalization_range [0,1]`) — that produced `normalized_d*.csv`
    * from `base_d*.csv`. */
  def normalize(df: DataFrame, stats: Map[String, (Double, Double)],
      minMax: Boolean = false): DataFrame =
    stats.foldLeft(df) { case (d, (c, (a, b))) =>
      val scale = if (minMax) b - a else b
      if (d.columns.contains(c)) d.withColumn(c, (col(c) - lit(a)) / lit(scale))
      else d
    }

  /** One iteration's (split, metric, horizon, value) rows with metrics in
    * price space, returns regime (`use_returns: true` — the config that
    * produced the committed reference CSVs): the model predicts the
    * normalized h-step return, and the metric pipeline reconstructs
    * prices as `baseline + return` before measuring
    * (`stl_pipeline_old.py:177-196`: MAE =
    * `mean|denormalize_returns(pred − target)|`, R² =
    * `r2_score(denormalize(baseline+target), denormalize(baseline+pred))`,
    * SNR = `mean(pred_price)/(unc+1e-9)` — which the z-score affine map
    * lets us apply algebraically): MAE and Uncertainty scale
    * by the CLOSE std (`pScale`), R² is computed on the RECONSTRUCTED
    * price pair (affine-invariant, so directly on
    * `close_z + ret_z`), and SNR divides the mean reconstructed
    * prediction PRICE by the price-unit uncertainty — which is why the
    * reference's SNR values sit in the thousands (≈1.2 / 0.0004). */
  def priceMetricRows(scored: DataFrame, horizons: Seq[Int], targetCol: String,
      pScale: Double, pShift: Double, split: String): DataFrame = {
    val closeZ = col(targetCol)
    val aggs: Seq[Column] = horizons.flatMap { h =>
      Seq(
        (Metrics.mae(col(s"pred_h$h"), col(s"target_h$h")) * lit(pScale)).as(s"mae_h$h"),
        Metrics.r2(closeZ + col(s"pred_h$h"), closeZ + col(s"target_h$h")).as(s"r2_h$h"),
        (avg(abs(col(s"unc_h$h"))) * lit(pScale)).as(s"uncertainty_h$h"),
        ((avg(closeZ + col(s"pred_h$h")) * lit(pScale) + lit(pShift)) /
          (avg(abs(col(s"unc_h$h"))) * lit(pScale) + lit(1e-9))).as(s"snr_h$h"))
    }
    val wide = scored
      .filter(horizons.map(h => col(s"target_h$h").isNotNull).reduce(_ && _))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("split", lit(split))
    horizons.flatMap { h =>
      Seq(s"mae_h$h" -> ("MAE", h), s"r2_h$h" -> ("R2", h),
        s"uncertainty_h$h" -> ("Uncertainty", h), s"snr_h$h" -> ("SNR", h))
    }.map { case (c, (name, h)) =>
      wide.select(col("split"), lit(name).as("metric"), lit(h).as("horizon"),
        col(c).as("value"))
    }.reduce(_.unionByName(_))
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("golden/phase_1_parity")
    val epochs = args.lift(1).map(_.toInt).getOrElse(60)
    // an `ext` suffix (e.g. "12600ext") draws the variant's train rows
    // from the extended all-committed-cuts pool (last N pre-validation
    // hours) regardless of the base pool's size — the PERIOD-MATCH
    // probe: at 12600 that window (≈2016-04→2017-09) lies inside the
    // reference's actual (uncommitted) train period, isolating how much
    // of the committed artifact's train-MAE gap is the 2010-12 vs
    // 2012-17 volatility-regime difference rather than method.
    val variants = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("12600", "1575"))
      .map(l => l -> l.stripSuffix("ext").toInt)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()

    val phaseKey = args.lift(4).getOrElse("1")
    val phase = Phases(phaseKey)
    val stats = Sources.loadNormStats(spark, phase.normJsonPath)
    val (closeA, closeB) = stats(phase.targetCol)
    // denorm slope/shift of the target: z-score → (std, mean); min-max →
    // (max − min, min)
    val (pScale, pShift) =
      if (phase.minMax) (closeB - closeA, closeA) else (closeB, closeA)
    val horizons = phase.horizons
    val nLags = 24
    // Level-invariant feature map (the documented re-expression of the
    // reference's 144×8 normalized-level window): the intra-bar band
    // columns (already differences; phase_1 only) + 24 CLOSE lag DELTAS
    // `lag_i − CLOSE`. An invertible linear function of the reference's
    // window entries that carries the same relative structure WITHOUT
    // the absolute price level — the level shifts by whole normalized
    // units between the committed train years (2010-12, ~1.30-1.45) and
    // the reference's val/test years (2017-20, ~1.08-1.25), and a
    // small per-horizon head, unlike the reference's 144-wide net,
    // cannot both memorize and ignore it.
    val featureCols = phase.bandCols ++ (1 to nLags).map(i => s"lagd_$i") ++
      (if (phase.indicators) IndicatorCols else Nil)

    def loadNorm(path: String, maxRows: Option[Int] = None): DataFrame = {
      val raw0 = Sources.loadCsv(spark, path, maxRows = maxRows)
      val raw1 = if (phase.deriveBands) withBands(raw0) else raw0
      val raw = if (phase.indicators) withIndicators(raw1) else raw1
      if (phase.preNormalized) raw else normalize(raw, stats, phase.minMax)
    }

    // train pool: the committed splits nearest the experiment's
    // (uncommitted) train period, chronological
    val pool = phase.trainFiles.map(f => loadNorm(f)).reduce(_.unionByName(_))
      .orderBy("ts")
    val poolCount = pool.count()
    val validation = loadNorm(phase.valFile)
    val test = loadNorm(phase.testFile, maxRows = Some(phase.testMax))

    /** The 25200-scale pool: union of [[ExtendedCuts]] deduped by
      * timestamp (cuts agree exactly at shared hours), bands derived
      * uniformly from OHLC, capped to bars BEFORE the validation period
      * (training on d5/d6 hours would leak the val/test splits), then
      * the LAST `maxTrain` bars — the window with maximal overlap with
      * the reference's actual (uncommitted) train file d4 (2012-09→
      * 2017-09): 21,455 of the 25,200 selected bars lie inside d4's
      * true period; the remaining 3,745 precede it by ≤7 months.
      */
    def extendedPool(maxTrain: Int): DataFrame = {
      val valStart = validation.agg(min(col("ts"))).head().getTimestamp(0)
      val raw = ExtendedCuts.map { f =>
        withBands(Sources.loadCsv(spark, f).select("ts", "OPEN", "LOW", "HIGH", "CLOSE"))
      }.reduce(_.unionByName(_))
      val merged = raw.dropDuplicates("ts").filter(col("ts") < lit(valStart))
      val lastN = merged.orderBy(col("ts").desc).limit(maxTrain).orderBy("ts")
      // indicator state crosses the union's two period seams with ~40
      // rows of warm-up distortion each — negligible at 25,200 rows
      val feat = if (phase.indicators) withIndicators(lastN) else lastN
      normalize(feat, stats, phase.minMax).orderBy("ts")
    }

    // returns regime (`use_returns: true`): targets are h-step CLOSE
    // deltas in z-units; `target_h*` naming keeps the Forecaster faces'
    // contract
    def featurized(df: DataFrame): DataFrame = {
      val f = featurize(df, phase.targetCol, horizons, nLags)
      // indicator warm-up rows (nulls) are dropped like lag warm-ups
      if (phase.indicators) f.na.drop(IndicatorCols) else f
    }

    val valF = featurized(validation).cache()
    val testF = featurized(test).cache()

    // chronological (oldest → newest) lag-delta sequence for the
    // sequence heads: conv/recurrent/attention heads read the assembled
    // feature vector as the input window in featureCols order
    val seqCols = (nLags to 1 by -1).map(i => s"lagd_$i")
    // arg 5 "earlystop": fit under the reference's LITERAL capacity
    // control instead of the documented weight-decay substitute —
    // `EarlyStopping(monitor='val_loss', restore_best_weights=True)`,
    // the exact instantiation the reference's plugins use
    // (`predictor_plugin_ann_best.py:631`), through the heads'
    // val-loss monitor (`Callbacks.EarlyStopping`; config
    // `early_patience`, `min_delta: 1e-7`, best-val-epoch weights
    // restored on stop), weight decay off so the two regimes are not
    // stacked. Run with epochs high enough that stopping, not the
    // budget, ends training (e.g. 200). Intended for the r9-verdict
    // regime comparison at 12600 (PLANS.md row); the committed
    // artifacts keep whichever regime lands closer.
    val earlyStop = args.lift(5).contains("earlystop")
    val adamw = Optimizer.OptConfig(method = "adamw", batches = 8,
      weightDecay = if (earlyStop) 0.0 else phase.weightDecay)
    val fitCallbacks: Int => Seq[graft.ml.Callbacks.TrainingCallback] =
      if (earlyStop) _ => Seq(new graft.ml.Callbacks.EarlyStopping(
        patience = 20, minDelta = 1e-7, restoreBestWeights = true))
      else _ => Nil

    // head → (feature layout, fit). Architectures mirror the reference
    // plugin family: ann = tanh MLP [48,24]
    // (`predictor_plugin_ann.py`), cnn = relu conv stack
    // (`predictor_plugin_cnn.py:27,66`), lstm = Bidirectional LSTM
    // (`predictor_plugin_lstm.py:506-510`), transformer = multi-head
    // attention + post-attention LayerNorm
    // (`predictor_plugin_transformer.py:73-74`) — each as the
    // per-horizon native head (SURVEY §2.9 M8), all under the same
    // AdamW regime.
    def fitFor(head: String, trainF: DataFrame, seed: Long)
        : (Seq[String], Map[Int, Forecaster.HorizonModel]) = head match {
      case "ann" => (featureCols, Forecaster.fitPerHorizonDeepMlp(
        trainF, featureCols, horizons, layers = Seq(48, 24), epochs = epochs,
        lr = 0.03, seed = seed, opt = adamw, callbacks = fitCallbacks,
        valData = if (earlyStop) Some(valF) else None))
      case "cnn" => (seqCols, Forecaster.fitPerHorizonCnn(
        trainF, seqCols, horizons, graft.ml.CnnRegressor.CnnConfig(
          channels = 16, epochs = epochs, lr = 0.03, seed = seed,
          activation = "relu"), opt = adamw, callbacks = fitCallbacks,
        valData = if (earlyStop) Some(valF) else None))
      case "lstm" => (seqCols, Forecaster.fitPerHorizonLstm(
        trainF, seqCols, horizons, graft.ml.LstmRegressor.LstmConfig(
          units = 8, epochs = epochs, lr = 0.03, seed = seed,
          bidirectional = true), opt = adamw, callbacks = fitCallbacks,
        valData = if (earlyStop) Some(valF) else None))
      case "transformer" => (seqCols, Forecaster.fitPerHorizonAttention(
        trainF, seqCols, horizons, graft.ml.AttentionRegressor.AttnConfig(
          dim = 8, heads = 2, epochs = epochs, lr = 0.03, seed = seed,
          layerNorm = true), opt = adamw, callbacks = fitCallbacks,
        valData = if (earlyStop) Some(valF) else None))
      // the reference's TRUE TFT architecture (LayerNorm at the
      // gated-residual + post-attention sites, 2 stacked LSTM encoder
      // layers — `predictor_plugin_tft.py:85,113-116,127`). No
      // reference TFT results grid exists for phase_1, so the artifact
      // is a graft-only quality grid; `QuantParitySpec` pins it to the
      // family's own magnitude range instead of a reference anchor.
      case "tft" => (seqCols, Forecaster.fitPerHorizonTft(
        trainF, seqCols, horizons, graft.ml.TftRegressor.TftConfig(
          units = 8, epochs = epochs, lr = 0.03, seed = seed,
          lstmLayers = 2, layerNorm = true), opt = adamw, callbacks = fitCallbacks,
        valData = if (earlyStop) Some(valF) else None))
      case other => throw new IllegalArgumentException(s"unknown parity head '$other'")
    }
    val heads = args.lift(3).map(_.split(",").toSeq).getOrElse(Seq("ann"))

    for ((label, maxTrain) <- variants) {
      // a phase-1 variant that outgrows the d2⧺d3 pool (only 25200
      // does) draws from the extended all-committed-cuts pool; the
      // other phases keep the original semantics (limit beyond the pool
      // = the whole pool — the committed phase_2_1 artifact's regime)
      val trainF = featurized(
        if (((phaseKey == "1" || phaseKey == "3_1") && maxTrain > poolCount)
            || label.endsWith("ext"))
          extendedPool(maxTrain)
        else pool.limit(maxTrain)).cache()
      // head × scale is caller-controlled (args 2/3): the committed set
      // runs ann at every scale and the deep zoo at 1575/3150/6300 (the
      // scales where the reference's grids are anomaly-free, r9 verdict)
      for (head <- heads) {
        val iterRows = (1 to 3).map { it =>
          val seed = 42L + 1000L * it
          val (feats, models) = fitFor(head, trainF, seed)
          Seq(("Train", trainF), ("Validation", valF), ("Test", testF)).map {
            case (split, df) =>
              val scored = Forecaster.predictWithUncertainty(models, df, "ts",
                feats, passes = 20, rate = 0.1, seed = seed)
              priceMetricRows(scored, horizons, phase.targetCol, pScale,
                pShift, split)
          }.reduce(_.unionByName(_)).withColumn("iteration", lit(it))
        }.reduce(_.unionByName(_))
        // Stage the Spark CSV write in a dot-prefixed scratch dir UNDER
        // outDir: (a) a job dying mid-write leaves no `_temporary`
        // trees next to committed fixtures (the dot-dir is gitignored),
        // and (b) the final move is a SAME-FILESYSTEM rename — staging
        // on the default temp filesystem let Files.move silently fall
        // back to copy+delete, where a crash mid-move could land a
        // truncated CSV under the final artifact name (r11 ADVICE).
        // ATOMIC_MOVE is requested explicitly so any residual
        // cross-device surprise fails loudly instead of tearing.
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        val scratch = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(outDir), ".parityrun_").toFile
        val stage = new java.io.File(scratch, s"results_${head}_$label")
        Sources.writeCsv(GoldenRun.resultsGolden(iterRows), stage.getPath, Nil)
        val part = stage.listFiles().find(_.getName.startsWith("part-")).get
        // the earlystop regime gets its own artifact name — it must
        // never silently overwrite the committed wd-regime grid
        val regimeTag = if (earlyStop) "_earlystop" else ""
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$outDir/${phase.artifactPrefix}_${head}_${label}_${phase.suffix}${regimeTag}_results.csv"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        def rmTree(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete()
        }
        rmTree(scratch)
        println(s"parity artifact for $head/$label written")
      }
      trainF.unpersist()
    }
    spark.stop()
  }
}
