package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Forecast-quality aggregates (SURVEY §2.6 A2–A7, W16).
  *
  * Each metric is a single declarative aggregate — partial (map-side)
  * aggregation is free from HashAggregateExec, so these scale linearly.
  * R² uses the sum-of-squares identity so one pass suffices.
  */
object Metrics {

  /** A2 MAE: mean |pred − target| (`stl_metrics.py:72`). */
  def mae(pred: Column, target: Column): Column = avg(abs(pred - target))

  /** A4/W16 naive MAE: mean |baseline − target| where baseline = current
    * value ⇒ naive forecast of zero change (`stl_metrics.py:77-81`).
    */
  def naiveMae(baseline: Column, target: Column): Column = avg(abs(baseline - target))

  /** A3 R² = 1 − Σ(t−p)² / Σ(t−mean(t))², single pass via
    * Σ(t−mean)² = Σt² − (Σt)²/n (`losses.py:29-38`).
    */
  def r2(pred: Column, target: Column): Column = {
    val ssRes = sum(pow(target - pred, 2))
    val ssTot = sum(pow(target, 2)) - pow(sum(target), 2) / count(target)
    lit(1.0) - ssRes / ssTot
  }

  /** A5 uncertainty mean: mean |unc·σ| (`stl_metrics.py:74`). */
  def uncertaintyMean(unc: Column, sigma: Double): Column = avg(abs(unc * lit(sigma)))

  /** A6 SNR: mean(pred) / (mean(|unc|) + 1e-9) (`stl_metrics.py:75`). */
  def snr(pred: Column, unc: Column): Column = avg(pred) / (avg(abs(unc)) + lit(1e-9))

  /** A7 cross-iteration stats: avg/std/min/max per (split, metric, horizon)
    * (`stl_metrics.py:164-201`). One groupBy plan, NaNs filtered like the
    * reference.
    */
  def aggregateResults(df: DataFrame, splitCol: String, metricCol: String, horizonCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol)
    df.filter(!isnan(v) && v.isNotNull)
      .groupBy(col(splitCol), col(metricCol), col(horizonCol))
      .agg(
        avg(v).as("avg_value"),
        coalesce(stddev_pop(v), lit(0.0)).as("std_dev"),
        min(v).as("min_value"),
        max(v).as("max_value")
      )
  }

  /** M1 Huber loss (elementwise → mean): ½e² below δ, δ(|e|−½δ) above
    * (`losses.py:120-125`).
    */
  def huberLoss(pred: Column, target: Column, delta: Double): Column = {
    val err = abs(pred - target)
    avg(when(err <= delta, lit(0.5) * err * err)
      .otherwise(lit(delta) * (err - lit(0.5 * delta))))
  }

  /** M4 Pearson structural loss: MAE + α(1 − corr(pred, target))
    * (`losses.py:153-169`).
    */
  def pearsonStructural(pred: Column, target: Column, alpha: Double): Column =
    mae(pred, target) + lit(alpha) * (lit(1.0) - corr(pred, target))

  /** M3 trend-direction penalty: fraction of steps where the predicted
    * and true first differences disagree in sign (`losses.py:134-150`'s
    * direction term, as an evaluation metric).
    */
  def directionPenalty(predDiff: Column, targetDiff: Column): Column =
    // rows with a NULL diff (every series head after lag) are excluded
    // from the denominator — avg skips the null branch
    avg(when(predDiff.isNotNull && targetDiff.isNotNull,
      when(signum(predDiff) * signum(targetDiff) < 0, 1.0).otherwise(0.0)))

  /** M3 FULL trend-sigma loss per series/window group
    * (`losses.py:134-150`): mean Huber, ×2.5 when the end-to-end trend
    * direction disagrees, + λ·max(0, σ_true − σ_pred) penalizing
    * variance collapse. `min_by/max_by(value, order)` pick the group's
    * first/last points without a sort; every term is a merging partial
    * aggregate, so one shuffle on the group key at any scale. NULL rows
    * fall out of every aggregate — the engine-wide analog of the
    * reference's gap mask.
    */
  def trendSigmaLoss(df: DataFrame, keyCols: Seq[String], orderCol: String,
      predCol: String, targetCol: String, lambda: Double = 0.1,
      delta: Double = 1.0): DataFrame = {
    val p = col(predCol)
    val t = col(targetCol)
    val o = col(orderCol)
    df.groupBy(keyCols.map(col): _*)
      .agg(
        huberLoss(p, t, delta).as("__base"),
        (max_by(t, o) - min_by(t, o)).as("__dy_true"),
        (max_by(p, o) - min_by(p, o)).as("__dy_pred"),
        stddev_pop(t).as("__sig_true"),
        stddev_pop(p).as("__sig_pred"))
      .withColumn("__w_dir",
        when(signum(col("__dy_true")) === signum(col("__dy_pred")), 1.0).otherwise(2.5))
      .withColumn("trend_sigma_loss",
        col("__base") * col("__w_dir") +
          lit(lambda) * greatest(lit(0.0), col("__sig_true") - col("__sig_pred")))
      .drop("__base", "__dy_true", "__dy_pred", "__sig_true", "__sig_pred", "__w_dir")
  }

  /** M5 combined first-difference loss: MAE(levels) + α·MAE(diffs)
    * (`losses.py:172-204`).
    */
  def firstDiffLoss(pred: Column, target: Column, predDiff: Column,
      targetDiff: Column, alpha: Double): Column =
    mae(pred, target) + lit(alpha) * mae(predDiff, targetDiff)

  /** A8 Welford-equivalent MC stats: per-key mean/std over exploded
    * samples — Spark's stddev_pop is already single-pass/merging, which is
    * the distributed analog of Welford (`common/bayesian.py:70-134`).
    */
  def mcStats(samples: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    samples.groupBy(keyCols.map(col): _*)
      .agg(avg(col(valueCol)).as("mc_mean"), stddev_pop(col(valueCol)).as("mc_std"))

  /** M2 incentive-scaled composite loss (`losses.py:354-407`,
    * `composite_loss_basic`): mean Huber on the magnitude column divided
    * by an "incentive" in [1, 1000] that rewards beating the naive
    * zero-return predictor, plus `λ·MMD(pred, target)`.
    *
    * Incentive (the CODE's constants — the reference docstring says 10
    * but the implementation uses 1000/999):
    *   ratio = clip(mean|t−p| / (mean|t| + ε), 0, 1), ε = 1e-7
    *   incentive = if mean|t−p| ≤ mean|t| then 1000 − 999·ratio else 1
    *   mean|t−p| ≤ ε  →  incentive = 1000  (perfect-fit override)
    *
    * One shuffle for the Huber/incentive aggregates (all merging
    * partials). The MMD term replays A9's contract: the reference
    * subsamples 256 rows (`losses.py:50-53`, random; here the first
    * `mmdSampleSize` by `orderCols` — deterministic by design), so the
    * O(s²) kernel is bounded per group no matter the corpus size.
    * Returns per-group rows: `huber_raw, incentive, mmd,
    * composite_loss = huber_raw/incentive + λ·mmd`.
    */
  def compositeIncentiveLoss(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], predCol: String, targetCol: String,
      mmdLambda: Double = 0.0, sigma: Double = 1.0, delta: Double = 1.0,
      mmdSampleSize: Int = 256): DataFrame = {
    val p = col(predCol)
    val t = col(targetCol)
    val eps = 1e-7 // Keras backend epsilon (losses.py:382)
    val base = df.groupBy(keyCols.map(col): _*)
      .agg(huberLoss(p, t, delta).as("huber_raw"),
        avg(abs(t - p)).as("__pe"),
        avg(abs(t)).as("__ne"))
      .withColumn("__ratio",
        least(greatest(col("__pe") / (col("__ne") + eps), lit(0.0)), lit(1.0)))
      .withColumn("incentive",
        when(col("__pe") <= eps, 1000.0)
          .when(col("__pe") <= col("__ne"), lit(1000.0) - lit(999.0) * col("__ratio"))
          .otherwise(1.0))
    val withMmd =
      if (mmdLambda == 0.0) base.withColumn("mmd", lit(0.0))
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
          .orderBy(orderCols.map(col): _*)
        val kernel = udf((ps: Seq[Double], ts: Seq[Double]) =>
          Aggregators.mmdGaussian(ps.toArray, ts.toArray, sigma))
        val samp = df
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= mmdSampleSize)
          .groupBy(keyCols.map(col): _*)
          .agg(
            transform(array_sort(collect_list(struct(col("__rn"), p.as("__v")))),
              x => x.getField("__v")).as("__ps"),
            transform(array_sort(collect_list(struct(col("__rn"), t.as("__v")))),
              x => x.getField("__v")).as("__ts"))
          .select((keyCols.map(col) :+
            kernel(col("__ps"), col("__ts")).as("mmd")): _*)
        base.join(samp, keyCols)
      }
    withMmd
      .withColumn("composite_loss",
        col("huber_raw") / col("incentive") + lit(mmdLambda) * col("mmd"))
      .drop("__pe", "__ne", "__ratio")
  }
}
