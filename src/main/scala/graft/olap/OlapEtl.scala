package graft.olap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OLAP star-schema ETL (SURVEY §2.1 S9-S10, §2.6 A12, §2.3 F14;
  * reference `olap/etl_migrate_v2.py`).
  *
  * The reference upserts row-at-a-time into Postgres; here each load is
  * one set-oriented plan: parse → conform dims → keyed upsert. Parquet
  * stands in for the warehouse table; `upsert` emulates `MERGE INTO` as
  * union + row_number-keep-newest — idempotent, no per-row round trips.
  */
object OlapEtl {

  /** F14: the reference's metric-row regex `^(Train|Validation|Test) (.+?) H(\d+)$`
    * (`etl_migrate_v2.py:35`) applied to a results table with columns
    * `Metric, Average, Std Dev, Min, Max` (S8 output shape).
    */
  def parseResults(results: DataFrame): DataFrame = {
    val re = "^(Train|Validation|Test) (.+?) H(\\d+)$"
    results
      .withColumn("split_key", lower(regexp_extract(col("Metric"), re, 1)))
      .withColumn("metric_key", canonicalMetric(regexp_extract(col("Metric"), re, 2)))
      .withColumn("horizon_key",
        // F15 numeric coercion with null fallback (ANSI cast would throw
        // on the '' a non-matching regex yields)
        regexp_extract(col("Metric"), re, 3).try_cast(org.apache.spark.sql.types.IntegerType))
      .filter(col("split_key") =!= "" && col("horizon_key").isNotNull)
      .select(
        col("split_key"), col("metric_key"), col("horizon_key"),
        col("Average").cast("double").as("avg_value"),
        col("`Std Dev`").cast("double").as("std_dev"),
        col("Min").cast("double").as("min_value"),
        col("Max").cast("double").as("max_value"))
  }

  /** Metric-key canonicalization (`etl_migrate_v2.py:515-527`). */
  def canonicalMetric(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c === "MAE", "mae")
      .when(c === "Naive MAE", "naive_mae")
      .when(c === "R2", "r2")
      .when(c === "Uncertainty", "uncertainty")
      .when(c === "SNR", "snr")
      .otherwise(lower(regexp_replace(c, "\\s+", "_")))

  /** Seeded dimensions (`etl_migrate_v2.py:249-269`). */
  def dimDatasetSplit(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq("train", "validation", "test").toDF("split_key")
  }
  def dimHorizon(spark: SparkSession, maxHorizon: Int = 6): DataFrame = {
    import spark.implicits._
    (1 to maxHorizon).toDF("horizon_key")
  }
  def dimMetric(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("mae", "error", "lower_better"),
      ("naive_mae", "error", "lower_better"),
      ("r2", "fit", "higher_better"),
      ("uncertainty", "uncertainty", "lower_better"),
      ("snr", "signal", "higher_better")
    ).toDF("metric_key", "metric_type", "direction")
  }

  /** MERGE INTO emulation: keep the newest row per key across
    * (existing ∪ updates). `precedence` 0 = existing, 1 = update — update
    * wins on key collision (the `ON CONFLICT DO UPDATE` semantics of
    * `etl_migrate_v2.py:292-397`); A12 duplicate purge falls out of the
    * same row_number pattern.
    */
  def upsert(existing: Option[DataFrame], updates: DataFrame, keys: Seq[String]): DataFrame = {
    val unioned = existing match {
      case Some(e) => e.withColumn("__prec", lit(0))
        .unionByName(updates.withColumn("__prec", lit(1)), allowMissingColumns = true)
      case None => updates.withColumn("__prec", lit(1))
    }
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__prec").desc)
    unioned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__prec", "__rn")
  }

  /** Load fact_performance: parse a results table and upsert into the
    * parquet-backed fact on the star-schema grain
    * (`load_performance_metrics`, `etl_migrate_v2.py:455-619`).
    */
  def loadFactPerformance(spark: SparkSession, results: DataFrame,
      experimentKey: String, factPath: String): DataFrame = {
    val updates = parseResults(results)
      .withColumn("experiment_key", lit(experimentKey))
    val existing = SnapshotStore.read(spark, factPath)
    val merged = upsert(existing, updates,
      Seq("experiment_key", "split_key", "metric_key", "horizon_key"))
    // Transactional commit via SnapshotStore (the reference runs its
    // upserts inside a Postgres transaction, `etl_migrate_v2.py:292-397`):
    // the merge plan reads the PREVIOUS snapshot while writing the next
    // directory, so there is no overwrite-while-reading hazard (the old
    // localCheckpoint materialization is gone) and a crash at any point
    // leaves the previous version readable. Old snapshots GC to current+1.
    SnapshotStore.commit(merged, factPath)
    SnapshotStore.gc(factPath)
    SnapshotStore.read(spark, factPath).get
  }

  /** Legacy star-schema fact `olap.fact_predictions`
    * (`olap_schema_postgres.sql:54-64`): one row per (experiment,
    * horizon, ts) with test_close/target/prediction/uncertainty. The
    * reference keeps the table for schema/migration compat without an
    * active loader; this loader melts the engine's own S7 wide
    * prediction output (`stl_io.py:16-117`: `DATE_TIME, test_CLOSE,
    * Target_H{h}, Prediction_H{h}` + a separate `Uncertainty_H{h}`
    * file) into the fact grain. The melt is one `explode(array(struct))`
    * pass — no shuffle until the keyed upsert; the optional
    * uncertainties frame joins on DATE_TIME before melting (one
    * co-grained join).
    */
  def meltPredictions(predictionsWide: DataFrame,
      uncertaintiesWide: Option[DataFrame], experimentKey: String): DataFrame =
    meltPredictions(predictionsWide, uncertaintiesWide, lit(experimentKey))

  /** Column-keyed overload: `experimentKey` evaluated against the wide
    * frame (e.g. a per-series key column for multi-experiment melts).
    */
  def meltPredictions(predictionsWide: DataFrame,
      uncertaintiesWide: Option[DataFrame],
      experimentKey: org.apache.spark.sql.Column): DataFrame = {
    val horizons = predictionsWide.columns
      .flatMap("^Prediction_H(\\d+)$".r.findFirstMatchIn(_).map(_.group(1).toInt))
      .sorted
    require(horizons.nonEmpty, "no Prediction_H{h} columns to melt")
    val joined = uncertaintiesWide match {
      case Some(u) => predictionsWide.join(u, Seq("DATE_TIME"), "left")
      case None => predictionsWide
    }
    def unc(h: Int) =
      if (joined.columns.contains(s"Uncertainty_H$h"))
        col(s"Uncertainty_H$h").cast("double")
      else lit(null).cast("double")
    joined.select(
        experimentKey.cast("string").as("experiment_key"),
        col("DATE_TIME").as("ts"),
        col("test_CLOSE").cast("double").as("test_close"),
        explode(array(horizons.map(h => struct(
          lit(h).as("horizon_key"),
          col(s"Target_H$h").cast("double").as("target_value"),
          col(s"Prediction_H$h").cast("double").as("prediction_value"),
          unc(h).as("uncertainty"))): _*)).as("__h"))
      .select(
        col("experiment_key"),
        col("__h.horizon_key").as("horizon_key"),
        col("ts"), col("test_close"),
        col("__h.target_value").as("target_value"),
        col("__h.prediction_value").as("prediction_value"),
        col("__h.uncertainty").as("uncertainty"))
  }

  /** Load [[meltPredictions]] output into the snapshot-versioned
    * `fact_predictions` (upsert grain: experiment × horizon × ts).
    */
  def loadFactPredictions(spark: SparkSession, predictionsWide: DataFrame,
      uncertaintiesWide: Option[DataFrame], experimentKey: String,
      factPath: String): DataFrame = {
    val updates = meltPredictions(predictionsWide, uncertaintiesWide, experimentKey)
    val merged = upsert(SnapshotStore.read(spark, factPath), updates,
      Seq("experiment_key", "horizon_key", "ts"))
    SnapshotStore.commit(merged, factPath)
    SnapshotStore.gc(factPath)
    SnapshotStore.read(spark, factPath).get
  }

  /** Legacy star-schema fact `olap.fact_trade_metrics`
    * (`olap_schema_postgres.sql:66-78`): one aggregated strategy-result
    * row per (experiment, horizon?) from the backtest trades relation
    * the engine already produces (`Backtest.Trade` shape — the
    * reference's `heuristic_strategy.py:313-332` summary stats plus the
    * schema's ratio columns). Conventions (the reference has no loader
    * to pin them): per-trade profit is the return unit — sharpe =
    * mean/stddev_pop of per-trade profit, sortino uses downside
    * root-mean-square (profits clamped at 0), no annualization;
    * max_drawdown = the worst intra-trade adverse excursion.
    * One aggregation pass over the trades.
    */
  def tradeMetrics(trades: DataFrame, experimentKey: String,
      horizonKey: Option[Int] = None): DataFrame = {
    val downside = when(col("profit") < 0.0, col("profit")).otherwise(lit(0.0))
    trades.agg(
        sum(col("profit")).as("total_profit"),
        max(col("maxDrawdown")).as("max_drawdown"),
        avg(col("profit")).as("__mean"),
        stddev_pop(col("profit")).as("__sd"),
        sqrt(avg(downside * downside)).as("__dd"),
        (count(when(col("profit") > 0.0, 1)) / count(lit(1)).cast("double")).as("win_rate"),
        avg(col("profit")).as("avg_trade_return"),
        count(lit(1)).cast("int").as("trades_count"))
      .select(
        lit(experimentKey).as("experiment_key"),
        horizonKey.map(h => lit(h)).getOrElse(lit(null)).cast("int").as("horizon_key"),
        col("total_profit"), col("max_drawdown"),
        when(col("__sd") > 0.0, col("__mean") / col("__sd")).as("sharpe"),
        when(col("__dd") > 0.0, col("__mean") / col("__dd")).as("sortino"),
        col("win_rate"), col("avg_trade_return"), col("trades_count"))
  }

  /** Load [[tradeMetrics]] into the snapshot-versioned
    * `fact_trade_metrics` (upsert grain: experiment × horizon).
    */
  def loadFactTradeMetrics(spark: SparkSession, trades: DataFrame,
      experimentKey: String, horizonKey: Option[Int], factPath: String): DataFrame = {
    val updates = tradeMetrics(trades, experimentKey, horizonKey)
    val merged = upsert(SnapshotStore.read(spark, factPath), updates,
      Seq("experiment_key", "horizon_key"))
    SnapshotStore.commit(merged, factPath)
    SnapshotStore.gc(factPath)
    SnapshotStore.read(spark, factPath).get
  }

  /** Legacy star-schema fact `olap.fact_experiment_metrics`
    * (`olap_schema_postgres.sql:40-52`): per (experiment, split,
    * horizon) row with the five metrics PIVOTED into columns (mae, r2,
    * uncertainty, snr, naive_error) — the wide face of the long
    * `fact_performance` grain. Built from [[parseResults]] output by
    * one grouped conditional-aggregation pass (no `pivot()` — the
    * metric set is fixed by the DDL, so `max(when(...))` keeps the
    * plan a plain partial-agg'd groupBy).
    */
  def experimentMetrics(results: DataFrame, experimentKey: String): DataFrame = {
    def m(key: String) =
      max(when(col("metric_key") === key, col("avg_value"))).as(
        if (key == "naive_mae") "naive_error" else key)
    parseResults(results)
      .groupBy(col("split_key"), col("horizon_key"))
      .agg(m("mae"), m("r2"), m("uncertainty"), m("snr"), m("naive_mae"))
      .select(lit(experimentKey).as("experiment_key"),
        col("split_key"), col("horizon_key"),
        col("mae"), col("r2"), col("uncertainty"), col("snr"),
        col("naive_error"))
  }

  /** Load [[experimentMetrics]] into the snapshot-versioned
    * `fact_experiment_metrics` (upsert grain: experiment × split ×
    * horizon).
    */
  def loadFactExperimentMetrics(spark: SparkSession, results: DataFrame,
      experimentKey: String, factPath: String): DataFrame = {
    val updates = experimentMetrics(results, experimentKey)
    val merged = upsert(SnapshotStore.read(spark, factPath), updates,
      Seq("experiment_key", "split_key", "horizon_key"))
    SnapshotStore.commit(merged, factPath)
    SnapshotStore.gc(factPath)
    SnapshotStore.read(spark, factPath).get
  }

  /** Legacy star-schema fact `olap.fact_strategy_params`
    * (`olap_schema_postgres.sql:80-87`): one row per experiment's
    * strategy config — name, bar frequency, and the raw params JSON
    * (the JSONB column; queryable through [[configKv]]/[[deepConfigKv]]
    * like the experiment config). Upsert grain: experiment ×
    * strategy_name.
    */
  def loadFactStrategyParams(spark: SparkSession, experimentKey: String,
      strategyName: String, freq: String, paramsJson: String,
      factPath: String): DataFrame = {
    import spark.implicits._
    loadFactStrategyParamsRows(spark,
      Seq((experimentKey, strategyName, freq, paramsJson))
        .toDF("experiment_key", "strategy_name", "freq", "params"),
      factPath)
  }

  /** Multi-row face of [[loadFactStrategyParams]]: a batch of
    * (experiment_key, strategy_name, freq, params) rows — e.g. the
    * walk-forward fold champions from
    * `StrategyOptimizer.walkForwardFactRows` — lands as ONE
    * SnapshotStore upsert/commit, not one commit per row.
    */
  def loadFactStrategyParamsRows(spark: SparkSession, updates: DataFrame,
      factPath: String): DataFrame = {
    val merged = upsert(SnapshotStore.read(spark, factPath), updates,
      Seq("experiment_key", "strategy_name"))
    SnapshotStore.commit(merged, factPath)
    SnapshotStore.gc(factPath)
    SnapshotStore.read(spark, factPath).get
  }

  /** Sketch-column fact loader — the warehouse landing of the
    * q117/q119 rollup pattern (the reference's star stores only exact
    * scalar aggregates, `olap_schema_postgres.sql`; this is the scale
    * face): one row per (series_key, grain) carrying BOTH mergeable
    * sketch families — the t-digest centroid struct for any later
    * quantile question, the HLL register array for any later
    * distinct-count question — plus the exact row count, upserted on
    * the grain key and SnapshotStore-committed (version-monotonic,
    * publish-locked). Ingest each grain once; every later
    * percentile/distinct query over any key + time range is a
    * centroid/register rollup over this table, never a rescan of raw
    * events — at 100 TB the events are cold storage, the fact is KBs
    * per grain.
    *
    * Grain semantics are selected by `mode`:
    *
    *   - [[ReplaceGrain]] (default) — RECOMPUTE-REPLACE: re-loading a
    *     grain replaces its row wholesale (the `upsert` MERGE), so a
    *     grain must be loaded from that grain's complete rows. The
    *     contract is IDEMPOTENT: replaying the same batch (at-least-once
    *     delivery, a backfill re-run) lands the same row — spec-pinned
    *     in `SketchFactSpec` along with the rollup consistency
    *     properties (HLL rollup ≡ direct estimate EXACTLY, digest
    *     rollup within the q115 rank bound).
    *   - [[MergeGrain]] (r15) — MERGE-ON-COLLISION: a batch carrying a
    *     PARTIAL grain (an hourly micro-batch landing into a daily
    *     grain) folds into the existing row instead of replacing it —
    *     register-max for the HLL (lossless), centroid merge for the
    *     t-digest (the q115 bound survives, it is one more merge
    *     tree), `n_rows` sums. Only the batch's OWN grain keys are
    *     re-aggregated (semi/anti split) — untouched stored rows pass
    *     through byte-identical, so an idle grain's digest never
    *     drifts through gratuitous recompression. At 100 TB this is
    *     the only viable ingest cadence: a grain's full history is
    *     never re-read and the fact is never re-folded wholesale.
    *     NOT idempotent on its own — n_rows double-counts a replayed
    *     batch and the digest double-weights it (the HLL alone is
    *     replay-immune) — so merge-mode feeds need exactly-once batch
    *     semantics: [[sketchFactBatchWriter]] provides them for
    *     Structured Streaming via the batchId fence committed
    *     atomically with the snapshot (`fence` here, r15); direct
    *     callers outside a streaming query carry that contract
    *     themselves. Incremental-ingest ≡ one-shot equivalence and
    *     replay no-op-ness are spec-pinned in `SketchFactSpec`.
    *
    * Rows with a NULL `valueCol` OR a NULL `idCol` are excluded
    * entirely (the digest/sample null contract — a null id would also
    * crash the typed HLL aggregator's Long deserializer), so the three
    * sketch columns describe ONE fully-non-null row set.
    */
  def loadFactSketches(spark: SparkSession, events: DataFrame,
      seriesCol: String, tsCol: String, valueCol: String, idCol: String,
      grainUs: Long, factPath: String,
      compression: Double = 100.0, p: Int = 12,
      mode: SketchIngestMode = ReplaceGrain,
      fence: Option[Long] = None,
      lineage: Option[String] = None,
      layout: PartitionedSnapshotStore.Layout = PartitionedSnapshotStore.Layout())
      : DataFrame = {
    loadFactSketches(spark, events, Seq(seriesCol), tsCol, valueCol, idCol,
      grainUs, factPath, compression, p, mode, fence, lineage, layout)
  }

  /** Composite-key face (r16): real warehouse series keys are often
    * composite — (event_type, region), (supplier, part-class). A
    * multi-column key lands as ONE `series_key` STRUCT column
    * (struct equality drives the grain upsert, struct hashing drives
    * the partition buckets), so the fact schema stays fixed at
    * (series_key, grain, value_digest, id_sketch, n_rows) whatever the
    * key arity; a single-column key stays the bare column — the
    * degenerate case is byte-identical to pre-r16 tables (q122
    * unchanged). */
  def loadFactSketches(spark: SparkSession, events: DataFrame,
      seriesCols: Seq[String], tsCol: String, valueCol: String,
      idCol: String, grainUs: Long, factPath: String, compression: Double,
      p: Int, mode: SketchIngestMode, fence: Option[Long],
      lineage: Option[String], layout: PartitionedSnapshotStore.Layout)
      : DataFrame = {
    val aggs = sketchAggExprs(col("__v"), col("__id"), compression, p)
    val updates = events
      // the null contract (scaladoc): value/id nulls can't be sketched;
      // a NULL timestamp has no derivable grain (r16 review — it would
      // NPE the partitioned path's bucket collect), so all three
      // exclude the row and the sketch columns describe ONE
      // fully-non-null row set
      .filter(col(valueCol).isNotNull && col(idCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(seriesKeyCol(seriesCols).as("series_key"),
        grainCol(col(tsCol), grainUs).as("grain"),
        col(valueCol).as("__v"), col(idCol).as("__id"))
      .groupBy(col("series_key"), col("grain"))
      .agg(aggs.head, aggs.tail: _*)
    commitSketchUpdates(spark, updates, factPath, mode, compression, p,
      fence, lineage, layout)
  }

  /** The fact's series-key expression: one column stays bare (the
    * pre-r16 shape), several pack into a struct named by the source
    * columns (readable back as `series_key.<name>`). */
  private[graft] def seriesKeyCol(seriesCols: Seq[String])
      : org.apache.spark.sql.Column = {
    require(seriesCols.nonEmpty, "at least one series-key column")
    if (seriesCols.size == 1) col(seriesCols.head)
    else struct(seriesCols.map(col): _*)
  }

  /** NULL-SAFE (series_key, grain) join condition for the grain
    * collision splits: a NULL series key is a legitimate group (the
    * window-based [[upsert]] groups NULLs and replaces), so the
    * semi/anti splits must match it too — plain `usingColumns`
    * equality passes a stored NULL-key row through the anti join and
    * DUPLICATES it on every backfill (r16 review). */
  private def grainKeyCond(left: DataFrame, right: DataFrame)
      : org.apache.spark.sql.Column =
    (left("series_key") <=> right("series_key")) &&
      (left("grain") <=> right("grain"))

  /** Shared commit leg of the sketch-fact loaders: lands an aggregated
    * grain-row `updates` relation into the fact under `mode`'s
    * collision semantics, on whichever snapshot layout the table
    * already has — partitioned manifest-of-files
    * ([[PartitionedSnapshotStore]], the default for NEW tables: a
    * merge commit stages only the colliding grain buckets, so
    * per-batch cost is O(batch), not O(|fact|) — the r15 disclosed
    * boundary, closed) or the legacy monolithic [[SnapshotStore]]
    * layout (pre-r16 tables keep working; their commit stays the
    * documented full-snapshot rewrite). CAS + fence + lineage
    * semantics are identical on both paths.
    */
  private def commitSketchUpdates(spark: SparkSession, updates: DataFrame,
      factPath: String, mode: SketchIngestMode, compression: Double, p: Int,
      fence: Option[Long], lineage: Option[String],
      layout: PartitionedSnapshotStore.Layout): DataFrame = {
    val legacyMonolithic =
      !PartitionedSnapshotStore.isPartitioned(factPath) &&
        SnapshotStore.currentVersion(factPath).isDefined
    if (legacyMonolithic)
      commitSketchUpdatesMonolithic(spark, updates, factPath, mode,
        compression, p, fence, lineage)
    else
      commitSketchUpdatesPartitioned(spark, updates, factPath, mode,
        compression, p, fence, lineage, layout)
  }

  /** The grain-bucket fold of a [[MergeGrain]] collision: register-max
    * for the HLL (lossless), centroid merge for the t-digest (the q115
    * bound survives — one more merge tree), n_rows sums. ONE
    * definition for both snapshot layouts. */
  private def collisionFold(rows: DataFrame, compression: Double, p: Int)
      : DataFrame = {
    import org.apache.spark.sql.Encoders
    val rollDigest = org.apache.spark.sql.functions.udaf(
      new graft.metrics.TDigest.RollupDigestsAgg(compression),
      Encoders.product[graft.metrics.TDigest.Digest])
    val rollHll = org.apache.spark.sql.functions.udaf(
      new graft.metrics.Hll.RollupSketchesAgg(p),
      Encoders.product[graft.metrics.Hll.Sketch])
    rows.groupBy(col("series_key"), col("grain"))
      .agg(
        rollDigest(col("value_digest.means"), col("value_digest.weights"))
          .as("value_digest"),
        rollHll(col("id_sketch.regs")).as("id_sketch"),
        sum(col("n_rows")).as("n_rows"))
  }

  private def commitSketchUpdatesPartitioned(spark: SparkSession,
      updates: DataFrame, factPath: String, mode: SketchIngestMode,
      compression: Double, p: Int, fence: Option[Long],
      lineage: Option[String], layout: PartitionedSnapshotStore.Layout)
      : DataFrame = {
    val ptn = PartitionedSnapshotStore
    val base = ptn.current(factPath)
    // the bucket function is a TABLE property — later loads must use
    // the committed layout, whatever the caller passed
    val lay = base.map(_.layout).getOrElse(layout)
    def bExpr = ptn.bucketExpr(col("series_key"), col("grain"), lay)
    val keyCols = Seq("series_key", "grain")
    // the batch relation is referenced up to three times (dirty-bucket
    // collect, key relation, union side) — persist so each micro-batch
    // pays its groupBy + digest/HLL fold once (the r15 finding)
    val upd = updates.withColumn(ptn.BucketCol, bExpr)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dirty = upd.select(col(ptn.BucketCol)).distinct()
        .collect().map(_.getLong(0)).toSet
      // read ONLY the colliding buckets' files — this, not the fold,
      // is what makes per-batch cost independent of |fact|
      val dirtyParts = base.toSeq.flatMap(_.parts)
        .filter(e => dirty.contains(e.bucket))
      val stored =
        if (dirtyParts.isEmpty) None
        else Some(spark.read
          .parquet(dirtyParts.map(e => s"$factPath/${e.relPath}"): _*)
          .withColumn(ptn.BucketCol, bExpr))
      val newData = (mode, stored) match {
        case (_, None) => upd
        case (ReplaceGrain, Some(e)) =>
          // recompute-replace within the dirty buckets: stored rows
          // for the batch's grain keys drop, everything else in the
          // bucket passes through (values byte-identical); null-safe
          // so a NULL-key grain replaces instead of duplicating
          val updKeys = broadcast(upd.select(keyCols.map(col): _*))
          e.join(updKeys, grainKeyCond(e, updKeys), "left_anti")
            .unionByName(upd)
        case (MergeGrain, Some(e)) =>
          // fold ONLY the colliding grain rows (semi/anti split):
          // untouched rows — in clean buckets, at the FILE level;
          // within dirty buckets, value-identical pass-through
          // (digest recompression is not bit-stable, so gratuitous
          // re-aggregation would drift idle digests)
          val updKeys = broadcast(upd.select(keyCols.map(col): _*))
          val untouched = e.join(updKeys, grainKeyCond(e, updKeys), "left_anti")
          val folded = collisionFold(
            e.join(updKeys, grainKeyCond(e, updKeys), "left_semi")
              .drop(ptn.BucketCol)
              .unionByName(upd.drop(ptn.BucketCol)),
            compression, p).withColumn(ptn.BucketCol, bExpr)
          untouched.unionByName(folded)
      }
      try {
        ptn.commitBuckets(spark, factPath, newData, dirty, lay, fence,
          lineage, base.map(_.version))
      } catch {
        // the fold reads the PINNED base manifest's files; a faster
        // writer's commits + gc can collect them mid-plan — translate
        // the buried FileNotFound to the typed retryable signal (same
        // discipline as the monolithic path)
        case e: Throwable if hasFileNotFoundCause(e) &&
            ptn.current(factPath).map(_.version) != base.map(_.version) =>
          throw new SnapshotStore.StaleVersionException(
            s"base manifest ${base.map(_.version).getOrElse(-1L)} at " +
              s"$factPath was collected mid-merge (concurrent writer " +
              "committed past it and gc ran); recompute against the " +
              s"current manifest and retry " +
              s"[${e.getClass.getSimpleName}: ${e.getMessage}]")
      }
    } finally upd.unpersist(blocking = false)
    ptn.gc(factPath)
    // a committed manifest with ZERO parts (first batch empty, or all
    // rows null-filtered) reads back as None — return an empty frame
    // with the fact schema instead of crashing the sink (review r16)
    SnapshotStore.read(spark, factPath)
      .getOrElse(updates.limit(0))
  }

  /** Pre-r16 monolithic-layout commit (kept verbatim for existing
    * tables): the whole merged relation restages as one snapshot —
    * the disclosed O(|fact|)-per-commit path. */
  private def commitSketchUpdatesMonolithic(spark: SparkSession,
      updates: DataFrame, factPath: String, mode: SketchIngestMode,
      compression: Double, p: Int, fence: Option[Long],
      lineage: Option[String]): DataFrame = {
    // CAS base: the version this ingest's merge plan READS — publish
    // refuses if another writer moved the table meanwhile (a lost
    // update would otherwise silently drop that writer's batch AND,
    // fence-carried, mark it applied; r15 review). Pin the read to the
    // SAME version the CAS names.
    val base = SnapshotStore.currentVersion(factPath)
    val existing = base.map(v => spark.read.parquet(s"$factPath/$v"))
    var pinned: Option[DataFrame] = None
    val merged = (mode, existing) match {
      case (ReplaceGrain, _) | (MergeGrain, None) =>
        upsert(existing, updates, Seq("series_key", "grain"))
      case (MergeGrain, Some(e)) =>
        val upd = updates
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pinned = Some(upd)
        val updKeys = broadcast(upd.select(col("series_key"), col("grain")))
        val untouched = e.join(updKeys, grainKeyCond(e, updKeys), "left_anti")
        val folded = collisionFold(
          e.join(updKeys, grainKeyCond(e, updKeys), "left_semi")
            .unionByName(upd),
          compression, p)
        untouched.unionByName(folded)
    }
    try {
      SnapshotStore.commitCas(merged, factPath, fence, lineage, base)
    } catch {
      case e: Throwable if hasFileNotFoundCause(e) &&
          SnapshotStore.currentVersion(factPath) != base =>
        throw new SnapshotStore.StaleVersionException(
          s"base snapshot ${base.getOrElse("<none>")} at $factPath was " +
            "collected mid-merge (concurrent writer committed past it and " +
            s"gc ran); restage against the current snapshot and retry " +
            s"[${e.getClass.getSimpleName}: ${e.getMessage}]")
    } finally pinned.foreach(_.unpersist(blocking = false))
    SnapshotStore.gc(factPath)
    SnapshotStore.read(spark, factPath).get
  }

  /** True when `t`'s cause chain contains a FileNotFound (Spark wraps
    * scan-time FNFs several layers deep). */
  private def hasFileNotFoundCause(t: Throwable): Boolean = {
    var c: Throwable = t
    var hops = 0
    while (c != null && hops < 20) {
      if (c.isInstanceOf[java.io.FileNotFoundException] ||
        c.getClass.getSimpleName.contains("FileNotFound")) return true
      c = c.getCause
      hops += 1
    }
    false
  }

  /** The fact's grain bucketing — ONE definition shared by the batch
    * loader, the read faces, and the streaming window arithmetic
    * (`floor`, matching both DuckDB's `//` and epoch-aligned
    * `window()` starts; a truncate-toward-zero here would diverge for
    * pre-1970 event times and break the batch ≡ streaming grain
    * contract — r15 review). */
  private[graft] def grainCol(ts: org.apache.spark.sql.Column,
      grainUs: Long): org.apache.spark.sql.Column =
    floor(unix_micros(ts) / grainUs).cast("long")

  /** The sketch fact's aggregate trio (digest struct, HLL struct, exact
    * count) — ONE definition shared by [[loadFactSketches]] and
    * [[graft.streaming.StreamOps.streamingSketchGrains]], so the two
    * ingest cadences cannot drift apart expression-by-expression. */
  private[graft] def sketchAggExprs(value: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column, compression: Double, p: Int)
      : Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.Encoders
    val mkDigest = org.apache.spark.sql.functions.udaf(
      new graft.metrics.TDigest.DigestAgg(compression), Encoders.scalaDouble)
    val mkHll = org.apache.spark.sql.functions.udaf(
      new graft.metrics.Hll.SketchAgg(p), Encoders.scalaLong)
    Seq(mkDigest(value).as("value_digest"),
      mkHll(id).as("id_sketch"),
      count(lit(1)).as("n_rows"))
  }

  /** Land PRE-AGGREGATED sketch-grain rows (schema: series_key, grain,
    * value_digest struct, id_sketch struct, n_rows) into the fact —
    * the sink half of [[graft.streaming.StreamOps.streamingSketchGrains]],
    * where the grains arrive already complete (watermark-closed
    * windows), so the recompute-replace upsert applies and is
    * IDEMPOTENT: a redelivered micro-batch re-lands identical rows.
    * No fence needed — append-mode emission + replace upsert is the
    * replay-safe pairing, exactly as ReplaceGrain backfills are.
    */
  def loadFactSketchRows(spark: SparkSession, grainRows: DataFrame,
      factPath: String,
      layout: PartitionedSnapshotStore.Layout = PartitionedSnapshotStore.Layout())
      : DataFrame =
    // recompute-replace through the shared commit leg: CAS'd against
    // the base the upsert plan read (a concurrent backfill surfaces as
    // a typed retryable conflict, never a silent lost update), and on
    // the partitioned layout only the landed grains' buckets restage
    commitSketchUpdates(spark, grainRows, factPath, ReplaceGrain,
      compression = 100.0, p = 12, fence = None, lineage = None, layout)

  /** Sketch-fact COMPACTION — the warehouse lifecycle operator (r16;
    * range-scoped r17): re-grain fine rows (hours) into coarse rows
    * (days/weeks) so a long-lived fact stays O(keys × coarse-grains)
    * instead of growing one row per fine grain forever. Pure sketch
    * algebra, no raw-data access: HLL registers merge losslessly (the
    * compacted sketch is BIT-IDENTICAL to one ingested directly at the
    * coarse grain), t-digests centroid-merge (one more merge tree —
    * the q115 rank bound holds at the coarse rollup level), `n_rows`
    * sums exactly. Committed as a normal CAS'd publish: a concurrent
    * ingest commit surfaces as the typed retryable
    * [[SnapshotStore.StaleVersionException]], and an unfenced commit
    * CARRIES the streaming fence/lineage forward (compaction
    * interleaved with a fenced sink must not erase its replay
    * protection).
    *
    * `toGrainUs` must be a multiple of `fromGrainUs` (day→week, not
    * day→10h): a non-nesting re-grain would split fine grains across
    * coarse rows, which sketch rows cannot express.
    *
    * GRAIN REPRESENTATION (r17, the mixed-grain contract): the stored
    * `grain` column stays in the table's ORIGINAL ingest units forever
    * — a compacted coarse row sits at its window-START grain,
    * `floor(g / ratio) * ratio` (ratio = toGrainUs/fromGrainUs), and
    * covers fine grains `[start, start + ratio)`. Compaction is then
    * TRANSPARENT to readers: the same `grain BETWEEN lo AND hi` range
    * question answers identically before and after, provided the
    * bounds are coarse-ALIGNED wherever they land in compacted
    * territory (`lo % ratio == 0`, and `hi` either ≥ the boundary or
    * ≡ ratio−1 mod ratio) — a misaligned bound inside a coarse window
    * would ask a sub-window question the coarse row cannot split.
    * Manifest-level file pruning ([[PartitionedSnapshotStore.readRange]])
    * inherits the same contract: part ranges hold window starts, so
    * aligned bounds prune exactly. (Pre-r17 this function re-based
    * grains to coarse UNITS, which made mixed-grain facts
    * unrepresentable — fine and coarse values collided numerically —
    * and forced every reader to switch units after compaction.)
    *
    * `upToGrain` (r17) scopes the lifecycle op to the AGED range: only
    * fine rows with `grain < upToGrain` (original units; must be
    * ratio-aligned) compact, the hot tail stays fine-grained, and on
    * the partitioned layout ONLY the buckets the aged range lives in
    * restage — recurring cost is O(aged window), independent of total
    * fact size (the untouched buckets' files re-list verbatim in the
    * new manifest). A boundary that ages no files is a true no-op (no
    * new manifest version). `upToGrain = None` compacts the whole
    * fact (every bucket dirty — O(|fact|), the one-shot migration
    * shape). On the legacy monolithic layout the commit is O(|fact|)
    * either way (documented layout property), but the fold itself
    * still touches only the aged rows.
    *
    * `toGrainUs == fromGrainUs` is the identity compaction and leaves
    * every row bit-identical (greedy t-digest recompression of an
    * already-compressed digest is a no-op — spec-pinned), which is
    * what makes accidental re-compaction harmless; re-running a scoped
    * compaction over an already-compacted range is likewise harmless —
    * window-start grains re-grain to themselves (`floor` fixes
    * ratio-aligned values) and fold as singleton groups. Returns the
    * compacted committed table.
    */
  def compactFactSketches(spark: SparkSession, factPath: String,
      fromGrainUs: Long, toGrainUs: Long,
      compression: Double = 100.0, p: Int = 12,
      upToGrain: Option[Long] = None): DataFrame = {
    require(fromGrainUs >= 1L && toGrainUs >= fromGrainUs &&
      toGrainUs % fromGrainUs == 0L,
      s"compaction must coarsen by an integer factor: from=$fromGrainUs " +
        s"to=$toGrainUs")
    val ratio = toGrainUs / fromGrainUs
    upToGrain.foreach(b => require(b % ratio == 0L,
      s"scoped-compaction boundary must be coarse-aligned " +
        s"(upToGrain % $ratio == 0, got $b) — a misaligned boundary " +
        "would split one coarse window across the compacted/fine zones"))
    // CAS discipline (r16 review): capture the base FIRST and pin the
    // fold's read to that exact manifest/version — resolving the table
    // before naming the base leaves a window where a concurrent ingest
    // commit passes the CAS check and is silently erased by the
    // compacted publish (the precise lost update CAS exists to refuse)
    def regrain(aged: DataFrame): DataFrame =
      // window-START re-grain (floor-div then re-scale — floor, not
      // truncate, so pre-1970 grains keep grainCol's semantics; exact
      // for |grain| < 2^53, see the bucketExpr precision contract)
      collisionFold(aged.withColumn("grain",
        (floor(col("grain") / lit(ratio)) * lit(ratio)).cast("long")),
        compression, p)
    if (PartitionedSnapshotStore.isPartitioned(factPath)) {
      val ptn = PartitionedSnapshotStore
      val base = ptn.current(factPath).getOrElse(
        throw new IllegalStateException(
          s"no committed sketch fact at $factPath to compact"))
      // file-level aging: a part whose whole grain range is at/above
      // the boundary — or at/below the PREVIOUS boundary (those rows
      // are already coarse; the manifest's `compacted` high-water mark
      // proves it) — re-lists VERBATIM (never read, never rewritten).
      // This two-sided skip, not the fold, is what makes the RECURRING
      // scoped op O(newly aged window) rather than O(aged history)
      // (SCALE-R17: the one-sided first cut re-identity-folded every
      // previously-coarse bucket each run). Caveats, documented on the
      // Manifest: late fine rows merged below the previous boundary,
      // or a CHANGED coarse grain, are settled only by a full pass.
      val prevBoundary = base.compactedUpTo.getOrElse(Long.MinValue)
      val agedParts = upToGrain.fold(base.parts)(b =>
        base.parts.filter(e => e.grainMin < b && e.grainMax >= prevBoundary))
      if (agedParts.isEmpty)
        return SnapshotStore.read(spark, factPath).getOrElse(
          throw new IllegalStateException(
            s"committed sketch fact at $factPath has no partitions"))
      def bExpr = ptn.bucketExpr(col("series_key"), col("grain"), base.layout)
      def readParts(parts: Seq[ptn.PartEntry]): DataFrame =
        spark.read.parquet(parts.map(e => s"$factPath/${e.relPath}"): _*)
      if (upToGrain.isEmpty) {
        // FULL pass (r18): every bucket is dirty by definition, so the
        // fixpoint below — whose persist materializes the ENTIRE
        // compacted fact and whose per-round distinct+collect exists
        // only to DECLARE the dirty bucket set — is pure overhead here
        // (at 100 TB that persist is a second full-fact write). One
        // fold, one staged write, a replace-all manifest.
        try ptn.commitBucketsReplaceAll(spark, factPath,
          regrain(readParts(base.parts)).withColumn(ptn.BucketCol, bExpr),
          base.layout, fence = None, lineage = None,
          expectedBase = Some(base.version), compactedUpTo = None)
        catch {
          case e: Throwable if hasFileNotFoundCause(e) &&
              ptn.current(factPath).map(_.version) != Some(base.version) =>
            throw new SnapshotStore.StaleVersionException(
              s"base manifest ${base.version} at $factPath was collected " +
                "mid-compaction (concurrent writer committed past it and " +
                "gc ran); re-read and retry " +
                s"[${e.getClass.getSimpleName}: ${e.getMessage}]")
        }
        ptn.gc(factPath)
        return SnapshotStore.read(spark, factPath).get
      }
      // FIXPOINT over the involved parts: a coarse window-start can
      // bucket below its fine rows' files (grainsPerBucket need not
      // align with ratio), and the landing bucket's EXISTING rows may
      // include the very (key, window-start) row a late-data fold just
      // produced — pulling the landing bucket's rows INTO the fold
      // (instead of raw-unioning them alongside, the r17 review's
      // duplicate-key hazard) lets collisions merge through the one
      // collisionFold: already-coarse rows re-grain to themselves and
      // identity-fold bit-stably (spec-pinned), colliding late rows
      // merge, young rows (grain ≥ boundary) pass through untouched.
      // Each pull can land new window starts in yet-earlier buckets
      // (late strays re-aging), so iterate until no new bucket appears
      // — monotone over a finite bucket set, ≤2 rounds in practice.
      var involved = agedParts
      var involvedBuckets = agedParts.map(_.bucket).toSet
      var coarse: DataFrame = null
      var coarseBuckets = Set.empty[Long]
      var settled = false
      try {
        while (!settled) {
          if (coarse != null) coarse.unpersist(blocking = false)
          val toFold = upToGrain.fold(readParts(involved))(b =>
            readParts(involved).filter(col("grain") < b))
          // the rollup fold is the dominant cost and the plan is
          // referenced twice (bucket collect + staged write) — persist
          coarse = regrain(toFold).withColumn(ptn.BucketCol, bExpr)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          coarseBuckets = coarse.select(col(ptn.BucketCol)).distinct()
            .collect().map(_.getLong(0)).toSet
          val extra = base.parts.filter(e =>
            !involvedBuckets.contains(e.bucket) && coarseBuckets.contains(e.bucket))
          if (extra.isEmpty) settled = true
          else {
            involved = involved ++ extra
            involvedBuckets = involvedBuckets ++ extra.map(_.bucket)
          }
        }
        // young rows in involved files (a straddling or landing bucket's
        // hot tail) pass through VALUE-identical — gratuitous
        // re-aggregation would drift idle digests
        val youngPass = upToGrain.map(b =>
          readParts(involved).filter(col("grain") >= b)
            .withColumn(ptn.BucketCol, bExpr))
        val newData = youngPass.fold(coarse: DataFrame)(coarse.unionByName(_))
        val dirty = involvedBuckets ++ coarseBuckets
        // a SCOPED pass advances the manifest's compaction high-water
        // mark so the next pass skips the newly coarse range at the
        // FILE level; a full pass leaves it (the property's alignment
        // is tied to the scoped cadence's ratio)
        ptn.commitBuckets(spark, factPath, newData, dirty, base.layout,
          fence = None, lineage = None, expectedBase = Some(base.version),
          compactedUpTo = upToGrain)
      } catch {
        // the fixpoint's collects and the commit's stage all scan the
        // PINNED base manifest's files; a concurrent ingest's commits +
        // gc can collect them mid-compaction — translate the buried
        // FileNotFound to the typed retryable signal the scaladoc
        // promises (same discipline as every other base-pinned path)
        case e: Throwable if hasFileNotFoundCause(e) &&
            ptn.current(factPath).map(_.version) != Some(base.version) =>
          throw new SnapshotStore.StaleVersionException(
            s"base manifest ${base.version} at $factPath was collected " +
              "mid-compaction (concurrent writer committed past it and " +
              "gc ran); re-read and retry " +
              s"[${e.getClass.getSimpleName}: ${e.getMessage}]")
      } finally {
        if (coarse != null) coarse.unpersist(blocking = false)
      }
      ptn.gc(factPath)
    } else {
      val base = SnapshotStore.currentVersion(factPath).getOrElse(
        throw new IllegalStateException(
          s"no committed sketch fact at $factPath to compact"))
      val cur = spark.read.parquet(s"$factPath/$base")
      val merged = upToGrain match {
        case None => regrain(cur)
        case Some(b) => regrain(cur.filter(col("grain") < b))
          .unionByName(cur.filter(col("grain") >= b))
      }
      try SnapshotStore.commitCas(merged, factPath, None, Some(base))
      catch {
        // same pinned-base FileNotFound translation as the partitioned
        // branch: the stage scans v$base lazily, a concurrent writer's
        // commits + gc can collect it mid-plan
        case e: Throwable if hasFileNotFoundCause(e) &&
            !SnapshotStore.currentVersion(factPath).contains(base) =>
          throw new SnapshotStore.StaleVersionException(
            s"base snapshot $base at $factPath was collected " +
              "mid-compaction (concurrent writer committed past it and " +
              "gc ran); re-read and retry " +
              s"[${e.getClass.getSimpleName}: ${e.getMessage}]")
      }
      SnapshotStore.gc(factPath)
    }
    SnapshotStore.read(spark, factPath).get
  }

  /** One-time MONOLITHIC → partitioned migration for a sketch fact
    * (r17): pre-r16 tables route to the legacy layout forever
    * ([[commitSketchUpdates]]) and pay its measured O(|fact|)
    * full-snapshot rewrite on every merge commit (SCALE-R16's bending
    * line); this re-commits the CURRENT snapshot as partitioned
    * manifest m0 — one final O(|fact|) write, after which every merge
    * ingest restages only its dirty buckets (the flat line). Fence and
    * lineage carry bit-for-bit, so a fenced streaming sink keeps its
    * replay protection across the layout change; CAS against the
    * monolithic version the snapshot was read at turns a concurrent
    * ingest into the typed retryable
    * [[SnapshotStore.StaleVersionException]]. Already-partitioned
    * tables return unchanged (idempotent). The legacy `v<N>` dirs
    * stay for in-flight readers until [[SnapshotStore.gc]]'s grace
    * (clock started at the swap) collects them.
    */
  def migrateFactToPartitioned(spark: SparkSession, factPath: String,
      layout: PartitionedSnapshotStore.Layout = PartitionedSnapshotStore.Layout())
      : DataFrame = {
    val ptn = PartitionedSnapshotStore
    var staged: Option[DataFrame] = None
    if (!ptn.isPartitioned(factPath)) {
      val base = SnapshotStore.currentVersion(factPath).getOrElse(
        throw new IllegalStateException(
          s"no committed sketch fact at $factPath to migrate"))
      val data = spark.read.parquet(s"$factPath/$base")
        .withColumn(ptn.BucketCol,
          ptn.bucketExpr(col("series_key"), col("grain"), layout))
      staged = Some(data)
      try ptn.migrateFromMonolithic(spark, factPath, data, layout, base)
      catch {
        // a concurrent migration won while we staged (its refusal
        // already cleaned our staged files) — idempotent success: fall
        // through to read the winner's manifest, same contents
        case _: IllegalStateException if ptn.isPartitioned(factPath) =>
          staged = None
        // the stage scans the pinned base snapshot lazily; a concurrent
        // monolithic writer's commits + gc can collect it mid-stage —
        // translate the buried FileNotFound to the typed retryable
        // signal, the same discipline as every other base-pinned path
        case e: Throwable if hasFileNotFoundCause(e) &&
            !SnapshotStore.currentVersion(factPath).contains(base) =>
          throw new SnapshotStore.StaleVersionException(
            s"base snapshot $base at $factPath was collected mid-migration " +
              "(concurrent writer committed past it and gc ran); re-read " +
              s"and retry [${e.getClass.getSimpleName}: ${e.getMessage}]")
      }
    }
    // a committed-but-EMPTY monolithic table migrates to a zero-part
    // manifest, which reads back as None — the migration still
    // succeeded (pointer swapped), so return an empty frame with the
    // fact schema rather than throwing after the commit (r17 review).
    // On RE-invocation over an already-migrated empty table there is no
    // staged frame either — the manifest's schema line (always written
    // by the migration commit) rebuilds the typed empty frame, keeping
    // the call idempotent rather than throwing on a healthy table.
    SnapshotStore.read(spark, factPath)
      .orElse(staged.map(_.drop(ptn.BucketCol).limit(0)))
      .orElse(ptn.current(factPath).flatMap(_.schema).map(sc =>
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), sc)))
      .getOrElse(throw new IllegalStateException(
        s"partitioned table at $factPath has no readable snapshot"))
  }

  /** Exactly-once streaming ingest for the sketch fact — the
    * `foreachBatch` sink that closes [[MergeGrain]]'s disclosed
    * replay-unsafety: each micro-batch folds into the fact in merge
    * mode FENCED by the stream's monotone batchId, committed with the
    * snapshot in one atomic manifest rename
    * ([[SnapshotStore.currentFence]]). An at-least-once redelivery
    * (failure replay re-runs `foreachBatch` with the SAME batchId) is
    * a no-op: the fast path probes the committed fence and skips; the
    * probe-then-commit race collapses inside the publish lock, where a
    * non-advancing fence is refused ([[SnapshotStore.StaleFenceException]],
    * swallowed here as "already applied"). This is the public
    * idempotent-sink pattern (Delta's txnVersion): the fence is valid
    * for ONE streaming query lineage — restarting from a FRESH
    * checkpoint restarts batchIds at 0, so a new query must target a
    * new factPath or deliberately call [[SnapshotStore.clearFence]]
    * between lineages (fence carry-forward means there is
    * intentionally no implicit reset), exactly the txnAppId
    * discipline.
    *
    * Usage: `events.writeStream.foreachBatch(
    *   OlapEtl.sketchFactBatchWriter(...)).start()`.
    */
  def sketchFactBatchWriter(seriesCol: String, tsCol: String,
      valueCol: String, idCol: String, grainUs: Long, factPath: String,
      compression: Double = 100.0, p: Int = 12,
      lineage: Option[String] = None): (DataFrame, Long) => Unit =
    sketchFactBatchWriter(Seq(seriesCol), tsCol, valueCol, idCol, grainUs,
      factPath, compression, p, lineage)

  /** Composite-key face of the fenced sink (see the struct-key
    * contract at the keyed [[loadFactSketches]]). */
  def sketchFactBatchWriter(seriesCols: Seq[String], tsCol: String,
      valueCol: String, idCol: String, grainUs: Long, factPath: String,
      compression: Double, p: Int, lineage: Option[String])
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    // lineage-scoped probe (r16): "already applied" only holds when the
    // committed fence belongs to THIS query lineage — a fresh
    // checkpoint renumbers batchIds from 0, and an unscoped probe
    // would silently swallow the new lineage's batches. A declared
    // lineage that mismatches the committed one is raised loudly here
    // (and again, authoritatively, inside the publish lock).
    def lineageConflict = lineage.exists(l =>
      SnapshotStore.currentLineage(factPath).exists(_ != l))
    def applied = {
      val fenced = SnapshotStore.currentFence(factPath).exists(_ >= batchId)
      if (fenced && lineageConflict)
        throw new SnapshotStore.FenceLineageException(
          s"batch $batchId of lineage ${lineage.get} hit a committed fence " +
            s"owned by lineage ${SnapshotStore.currentLineage(factPath).get} " +
            s"at $factPath — call SnapshotStore.clearFence between query " +
            "lineages, or point the new query at a new table")
      fenced
    }
    var attempts = 0
    var done = applied
    while (!done) {
      attempts += 1
      try {
        loadFactSketches(batch.sparkSession, batch, seriesCols, tsCol,
          valueCol, idCol, grainUs, factPath, compression, p,
          MergeGrain, Some(batchId), lineage,
          PartitionedSnapshotStore.Layout())
        done = true
      } catch {
        // the batch's effect is already committed (replay that lost
        // the probe-then-commit race): a no-op, as advertised
        case _: SnapshotStore.StaleFenceException => done = true
        // a concurrent writer (zombie duplicate of this batch, or an
        // interleaved backfill) committed a newer VERSION first — the
        // version check fires before the fence check, so re-probe the
        // fence: if the duplicate already landed this batchId we're
        // done; otherwise restage against the new snapshot and retry
        case e: SnapshotStore.StaleVersionException =>
          if (applied) done = true
          else if (attempts >= 3) throw e
      }
    }
  }

  /** Grain-collision semantics for [[loadFactSketches]]. */
  sealed trait SketchIngestMode
  /** Recompute-replace: a batch carries a grain's COMPLETE rows;
    * re-loading replaces the grain row wholesale (idempotent backfill). */
  case object ReplaceGrain extends SketchIngestMode
  /** Merge-on-collision: a batch may carry a PARTIAL grain; collisions
    * fold (register-max / centroid-merge / n_rows sum). Micro-batch
    * safe, replay-unsafe — see [[loadFactSketches]]. */
  case object MergeGrain extends SketchIngestMode

  /** The Metabase config-flatten view analog (J5): explode a JSON config
    * column into (key, value) rows (`olap_metabase_helpers.sql:4-23`).
    * One level only — for nested configs use [[deepConfigKv]].
    */
  def configKv(experiments: DataFrame, keyCol: String, configJsonCol: String): DataFrame =
    experiments.select(col(keyCol),
      explode(from_json(col(configJsonCol),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))).as(Seq("conf_key", "conf_value")))

  /** RECURSIVE config flatten — the full `jsonb_deep_each` semantics
    * (`olap_metabase_helpers.sql:4-23`): every leaf of an arbitrarily
    * nested config as (dot.joined.path, text value); arrays are leaves.
    * Backed by the native `json_deep_flatten` expression, so nested
    * configs (the common case under the reference's `examples/config/`)
    * no longer silently null out as they would through the one-level
    * MapType cast in [[configKv]].
    */
  def deepConfigKv(experiments: DataFrame, keyCol: String, configJsonCol: String): DataFrame = {
    // Build the expression Column directly (no session registration
    // needed — OlapEtl entry points must work on a vanilla session).
    val flattened = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.JsonDeepFlatten(
        org.apache.spark.sql.GraftColumnBridge.expression(col(configJsonCol))))
    experiments.select(col(keyCol), explode(flattened).as("kv"))
      .select(col(keyCol),
        col("kv.path").as("conf_path"),
        col("kv.value").as("conf_value"))
  }

  /** S9: `dim_experiment` builder — typed extraction of the config
    * fields the reference's Metabase GUI filters on
    * (`etl_migrate_v2.py:292-332`: ~30 typed columns + the full config
    * kept alongside). Missing/malformed fields coerce to NULL (`try_cast`,
    * F15), exactly the reference's `cfg.get(...) → None` behavior.
    * `predicted_horizons` stays JSON text, as in the reference (it is
    * `json.dumps`-ed back into a JSONB column).
    */
  def dimExperiment(experiments: DataFrame, experimentKeyCol: String,
      projectKeyCol: String, phaseKeyCol: String, configJsonCol: String): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, StringType, StructField, StructType}
    val cfg = col(configJsonCol)
    val intFields = Seq("max_steps_train", "max_steps_test", "intermediate_layers",
      "initial_layer_size", "layer_size_divisor", "kl_anneal_epochs", "early_patience",
      "start_from_epoch", "window_size", "batch_size", "epochs", "stl_period", "mc_samples")
    val doubleFields = Seq("learning_rate", "l2_reg", "kl_weight", "mmd_lambda", "min_delta")
    val boolFields = Seq("use_returns", "use_stl", "use_wavelets", "use_multi_tapper",
      "use_strategy", "use_daily")
    val stringFields = Seq("activation", "predictor_plugin", "optimizer_plugin",
      "pipeline_plugin", "preprocessor_plugin")
    // ONE from_json parse per row. The naive spelling (30 × getField
    // over one from_json) silently re-parses per FIELD: JsonToStructs is
    // CodegenFallback, so codegen subexpression elimination never sees
    // it, and CollapseProject happily duplicates it — measured 10× slower.
    // `explode(array(struct))` is a Generate boundary CollapseProject
    // cannot cross, so the struct materializes exactly once per row
    // (a NULL config still emits its row: array(null) explodes to one
    // null struct → all typed fields NULL). String-typed struct fields
    // carry exactly get_json_object's semantics: scalars as text,
    // arrays/objects as raw JSON text, absent/null → NULL.
    val allFields = intFields ++ doubleFields ++ boolFields ++
      stringFields ++ Seq("predicted_horizons")
    val parsed = from_json(cfg, StructType(allFields.map(StructField(_, StringType))))
    def f(name: String) = col("__cfg").getField(name)
    experiments.select(
        col(experimentKeyCol).as("experiment_key"),
        col(projectKeyCol).as("project_key"),
        col(phaseKeyCol).as("phase_key"),
        cfg.as("config_json"),
        explode(array(parsed)).as("__cfg"))
      .select(
        col("experiment_key") +: col("project_key") +: col("phase_key") +:
        col("config_json") +:
        (intFields.map(n => f(n).try_cast(IntegerType).as(n)) ++
          doubleFields.map(n => f(n).try_cast(DoubleType).as(n)) ++
          boolFields.map(n => f(n).try_cast(BooleanType).as(n)) ++
          stringFields.map(n => f(n).as(n)) ++
          Seq(f("predicted_horizons").as("predicted_horizons"))): _*)
  }
}
