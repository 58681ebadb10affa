package graft.backtest

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ml.GeneticSearch

/** GA over backtest strategy parameters — the reference's
  * `app/optimizer_ga.py:16-96`: a DEAP GA whose genome is
  * `(profit_threshold, tp_multiplier, sl_multiplier, rel_volume,
  * lower_rr, upper_rr)` (attribute bounds `:70-75`) and whose fitness is
  * the backtest's final profit (`evaluate_strategy:16-60` — one full
  * `cerebro.run()` per individual). Re-expressed Spark-first: each
  * fitness evaluation is one DISTRIBUTED [[Backtest.run]] over the bar
  * feed (parallel across symbols, exactly the candidate-=-one-Spark-job
  * shape of the M10 optimizers), with only the scalar profit crossing
  * the driver; the generational loop itself is [[GeneticSearch]]
  * (driver-side, like the reference's DEAP loop).
  *
  * Genome → strategy decoding (`heuristic_strategy.py:50-62,175-186`):
  *   - `profit_threshold` → [[Backtest.Params.threshold]] (the entry
  *     signal gate, `:189-190`);
  *   - `tp_multiplier` / `sl_multiplier` scale the base TP/SL distances
  *     (`:175-176,185-186` — the reference multiplies the per-entry
  *     ideal pips; our state machine models fixed pip distances, so the
  *     multipliers scale those);
  *   - `rel_volume`, `lower_rr`, `upper_rr` set the ORDER SIZE
  *     (`compute_size:230-243`): linear interpolation between min and
  *     max volume by the strategy's reward/risk ratio (tp/sl), capped
  *     by `cash * rel_volume * leverage`. Size multiplies per-trade
  *     price profit into cash profit — it scales fitness without
  *     touching the (oracle-pinned) state machine.
  *
  * Fitness sums per-trade profit through an exact DECIMAL cast
  * (deterministic across partition orders — the dsum discipline), so a
  * seeded search is reproducible run-to-run: spec-pinned.
  */
object StrategyOptimizer {

  /** Genome bounds, `optimizer_ga.py:70-75` verbatim. */
  val Space: Seq[(String, (Double, Double))] = Seq(
    "profit_threshold" -> (1.0, 20.0),
    "tp_multiplier" -> (0.8, 1.2),
    "sl_multiplier" -> (1.5, 3.0),
    "rel_volume" -> (0.01, 0.1),
    "lower_rr" -> (0.3, 1.0),
    "upper_rr" -> (1.5, 3.0))

  /** Account/sizing constants — `heuristic_strategy.py:52-54` defaults
    * verbatim (min 10000 / max 1000000 units, leverage 1000) plus
    * `optimizer_ga.py:49`'s setcash(10000). With these, the cash cap
    * `cash × rel_volume × leverage` spans [100k, 1M] over the
    * rel_volume gene's [0.01, 0.1] range and genuinely binds against
    * the RR-interpolated volume, exactly as in `compute_size:241-243`.
    */
  final case class Sizing(cash: Double = 10000.0, leverage: Double = 1000.0,
      minVolume: Double = 10000.0, maxVolume: Double = 1000000.0)

  /** A decoded candidate: the state-machine params plus the sizing
    * genes that turn price profit into cash profit.
    */
  final case class Strategy(params: Backtest.Params, relVolume: Double,
      lowerRr: Double, upperRr: Double, decoded: Map[String, Double])

  /** Unit-interval genome → [[Strategy]] against base params (the
    * multipliers need a base TP/SL distance to scale, as the reference's
    * multipliers scale the per-entry ideal pips).
    */
  def decode(genome: Vector[Double], base: Backtest.Params): Strategy = {
    require(genome.size == Space.size,
      s"genome dim ${genome.size} != ${Space.size} (${Space.map(_._1).mkString(",")})")
    val g = Space.zip(genome).map { case ((k, (lo, hi)), v) =>
      k -> (lo + math.min(1.0, math.max(0.0, v)) * (hi - lo))
    }.toMap
    Strategy(
      params = base.copy(
        threshold = g("profit_threshold"),
        tp = g("tp_multiplier") * base.tp,
        sl = g("sl_multiplier") * base.sl),
      relVolume = g("rel_volume"),
      lowerRr = g("lower_rr"),
      upperRr = g("upper_rr"),
      decoded = g)
  }

  /** `compute_size` (`heuristic_strategy.py:230-243`): linear
    * interpolation between min and max volume by reward/risk ratio,
    * capped by available cash × rel_volume × leverage. RR is the
    * strategy's tp/sl distance ratio (the reference computes it from the
    * same TP/SL distances it places the orders at).
    */
  def orderSize(s: Strategy, sz: Sizing = Sizing()): Double = {
    val rr = if (s.params.sl > 0) s.params.tp / s.params.sl else 0.0
    val interp =
      if (rr >= s.upperRr) sz.maxVolume
      else if (rr <= s.lowerRr) sz.minVolume
      else sz.minVolume +
        (rr - s.lowerRr) / (s.upperRr - s.lowerRr) * (sz.maxVolume - sz.minVolume)
    math.min(interp, sz.cash * s.relVolume * sz.leverage)
  }

  /** One candidate evaluation: the price-profit sum (exact-decimal,
    * partition-order-independent), trade count, and the cash profit
    * (= size × price profit) the GA maximizes.
    */
  final case class Eval(priceProfit: Double, nTrades: Long, cashProfit: Double)

  def evaluate(bars: Dataset[Backtest.Bar], s: Strategy,
      sz: Sizing = Sizing()): Eval = {
    val agg = Backtest.run(bars, s.params)
      .agg(
        sum(col("profit").cast(DecimalType(28, 10))).as("p"),
        count(lit(1)).as("n"))
      .head()
    val priceProfit =
      Option(agg.getDecimal(0)).map(_.doubleValue()).getOrElse(0.0)
    Eval(priceProfit, agg.getLong(1), orderSize(s, sz) * priceProfit)
  }

  final case class GenStats(generation: Int, maxProfit: Double, avgProfit: Double)

  /** `sizing` is the account model the search actually ran under — the
    * champion artifacts must be derived from it, not from defaults.
    */
  final case class Result(best: Strategy, bestEval: Eval,
      stats: Seq[GenStats], evaluations: Int, uniqueEvaluations: Int,
      sizing: Sizing)

  /** The `optimizer_ga.py:97-137` main loop: maximize backtest profit
    * over the six-gene space. Evaluations memoize by genome — the GA
    * re-scores carried-over elites each generation, and re-firing an
    * identical distributed backtest for an identical genome is pure
    * waste (the reference pays this cost; `ind.fitness.valid` only
    * skips untouched clones). The bar feed is persisted across the
    * search and released before returning.
    */
  def optimize(bars: Dataset[Backtest.Bar],
      base: Backtest.Params = Backtest.Params(),
      cfg: GeneticSearch.Config = GeneticSearch.Config(),
      sizing: Sizing = Sizing()): Result = {
    val persisted = bars.persist()
    try {
      var evals = 0
      val memo = scala.collection.mutable.Map.empty[Vector[Double], Eval]
      def eval(g: Vector[Double]): Eval = {
        evals += 1
        memo.getOrElseUpdate(g, evaluate(persisted, decode(g, base), sizing))
      }
      // GeneticSearch minimizes; profit is maximized → negate
      val r = GeneticSearch.optimize(Space.size, g => -eval(g).cashProfit, cfg)
      val best = decode(r.best, base)
      Result(best, memo(r.best),
        r.stats.map(s => GenStats(s.generation, -s.bestFitness, -s.meanFitness)),
        evals, memo.size, sizing)
    } finally persisted.unpersist()
  }

  /** One walk-forward fold: the champion found on everything BEFORE the
    * fold window, and its performance ON the window it never saw.
    * Carries the `sizing` the fold optimized under — the serialization
    * faces (stats JSON, fact rows) must derive order_size from it, not
    * from a default the caller would have to re-thread correctly.
    */
  final case class FoldResult(fold: Int, trainBars: Long, testBars: Long,
      champion: Strategy, inSample: Eval, outOfSample: Eval,
      sizing: Sizing)

  /** Walk-forward validation — the overfit guard the reference's demo
    * lacks (`optimizer_ga.py` optimizes and reports on the SAME 2014
    * window): split the feed into `folds + 1` equal time slices, and
    * for fold k = 1..folds optimize on every bar before slice k's start
    * (expanding window) and evaluate the champion on slice k alone.
    * A strategy that only memorized its training window shows up as
    * in-sample profit ≫ out-of-sample profit across folds — the number
    * a user must read before trusting a champion at scale. Each fold is
    * a full seeded [[optimize]] run (distributed evaluations, memoized);
    * the time cuts come from one min/max aggregate over the feed.
    */
  def walkForward(bars: Dataset[Backtest.Bar],
      base: Backtest.Params = Backtest.Params(),
      cfg: GeneticSearch.Config = GeneticSearch.Config(),
      sizing: Sizing = Sizing(), folds: Int = 3): Seq[FoldResult] = {
    require(folds >= 1, s"need at least one fold, got $folds")
    val persisted = bars.persist()
    try {
      val mm = persisted.agg(min(col("ts")), max(col("ts"))).head()
      require(!mm.isNullAt(0), "walkForward needs a non-empty bar feed")
      val (tsMin, tsMax) = (mm.getLong(0), mm.getLong(1))
      val slices = folds + 1
      def cut(i: Int): Long = tsMin + (tsMax - tsMin + 1L) * i / slices
      // fold metadata in ONE pass: per-slice conditional counts over the
      // persisted feed (cumulative prefix = the fold's expanding train
      // size) instead of two count() actions per fold
      val sliceExprs = (1 to slices).map(j =>
        sum(when(col("ts") >= cut(j - 1) && col("ts") < cut(j), 1L)
          .otherwise(0L)).as(s"c$j"))
      val sliceRow = persisted.agg(sliceExprs.head, sliceExprs.tail: _*).head()
      val sliceCounts = (0 until slices).map(sliceRow.getLong)
      val trainCum = sliceCounts.scanLeft(0L)(_ + _)
      (1 to folds).map { k =>
        val lo = cut(k); val hi = cut(k + 1)
        val train = persisted.filter(col("ts") < lo)
        val test = persisted.filter(col("ts") >= lo && col("ts") < hi)
        val r = optimize(train, base, cfg, sizing)
        FoldResult(k, trainCum(k), sliceCounts(k), r.best, r.bestEval,
          evaluate(test, r.best, sizing), sizing)
      }
    } finally persisted.unpersist()
  }

  private def num(v: Double): String =
    if (v.isNaN || v.isInfinite) "null"
    else java.lang.Double.toString(v)

  /** `*_optimization_stats.json` for the strategy GA — the
    * per-generation `Max Profit` / `Avg Profit` report the reference
    * prints (`optimizer_ga.py:135-150`) plus the champion block, in the
    * optimizer-stats file family (`OptimizerStats`).
    */
  def statsJson(r: Result, totalSeconds: Double): String = {
    val history = r.stats.map(s =>
      s"""{"generation": ${s.generation}, "max_profit": ${num(s.maxProfit)}, """ +
        s""""avg_profit": ${num(s.avgProfit)}}""").mkString("[", ", ", "]")
    s"""{"optimizer_type": "ga_backtest", "total_time_elapsed": ${num(totalSeconds)}, """ +
      s""""candidates_evaluated_so_far": ${r.evaluations}, """ +
      s""""unique_candidates_evaluated": ${r.uniqueEvaluations}, """ +
      s""""champion_profit": ${num(r.bestEval.cashProfit)}, """ +
      s""""champion_price_profit": ${num(r.bestEval.priceProfit)}, """ +
      s""""champion_n_trades": ${r.bestEval.nTrades}, """ +
      s""""history": $history}"""
  }

  /** The flat champion dict for `*_optimization_parameters.json` and the
    * `fact_strategy_params` JSONB payload
    * (`olap_schema_postgres.sql:80-87` via
    * `OlapEtl.loadFactStrategyParams`): the six genes plus the derived
    * state-machine params they decode to.
    */
  def championParams(r: Result): Map[String, Double] =
    championParams(r.best, r.sizing)

  /** Per-strategy face of [[championParams]] (walk-forward fold
    * champions carry the fold's sizing explicitly).
    */
  def championParams(s: Strategy, sizing: Sizing): Map[String, Double] =
    s.decoded ++ Map(
      "threshold" -> s.params.threshold,
      "tp" -> s.params.tp,
      "sl" -> s.params.sl,
      // the sizing the search ran under — a default-Sizing order_size
      // would not reproduce champion_profit from champion_price_profit
      "order_size" -> orderSize(s, sizing))

  /** Walk-forward fold champions as `fact_strategy_params` upsert rows
    * (`olap_schema_postgres.sql:80-87` grain: experiment ×
    * strategy_name): one row per fold, `strategy_name =
    * wf_fold_<k>_champion`, params = the [[championParams]] JSON the
    * single-champion path persists. Load with
    * `OlapEtl.loadFactStrategyParamsRows` — ONE SnapshotStore
    * upsert/commit for the whole walk, not one commit per fold.
    */
  def walkForwardFactRows(spark: org.apache.spark.sql.SparkSession,
      experimentKey: String, freq: String, folds: Seq[FoldResult])
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    folds.map { f =>
      (experimentKey, s"wf_fold_${f.fold}_champion", freq,
        graft.ml.OptimizerStats.parametersJson(
          championParams(f.champion, f.sizing)))
    }.toDF("experiment_key", "strategy_name", "freq", "params")
  }

  /** `*_walkforward_stats.json`: per-fold champion + in/out-of-sample
    * profit — the overfit report [[walkForward]] exists to produce
    * (in-sample ≫ out-of-sample across folds = the champion memorized
    * its training window). Champion blocks are the same flat dict as
    * [[championParams]], so the stats file and the
    * `fact_strategy_params` payloads cross-check key-for-key.
    */
  def walkForwardStatsJson(folds: Seq[FoldResult],
      totalSeconds: Double): String = {
    def evalJson(e: Eval): String =
      s"""{"price_profit": ${num(e.priceProfit)}, "n_trades": ${e.nTrades}, """ +
        s""""cash_profit": ${num(e.cashProfit)}}"""
    val foldRows = folds.map { f =>
      s"""{"fold": ${f.fold}, "train_bars": ${f.trainBars}, """ +
        s""""test_bars": ${f.testBars}, """ +
        s""""in_sample": ${evalJson(f.inSample)}, """ +
        s""""out_of_sample": ${evalJson(f.outOfSample)}, """ +
        s""""champion": ${graft.ml.OptimizerStats.parametersJson(
          championParams(f.champion, f.sizing))}}"""
    }.mkString("[", ", ", "]")
    def mean(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0 else xs.sum / xs.size
    s"""{"optimizer_type": "ga_backtest_walkforward", """ +
      s""""total_time_elapsed": ${num(totalSeconds)}, """ +
      s""""folds": $foldRows, """ +
      s""""mean_in_sample_profit": ${num(mean(folds.map(_.inSample.cashProfit)))}, """ +
      s""""mean_out_of_sample_profit": ${num(mean(folds.map(_.outOfSample.cashProfit)))}}"""
  }
}
