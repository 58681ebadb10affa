package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.backtest.{Backtest, StrategyOptimizer}
import graft.ml.{GeneticSearch, OptimizerStats}

/** Golden run for the strategy-parameter GA (`app/optimizer_ga.py` —
  * the reference's last standalone module): optimize the six-gene
  * strategy space over a deterministic bar fixture and write the
  * optimizer artifact pair into `golden/backtest/`:
  *
  *   - `graft_backtest_ga_optimization_stats.json` — champion profit +
  *     the per-generation Max/Avg-profit history the reference prints
  *     (`optimizer_ga.py:135-150`);
  *   - `graft_backtest_ga_optimization_parameters.json` — the flat
  *     champion dict (`:139-147`), the same payload
  *     `OlapEtl.loadFactStrategyParams` persists into
  *     `fact_strategy_params`.
  *
  * `StrategyOptimizerSpec` re-runs the same seeded search and diffs the
  * champion parameters against the committed file (timing fields are
  * wall-clock, everything else is seed-fixed); `GoldenInventorySpec`
  * pins the file set.
  *
  *   sbt "runMain graft.pipeline.StrategyOptGoldenRun [outDir]"
  */
object StrategyOptGoldenRun {

  /** GA scale of the golden (reference runs 20×100; the golden keeps
    * the committed artifact cheap to regenerate, like
    * OptimizationGoldenRun's 6×3).
    */
  val GaConfig: GeneticSearch.Config =
    GeneticSearch.Config(populationSize = 12, generations = 6, seed = 42L)

  /** Walk-forward GA scale: each fold is a full [[GaConfig]]-style
    * search, so the per-fold budget stays smaller (3 folds × ~18
    * evaluations) to keep the committed artifact cheap to regenerate.
    */
  val WfConfig: GeneticSearch.Config =
    GeneticSearch.Config(populationSize = 6, generations = 2, seed = 42L)

  val WfFolds = 3

  /** Deterministic momentum-walk bar fixture: 3 symbols × 1200 bars.
    * Price follows an AR(1)-trend random walk and the prediction is an
    * imperfect momentum forecast (trend × horizon + noise), so the
    * profit surface over (threshold, tp, sl) has real structure — weak
    * signals lose to stop-outs, strong ones pay — rather than being
    * flat noise the GA would overfit.
    */
  def fixtureBars(spark: SparkSession): Dataset[Backtest.Bar] = {
    import spark.implicits._
    val bars = (0 until 3).flatMap { s =>
      val rnd = new scala.util.Random(1000L + s)
      var price = 100.0 + 10 * s
      var trend = 0.0
      (0 until 1200).map { i =>
        trend = 0.9 * trend + rnd.nextGaussian() * 0.25
        price += trend + rnd.nextGaussian() * 0.6
        val range = math.abs(rnd.nextGaussian()) * 0.4
        val pred = price + 9.6 * trend + rnd.nextGaussian() * 0.5
        Backtest.Bar(s"sym$s", i.toLong * 3600000000L,
          price, price + range, price - range, price, pred)
      }
    }
    bars.toDS()
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("golden/backtest")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()

    val t0 = System.nanoTime()
    val result = StrategyOptimizer.optimize(fixtureBars(spark),
      base = Backtest.Params(), cfg = GaConfig)
    val totalSec = (System.nanoTime() - t0) / 1e9

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/graft_backtest_ga_optimization_stats.json"),
      StrategyOptimizer.statsJson(result, totalSec))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/graft_backtest_ga_optimization_parameters.json"),
      OptimizerStats.parametersJson(StrategyOptimizer.championParams(result)))
    println(f"strategy GA golden written to $outDir%s (champion profit=" +
      f"${result.bestEval.cashProfit}%.2f over ${result.bestEval.nTrades}%d trades, " +
      f"${result.uniqueEvaluations}%d unique evals, $totalSec%.1f s)")

    // walk-forward leg: fold champions + out-of-sample verdicts, then
    // the same champions END-TO-END through the OLAP loader into a
    // SnapshotStore-committed fact_strategy_params (transactional
    // manifest-swap commit; the golden artifact pins the stats JSON,
    // StrategyOptimizerSpec replays the walk and the loader round-trip)
    val t1 = System.nanoTime()
    val folds = StrategyOptimizer.walkForward(fixtureBars(spark),
      base = Backtest.Params(), cfg = WfConfig, folds = WfFolds)
    val wfSec = (System.nanoTime() - t1) / 1e9
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/graft_backtest_ga_walkforward_stats.json"),
      StrategyOptimizer.walkForwardStatsJson(folds, wfSec))
    val factPath = java.nio.file.Files
      .createTempDirectory("wf_fact_strategy").toString
    val fact = graft.olap.OlapEtl.loadFactStrategyParamsRows(spark,
      StrategyOptimizer.walkForwardFactRows(spark, "exp_golden_wf", "1h", folds),
      factPath)
    println(f"walk-forward golden written (${folds.size}%d folds, " +
      f"${fact.count()}%d fact_strategy_params rows, $wfSec%.1f s)")
    spark.stop()
  }
}
