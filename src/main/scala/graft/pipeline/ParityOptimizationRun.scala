package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.ml.{Callbacks, Forecaster, NeatSearch, Optimizer, OptimizerStats}

/** SURVEY §5 + r9 verdict task #5: optimizer-search QUALITY evidence on
  * the reference's own committed hourly EURUSD bars — a real
  * `NeatSearch` hyper-parameter search over the phase-1 ann head at the
  * 1575 scale (`ParityRun`'s exact splits/features), fitness = val MAE
  * − val naive MAE (the reference optimizer's objective,
  * `neat_optimizer.py:366-404`), stats sunk in the reference's
  * `*_optimization_stats.json` shape next to the parity artifacts.
  *
  * What the committed artifact can and cannot show, honestly: on the
  * COMMITTED hourly data, NO head configuration beats the random-walk
  * naive baseline — the reference's own committed
  * `phase_1_ann_1575_1h_results.csv` has Validation MAE H1 0.001094
  * against a naive MAE of 0.000737 computed from its own committed
  * validation bars (base_d5 CLOSE), i.e. the reference's committed
  * hourly run sits 48% ABOVE naive too (only the provenance-anomalous
  * 12600+/25200 grids dip below it — see the re-cut findings pinned in
  * `QuantParitySpec`). A champion fitness < 0 here would be evidence of
  * a bug, not of quality. What the search DOES evidence, and
  * `ParityOptimizationSpec` asserts: the optimizer converges to the
  * no-signal floor — champion val MAE within a few percent of the naive
  * MAE (where the default ann regime sits 55% above it), at or below
  * the reference's own committed 1575 validation MAE, with the global
  * champion fitness non-increasing across generations. The search space
  * (hidden width, lr, log-decay) includes the heavy-decay corner whose
  * optimum predicts the train-mean return — the fitness landscape's
  * true floor on no-edge data — so finding it is the correct behavior
  * the reference's optimizer would also exhibit on these bars. Each
  * candidate fit runs under a `TimeBudget` guard (`callbacks.py:246`).
  *
  *   tools/runmain.sh graft.pipeline.ParityOptimizationRun [outDir]
  */
object ParityOptimizationRun {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("golden/phase_1_parity")
    val epochs = args.lift(1).map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()

    val phase = ParityRun.Phases("1")
    val stats = Sources.loadNormStats(spark, phase.normJsonPath)
    val pScale = stats(phase.targetCol)._2 // z-score: (mean, std)
    val nLags = 24
    val featureCols = phase.bandCols ++ (1 to nLags).map(i => s"lagd_$i")
    def loadNorm(path: String, maxRows: Option[Int] = None): DataFrame =
      ParityRun.normalize(Sources.loadCsv(spark, path, maxRows = maxRows), stats)
    def featurized(df: DataFrame): DataFrame =
      ParityRun.featurize(df, phase.targetCol, Seq(1), nLags)

    val pool = phase.trainFiles.map(f => loadNorm(f)).reduce(_.unionByName(_))
      .orderBy("ts")
    val trainF = featurized(pool.limit(1575)).cache()
    val valF = featurized(loadNorm(phase.valFile)).cache()
    val testF = featurized(loadNorm(phase.testFile, maxRows = Some(phase.testMax))).cache()

    // (mae, naive mae) of a fitted H1 model on a split, price units —
    // naive = last-value-carried-forward, i.e. predicted return 0
    def score(models: Map[Int, Forecaster.HorizonModel], df: DataFrame): (Double, Double) = {
      val scored = Forecaster.predict(models, df, featureCols)
        .filter(col("target_h1").isNotNull)
      val r = scored.agg(
        avg(abs(col("pred_h1") - col("target_h1"))),
        avg(abs(col("target_h1")))).head()
      (r.getDouble(0) * pScale, r.getDouble(1) * pScale)
    }

    def fitFor(params: Map[String, Double]): Map[Int, Forecaster.HorizonModel] =
      Forecaster.fitPerHorizonDeepMlp(
        trainF, featureCols, Seq(1),
        layers = Seq(math.max(2, params("hidden").round.toInt)),
        epochs = epochs, lr = params("lr"), seed = 42L,
        opt = Optimizer.OptConfig(method = "adamw", batches = 8,
          weightDecay = math.pow(10.0, params("log10_wd"))),
        callbacks = _ => Seq(new Callbacks.TimeBudget(120)))

    // chronological evaluation log (params, fitness, mae, naive):
    // championPerGen below resolves each generation's champion metrics
    // from it. NOT keyed by the raw fitness Double — two candidates
    // with equal fitness must not overwrite each other's metrics.
    val evals = scala.collection.mutable.ArrayBuffer
      .empty[(Map[String, Double], Double, Double, Double)]
    def fitness(params: Map[String, Double]): Double = {
      val (mae, naive) = score(fitFor(params), valF)
      val f = mae - naive
      evals += ((params, f, mae, naive))
      f
    }

    val t0 = System.nanoTime()
    val result = NeatSearch.optimize(
      bounds = Seq("hidden" -> (2.0, 16.0), "lr" -> (0.005, 0.1),
        "log10_wd" -> (-5.0, -1.0)),
      fitness = fitness,
      cfg = NeatSearch.Config(populationSize = 8, generations = 5,
        patience = 5, minParams = 3, seed = 7L))
    val totalSec = (System.nanoTime() - t0) / 1e9

    val champModels = fitFor(result.bestParams)
    val (vMae, vNaive) = score(champModels, valF)
    val (tMae, tNaive) = score(champModels, testF)
    val (trMae, trNaive) = score(champModels, trainF)
    val champ = OptimizerStats.ChampionMetrics(
      fitness = result.bestFitness,
      validationMae = vMae, validationNaiveMae = vNaive,
      testMae = tMae, testNaiveMae = tNaive,
      trainMae = trMae, trainNaiveMae = trNaive)

    // The champion after generation g is the FIRST evaluation reaching
    // min(bestFitness over gens <= g): NeatSearch's champion update is
    // strict (<) and its within-generation minBy takes the first of
    // equals, both matching first-in-chronological-order here — so each
    // generation's reported val (mae, naive) is the actual champion's,
    // not a reverse lookup that the final champion could shadow.
    var best = Double.PositiveInfinity
    val championPerGen = result.stats.map { g =>
      best = math.min(best, g.bestFitness)
      val (_, _, cv, cn) = evals.find(_._2 == best)
        .getOrElse((Map.empty[String, Double], best, vMae, vNaive))
      (best, cv, cn)
    }
    val perGen = result.stats.map(_ => totalSec / math.max(1, result.stats.size))

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/graft_phase_1_ann_neat_1575_1h_optimization_stats.json"),
      OptimizerStats.neatStatsJson(result, totalSec, champ, perGen, championPerGen))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/graft_phase_1_ann_neat_1575_1h_optimization_parameters.json"),
      OptimizerStats.parametersJson(result.bestParams))
    println(s"champion fitness ${result.bestFitness} (val $vMae vs naive $vNaive) " +
      s"after ${result.evaluations} evaluations in $totalSec s")
    spark.stop()
  }
}
