package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.ml.{NeatSearch, OptimizerStats}

/** SURVEY §5 last output family: the optimizer artifacts. Runs a real
  * (small) NEAT hyper-parameter search over the MLP head on the
  * FIXTURES.md phase-1 splits — each candidate evaluation is the same
  * distributed `modelMetrics` dataflow the reference fires per genome
  * (`neat_optimizer.py:366-404`), only the scalar fitness crossing the
  * driver — and writes the reference's two optimizer output files:
  *
  *   - `*_optimization_stats.json` (`app/main.py:281-284`; golden key
  *     shape `phase_1_tcn_neat_1d_optimization_stats.json`): champion
  *     metrics, NEAT population shape, per-generation history;
  *   - `*_optimization_parameters.json`: the flat best-hyperparameter
  *     dict.
  *
  * `OptimizationGoldenSpec` diffs the key sets against the reference
  * goldens. Timings inside the stats file are wall-clock (as in the
  * reference); everything else is seed-fixed.
  *
  *   sbt "runMain graft.pipeline.OptimizationGoldenRun [outDir]"
  */
object OptimizationGoldenRun {
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
    val tmp = java.nio.file.Files.createTempDirectory("opt_golden").toString
    GoldenRun.writeFixtureSplit(s"$tmp/train.csv", 1200, seed = 101L, "2017-01-02T00:00:00")
    GoldenRun.writeFixtureSplit(s"$tmp/validation.csv", 400, seed = 202L, "2017-02-21T00:00:00")
    GoldenRun.writeFixtureSplit(s"$tmp/test.csv", 400, seed = 303L, "2017-03-10T00:00:00")
    val cfg = ForecastPipeline.Config(
      splits = Map("train" -> s"$tmp/train.csv",
        "validation" -> s"$tmp/validation.csv", "test" -> s"$tmp/test.csv"),
      targetColumn = "CLOSE", horizons = Seq(1))

    // metric lookup per evaluation: (split, metric) -> value at H1
    def metricsFor(params: Map[String, Double]): Map[(String, String), Double] = {
      val mc = ForecastPipeline.MlpConf(
        hidden = math.max(2, params("hidden").round.toInt),
        epochs = 60, lr = params("lr"))
      ForecastPipeline.modelMetrics(spark, cfg, nLags = 3, head = "mlp", mlpConf = mc)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    }

    // fitness = val MAE − val naive MAE (the reference's optimizer
    // objective); memo keyed by the fitness value so the per-generation
    // global champion's val metrics can be recovered for the history
    val memo = scala.collection.mutable.Map.empty[Double, (Double, Double)]
    val paramMemo = scala.collection.mutable.Map.empty[Double, Map[String, Double]]
    def fitness(params: Map[String, Double]): Double = {
      val m = metricsFor(params)
      val mae = m(("validation", "MAE"))
      val naive = m(("validation", "Naive MAE"))
      val f = mae - naive
      memo(f) = (mae, naive)
      paramMemo(f) = params
      f
    }

    val t0 = System.nanoTime()
    val result = NeatSearch.optimize(
      bounds = Seq("hidden" -> (2.0, 12.0), "lr" -> (0.02, 0.3)),
      fitness = fitness,
      cfg = NeatSearch.Config(populationSize = 6, generations = 3,
        patience = 3, minParams = 2, seed = 7L))
    val totalSec = (System.nanoTime() - t0) / 1e9

    // champion metrics across all three splits (one re-evaluation of
    // the best genome, the reference's final champion report)
    val champM = metricsFor(result.bestParams)
    val champ = OptimizerStats.ChampionMetrics(
      fitness = result.bestFitness,
      validationMae = champM(("validation", "MAE")),
      validationNaiveMae = champM(("validation", "Naive MAE")),
      testMae = champM(("test", "MAE")),
      testNaiveMae = champM(("test", "Naive MAE")),
      trainMae = champM(("train", "MAE")),
      trainNaiveMae = champM(("train", "Naive MAE")))

    // per-generation global champion = running min of gen-best fitness;
    // its val metrics come from the evaluation memo
    var best = Double.PositiveInfinity
    val championPerGen = result.stats.map { g =>
      best = math.min(best, g.bestFitness)
      val (cv, cn) = memo.getOrElse(best,
        (champ.validationMae, champ.validationNaiveMae))
      (best, cv, cn)
    }
    val perGen = result.stats.map(_ => totalSec / math.max(1, result.stats.size))

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/graft_phase_1_mlp_neat_optimization_stats.json"),
      OptimizerStats.neatStatsJson(result, totalSec, champ, perGen, championPerGen))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/graft_phase_1_mlp_neat_optimization_parameters.json"),
      OptimizerStats.parametersJson(result.bestParams))
    // resume checkpoint (the reference's third optimizer file): final
    // population, reloadable into NeatSearch.optimize(resumeFrom = ...)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/graft_phase_1_mlp_neat_optimization_resume.json"),
      OptimizerStats.neatResumeJson(result.stats.size, result.finalPopulation))

    // GA (DEAP/mimo) variant: same space through GeneticSearch over
    // [0,1]^2, decoded to bounds — the reference's second stats shape
    val bounds = Seq(("hidden", (2.0, 12.0)), ("lr", (0.02, 0.3)))
    def decode(g: Vector[Double]): Map[String, Double] =
      bounds.zip(g).map { case ((k, (lo, hi)), v) => k -> (lo + v * (hi - lo)) }.toMap
    var gaEvals = 0
    val memoGa = scala.collection.mutable.Map.empty[Double, (Double, Double)]
    def gaFitness(g: Vector[Double]): Double = {
      gaEvals += 1
      val f = fitness(decode(g))
      memoGa(f) = memo(f)
      f
    }
    val tGa0 = System.nanoTime()
    val gaResult = graft.ml.GeneticSearch.optimize(dim = 2, gaFitness,
      graft.ml.GeneticSearch.Config(populationSize = 6, generations = 3, seed = 7L))
    val gaSec = (System.nanoTime() - tGa0) / 1e9
    val gaChampM = metricsFor(decode(gaResult.best))
    val gaChamp = OptimizerStats.ChampionMetrics(
      fitness = gaResult.bestFitness,
      validationMae = gaChampM(("validation", "MAE")),
      validationNaiveMae = gaChampM(("validation", "Naive MAE")),
      testMae = gaChampM(("test", "MAE")),
      testNaiveMae = gaChampM(("test", "Naive MAE")),
      trainMae = gaChampM(("train", "MAE")),
      trainNaiveMae = gaChampM(("train", "Naive MAE")))
    var gaBest = Double.PositiveInfinity
    val gaPerGen = gaResult.stats.map { g =>
      gaBest = math.min(gaBest, g.bestFitness)
      val (bv, bn) = memoGa.getOrElse(g.bestFitness,
        (gaChamp.validationMae, gaChamp.validationNaiveMae))
      val (cv, cn) = memoGa.getOrElse(gaBest,
        (gaChamp.validationMae, gaChamp.validationNaiveMae))
      (g.meanFitness, g.bestFitness, bv, bn, gaBest, cv, cn)
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/graft_phase_1_mlp_ga_optimization_stats.json"),
      OptimizerStats.gaStatsJson(gaResult, gaSec, gaEvals, gaChamp,
        gaResult.stats.map(_ => gaSec / math.max(1, gaResult.stats.size)), gaPerGen))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/graft_phase_1_mlp_ga_optimization_parameters.json"),
      OptimizerStats.parametersJson(decode(gaResult.best)))
    println(f"optimization golden written to $outDir%s " +
      f"(champion fitness=${result.bestFitness}%.6g, evals=${result.evaluations}%d, $totalSec%.1f s)")
    spark.stop()
  }
}
