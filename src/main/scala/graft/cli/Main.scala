package graft.cli

import org.apache.spark.sql.SparkSession

import graft.config.ConfigMerger
import graft.io.Sources
import graft.pipeline.ForecastPipeline

/** CLI entry point — the reference's `predictor --load_config <json>`
  * shape (SURVEY §3 entry point 1): config assembly (defaults ← file ←
  * CLI, `ConfigMerger` precedence) → the `app/main.py:264-301` execution
  * decision:
  *
  *   1. `load_model` set → load the saved per-horizon model and
  *      EVALUATE it (`main.py:265-272`; no fit) → results CSV;
  *   2. else `use_optimizer` truthy → run the optimizer plugin
  *      (`optimizer_plugin`: "neat" default | "ga") and save the
  *      champion hyper-parameters to `optimizer_output_file`
  *      (`main.py:274-291`) — optimization replaces the pipeline run,
  *      as in the reference;
  *   3. else → the prediction pipeline: with `predictor_plugin` set,
  *      fit that head end-to-end (optionally persisting it under
  *      `save_model`) and write its results CSV; without one, the
  *      naive slice (the original entry-point-1 default).
  *
  * Usage:
  *   runMain graft.cli.Main --config <config.json> [--results_file <dir>]
  *     [--load_model <dir>] [--save_model <dir>] [--predictor_plugin mlp]
  *     [--use_optimizer true] [--optimizer_plugin neat|ga]
  *     [--optimizer_output_file <json>]
  *
  * Config JSON fields (reference names, FIXTURES.md §4):
  *   x_train_file / x_validation_file / x_test_file : split CSVs
  *   target_column                                  : e.g. "CLOSE"
  *   predicted_horizons                             : [1, 6, ...]
  *   use_normalization_json                         : stats JSON path (optional)
  *   max_steps_train                                : row limit (optional)
  *   results_file                                   : output CSV dir
  *   predictor_plugin / load_model / save_model     : head + artifact paths
  *   use_optimizer / optimizer_plugin / optimizer_output_file
  *   population_size / generations / epochs / learning_rate / hidden
  */
object Main {

  private val Defaults: ConfigMerger.Conf = Map(
    "target_column" -> "CLOSE",
    "predicted_horizons" -> Seq(1),
    "results_file" -> "/tmp/graft_results")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toIndexedSeq) finally spark.stop()
  }

  /** The full dispatch on a caller-owned session — `main` minus the
    * session lifecycle, so `CliMainSpec` can drive all three branches
    * on the shared test session (the indicatorGroupStep extraction
    * pattern).
    */
  private[cli] def run(spark: SparkSession, args: Seq[String]): Unit = {
    val cli = ConfigMerger.parseCliArgs(args.toIndexedSeq);
    {
      val fileConf: ConfigMerger.Conf = cli.get("config") match {
        case Some(path: String) => loadJsonConfig(spark, path)
        case _ => Map.empty
      }
      val conf = ConfigMerger.merge(Map.empty, Defaults, fileConf, cli)
      val splits = Seq(
        "train" -> conf.get("x_train_file"),
        "validation" -> conf.get("x_validation_file"),
        "test" -> conf.get("x_test_file")
      ).collect { case (k, Some(v: String)) => k -> v }.toMap
      require(splits.nonEmpty, "config must name at least x_train_file")
      val horizons = conf("predicted_horizons") match {
        case s: Seq[_] => s.map(_.toString.toDouble.toInt)
        case s: String => s.split(",").map(_.trim.toInt).toSeq
        case i: Int => Seq(i)
        case other => Seq(other.toString.toInt)
      }
      val normStats = conf.get("use_normalization_json") match {
        case Some(p: String) => Sources.loadNormStats(spark, p)
        case _ => Map.empty[String, (Double, Double)]
      }
      // per-split caps: max_steps_train / max_steps_val / max_steps_test
      val maxSteps = Seq(
        "train" -> conf.get("max_steps_train"),
        "validation" -> conf.get("max_steps_val"),
        "test" -> conf.get("max_steps_test")
      ).collect { case (k, Some(v)) => k -> v.toString.toDouble.toInt }.toMap
      val cfg = ForecastPipeline.Config(
        splits = splits,
        targetColumn = conf("target_column").toString,
        horizons = horizons,
        normStats = normStats,
        maxSteps = maxSteps)
      val out = conf("results_file").toString
      def str(k: String): Option[String] =
        conf.get(k).map(_.toString).filter(v => v.nonEmpty && v != "false")
      def intOr(k: String, d: Int): Int =
        conf.get(k).map(_.toString.toDouble.toInt).getOrElse(d)
      val head = str("predictor_plugin")
      val mlpConf = ForecastPipeline.MlpConf(
        hidden = intOr("hidden", 8),
        epochs = intOr("epochs", 60),
        lr = conf.get("learning_rate").map(_.toString.toDouble).getOrElse(0.1))

      // the result tables are multi-union plans: cache before the
      // write + count pair, or the count re-fires every per-split
      // predict/aggregate job just to print a number
      def writeCounted(results: org.apache.spark.sql.DataFrame): Long = {
        results.cache()
        try { Sources.writeCsv(results, out, Seq("Metric")); results.count() }
        finally results.unpersist()
      }
      str("load_model") match {
        case Some(modelDir) =>
          // main.py:265-272 — load and evaluate, no fit
          val n = writeCounted(ForecastPipeline.resultsTable(
            ForecastPipeline.evaluateSavedMetrics(spark, cfg,
              head.getOrElse("mlp"), modelDir)))
          println(s"[graft] evaluated saved model at $modelDir -> " +
            s"$n result rows to $out")
        case None if str("use_optimizer").isDefined =>
          // main.py:274-291 — optimize, save champion params; the
          // optimization REPLACES the pipeline run, as in the reference
          val optOut = conf.getOrElse("optimizer_output_file",
            "optimizer_output.json").toString
          runOptimizer(spark, cfg, str("optimizer_plugin").getOrElse("neat"),
            intOr("population_size", 6), intOr("generations", 3), mlpConf, optOut)
          println(s"[graft] optimized parameters saved to $optOut")
        case None =>
          val n = head match {
            case Some(h) =>
              val c = writeCounted(ForecastPipeline.resultsTable(
                ForecastPipeline.modelMetrics(spark, cfg, nLags = 3, head = h,
                  modelDir = str("save_model"), mlpConf = mlpConf)))
              str("save_model").foreach(d => println(s"[graft] saved model to $d"))
              c
            case None => writeCounted(ForecastPipeline.run(spark, cfg, None))
          }
          println(s"[graft] wrote $n result rows to $out")
      }
    }
  }

  /** The `use_optimizer` branch: NEAT or GA over the MLP head's
    * (hidden, lr) space with the reference's fitness (val MAE − val
    * naive MAE), champion dict written as the reference's
    * `optimizer_output.json` (`main.py:283-287`). Each candidate
    * evaluation is a distributed `modelMetrics` run — only the scalar
    * fitness crosses the driver.
    */
  private[cli] def runOptimizer(spark: SparkSession,
      cfg: ForecastPipeline.Config, optimizer: String, populationSize: Int,
      generations: Int, mlpConf: ForecastPipeline.MlpConf,
      outFile: String): Map[String, Double] = {
    // out-of-sample fitness only: silently falling back to the train
    // split would reward memorization and persist a champion selected
    // with zero held-out signal — surface the misconfiguration instead
    val valSplit =
      if (cfg.splits.contains("validation")) "validation"
      else if (cfg.splits.contains("test")) {
        // loud, not silent: selecting on test contaminates it — its
        // metrics are no longer held-out after this run
        System.err.println("[graft] WARNING: no x_validation_file — " +
          "scoring optimizer candidates on the TEST split; test metrics " +
          "are no longer held-out for the champion")
        "test"
      } else throw new IllegalArgumentException(
        "use_optimizer needs a held-out split: name x_validation_file " +
          "(or x_test_file) in the config")
    // the PRIMARY horizon scores the search (the reference optimizer's
    // single-fitness shape); keying without the horizon would silently
    // collapse multi-horizon rows to an arbitrary one
    val h = cfg.horizons.head
    def fitness(params: Map[String, Double]): Double = {
      val mc = mlpConf.copy(
        hidden = math.max(2, params("hidden").round.toInt),
        lr = params("lr"))
      val rows = ForecastPipeline.modelMetrics(spark, cfg, nLags = 3,
          head = "mlp", mlpConf = mc)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getDouble(3))
        .toMap
      rows((valSplit, "MAE", h)) - rows((valSplit, "Naive MAE", h))
    }
    val bounds = Seq("hidden" -> (2.0, 12.0), "lr" -> (0.02, 0.3))
    val best: Map[String, Double] = optimizer match {
      case "neat" =>
        graft.ml.NeatSearch.optimize(bounds, fitness,
          graft.ml.NeatSearch.Config(populationSize = populationSize,
            generations = generations, patience = generations,
            minParams = bounds.size, seed = 7L)).bestParams
      case "ga" =>
        def decode(g: Vector[Double]): Map[String, Double] =
          bounds.zip(g).map { case ((k, (lo, hi)), v) => k -> (lo + v * (hi - lo)) }.toMap
        val r = graft.ml.GeneticSearch.optimize(bounds.size,
          g => fitness(decode(g)),
          graft.ml.GeneticSearch.Config(populationSize = populationSize,
            generations = generations, seed = 7L))
        decode(r.best)
      case other => throw new IllegalArgumentException(
        s"unknown optimizer_plugin '$other' (expected neat | ga)")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      graft.ml.OptimizerStats.parametersJson(best))
    best
  }

  /** Flat JSON config → Conf (driver-side read of a small local file). */
  private[cli] def loadJsonConfig(spark: SparkSession, path: String): ConfigMerger.Conf = {
    val df = spark.read.option("multiLine", "true").json(path)
    val row = df.head()
    df.schema.fields.map { f =>
      val v = row.get(df.schema.fieldIndex(f.name)) match {
        case s: scala.collection.Seq[_] => s.toSeq
        case other => other
      }
      f.name -> v
    }.toMap.filter(_._2 != null)
  }
}
