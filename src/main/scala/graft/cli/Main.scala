package graft.cli

import org.apache.spark.sql.SparkSession

import graft.config.ConfigMerger
import graft.io.Sources
import graft.pipeline.ForecastPipeline

/** CLI entry point — the reference's `predictor --load_config <json>`
  * shape (SURVEY §3 entry point 1): config assembly (defaults ← file ←
  * CLI, `ConfigMerger` precedence) → naive-slice pipeline → results CSV.
  *
  * Usage:
  *   runMain graft.cli.Main --config <config.json> [--results_file <dir>]
  *
  * Config JSON fields (reference names, FIXTURES.md §4):
  *   x_train_file / x_validation_file / x_test_file : split CSVs
  *   target_column                                  : e.g. "CLOSE"
  *   predicted_horizons                             : [1, 6, ...]
  *   use_normalization_json                         : stats JSON path (optional)
  *   max_steps_train                                : row limit (optional)
  *   results_file                                   : output CSV dir
  */
object Main {

  private val Defaults: ConfigMerger.Conf = Map(
    "target_column" -> "CLOSE",
    "predicted_horizons" -> Seq(1),
    "results_file" -> "/tmp/graft_results")

  def main(args: Array[String]): Unit = {
    val cli = ConfigMerger.parseCliArgs(args.toIndexedSeq)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
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
      val results = ForecastPipeline.run(spark, cfg, Some(out))
      println(s"[graft] wrote ${results.count()} result rows to $out")
    } finally spark.stop()
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
