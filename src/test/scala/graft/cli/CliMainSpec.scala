package graft.cli

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.pipeline.GoldenRun

/** Drives `Main.run` — the reference's `app/main.py:264-301` execution
  * decision — through all three branches on tiny fixtures: train (+
  * save_model), load_model → evaluate, and use_optimizer. Runs on the
  * shared test session via the extracted dispatch (main() owns its own
  * session lifecycle and would stop ours).
  */
class CliMainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val work = {
    val dir = java.nio.file.Files.createTempDirectory("cli_main").toString
    GoldenRun.writeFixtureSplit(s"$dir/train.csv", 400, seed = 11L, "2017-01-02T00:00:00")
    GoldenRun.writeFixtureSplit(s"$dir/validation.csv", 150, seed = 22L, "2017-02-01T00:00:00")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/config.json"),
      s"""{"x_train_file": "$dir/train.csv",
         | "x_validation_file": "$dir/validation.csv",
         | "target_column": "CLOSE",
         | "predicted_horizons": [1],
         | "epochs": 20, "hidden": 4}""".stripMargin)
    dir
  }

  private def readResults(dir: String): Map[String, Double] = {
    val f = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".csv")).getOrElse(fail(s"no csv under $dir"))
    val lines = java.nio.file.Files.readAllLines(f.toPath)
    lines.subList(1, lines.size).toArray.map(_.toString.split(","))
      .map(a => a(0) -> a(1).toDouble).toMap
  }

  test("train branch: predictor_plugin head fits, saves the model, writes results") {
    Main.run(spark, Seq("--config", s"$work/config.json",
      "--predictor_plugin", "mlp",
      "--save_model", s"$work/model",
      "--results_file", s"$work/out_train"))
    val rows = readResults(s"$work/out_train")
    assert(rows.contains("Train MAE H1") && rows.contains("Validation MAE H1"),
      s"missing metric rows: ${rows.keySet}")
    assert(rows("Train MAE H1") > 0.0)
    assert(new java.io.File(s"$work/model/h1").isDirectory,
      "save_model must persist the per-horizon artifact")
  }

  test("load_model branch: evaluate-only reproduces the training run's metrics exactly") {
    // depends on the train branch's artifact — ScalaTest runs suites'
    // tests in declaration order, and `work` is shared
    assert(new java.io.File(s"$work/model/h1").isDirectory, "train branch must run first")
    Main.run(spark, Seq("--config", s"$work/config.json",
      "--predictor_plugin", "mlp",
      "--load_model", s"$work/model",
      "--results_file", s"$work/out_eval"))
    val trained = readResults(s"$work/out_train")
    val loaded = readResults(s"$work/out_eval")
    assert(loaded.keySet == trained.keySet)
    // save → load → evaluate must reproduce the fit-time evaluation
    // bit-for-bit: same features, same weights, same metric ops
    trained.foreach { case (k, v) =>
      assert(loaded(k) == v, s"$k drifted on reload: trained=$v loaded=${loaded(k)}")
    }
  }

  test("use_optimizer branch: ga and neat both write the champion parameter dict") {
    for (opt <- Seq("ga", "neat")) {
      val outJson = s"$work/opt_$opt.json"
      Main.run(spark, Seq("--config", s"$work/config.json",
        "--use_optimizer", "true",
        "--optimizer_plugin", opt,
        "--population_size", "4", "--generations", "2",
        "--optimizer_output_file", outJson,
        "--results_file", s"$work/out_opt_$opt"))
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(outJson)))
      assert(node.has("hidden") && node.has("lr"), s"$opt: champion dict incomplete")
      val hidden = node.get("hidden").asDouble()
      val lr = node.get("lr").asDouble()
      assert(hidden >= 2.0 && hidden <= 12.0 && lr >= 0.02 && lr <= 0.3,
        s"$opt: champion outside the search bounds: hidden=$hidden lr=$lr")
      // optimization replaces the pipeline run (main.py's else-if) — no
      // results CSV is written on this branch
      assert(!new java.io.File(s"$work/out_opt_$opt").exists,
        "optimizer branch must not run the pipeline")
    }
    intercept[IllegalArgumentException] {
      Main.run(spark, Seq("--config", s"$work/config.json",
        "--use_optimizer", "true", "--optimizer_plugin", "nope"))
    }
  }

  test("default branch: no predictor_plugin falls back to the naive slice") {
    Main.run(spark, Seq("--config", s"$work/config.json",
      "--results_file", s"$work/out_naive"))
    val rows = readResults(s"$work/out_naive")
    assert(rows.contains("Train Naive MAE H1") && rows("Train Naive MAE H1") > 0.0)
  }
}
