package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ForecastPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic synthetic normalized series: CLOSE_norm walks ±0.1. */
  private def writeSplit(n: Int, start: Double): String = {
    val f = Files.createTempFile("slice", ".csv")
    val rows = (0 until n).map { i =>
      val ts = f"2020-01-01 ${i / 60}%02d:${i % 60}%02d:00"
      val v = start + (if (i % 2 == 0) 0.1 else -0.1) * (i % 5)
      s"$ts,$v"
    }
    Files.writeString(f, "DATE_TIME,CLOSE\n" + rows.mkString("\n") + "\n")
    f.toString
  }

  test("naive slice end-to-end: results table with the reference's shape") {
    val cfg = ForecastPipeline.Config(
      splits = Map("train" -> writeSplit(120, 0.0), "test" -> writeSplit(80, 1.0)),
      targetColumn = "CLOSE",
      horizons = Seq(1, 3),
      normStats = Map("CLOSE" -> (1.2, 0.5)))
    val out = Files.createTempDirectory("res").toString + "/results"
    val results = ForecastPipeline.run(spark, cfg, Some(out))
    assert(results.columns.toSeq == Seq("Metric", "Average", "Std Dev", "Min", "Max"))
    // 2 splits × 3 metrics × 2 horizons
    assert(results.count() == 12)
    val metrics = results.select("Metric").as[String].collect().toSet
    assert(metrics.contains("Train MAE H1") && metrics.contains("Test Naive MAE H3")
      && metrics.contains("Train R2 H1"))
    // naive model: MAE == Naive MAE (prediction IS the baseline)
    val mae = results.filter($"Metric" === "Train MAE H1").select("Average").as[Double].head()
    val nmae = results.filter($"Metric" === "Train Naive MAE H1").select("Average").as[Double].head()
    assert(mae == nmae && mae > 0.0)
    // denormalization scales returns by std: recompute by hand for h=1
    // series alternates, |ret_h1| pattern deterministic — just sanity-check scale
    assert(mae < 1.0) // normalized steps ≤0.8 × std 0.5 → denorm |ret| ≤ 0.4
    // CSV sink exists
    val csv = spark.read.option("header", "true").csv(out)
    assert(csv.count() == 12)
  }

  test("R2 of the naive zero-return forecast relates to return variance") {
    val cfg = ForecastPipeline.Config(
      splits = Map("train" -> writeSplit(60, 0.0)),
      targetColumn = "CLOSE", horizons = Seq(1))
    val r2 = ForecastPipeline.naiveMetrics(spark, cfg)
      .filter($"metric" === "R2").select("value").as[Double].head()
    // R2 = 1 - Σr²/Σ(r-mean r)² ≤ small for zero-centered returns
    assert(r2 <= 1.0 + 1e-9)
  }
}
