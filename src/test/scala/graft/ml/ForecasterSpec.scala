package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.target.Targets
import graft.ts.TS

class ForecasterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // AR(1)-ish deterministic series: x_t = 0.8 x_{t-1} + drift(t)
  private def series(n: Int): org.apache.spark.sql.DataFrame = {
    val xs = new Array[Double](n)
    xs(0) = 10.0
    (1 until n).foreach(i => xs(i) = 0.8 * xs(i - 1) + 2.0 + 0.1 * math.sin(i * 0.7))
    xs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }.toSeq.toDF("sid", "t", "v")
  }

  private val w = TS.seriesWindow(Seq("sid"), Seq("t"))

  test("per-horizon linear fit beats the naive forecast on an AR series") {
    val df = Targets.multiHorizon(series(300), "v", Seq(1, 2), w)
    val feat = Forecaster.withLagFeatures(df, "v", 3, Seq("sid"), Seq("t"))
    val featureCols = Seq("v", "lag_1", "lag_2", "lag_3")
    val train = feat.filter($"t" < 200)
    val test = feat.filter($"t" >= 200)
    val models = Forecaster.fitPerHorizon(train, featureCols, Seq(1, 2))
    assert(models.keySet == Set(1, 2))
    val pred = Forecaster.predict(models, test, featureCols)
    val fitness = Forecaster.naiveRelativeFitness(pred, "pred_h1", "target_h1", "v")
    assert(fitness < 0.0, s"model should beat naive, fitness=$fitness")
  }

  test("ensembleUncertainty: per-row mean/std columns, deterministic seed") {
    val df = Targets.multiHorizon(series(150), "v", Seq(1), w)
    val feat = Forecaster.withLagFeatures(df, "v", 2, Seq("sid"), Seq("t"))
    val cols = Seq("v", "lag_1", "lag_2")
    val unc = Forecaster.ensembleUncertainty(
      feat, feat.limit(20), cols, "target_h1", "t", k = 3)
    assert(unc.count() == 20)
    assert(unc.columns.toSet == Set("t", "pred_mean", "pred_unc"))
    assert(unc.agg(max("pred_unc")).head().getDouble(0) >= 0.0)
    val unc2 = Forecaster.ensembleUncertainty(
      feat, feat.limit(20), cols, "target_h1", "t", k = 3)
    val a = unc.orderBy("t").select("pred_mean").as[Double].collect().toSeq
    val b = unc2.orderBy("t").select("pred_mean").as[Double].collect().toSeq
    assert(a == b) // seeded bootstrap → reproducible
  }

  test("S11: fitted model round-trips through save/load") {
    val df = Targets.multiHorizon(series(100), "v", Seq(1), w)
    val feat = Forecaster.withLagFeatures(df, "v", 2, Seq("sid"), Seq("t"))
    val cols = Seq("v", "lag_1", "lag_2")
    val m = Forecaster.fitPerHorizon(feat, cols, Seq(1))(1)
    val path = java.nio.file.Files.createTempDirectory("model").toString + "/m1"
    m.write.overwrite().save(path)
    val back = org.apache.spark.ml.regression.LinearRegressionModel.load(path)
    assert(back.coefficients.toArray.toSeq == m.coefficients.toArray.toSeq)
    assert(back.intercept == m.intercept)
  }

  test("search returns the arg-min candidate") {
    val (best, fit) = Forecaster.search(Seq(1, 2, 3, 4), (c: Int) => math.abs(c - 3).toDouble)
    assert(best == 3 && fit == 0.0)
  }
}
