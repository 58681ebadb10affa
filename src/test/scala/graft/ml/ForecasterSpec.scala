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

  // Nonlinear series: the next step depends on v through a kink — a
  // single global linear fit can't express it, trees can.
  private def nonlinearSeries(n: Int): org.apache.spark.sql.DataFrame = {
    val xs = new Array[Double](n)
    xs(0) = 1.0
    (1 until n).foreach { i =>
      val prev = xs(i - 1)
      xs(i) = (if (prev > 2.0) 0.5 * prev else 1.4 * prev + 0.3) + 0.05 * math.sin(i * 1.3)
    }
    xs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }.toSeq.toDF("sid", "t", "v")
  }

  test("M8 GBT head beats the linear head on a kinked (nonlinear) series") {
    val df = Targets.multiHorizon(nonlinearSeries(400), "v", Seq(1), w)
    val feat = Forecaster.withLagFeatures(df, "v", 3, Seq("sid"), Seq("t"))
    val cols = Seq("v", "lag_1", "lag_2", "lag_3")
    val train = feat.filter($"t" < 300).cache()
    val test = feat.filter($"t" >= 300).cache()
    try {
      val lin = Forecaster.fitPerHorizon(train, cols, Seq(1))
      val gbt = Forecaster.fitPerHorizonGbt(train, cols, Seq(1), maxDepth = 4, maxIter = 25)
      val fLin = Forecaster.naiveRelativeFitness(
        Forecaster.predict(lin, test, cols), "pred_h1", "target_h1", "v")
      val fGbt = Forecaster.naiveRelativeFitness(
        Forecaster.predict(gbt, test, cols), "pred_h1", "target_h1", "v")
      assert(fGbt < fLin, s"gbt=$fGbt lin=$fLin")
      assert(fGbt < 0.0, s"gbt should beat naive, fitness=$fGbt")
    } finally { train.unpersist(); test.unpersist() }
  }

  test("S11: GBT per-horizon model round-trips through save/load") {
    val df = Targets.multiHorizon(nonlinearSeries(120), "v", Seq(1), w)
    val feat = Forecaster.withLagFeatures(df, "v", 2, Seq("sid"), Seq("t"))
    val cols = Seq("v", "lag_1", "lag_2")
    val m = Forecaster.fitPerHorizonGbt(feat, cols, Seq(1), maxDepth = 3, maxIter = 5)(1)
      .asInstanceOf[org.apache.spark.ml.regression.GBTRegressionModel]
    val path = java.nio.file.Files.createTempDirectory("model").toString + "/g1"
    m.write.overwrite().save(path)
    val back = org.apache.spark.ml.regression.GBTRegressionModel.load(path)
    assert(back.getNumTrees == m.getNumTrees)
    assert(back.treeWeights.toSeq == m.treeWeights.toSeq)
  }

  // Smooth nonlinear map: the next value is a sine of the previous one —
  // no global linear model on lags can express it; a tanh MLP can.
  private def sineMapSeries(n: Int): org.apache.spark.sql.DataFrame = {
    val xs = new Array[Double](n)
    xs(0) = 0.5
    (1 until n).foreach(i => xs(i) = 2.5 * math.sin(1.1 * xs(i - 1)) + 0.05 * math.cos(i * 0.3))
    xs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }.toSeq.toDF("sid", "t", "v")
  }

  test("M8 MLP head beats the linear head on a smooth nonlinear series") {
    val df = Targets.multiHorizon(sineMapSeries(400), "v", Seq(1), w)
    val feat = Forecaster.withLagFeatures(df, "v", 2, Seq("sid"), Seq("t"))
    val cols = Seq("v", "lag_1", "lag_2")
    val train = feat.filter($"t" < 300).cache()
    val test = feat.filter($"t" >= 300).cache()
    try {
      val lin = Forecaster.fitPerHorizon(train, cols, Seq(1))
      val mlp = Forecaster.fitPerHorizonMlp(train, cols, Seq(1),
        hidden = 8, epochs = 300, lr = 0.1)
      val fLin = Forecaster.naiveRelativeFitness(
        Forecaster.predict(lin, test, cols), "pred_h1", "target_h1", "v")
      val fMlp = Forecaster.naiveRelativeFitness(
        Forecaster.predict(mlp, test, cols), "pred_h1", "target_h1", "v")
      assert(fMlp < fLin, s"mlp=$fMlp lin=$fLin")
      assert(fMlp < 0.0, s"mlp should beat naive, fitness=$fMlp")
    } finally { train.unpersist(); test.unpersist() }
  }

  test("S11: MLP model round-trips through save/load with identical predictions") {
    val df = Targets.multiHorizon(sineMapSeries(120), "v", Seq(1), w)
    val feat = Forecaster.withLagFeatures(df, "v", 2, Seq("sid"), Seq("t"))
    val cols = Seq("v", "lag_1", "lag_2")
    val m = Forecaster.fitPerHorizonMlp(feat, cols, Seq(1), hidden = 4, epochs = 50)(1)
      .asInstanceOf[MlpRegressor.MlpRegressionModel]
    val path = java.nio.file.Files.createTempDirectory("model").toString + "/mlp1"
    MlpRegressor.save(m, path)
    val back = MlpRegressor.load(spark, path)
    assert(back.layers.toSeq == m.layers.toSeq &&
      back.weights.map(_.toSeq).toSeq == m.weights.map(_.toSeq).toSeq &&
      back.biases.map(_.toSeq).toSeq == m.biases.map(_.toSeq).toSeq)
    val probes = Seq(
      org.apache.spark.ml.linalg.Vectors.dense(0.3, -0.2, 1.1),
      org.apache.spark.ml.linalg.Vectors.dense(-1.5, 0.8, 0.0))
    probes.foreach(v => assert(
      java.lang.Double.doubleToRawLongBits(back.predict(v)) ==
        java.lang.Double.doubleToRawLongBits(m.predict(v))))
  }

  test("M8 deep: 2-layer MLP beats 1-layer on a composed nonlinearity; artifacts round-trip") {
    // Teacher = exactly a depth-2 tanh network (tanh of a combination of
    // tanh units) — representable by fitLayers(Seq(h1,h2)) but not by any
    // single tanh layer; the reference's dense heads stack 2 such layers
    // (predictor_plugin_ann_best.py:222-226).
    def teacher(x1: Double, x2: Double): Double =
      2.0 * math.tanh(1.5 * math.tanh(2.0 * x1 + x2) - 1.5 * math.tanh(x1 - 2.0 * x2) + 0.5)
    val pts = for { i <- 0 until 21; j <- 0 until 21 } yield {
      val x1 = -2.0 + i * 0.2; val x2 = -2.0 + j * 0.2
      (x1, x2, teacher(x1, x2))
    }
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("x1", "x2")).setOutputCol("features")
      .transform(pts.toDF("x1", "x2", "y"))
      .cache()
    try {
      // comparable parameter budgets: 1×6 → 25 weights, 4+4 → 37
      val shallow = MlpRegressor.fit(assembled, "y", hidden = 6, epochs = 250, lr = 0.3)
      val deep = MlpRegressor.fitLayers(assembled, "y", Seq(4, 4), epochs = 250, lr = 0.3)
      def mse(m: MlpRegressor.MlpRegressionModel): Double = {
        val errs = pts.map { case (x1, x2, y) =>
          val e = m.predict(org.apache.spark.ml.linalg.Vectors.dense(x1, x2)) - y
          e * e
        }
        errs.sum / errs.size
      }
      val (msS, msD) = (mse(shallow), mse(deep))
      assert(msD < msS, s"deep=$msD shallow=$msS")
      // deep artifacts round-trip bitwise
      val path = java.nio.file.Files.createTempDirectory("model").toString + "/deep"
      MlpRegressor.save(deep, path)
      val back = MlpRegressor.load(spark, path)
      assert(back.layers.toSeq == Seq(4, 4))
      val probe = org.apache.spark.ml.linalg.Vectors.dense(0.7, -1.1)
      assert(java.lang.Double.doubleToRawLongBits(back.predict(probe)) ==
        java.lang.Double.doubleToRawLongBits(deep.predict(probe)))
    } finally { assembled.unpersist(); () }
  }

  test("M10b: NeatSearch drives distributed fits through naiveRelativeFitness") {
    val df = Targets.multiHorizon(series(250), "v", Seq(1), w)
    val full = Forecaster.withLagFeatures(df, "v", 4, Seq("sid"), Seq("t")).cache()
    val train = full.filter($"t" < 180)
    val test = full.filter($"t" >= 180)
    try {
      // Genome: nLags in [1,4] (rounded), log10(regParam) in [-6, 0].
      val result = NeatSearch.optimize(
        Seq("n_lags" -> (1.0, 4.0), "log_reg" -> (-6.0, 0.0)),
        params => {
          val nLags = math.max(1, math.round(params.getOrElse("n_lags", 2.0)).toInt)
          val reg = math.pow(10.0, params.getOrElse("log_reg", -3.0))
          val cols = "v" +: (1 to nLags).map(i => s"lag_$i")
          val m = Forecaster.fitPerHorizon(train, cols, Seq(1), regParam = reg)
          Forecaster.naiveRelativeFitness(
            Forecaster.predict(m, test, cols), "pred_h1", "target_h1", "v")
        },
        NeatSearch.Config(populationSize = 6, generations = 2, patience = 2, seed = 5L))
      assert(result.bestFitness < 0.0, s"champion should beat naive: ${result.bestFitness}")
      assert(result.bestParams.nonEmpty && result.evaluations >= 6)
    } finally full.unpersist()
  }

  test("train-time dropout: deterministic, regularizes, rate 0 is the original fit") {
    val df = Targets.multiHorizon(sineMapSeries(300), "v", Seq(1), w)
    val feat = Forecaster.withLagFeatures(df, "v", 2, Seq("sid"), Seq("t"))
    val cols = Seq("v", "lag_1", "lag_2")
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol("features")
      .transform(feat.na.drop(cols :+ "target_h1"))
      .select($"features", $"target_h1".as("y")).cache()
    try {
      def weightsOf(m: MlpRegressor.MlpRegressionModel) = m.weights.flatten.toSeq
      val plain = MlpRegressor.fitLayers(assembled, "y", Seq(6), epochs = 120, lr = 0.2)
      val plain0 = MlpRegressor.fitLayers(assembled, "y", Seq(6), epochs = 120, lr = 0.2,
        dropout = 0.0)
      // rate 0 takes the mask-free path: bitwise-identical weights
      assert(weightsOf(plain) == weightsOf(plain0))
      val dropped = MlpRegressor.fitLayers(assembled, "y", Seq(6), epochs = 120, lr = 0.2,
        dropout = 0.25)
      val dropped2 = MlpRegressor.fitLayers(assembled, "y", Seq(6), epochs = 120, lr = 0.2,
        dropout = 0.25)
      // epoch-resampled masks are deterministic: same fit twice
      assert(weightsOf(dropped) == weightsOf(dropped2))
      // and they actually perturb training
      assert(weightsOf(dropped) != weightsOf(plain))
      // the fitted net still predicts finite values in the data range
      val p = dropped.predict(org.apache.spark.ml.linalg.Vectors.dense(0.5, 0.45, 0.4))
      assert(java.lang.Double.isFinite(p) && math.abs(p) < 10.0, s"pred=$p")
    } finally { assembled.unpersist(); () }
  }
}
