package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class McDropoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val (model, scored) = {
    // y = sin(3x₀) + 0.5·x₁ — nonlinear, so hidden units carry real
    // signal and dropping them produces genuine predictive variance
    val df = (0 until 200).map { i =>
      val x0 = -1.0 + 2.0 * i / 199.0
      val x1 = math.cos(i * 0.7)
      (i.toLong, x0, x1, math.sin(3 * x0) + 0.5 * x1)
    }.toDF("id", "x0", "x1", "y")
    val assembled = new VectorAssembler()
      .setInputCols(Array("x0", "x1")).setOutputCol("features").transform(df)
    (MlpRegressor.fit(assembled, "y", hidden = 8, epochs = 250, lr = 0.3), assembled)
  }

  test("rate 0 reproduces the deterministic forward pass with zero uncertainty") {
    val out = McDropout.predictWithUncertainty(model, scored, "id", rate = 0.0, passes = 5)
      .withColumn("plain", udf((v: org.apache.spark.ml.linalg.Vector) => model.predict(v))
        .apply(col("features")))
    assert(out.filter(col("pred_unc") =!= 0.0).count() == 0)
    assert(out.filter(col("pred_mean") =!= col("plain")).count() == 0)
  }

  test("masks are partition-independent and bitwise repeatable") {
    def run(parts: Int) = McDropout
      .predictWithUncertainty(model, scored.repartition(parts), "id",
        rate = 0.2, passes = 20, seed = 7L)
      .select("id", "pred_mean", "pred_unc").orderBy("id")
      .as[(Long, Double, Double)].collect().toSeq
    assert(run(1) == run(7))
    assert(run(3) == run(3))
  }

  test("uncertainty is positive under dropout and grows with the rate") {
    def meanUnc(rate: Double) = McDropout
      .predictWithUncertainty(model, scored, "id", rate = rate, passes = 30)
      .agg(avg("pred_unc")).head().getDouble(0)
    val low = meanUnc(0.05)
    val high = meanUnc(0.4)
    assert(low > 0.0, s"low=$low")
    assert(high > low, s"high=$high low=$low")
  }

  test("rate 0 reproduces predict for an ELU-trained model (activation honored)") {
    // an ELU model scored through the MC forward must run an ELU
    // forward — a tanh forward over ELU weights would silently break
    // the rate = 0 ≡ predict contract (round-8 advice, high)
    val eluModel = MlpRegressor.fitLayers(scored, "y", Seq(8),
      epochs = 120, lr = 0.2, activation = "elu")
    assert(eluModel.activation == "elu")
    val out = McDropout.predictWithUncertainty(eluModel, scored, "id", rate = 0.0, passes = 4)
      .withColumn("plain", udf((v: org.apache.spark.ml.linalg.Vector) => eluModel.predict(v))
        .apply(col("features")))
    assert(out.filter(col("pred_unc") =!= 0.0).count() == 0)
    assert(out.filter(col("pred_mean") =!= col("plain")).count() == 0)
    // and under dropout the ELU MC forward still produces finite,
    // positive uncertainty (the masked path exercises the ELU branch)
    val unc = McDropout.predictWithUncertainty(eluModel, scored, "id", rate = 0.2, passes = 20)
      .agg(avg("pred_unc")).head().getDouble(0)
    assert(unc > 0.0 && java.lang.Double.isFinite(unc), s"unc=$unc")
  }

  test("MC mean stays close to the deterministic prediction at low rate") {
    val out = McDropout.predictWithUncertainty(model, scored, "id", rate = 0.05, passes = 50)
      .withColumn("plain", udf((v: org.apache.spark.ml.linalg.Vector) => model.predict(v))
        .apply(col("features")))
    val drift = out.agg(avg(abs(col("pred_mean") - col("plain")))).head().getDouble(0)
    val spread = out.agg(stddev(col("plain"))).head().getDouble(0)
    assert(drift < 0.5 * spread, s"drift=$drift spread=$spread")
  }
}
