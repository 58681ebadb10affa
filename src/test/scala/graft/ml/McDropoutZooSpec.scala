package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** MC-dropout across the full model zoo (TCN / LSTM / attention — the
  * MLP battery lives in McDropoutSpec): per head, the three contract
  * properties the verdict pins — `rate = 0` reproduces the
  * deterministic forward exactly, masks are partition-independent and
  * bitwise repeatable, and dropout produces genuine positive variance
  * with an MC mean near the plain prediction. Plus the
  * `Forecaster.predictWithUncertainty` zoo dispatch.
  */
class McDropoutZooSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T = 8

  // windowed AR-ish teacher: y = mean(tanh(first-difference)) — causal
  // structure every sequence head can latch onto
  private def teacher(x: Array[Double]): Double = {
    var s = 0.0
    var t = 1
    while (t < T) { s += math.tanh(x(t) - x(t - 1)); t += 1 }
    s / (T - 1)
  }

  private lazy val scored: DataFrame = {
    val rnd = new java.util.Random(13L)
    (0 until 150).map { i =>
      val x = Array.fill(T)(rnd.nextGaussian())
      (i.toLong, Vectors.dense(x), teacher(x))
    }.toDF("id", "features", "label").cache()
  }

  private lazy val tcn = TcnRegressor.fit(scored, "label",
    TcnRegressor.TcnConfig(channels = 2, kernel = 3, blocks = 1, epochs = 80, lr = 0.25))
  private lazy val lstm = LstmRegressor.fit(scored, "label",
    LstmRegressor.LstmConfig(units = 3, epochs = 80, lr = 0.2))
  private lazy val attn = AttentionRegressor.fit(scored, "label",
    AttentionRegressor.AttnConfig(dim = 3, epochs = 80, lr = 0.2))

  // one battery, three heads — heads differ only in the mc/plain closures
  private def mc(head: String, rate: Double, passes: Int, seed: Long,
      df: DataFrame = scored): DataFrame = head match {
    case "tcn" => McDropout.predictWithUncertainty(tcn, df, "id", "features", passes, rate, seed)
    case "lstm" => McDropout.predictWithUncertainty(lstm, df, "id", "features", passes, rate, seed)
    case "attn" => McDropout.predictWithUncertainty(attn, df, "id", "features", passes, rate, seed)
  }
  // bind each model to a local before closing over it — an eta-expanded
  // `tcn.predict _` captures the spec instance (non-serializable Engine)
  private def plain(head: String): Vector => Double = head match {
    case "tcn" => val m = tcn; v => m.predict(v)
    case "lstm" => val m = lstm; v => m.predict(v)
    case "attn" => val m = attn; v => m.predict(v)
  }

  for (head <- Seq("tcn", "lstm", "attn")) {
    test(s"$head: rate 0 reproduces the deterministic forward with zero uncertainty") {
      val p = plain(head)
      val out = mc(head, rate = 0.0, passes = 4, seed = 42L)
        .withColumn("plain", udf((v: Vector) => p(v)).apply(col("features")))
      assert(out.filter(col("pred_unc") =!= 0.0).count() == 0)
      assert(out.filter(col("pred_mean") =!= col("plain")).count() == 0)
    }

    test(s"$head: masks are partition-independent and bitwise repeatable") {
      def run(parts: Int) =
        mc(head, rate = 0.2, passes = 12, seed = 7L, df = scored.repartition(parts))
          .select("id", "pred_mean", "pred_unc").orderBy("id")
          .as[(Long, Double, Double)].collect().toSeq
      assert(run(1) == run(5))
      assert(run(3) == run(3))
    }

    test(s"$head: dropout yields positive uncertainty, mean near the plain prediction") {
      val p = plain(head)
      val out = mc(head, rate = 0.1, passes = 30, seed = 42L)
        .withColumn("plain", udf((v: Vector) => p(v)).apply(col("features")))
        .cache()
      assert(out.agg(avg("pred_unc")).head().getDouble(0) > 0.0)
      val drift = out.agg(avg(abs(col("pred_mean") - col("plain")))).head().getDouble(0)
      val spread = out.agg(stddev(col("plain"))).head().getDouble(0)
      assert(drift < 0.5 * spread, s"drift=$drift spread=$spread")
    }
  }

  test("Forecaster.predictWithUncertainty dispatches per head and errors on deterministic heads") {
    // raw lag columns + assembler-free zoo entry: two horizons, two
    // different head types in one model map
    val lagCols = (0 until T).map(i => s"lag$i")
    val raw = scored.select(
      col("id") +: (0 until T).map(i =>
        udf((v: Vector) => v(i)).apply(col("features")).as(s"lag$i")): _*)
    val models: Map[Int, Forecaster.HorizonModel] = Map(1 -> tcn, 2 -> lstm)
    val out = Forecaster.predictWithUncertainty(models, raw, "id", lagCols,
      passes = 8, rate = 0.2, seed = 42L)
    assert(out.columns.toSet.intersect(
      Set("pred_h1", "unc_h1", "pred_h2", "unc_h2")).size == 4)
    assert(out.filter(col("unc_h1") > 0.0).count() > 0)
    assert(out.filter(col("unc_h2") > 0.0).count() > 0)
    // deterministic heads have no dropout semantics — loud failure, not
    // a silent zero-uncertainty column
    val lin = Forecaster.fitPerHorizon(
      raw.withColumn("target_h1", lit(0.0)), lagCols, Seq(1))
    val ex = intercept[IllegalArgumentException] {
      Forecaster.predictWithUncertainty(lin, raw, "id", lagCols, passes = 2)
    }
    assert(ex.getMessage.contains("ensembleUncertainty"))
  }
}
