package graft.ml

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions.avg
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class NBeatsRegressorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T = 8

  // Additive two-component teacher: a smooth trend response PLUS a
  // sharp nonlinear residual of what the trend leaves behind — the
  // decompose-then-refine shape N-BEATS's doubly-residual stacking is
  // built for (block 1 can absorb the trend's contribution, block 2
  // models the remainder).
  private def teacher(x: Array[Double]): Double = {
    val mean = x.sum / T
    val resid = x.map(_ - mean)
    math.tanh(2.0 * mean) + 0.5 * math.tanh(resid(T - 1) - resid(T - 2))
  }

  private def windows(n: Int, seed: Long) = {
    val rnd = new java.util.Random(seed)
    (0 until n).map { _ =>
      val x = Array.fill(T)(rnd.nextGaussian())
      (Vectors.dense(x), teacher(x))
    }
  }

  test("M8: N-BEATS beats the naive-mean predictor and a linear fit") {
    val train = windows(400, 3L).toDF("features", "label").cache()
    val test = windows(100, 4L)
    try {
      val m = NBeatsRegressor.fit(train, "label",
        NBeatsRegressor.NBeatsConfig(blocks = 2, layers = 2, units = 8,
          epochs = 250, lr = 0.2))
      def mse(p: org.apache.spark.ml.linalg.Vector => Double): Double = {
        val errs = test.map { case (v, y) => val e = p(v) - y; e * e }
        errs.sum / errs.size
      }
      val yBar = train.select(avg($"label")).head().getDouble(0)
      val mN = mse(m.predict)
      val mMean = mse(_ => yBar)
      assert(mN < 0.25 * mMean, s"nbeats=$mN mean-baseline=$mMean")
      assert(mN < 0.02, s"should nearly recover the teacher, mse=$mN")
    } finally { train.unpersist(); () }
  }

  test("doubly-residual stacking is live: ablating block 2's forecast degrades the fit") {
    val train = windows(300, 5L).toDF("features", "label").cache()
    val test = windows(100, 6L)
    try {
      val conf = NBeatsRegressor.NBeatsConfig(blocks = 2, layers = 2,
        units = 6, epochs = 200, lr = 0.2)
      val m = NBeatsRegressor.fit(train, "label", conf)
      def mse(p: org.apache.spark.ml.linalg.Vector => Double): Double = {
        val errs = test.map { case (v, y) => val e = p(v) - y; e * e }
        errs.sum / errs.size
      }
      val full = mse(m.predict)
      assert(full < 0.05, s"2-block fit should converge, mse=$full")
      // zero block 2's forecast parameters: if the accumulation across
      // blocks were dead weight, predictions would not move — they must
      // move AND get worse
      val h = conf.units; val t = T
      val perBlock = (h * t + h) + (conf.layers - 1) * (h * h + h) +
        (t * h + t) + (h * h + h)
      val foreOff1 = 1 * perBlock + (h * t + h) +
        (conf.layers - 1) * (h * h + h) + (t * h + t)
      val ablated = m.weights.clone()
      java.util.Arrays.fill(ablated, foreOff1, foreOff1 + h * h + h, 0.0)
      val mAbl = new NBeatsRegressor.NBeatsRegressionModel(m.uid, conf,
        ablated, m.seqLen, m.featMean, m.featStd, m.labelMean, m.labelStd)
      val abl = mse(mAbl.predict)
      assert(abl > full * 1.5, s"ablated=$abl full=$full — block 2 carried no signal")
      // the backcast machinery is live too: the residual entering block 2
      // differs from the raw input
      val norms = NBeatsRegressor.residualNorms(m, test.head._1)
      assert(norms.length == 2 && math.abs(norms(1) - norms(0)) > 1e-9)
    } finally { train.unpersist(); () }
  }

  test("MC-dropout contract: rate 0 reproduces predict; rate > 0 varies deterministically") {
    val train = windows(120, 9L).toDF("features", "label").cache()
    try {
      val m = NBeatsRegressor.fit(train, "label",
        NBeatsRegressor.NBeatsConfig(blocks = 2, layers = 2, units = 4,
          epochs = 40, lr = 0.2))
      val probes = windows(10, 10L).zipWithIndex
        .map { case ((v, _), i) => (i.toLong, v) }.toDF("id", "features")
      val zero = McDropout.predictWithUncertainty(m, probes, "id", "features",
        passes = 5, rate = 0.0, seed = 1L)
        .select("id", "pred_mean", "pred_unc").collect()
      zero.foreach { r =>
        val v = probes.filter($"id" === r.getLong(0)).select("features")
          .head().getAs[org.apache.spark.ml.linalg.Vector](0)
        assert(math.abs(r.getDouble(1) - m.predict(v)) < 1e-9)
        assert(r.getDouble(2) == 0.0)
      }
      def uncs() = McDropout.predictWithUncertainty(m, probes, "id", "features",
        passes = 20, rate = 0.3, seed = 2L)
        .select("id", "pred_unc").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val (u1, u2) = (uncs(), uncs())
      assert(u1 == u2, "MC draws must be deterministic")
      assert(u1.values.exists(_ > 0.0), "dropout should produce variance")
    } finally { train.unpersist(); () }
  }

  test("determinism, dropout perturbation, and S11 artifact round-trip") {
    val train = windows(120, 7L).toDF("features", "label").cache()
    try {
      val conf = NBeatsRegressor.NBeatsConfig(blocks = 2, layers = 2,
        units = 4, epochs = 30, lr = 0.2)
      val a = NBeatsRegressor.fit(train, "label", conf)
      val b = NBeatsRegressor.fit(train, "label", conf)
      assert(a.weights.toSeq == b.weights.toSeq, "fit not reproducible")
      val d1 = NBeatsRegressor.fit(train, "label", conf, dropout = 0.3)
      val d2 = NBeatsRegressor.fit(train, "label", conf, dropout = 0.3)
      assert(d1.weights.toSeq == d2.weights.toSeq)
      assert(d1.weights.toSeq != a.weights.toSeq)
      val dir = java.nio.file.Files.createTempDirectory("nbeats").toString
      NBeatsRegressor.save(a, s"$dir/m")
      val r = NBeatsRegressor.load(spark, s"$dir/m")
      val probe = Vectors.dense(Array.fill(T)(0.3))
      assert(math.abs(a.predict(probe) - r.predict(probe)) < 1e-12)
    } finally { train.unpersist(); () }
  }
}
