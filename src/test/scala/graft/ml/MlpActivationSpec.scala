package graft.ml

import org.apache.spark.ml.linalg.Vectors
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The activation option (round 8): the reference's deep heads default
  * to ELU hidden activations (`predictor_plugin_tft.py:106-140`,
  * `predictor_plugin_ann_best.py`); the MLP head now takes
  * `activation = "elu"` beside the original tanh. Gradient is checked
  * against an independently written ELU forward; artifacts round-trip
  * with the activation persisted, and pre-option artifacts (no
  * `activation` column) load as tanh.
  */
class MlpActivationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(n: Int, seed: Long) = {
    val rnd = new java.util.Random(seed)
    Seq.fill(n)((Vectors.dense(Array.fill(3)(rnd.nextGaussian())), rnd.nextGaussian()))
  }

  test("ELU gradient vs an independently written forward") {
    val d = 3; val layers = Seq(4); val lr = 0.3; val seed = 17L
    val data = rows(6, 43L)
    val df = data.toDF("features", "y")
    def flat(m: MlpRegressor.MlpRegressionModel): Array[Double] =
      m.weights.zip(m.biases).flatMap { case (w, b) => w ++ b }
    val m0 = MlpRegressor.fitLayers(df, "y", layers, epochs = 0, lr = lr,
      seed = seed, activation = "elu")
    val m1 = MlpRegressor.fitLayers(df, "y", layers, epochs = 1, lr = lr,
      seed = seed, activation = "elu")
    val n = data.length
    val w0 = flat(m0)
    val analytic = w0.zip(flat(m1)).map { case (a, b) => (a - b) * n / lr }
    val fMean = Array.tabulate(d)(j => data.map(_._1(j)).sum / n)
    val fStd = Array.tabulate(d) { j =>
      val v = data.map(r => math.pow(r._1(j) - fMean(j), 2)).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s
    }
    val yMean = data.map(_._2).sum / n
    val yStd = { val v = data.map(r => math.pow(r._2 - yMean, 2)).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val sizes = (d +: layers :+ 1).toArray
    def loss(w: Array[Double]): Double =
      data.map { case (xv, y) =>
        var a = Array.tabulate(d)(j => (xv(j) - fMean(j)) / fStd(j))
        var off = 0
        for (l <- 0 until sizes.length - 1) {
          val in = sizes(l); val out = sizes(l + 1)
          val nxt = new Array[Double](out)
          for (h <- 0 until out) {
            var z = w(off + out * in + h)
            for (kk <- 0 until in) z += w(off + h * in + kk) * a(kk)
            nxt(h) =
              if (l == sizes.length - 2) z
              else if (z > 0) z else math.exp(z) - 1.0 // ELU
          }
          off += out * in + out
          a = nxt
        }
        val e = a(0) - (y - yMean) / yStd
        0.5 * e * e
      }.sum
    val eps = 1e-5
    for (i <- w0.indices) {
      val wp = w0.clone(); wp(i) += eps
      val wm = w0.clone(); wm(i) -= eps
      val num = (loss(wp) - loss(wm)) / (2 * eps)
      val err = math.abs(num - analytic(i)) / math.max(1.0, math.abs(num))
      assert(err < 1e-4, s"weight $i: analytic=${analytic(i)} numeric=$num")
    }
  }

  test("ELU works on the mini-batch adam path and beats tanh on a ReLU-ish teacher") {
    val rnd = new java.util.Random(3L)
    val data = Seq.fill(240)({
      val x = Array.fill(3)(rnd.nextGaussian())
      (Vectors.dense(x), math.max(0.0, 2.0 * x(0)) + math.max(0.0, -x(1)))
    })
    val df = data.toDF("features", "y").cache()
    def mse(m: MlpRegressor.MlpRegressionModel): Double =
      data.map { case (x, y) => val e = m.predict(x) - y; e * e }.sum / data.size
    val oc = Optimizer.OptConfig(method = "adam", batches = 3)
    val elu = MlpRegressor.fitLayers(df, "y", Seq(8), epochs = 120, lr = 0.02,
      seed = 5L, opt = oc, activation = "elu")
    val tanh = MlpRegressor.fitLayers(df, "y", Seq(8), epochs = 120, lr = 0.02,
      seed = 5L, opt = oc, activation = "tanh")
    assert(mse(elu) < mse(tanh),
      s"ELU should fit the piecewise-linear teacher better: ${mse(elu)} vs ${mse(tanh)}")
    df.unpersist()
  }

  test("S11: activation persists through save/load; legacy artifacts load as tanh") {
    val df = rows(40, 7L).toDF("features", "y")
    val m = MlpRegressor.fitLayers(df, "y", Seq(4), epochs = 10, lr = 0.1,
      seed = 9L, activation = "elu")
    val path = java.nio.file.Files.createTempDirectory("model").toString + "/mlp_elu"
    MlpRegressor.save(m, path)
    val back = MlpRegressor.load(spark, path)
    assert(back.activation == "elu")
    rows(5, 8L).foreach { case (v, _) =>
      assert(java.lang.Double.doubleToRawLongBits(back.predict(v)) ==
        java.lang.Double.doubleToRawLongBits(m.predict(v)))
    }
    // legacy shape: drop the activation column — must load as tanh
    val legacy = spark.read.parquet(path).drop("activation")
    legacy.coalesce(1).write.mode("overwrite").parquet(path + "_legacy")
    assert(MlpRegressor.load(spark, path + "_legacy").activation == "tanh")
  }

  test("unknown activation fails loudly") {
    val df = rows(5, 1L).toDF("features", "y")
    intercept[IllegalArgumentException] {
      MlpRegressor.fitLayers(df, "y", Seq(2), epochs = 1, activation = "relu")
    }
  }
}
