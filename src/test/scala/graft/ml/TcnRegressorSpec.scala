package graft.ml

import org.apache.spark.ml.linalg.Vectors
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TcnRegressorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Teacher = a causal convolution the TCN can represent exactly: the
  // tanh response of a curvature kernel [1, -2, 1] averaged over the
  // window (zero-padded on the left, the TCN's own causal convention).
  // Translation invariance is the point: the conv learns the kernel
  // ONCE; a dense net must re-learn it at every window position.
  private val T = 16
  private def teacher(x: Array[Double]): Double = {
    var s = 0.0
    var t = 0
    while (t < T) {
      val x0 = x(t)
      val x1 = if (t >= 1) x(t - 1) else 0.0
      val x2 = if (t >= 2) x(t - 2) else 0.0
      s += math.tanh(x0 - 2.0 * x1 + x2)
      t += 1
    }
    s / T
  }

  private def windows(n: Int, seed: Long) = {
    val rnd = new java.util.Random(seed)
    (0 until n).map { _ =>
      val x = Array.fill(T)(rnd.nextGaussian())
      (Vectors.dense(x), teacher(x))
    }
  }

  test("TCN beats a same-budget MLP on a translation-invariant pattern") {
    val train = windows(400, 11L).toDF("features", "label").cache()
    val test = windows(100, 12L)
    try {
      val tcn = TcnRegressor.fit(train, "label",
        TcnRegressor.TcnConfig(channels = 2, kernel = 3, blocks = 1,
          epochs = 250, lr = 0.3))
      val mlp = MlpRegressor.fit(train, "label", hidden = 4, epochs = 250, lr = 0.3)
      def mse(p: org.apache.spark.ml.linalg.Vector => Double): Double = {
        val errs = test.map { case (v, y) => val e = p(v) - y; e * e }
        errs.sum / errs.size
      }
      val (mTcn, mMlp) = (mse(tcn.predict), mse(mlp.predict))
      // 13 TCN params vs 73 MLP params, and the TCN still wins: weight
      // sharing across time is doing the work.
      assert(mTcn < mMlp, s"tcn=$mTcn mlp=$mMlp")
      assert(mTcn < 0.005, s"tcn should nearly recover the teacher, mse=$mTcn")
    } finally { train.unpersist(); () }
  }

  test("dilated stack: receptive field covers a long-range dependency") {
    // Translation-invariant long-range teacher: the averaged response of
    // a lag-6 difference detector. A 2-block dilated stack (kernel 3,
    // dilations 1+2 -> receptive field 7) can reach lag 6; a single
    // block (receptive field 3) cannot — dilation is what the deep net
    // buys, so it must fit strictly better.
    val rnd = new java.util.Random(21L)
    val rows = (0 until 400).map { _ =>
      val x = Array.fill(T)(rnd.nextGaussian())
      var s = 0.0
      var t = 0
      while (t < T) {
        s += math.tanh(x(t) - (if (t >= 6) x(t - 6) else 0.0)); t += 1
      }
      (Vectors.dense(x), s / T)
    }
    val df = rows.toDF("features", "label").cache()
    try {
      def mseOf(blocks: Int): Double = {
        val m = TcnRegressor.fit(df, "label",
          TcnRegressor.TcnConfig(channels = 3, kernel = 3, blocks = blocks,
            epochs = 300, lr = 0.2))
        val errs = rows.map { case (v, y) => val e = m.predict(v) - y; e * e }
        errs.sum / errs.size
      }
      val (deep, shallow) = (mseOf(2), mseOf(1))
      assert(deep < shallow, s"deep=$deep shallow=$shallow")
    } finally { df.unpersist(); () }
  }

  test("S11: TCN artifacts round-trip with bitwise-identical predictions") {
    val train = windows(80, 31L).toDF("features", "label")
    val m = TcnRegressor.fit(train, "label",
      TcnRegressor.TcnConfig(channels = 2, kernel = 3, blocks = 2, epochs = 30))
    val path = java.nio.file.Files.createTempDirectory("model").toString + "/tcn1"
    TcnRegressor.save(m, path)
    val back = TcnRegressor.load(spark, path)
    assert(back.channels == m.channels && back.blocks == m.blocks &&
      back.seqLen == m.seqLen)
    windows(5, 41L).foreach { case (v, _) =>
      assert(java.lang.Double.doubleToRawLongBits(back.predict(v)) ==
        java.lang.Double.doubleToRawLongBits(m.predict(v)))
    }
  }

  test("fitPerHorizonTcn: Forecaster contract — predict adds pred_h columns") {
    import org.apache.spark.sql.functions._
    val xs = new Array[Double](260)
    xs(0) = 10.0
    (1 until 260).foreach(i => xs(i) = 0.8 * xs(i - 1) + 2.0 + 0.1 * math.sin(i * 0.7))
    val df = xs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toSeq.toDF("sid", "t", "v")
    val w = graft.ts.TS.seriesWindow(Seq("sid"), Seq("t"))
    val tgt = graft.target.Targets.multiHorizon(df, "v", Seq(1), w)
    val feat = Forecaster.withLagFeatures(tgt, "v", 3, Seq("sid"), Seq("t"))
    val cols = Seq("v", "lag_1", "lag_2", "lag_3")
    val models = Forecaster.fitPerHorizonTcn(feat.filter(col("t") < 200), cols, Seq(1),
      TcnRegressor.TcnConfig(channels = 2, kernel = 2, blocks = 1, epochs = 80, lr = 0.2))
    val pred = Forecaster.predict(models, feat.filter(col("t") >= 200), cols)
    assert(pred.columns.contains("pred_h1"))
    assert(pred.filter(col("pred_h1").isNull || isnan(col("pred_h1"))).count() == 0)
  }
}
