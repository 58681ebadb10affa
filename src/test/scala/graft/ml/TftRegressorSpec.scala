package graft.ml

import org.apache.spark.ml.linalg.Vectors
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TftRegressorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T = 10

  private def windows(n: Int, seed: Long) = {
    val rnd = new java.util.Random(seed)
    (0 until n).map { _ =>
      val x = Array.fill(T)(rnd.nextGaussian())
      // teacher mixes a recency readout with a content soft-max — the
      // local (LSTM) and long-range (attention) signals the TFT fuses
      val ex = x.map(v => math.exp(1.5 * v)); val z = ex.sum
      val y = 0.5 * x(T - 1) + ex.zip(x).map { case (e, v) => e / z * v }.sum
      (Vectors.dense(x), y)
    }
  }

  test("tft gradient vs its own forward (pins the GRN->LSTM->MHA->GRN chain)") {
    val u = 4; val nH = 2; val t = 5
    val drop = 0.5; val lr = 0.3; val seed = 23L
    val rnd = new scala.util.Random(59)
    val data = Seq.fill(5)((Vectors.dense(Array.fill(t)(rnd.nextGaussian())),
      rnd.nextGaussian()))
    val df = data.toDF("features", "y")
    val conf = TftRegressor.TftConfig(units = u, heads = nH, epochs = 0,
      lr = lr, seed = seed)
    val m0 = TftRegressor.fit(df, "y", conf, dropout = drop)
    val m1 = TftRegressor.fit(df, "y", conf.copy(epochs = 1), dropout = drop)
    val w0 = m0.weights
    val n = data.length
    val analytic = w0.zip(m1.weights).map { case (a, b) => (a - b) * n / lr }
    val allX = data.flatMap(_._1.toArray)
    val fMean = allX.sum / allX.length
    val fStd = { val v = allX.map(x => (x - fMean) * (x - fMean)).sum / allX.length
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val yMean = data.map(_._2).sum / n
    val yStd = { val v = data.map(r => math.pow(r._2 - yMean, 2)).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val mkHead = Array.tabulate(u)(i =>
      if (McDropout.uniform(seed, 0L, -1, 0, i) < drop) 0.0 else 1.0 / (1.0 - drop))
    def loss(w: Array[Double]): Double =
      data.map { case (xv, y) =>
        val x = xv.toArray.map(v => (v - fMean) / fStd)
        val out = TftRegressor.forwardMasked(x, u, nH, w, (_, i) => mkHead(i))
        val e = out - (y - yMean) / yStd
        0.5 * e * e
      }.sum
    val eps = 1e-5
    var worst = 0.0
    for (i <- w0.indices) {
      val wp = w0.clone(); wp(i) += eps
      val wm = w0.clone(); wm(i) -= eps
      val num = (loss(wp) - loss(wm)) / (2 * eps)
      val err = math.abs(num - analytic(i)) / math.max(1.0, math.abs(num))
      if (err > worst) worst = err
      assert(err < 1e-4, s"weight $i: analytic=${analytic(i)} numeric=$num")
    }
    // live-mask fixture check (matches CnnRegressorSpec): this seed must
    // actually drop a unit, or the masked-gradient path isn't exercised
    assert(mkHead.contains(0.0), s"seed $seed dropped no unit: ${mkHead.mkString(",")}")
  }

  test("tft gradient with layerNorm + 2 encoder layers (pins the LN/stacked backward)") {
    // the reference architecture's true shape: LayerNormalization at
    // every GRN tail + the post-attention residual
    // (predictor_plugin_tft.py:85,127) and tft_lstm_layers = 2
    // (:113-116); the finite-difference check covers EVERY weight,
    // including the appended layer-2 LSTM/GRN blocks and LN gain/bias
    val u = 4; val nH = 2; val t = 5
    val drop = 0.5; val lr = 0.3; val seed = 23L
    val rnd = new scala.util.Random(61)
    val data = Seq.fill(5)((Vectors.dense(Array.fill(t)(rnd.nextGaussian())),
      rnd.nextGaussian()))
    val df = data.toDF("features", "y")
    val conf = TftRegressor.TftConfig(units = u, heads = nH, epochs = 0,
      lr = lr, seed = seed, lstmLayers = 2, layerNorm = true)
    val m0 = TftRegressor.fit(df, "y", conf, dropout = drop)
    val m1 = TftRegressor.fit(df, "y", conf.copy(epochs = 1), dropout = drop)
    val w0 = m0.weights
    val n = data.length
    val analytic = w0.zip(m1.weights).map { case (a, b) => (a - b) * n / lr }
    val allX = data.flatMap(_._1.toArray)
    val fMean = allX.sum / allX.length
    val fStd = { val v = allX.map(x => (x - fMean) * (x - fMean)).sum / allX.length
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val yMean = data.map(_._2).sum / n
    val yStd = { val v = data.map(r => math.pow(r._2 - yMean, 2)).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val mkHead = Array.tabulate(u)(i =>
      if (McDropout.uniform(seed, 0L, -1, 0, i) < drop) 0.0 else 1.0 / (1.0 - drop))
    def loss(w: Array[Double]): Double =
      data.map { case (xv, y) =>
        val x = xv.toArray.map(v => (v - fMean) / fStd)
        val out = TftRegressor.forwardMasked(x, u, nH, w, (_, i) => mkHead(i),
          layers = 2, ln = true)
        val e = out - (y - yMean) / yStd
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
    assert(mkHead.contains(0.0), s"seed $seed dropped no unit: ${mkHead.mkString(",")}")
  }

  test("layerNorm default-off keeps the former fit bit-for-bit") {
    val rows = windows(30, 41L)
    val df = rows.toDF("features", "label")
    val base = TftRegressor.TftConfig(units = 4, heads = 2, epochs = 8, lr = 0.1)
    val a = TftRegressor.fit(df, "label", base)
    val b = TftRegressor.fit(df, "label", base.copy(lstmLayers = 1, layerNorm = false))
    assert(a.weights.toSeq == b.weights.toSeq)
  }

  test("flagged LN + stacked path trains (loss decreases) and round-trips S11") {
    val rows = windows(40, 43L)
    val df = rows.toDF("features", "label").cache()
    try {
      val conf = TftRegressor.TftConfig(units = 4, heads = 2, epochs = 60,
        lr = 0.05, momentum = 0.0, lstmLayers = 2, layerNorm = true)
      def mse(m: TftRegressor.TftRegressionModel): Double =
        rows.map { case (v, y) => val e = m.predict(v) - y; e * e }.sum / rows.size
      val early = mse(TftRegressor.fit(df, "label", conf.copy(epochs = 1)))
      val m = TftRegressor.fit(df, "label", conf)
      assert(mse(m) < early, s"LN path not training: ${mse(m)} vs $early")
      val dir = java.nio.file.Files.createTempDirectory("tft_ln_s11").toString
      TftRegressor.save(m, s"$dir/model")
      val back = TftRegressor.load(spark, s"$dir/model")
      assert(back.lstmLayers == 2 && back.layerNorm)
      rows.take(5).foreach { case (v, _) =>
        assert(java.lang.Double.doubleToRawLongBits(back.predict(v)) ==
          java.lang.Double.doubleToRawLongBits(m.predict(v)))
      }
    } finally { df.unpersist(); () }
  }

  test("descent strictly decreases the loss from init") {
    val rows = windows(12, 7L)
    val df = rows.toDF("features", "label")
    def lossAt(epochs: Int): Double = {
      val m = TftRegressor.fit(df, "label",
        TftRegressor.TftConfig(units = 4, heads = 2, epochs = epochs,
          lr = 0.05, momentum = 0.0))
      rows.map { case (v, y) => val e = m.predict(v) - y; e * e }.sum / rows.size
    }
    val (l1, l40, l160) = (lossAt(1), lossAt(40), lossAt(160))
    assert(l40 < l1, s"loss not decreasing: 1=$l1 40=$l40")
    assert(l160 < l40, s"loss not decreasing: 40=$l40 160=$l160")
  }

  test("M8 TFT head beats the mean predictor on the fused teacher") {
    val train = windows(300, 3L).toDF("features", "label").cache()
    val test = windows(100, 4L)
    try {
      val m = TftRegressor.fit(train, "label",
        TftRegressor.TftConfig(units = 4, heads = 2, epochs = 200, lr = 0.1))
      val yBar = test.map(_._2).sum / test.size
      val mseModel = test.map { case (v, y) => val e = m.predict(v) - y; e * e }.sum / test.size
      val mseMean = test.map { case (_, y) => val e = yBar - y; e * e }.sum / test.size
      assert(mseModel < 0.5 * mseMean, s"model=$mseModel mean=$mseMean")
    } finally { train.unpersist(); () }
  }

  test("fit is bitwise reproducible (OrderedAgg merges)") {
    val rows = windows(60, 17L)
    val df = rows.toDF("features", "label").repartition(7).cache()
    try {
      def go() = TftRegressor.fit(df, "label",
        TftRegressor.TftConfig(units = 4, heads = 2, epochs = 20, lr = 0.1))
      assert(go().weights.toSeq == go().weights.toSeq)
    } finally { df.unpersist(); () }
  }

  test("S11: TFT artifacts round-trip with bitwise-identical predictions") {
    val rows = windows(40, 29L)
    val df = rows.toDF("features", "label")
    val m = TftRegressor.fit(df, "label",
      TftRegressor.TftConfig(units = 4, heads = 2, epochs = 15))
    val dir = java.nio.file.Files.createTempDirectory("tft_s11").toString
    TftRegressor.save(m, s"$dir/model")
    val back = TftRegressor.load(spark, s"$dir/model")
    assert(back.units == m.units && back.heads == m.heads)
    rows.take(5).foreach { case (v, _) =>
      assert(java.lang.Double.doubleToRawLongBits(back.predict(v)) ==
        java.lang.Double.doubleToRawLongBits(m.predict(v)))
    }
  }

  test("MC-dropout: rate 0 equals predict; rate > 0 gives deterministic spread") {
    val rows = windows(40, 31L)
    val df = rows.toDF("features", "label")
    val m = TftRegressor.fit(df, "label",
      TftRegressor.TftConfig(units = 4, heads = 2, epochs = 20, lr = 0.1))
    val withId = df.withColumn("id",
      org.apache.spark.sql.functions.monotonically_increasing_id())
    val zero = McDropout.predictWithUncertainty(m, withId, "id", "features",
      passes = 5, rate = 0.0, seed = 7L).select("pred_unc")
      .collect().map(_.getDouble(0))
    assert(zero.forall(_ == 0.0))
    def run() = McDropout.predictWithUncertainty(m, withId, "id", "features",
      passes = 20, rate = 0.3, seed = 7L)
      .select("id", "pred_mean", "pred_unc").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1).toSeq
    val a = run()
    assert(a == run(), "MC-dropout must be deterministic under a fixed seed")
    assert(a.exists(_._3 > 0.0))
  }
}
