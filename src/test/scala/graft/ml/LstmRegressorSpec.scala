package graft.ml

import org.apache.spark.ml.linalg.Vectors
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LstmRegressorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T = 12

  // Teacher = a nonlinear RECURSION: s_t = tanh(0.9 s_{t-1} + x_t),
  // y = s_T. An RNN computes this with O(units) state; a feed-forward
  // net on the raw window must approximate a T-deep nested composition
  // with whatever depth it has — recurrence is exactly what it lacks.
  private def teacher(x: Array[Double]): Double = {
    var s = 0.0
    var t = 0
    while (t < T) { s = math.tanh(0.9 * s + x(t)); t += 1 }
    s
  }

  private def windows(n: Int, seed: Long) = {
    val rnd = new java.util.Random(seed)
    (0 until n).map { _ =>
      val x = Array.fill(T)(rnd.nextGaussian())
      (Vectors.dense(x), teacher(x))
    }
  }

  test("LSTM beats a same-epoch MLP on a recursive (stateful) teacher") {
    val train = windows(400, 5L).toDF("features", "label").cache()
    val test = windows(100, 6L)
    try {
      val lstm = LstmRegressor.fit(train, "label",
        LstmRegressor.LstmConfig(units = 4, epochs = 250, lr = 0.25))
      val mlp = MlpRegressor.fit(train, "label", hidden = 8, epochs = 250, lr = 0.25)
      def mse(p: org.apache.spark.ml.linalg.Vector => Double): Double = {
        val errs = test.map { case (v, y) => val e = p(v) - y; e * e }
        errs.sum / errs.size
      }
      val (mL, mM) = (mse(lstm.predict), mse(mlp.predict))
      assert(mL < mM, s"lstm=$mL mlp=$mM")
    } finally { train.unpersist(); () }
  }

  test("BPTT sanity: descent strictly decreases the loss from init") {
    // tiny net, tiny data, no momentum — a sign or index error anywhere
    // in the backward pass would stall or increase the loss
    val rows = windows(8, 9L)
    val df = rows.toDF("features", "label")
    def lossAt(epochs: Int, lr: Double): Double = {
      val m = LstmRegressor.fit(df, "label",
        LstmRegressor.LstmConfig(units = 2, epochs = epochs, lr = lr, momentum = 0.0))
      rows.map { case (v, y) => val e = m.predict(v) - y; e * e }.sum / rows.size
    }
    // one small step must strictly decrease the loss from init (a wrong
    // gradient sign or index would not); repeated steps keep decreasing
    val l1 = lossAt(1, 0.05)
    val l40 = lossAt(40, 0.05)
    val l160 = lossAt(160, 0.05)
    assert(l40 < l1, s"loss not decreasing: 1=$l1 40=$l40")
    assert(l160 < l40, s"loss not decreasing: 40=$l40 160=$l160")
  }

  test("S11: LSTM artifacts round-trip with bitwise-identical predictions") {
    val train = windows(60, 13L).toDF("features", "label")
    val m = LstmRegressor.fit(train, "label",
      LstmRegressor.LstmConfig(units = 3, epochs = 25))
    val path = java.nio.file.Files.createTempDirectory("model").toString + "/lstm1"
    LstmRegressor.save(m, path)
    val back = LstmRegressor.load(spark, path)
    assert(back.units == m.units && back.seqLen == m.seqLen)
    windows(5, 17L).foreach { case (v, _) =>
      assert(java.lang.Double.doubleToRawLongBits(back.predict(v)) ==
        java.lang.Double.doubleToRawLongBits(m.predict(v)))
    }
  }

  test("bidirectional default-off keeps the former fit bit-for-bit") {
    val train = windows(40, 21L).toDF("features", "label")
    val base = LstmRegressor.LstmConfig(units = 3, epochs = 8)
    val a = LstmRegressor.fit(train, "label", base)
    val b = LstmRegressor.fit(train, "label", base.copy(bidirectional = false))
    assert(a.wx.toSeq == b.wx.toSeq && a.wh.toSeq == b.wh.toSeq &&
      a.headW.toSeq == b.headW.toSeq && a.headB == b.headB)
    assert(a.wx2 == null && !a.bidirectional)
  }

  test("bidirectional LSTM fits a direction-asymmetric teacher the forward cell can't") {
    // y = f(x(0)): the forward cell must carry position 0 across T
    // steps of decaying state; the backward cell reads it at its LAST
    // step (predictor_plugin_lstm.py:506-510 Bidirectional rationale)
    val T = 16
    val rnd = new java.util.Random(33L)
    val rows = (0 until 150).map { _ =>
      val x = Array.fill(T)(rnd.nextGaussian())
      (org.apache.spark.ml.linalg.Vectors.dense(x), math.tanh(2.0 * x(0)))
    }
    val df = rows.toDF("features", "label").cache()
    try {
      def mse(bi: Boolean): Double = {
        val m = LstmRegressor.fit(df, "label",
          LstmRegressor.LstmConfig(units = 3, epochs = 120, lr = 0.2,
            bidirectional = bi))
        rows.map { case (v, y) => val e = m.predict(v) - y; e * e }.sum / rows.size
      }
      val (fwd, bi) = (mse(false), mse(true))
      assert(bi < 0.5 * fwd,
        s"bidirectional should dominate on an early-position teacher: bi=$bi fwd=$fwd")
    } finally { df.unpersist(); () }
  }

  test("S11: bidirectional artifacts round-trip; pre-bi artifacts load forward-only") {
    val train = windows(50, 27L).toDF("features", "label")
    val m = LstmRegressor.fit(train, "label",
      LstmRegressor.LstmConfig(units = 3, epochs = 20, bidirectional = true))
    val path = java.nio.file.Files.createTempDirectory("model").toString + "/lstm_bi"
    LstmRegressor.save(m, path)
    val back = LstmRegressor.load(spark, path)
    assert(back.bidirectional && back.headW.length == 6)
    windows(5, 17L).foreach { case (v, _) =>
      assert(java.lang.Double.doubleToRawLongBits(back.predict(v)) ==
        java.lang.Double.doubleToRawLongBits(m.predict(v)))
    }
    // a pre-bidirectional artifact (no wx2/wh2/b2 columns) loads forward-only
    val fm = LstmRegressor.fit(train, "label",
      LstmRegressor.LstmConfig(units = 3, epochs = 10))
    LstmRegressor.save(fm, path + "_fwd")
    val legacy = spark.read.parquet(path + "_fwd").drop("wx2", "wh2", "b2")
    legacy.coalesce(1).write.mode("overwrite").parquet(path + "_legacy")
    val backF = LstmRegressor.load(spark, path + "_legacy")
    assert(!backF.bidirectional)
    windows(5, 19L).foreach { case (v, _) =>
      assert(java.lang.Double.doubleToRawLongBits(backF.predict(v)) ==
        java.lang.Double.doubleToRawLongBits(fm.predict(v)))
    }
    // MC-dropout honors the backward cell (rate = 0 ≡ predict)
    import org.apache.spark.sql.functions._
    val withId = train.withColumn("id", monotonically_increasing_id())
    val zero = McDropout.predictWithUncertainty(m, withId, "id", "features",
      passes = 4, rate = 0.0, seed = 7L)
      .withColumn("plain", udf((v: org.apache.spark.ml.linalg.Vector) => m.predict(v))
        .apply(col("features")))
    assert(zero.filter(col("pred_unc") =!= 0.0).count() == 0)
    assert(zero.filter(col("pred_mean") =!= col("plain")).count() == 0)
  }

  test("fitPerHorizonLstm: Forecaster contract — predict adds pred_h columns") {
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
    val models = Forecaster.fitPerHorizonLstm(feat.filter(col("t") < 200), cols, Seq(1),
      LstmRegressor.LstmConfig(units = 3, epochs = 60, lr = 0.2))
    val pred = Forecaster.predict(models, feat.filter(col("t") >= 200), cols)
    assert(pred.columns.contains("pred_h1"))
    assert(pred.filter(col("pred_h1").isNull || isnan(col("pred_h1"))).count() == 0)
  }
}
