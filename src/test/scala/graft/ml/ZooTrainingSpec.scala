package graft.ml

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Train-time head dropout + M11 callbacks across the sequence heads
  * (TCN / LSTM / attention — the MLP battery lives in ForecasterSpec /
  * CallbacksSpec). Per head: `dropout = 0` is bit-for-bit the original
  * fit, dropout fits are deterministic across runs and genuinely
  * perturb training, and the callback hook sees every epoch / can halt
  * the loop early.
  */
class ZooTrainingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T = 8

  private def teacher(x: Array[Double]): Double = {
    var s = 0.0
    var t = 1
    while (t < T) { s += math.tanh(x(t) - x(t - 1)); t += 1 }
    s / (T - 1)
  }

  private lazy val scored: DataFrame = {
    val rnd = new java.util.Random(29L)
    (0 until 120).map { i =>
      val x = Array.fill(T)(rnd.nextGaussian())
      (i.toLong, Vectors.dense(x), teacher(x))
    }.toDF("id", "features", "label").cache()
  }

  // per-head fit closures: (dropout, callbacks) => flattened weights
  private def fitW(head: String, dropout: Double,
      cbs: Seq[Callbacks.TrainingCallback]): Seq[Double] = head match {
    case "tcn" =>
      val m = TcnRegressor.fit(scored, "label",
        TcnRegressor.TcnConfig(channels = 2, kernel = 3, blocks = 1,
          epochs = 30, lr = 0.2), dropout = dropout, callbacks = cbs)
      m.convW.flatten.toSeq ++ m.headW.toSeq
    case "lstm" =>
      val m = LstmRegressor.fit(scored, "label",
        LstmRegressor.LstmConfig(units = 3, epochs = 30, lr = 0.2),
        dropout = dropout, callbacks = cbs)
      m.wx.toSeq ++ m.headW.toSeq
    case "attn" =>
      val m = AttentionRegressor.fit(scored, "label",
        AttentionRegressor.AttnConfig(dim = 3, epochs = 30, lr = 0.2),
        dropout = dropout, callbacks = cbs)
      m.wq.toSeq ++ m.headW.toSeq
  }

  test("tcn spatial dropout: analytic gradient matches finite differences") {
    // Recover the epoch-0 analytic gradient from a 1-epoch fit
    // (velocity starts at 0, so w1 = w0 − lr·Σg/n) and compare it,
    // coordinate by coordinate, against central differences of the
    // masked loss computed through the SAME forward (forwardMasked) —
    // pins the whole masked forward/backprop pair, including the
    // dropped-channel zero-gradient and unmasked-residual contracts.
    val c = 2; val k = 2; val blocks = 2; val t = 4
    val drop = 0.5; val lr = 0.5; val seed = 7L
    val rnd = new scala.util.Random(23)
    val data = Seq.fill(6)((Vectors.dense(Array.fill(t)(rnd.nextGaussian())),
      rnd.nextGaussian()))
    val df = data.toDF("features", "y")
    val conf = TcnRegressor.TcnConfig(channels = c, kernel = k, blocks = blocks,
      epochs = 0, lr = lr, momentum = 0.9, seed = seed)
    def flat(m: TcnRegressor.TcnRegressionModel): Array[Double] =
      (m.convW(0) ++ m.convB(0) ++ m.convW(1) ++ m.convB(1) ++ m.skipP ++
        m.headW ++ Array(m.headB))
    val w0 = flat(TcnRegressor.fit(df, "y", conf, dropout = drop))
    val w1 = flat(TcnRegressor.fit(df, "y", conf.copy(epochs = 1), dropout = drop))
    val n = data.length
    val analytic = w0.zip(w1).map { case (a, b) => (a - b) * n / lr }
    // standardization exactly as fit computes it (global scalar moments)
    val xs = data.map(_._1.toArray)
    val allX = xs.flatten
    val fMean = allX.sum / allX.length
    val fStd = { val v = allX.map(x => (x - fMean) * (x - fMean)).sum / allX.length
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val ys0 = data.map(_._2)
    val yMean = ys0.sum / n
    val yStd = { val v = ys0.map(y => (y - yMean) * (y - yMean)).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    // epoch-0 masks from the same counter hash
    val mkHead = Array.tabulate(c)(i =>
      if (McDropout.uniform(seed, 0L, -1, 0, i) < drop) 0.0 else 1.0 / (1.0 - drop))
    val mkB = Array.tabulate(blocks)(b => Array.tabulate(c)(i =>
      if (McDropout.uniform(seed, 0L, -1, 1 + b, i) < drop) 0.0 else 1.0 / (1.0 - drop)))
    val sizes = Array(c * k, c, c * c * k, c, c, c, 1) // W0|b0|W1|b1|P|headW|headB
    def loss(w: Array[Double]): Double = {
      var off = 0
      def take(m: Int) = { val a = java.util.Arrays.copyOfRange(w, off, off + m); off += m; a }
      val cw = Array(take(c * k), take(c))
      val cw1 = Array(take(c * c * k), take(c))
      val convW = Array(cw(0), cw1(0)); val convB = Array(cw(1), cw1(1))
      val skipP = take(c)
      val headW = take(c).zip(mkHead).map { case (x, m) => x * m }
      val headB = take(1)(0)
      data.map { case (xv, y) =>
        val x = xv.toArray.map(v => (v - fMean) / fStd)
        val out = TcnRegressor.forwardMasked(x, c, k, blocks, convW, convB,
          skipP, headW, headB, (b, idx) => mkB(b)(idx % c))
        val e = out - (y - yMean) / yStd
        0.5 * e * e
      }.sum
    }
    assert(sizes.sum == w0.length)
    val eps = 1e-5
    var maxErr = 0.0
    for (i <- w0.indices) {
      val wp = w0.clone(); wp(i) += eps
      val wm = w0.clone(); wm(i) -= eps
      val num = (loss(wp) - loss(wm)) / (2 * eps)
      val err = math.abs(num - analytic(i)) / math.max(1.0, math.abs(num))
      maxErr = math.max(maxErr, err)
      assert(err < 1e-4, s"weight $i: analytic=${analytic(i)} numeric=$num")
    }
    assert(maxErr < 1e-4)
  }

  for (act <- Seq("relu", "elu"))
  test(s"tcn $act gradient vs its own forward (activation routing, $act)") {
    val c = 2; val k = 2; val blocks = 2; val t = 4; val lr = 0.5
    val rnd = new scala.util.Random(29)
    val data = Seq.fill(6)((Vectors.dense(Array.fill(t)(rnd.nextGaussian())),
      rnd.nextGaussian()))
    val df = data.toDF("features", "y")
    val conf = TcnRegressor.TcnConfig(channels = c, kernel = k, blocks = blocks,
      epochs = 0, lr = lr, momentum = 0.9, seed = 7L, activation = act)
    def flat(m: TcnRegressor.TcnRegressionModel): Array[Double] =
      (m.convW(0) ++ m.convB(0) ++ m.convW(1) ++ m.convB(1) ++ m.skipP ++
        m.headW ++ Array(m.headB))
    val m0 = TcnRegressor.fit(df, "y", conf)
    assert(m0.activation == act)
    val w0 = flat(m0)
    val w1 = flat(TcnRegressor.fit(df, "y", conf.copy(epochs = 1)))
    val n = data.length
    val analytic = w0.zip(w1).map { case (a, b) => (a - b) * n / lr }
    val allX = data.flatMap(_._1.toArray)
    val fMean = allX.sum / allX.length
    val fStd = { val v = allX.map(x => (x - fMean) * (x - fMean)).sum / allX.length
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val ys0 = data.map(_._2)
    val yMean = ys0.sum / n
    val yStd = { val v = ys0.map(y => (y - yMean) * (y - yMean)).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    def loss(w: Array[Double]): Double = {
      var off = 0
      def take(m: Int) = { val a = java.util.Arrays.copyOfRange(w, off, off + m); off += m; a }
      val cw0 = take(c * k); val cb0 = take(c)
      val cw1 = take(c * c * k); val cb1 = take(c)
      val skipP = take(c)
      val headW = take(c)
      val headB = take(1)(0)
      data.map { case (xv, y) =>
        val x = xv.toArray.map(v => (v - fMean) / fStd)
        val out = TcnRegressor.forwardMasked(x, c, k, blocks,
          Array(cw0, cw1), Array(cb0, cb1), skipP, headW, headB,
          (_, _) => 1.0, act)
        val e = out - (y - yMean) / yStd
        0.5 * e * e
      }.sum
    }
    val eps = 1e-5
    for (i <- w0.indices) {
      val wp = w0.clone(); wp(i) += eps
      val wm = w0.clone(); wm(i) -= eps
      val num = (loss(wp) - loss(wm)) / (2 * eps)
      val err = math.abs(num - analytic(i)) / math.max(1.0, math.abs(num))
      assert(err < 1e-4, s"[$act] weight $i: analytic=${analytic(i)} numeric=$num")
    }
  }

  test("pipeline wiring: architecture knobs reach the heads (activation/LN/layers/bi)") {
    import graft.pipeline.ForecastPipeline
    val rnd = new java.util.Random(11L)
    val rows = (0 until 30).map { _ =>
      val a = rnd.nextGaussian(); val b = rnd.nextGaussian()
      (a, b, a + 0.5 * b)
    }
    val df = rows.toDF("f1", "f2", "target_h1")
    val cols = Seq("f1", "f2")
    val conf = ForecastPipeline.MlpConf(hidden = 4, epochs = 2, lr = 0.1,
      activation = "relu", layerNorm = true, lstmLayers = 2, bidirectional = true)
    val cnn = ForecastPipeline.fitHead(df, cols, Seq(1), "cnn", conf)(1)
      .asInstanceOf[CnnRegressor.CnnRegressionModel]
    assert(cnn.activation == "relu")
    val tcn = ForecastPipeline.fitHead(df, cols, Seq(1), "tcn", conf)(1)
      .asInstanceOf[TcnRegressor.TcnRegressionModel]
    assert(tcn.activation == "relu")
    val lstm = ForecastPipeline.fitHead(df, cols, Seq(1), "lstm", conf)(1)
      .asInstanceOf[LstmRegressor.LstmRegressionModel]
    assert(lstm.bidirectional)
    val tft = ForecastPipeline.fitHead(df, cols, Seq(1), "tft", conf)(1)
      .asInstanceOf[TftRegressor.TftRegressionModel]
    assert(tft.lstmLayers == 2 && tft.layerNorm)
    val attn = ForecastPipeline.fitHead(df, cols, Seq(1), "attention", conf)(1)
      .asInstanceOf[AttentionRegressor.AttentionRegressionModel]
    assert(attn.lnG != null)
  }

  test("pipeline wiring: MlpConf.dropout reaches the sequence heads") {
    import graft.pipeline.ForecastPipeline
    def writeSplit(n: Int, x0: Double): String = {
      val f = java.nio.file.Files.createTempFile("zoodrop", ".csv")
      val xs = new Array[Double](n)
      xs(0) = x0
      (1 until n).foreach(i => xs(i) = 3.7 * xs(i - 1) * (1.0 - xs(i - 1)))
      val sb = new StringBuilder("DATE_TIME,CLOSE\n")
      (0 until n).foreach { i =>
        sb.append(java.time.LocalDateTime.of(2020, 1, 1, 0, 0).plusMinutes(i.toLong)
          .toString.replace('T', ' ')).append(',').append(xs(i)).append('\n')
      }
      java.nio.file.Files.writeString(f, sb.toString)
      f.toString
    }
    val cfg = ForecastPipeline.Config(
      splits = Map("train" -> writeSplit(200, 0.41), "val" -> writeSplit(200, 0.27)),
      targetColumn = "CLOSE", horizons = Seq(1))
    def valMae(drop: Double): Double =
      ForecastPipeline.modelMetrics(spark, cfg, nLags = 2, head = "tcn",
        mlpConf = ForecastPipeline.MlpConf(epochs = 15, lr = 0.2, dropout = drop))
        .filter($"split" === "val" && $"metric" === "MAE" && $"horizon" === 1)
        .head().getAs[Double]("value")
    // distinct val MAE under dropout proves the rate flowed through
    // modelMetrics → fitPerHorizonTcn → TcnRegressor.fit
    assert(valMae(0.0) != valMae(0.4))
  }

  for (head <- Seq("tcn", "lstm", "attn")) {
    test(s"$head: dropout 0 is the original fit; dropout fits are deterministic") {
      val base = fitW(head, 0.0, Nil)
      val base2 = fitW(head, 0.0, Nil)
      assert(base == base2, s"$head: plain fit not reproducible")
      val d1 = fitW(head, 0.3, Nil)
      val d2 = fitW(head, 0.3, Nil)
      assert(d1 == d2, s"$head: dropout fit not deterministic")
      assert(d1 != base, s"$head: dropout did not perturb training")
      assert(d1.forall(java.lang.Double.isFinite), s"$head: non-finite weights")
    }

    test(s"$head: callbacks see every epoch and can stop the loop") {
      val h = new Callbacks.History
      fitW(head, 0.0, Seq(h))
      assert(h.rows.length == 30, s"$head: ${h.rows.length} epochs recorded")
      assert(h.rows.map(_._2).forall(java.lang.Double.isFinite))
      val h2 = new Callbacks.History
      val es = new Callbacks.EarlyStopping(patience = 2, minDelta = 1e9)
      fitW(head, 0.0, Seq(h2, es))
      assert(h2.rows.length == 3, s"$head: early stop ran ${h2.rows.length}")
      assert(es.stoppedEpoch == 2)
    }
  }
}
