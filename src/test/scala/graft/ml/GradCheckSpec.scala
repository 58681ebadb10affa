package graft.ml

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Finite-difference gradient checks for the native heads (the TCN's
  * lives in ZooTrainingSpec next to its spatial-dropout contract).
  *
  * Protocol per head: a fit with `epochs = 0` returns the seeded init
  * weights w0; one epoch of momentum-SGD from rest gives
  * w1 = w0 − lr·Σg/n, so the analytic epoch-0 gradient is
  * (w0 − w1)·n/lr. The numeric side central-differences the SAME loss
  * (standardized ½·err², epoch-0 dropout masks) — through an
  * independently re-derived forward for the MLP, and through the shared
  * `forwardMasked` for the LSTM/attention, which pins the whole
  * BPTT/attention backprop against its forward.
  */
class GradCheckSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Eps = 1e-5
  private val Tol = 1e-4

  private def checkAll(w0: Array[Double], analytic: Array[Double],
      loss: Array[Double] => Double): Unit = {
    for (i <- w0.indices) {
      val wp = w0.clone(); wp(i) += Eps
      val wm = w0.clone(); wm(i) -= Eps
      val num = (loss(wp) - loss(wm)) / (2 * Eps)
      val err = math.abs(num - analytic(i)) / math.max(1.0, math.abs(num))
      assert(err < Tol, s"weight $i: analytic=${analytic(i)} numeric=$num")
    }
  }

  test("mlp dropout gradient vs an independently written masked forward") {
    val d = 3; val layers = Seq(3)
    val drop = 0.5; val lr = 0.3; val seed = 11L
    val rnd = new scala.util.Random(31)
    val data = Seq.fill(6)((Vectors.dense(Array.fill(d)(rnd.nextGaussian())),
      rnd.nextGaussian()))
    val df = data.toDF("features", "y")
    def flat(m: MlpRegressor.MlpRegressionModel): Array[Double] =
      m.weights.zip(m.biases).flatMap { case (w, b) => w ++ b }
    val m0 = MlpRegressor.fitLayers(df, "y", layers, epochs = 0, lr = lr,
      seed = seed, dropout = drop)
    val m1 = MlpRegressor.fitLayers(df, "y", layers, epochs = 1, lr = lr,
      seed = seed, dropout = drop)
    val n = data.length
    val w0 = flat(m0)
    val analytic = w0.zip(flat(m1)).map { case (a, b) => (a - b) * n / lr }
    // per-dim standardization exactly as fitLayers computes it
    val fMean = Array.tabulate(d)(j => data.map(_._1(j)).sum / n)
    val fStd = Array.tabulate(d) { j =>
      val v = data.map(r => math.pow(r._1(j) - fMean(j), 2)).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s
    }
    val yMean = data.map(_._2).sum / n
    val yStd = { val v = data.map(r => math.pow(r._2 - yMean, 2)).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val sizes = (d +: layers :+ 1).toArray
    val mask = Array.tabulate(layers.length)(l => Array.tabulate(sizes(l + 1))(h =>
      if (McDropout.uniform(seed, 0L, -1, l, h) < drop) 0.0 else 1.0 / (1.0 - drop)))
    def loss(w: Array[Double]): Double = {
      data.map { case (xv, y) =>
        var a = Array.tabulate(d)(j => (xv(j) - fMean(j)) / fStd(j))
        var off = 0
        for (l <- 0 until sizes.length - 1) {
          val in = sizes(l); val out = sizes(l + 1)
          val nxt = new Array[Double](out)
          for (h <- 0 until out) {
            var z = w(off + out * in + h) // bias after the W block
            for (kk <- 0 until in) z += w(off + h * in + kk) * a(kk)
            nxt(h) =
              if (l == sizes.length - 2) z
              else math.tanh(z) * mask(l)(h)
          }
          off += out * in + out
          a = nxt
        }
        val e = a(0) - (y - yMean) / yStd
        0.5 * e * e
      }.sum
    }
    // the dropout path clips the MEAN gradient's global L2 norm to 1
    // (MlpRegressor's stabilizer), so the analytic side is the clipped
    // gradient — apply the same clip to the numeric vector, which
    // verifies the clip semantics along with the gradient itself
    val numeric = w0.indices.map { i =>
      val wp = w0.clone(); wp(i) += Eps
      val wm = w0.clone(); wm(i) -= Eps
      (loss(wp) - loss(wm)) / (2 * Eps)
    }.toArray
    val meanNorm = math.sqrt(numeric.map(g => (g / n) * (g / n)).sum)
    val scaled = numeric.map(g => if (meanNorm > 1.0) g / meanNorm else g)
    for (i <- w0.indices) {
      val err = math.abs(scaled(i) - analytic(i)) / math.max(1.0, math.abs(scaled(i)))
      assert(err < Tol, s"weight $i: analytic=${analytic(i)} numeric=${scaled(i)}")
    }
    assert(meanNorm > 1.0, "fixture should exercise the clip branch")
  }

  test("lstm gradient vs its own masked forward (pins the BPTT + recurrent dropout)") {
    val u = 2; val t = 4
    val drop = 0.5; val rDrop = 0.4; val lr = 0.3; val seed = 13L
    val rnd = new scala.util.Random(37)
    val data = Seq.fill(6)((Vectors.dense(Array.fill(t)(rnd.nextGaussian())),
      rnd.nextGaussian()))
    val df = data.toDF("features", "y")
    val conf = LstmRegressor.LstmConfig(units = u, epochs = 0, lr = lr, seed = seed)
    def flat(m: LstmRegressor.LstmRegressionModel): Array[Double] =
      m.wx ++ m.wh ++ m.b ++ m.headW ++ Array(m.headB)
    val w0 = flat(LstmRegressor.fit(df, "y", conf, dropout = drop,
      recurrentDropout = rDrop))
    val w1 = flat(LstmRegressor.fit(df, "y", conf.copy(epochs = 1), dropout = drop,
      recurrentDropout = rDrop))
    val n = data.length
    val analytic = w0.zip(w1).map { case (a, b) => (a - b) * n / lr }
    val allX = data.flatMap(_._1.toArray)
    val fMean = allX.sum / allX.length
    val fStd = { val v = allX.map(x => (x - fMean) * (x - fMean)).sum / allX.length
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val yMean = data.map(_._2).sum / n
    val yStd = { val v = data.map(r => math.pow(r._2 - yMean, 2)).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val mkHead = Array.tabulate(u)(i =>
      if (McDropout.uniform(seed, 0L, -1, 0, i) < drop) 0.0 else 1.0 / (1.0 - drop))
    val mkR = Array.tabulate(u)(i =>
      if (McDropout.uniform(seed, 0L, -1, 1, i) < rDrop) 0.0 else 1.0 / (1.0 - rDrop))
    def loss(w: Array[Double]): Double = {
      val wx = java.util.Arrays.copyOfRange(w, 0, 4 * u)
      val wh = java.util.Arrays.copyOfRange(w, 4 * u, 4 * u + 4 * u * u)
      val b = java.util.Arrays.copyOfRange(w, 4 * u + 4 * u * u, 8 * u + 4 * u * u)
      val headW = java.util.Arrays
        .copyOfRange(w, 8 * u + 4 * u * u, 9 * u + 4 * u * u)
        .zip(mkHead).map { case (x, m) => x * m }
      val headB = w(9 * u + 4 * u * u)
      data.map { case (xv, y) =>
        val x = xv.toArray.map(v => (v - fMean) / fStd)
        val out = LstmRegressor.forwardMasked(x, u, wx, wh, b, headW, headB,
          (_, v) => mkR(v))
        val e = out - (y - yMean) / yStd
        0.5 * e * e
      }.sum
    }
    checkAll(w0, analytic, loss)
  }

  test("bidirectional lstm gradient vs its own masked forward (pins the two-cell BPTT)") {
    // the reference's Bidirectional(LSTM) wrapper
    // (predictor_plugin_lstm.py:506-510): independent backward cell over
    // the reversed sequence, concat readout — the check covers both
    // cells' gate weights, the 2u head, and per-direction variational
    // recurrent masks
    val u = 2; val t = 4
    val drop = 0.5; val rDrop = 0.4; val lr = 0.3; val seed = 13L
    val rnd = new scala.util.Random(53)
    val data = Seq.fill(6)((Vectors.dense(Array.fill(t)(rnd.nextGaussian())),
      rnd.nextGaussian()))
    val df = data.toDF("features", "y")
    val conf = LstmRegressor.LstmConfig(units = u, epochs = 0, lr = lr,
      seed = seed, bidirectional = true)
    // fit's flat layout: [wx|wh|b|headW_f(u)|headB|wx2|wh2|b2|headW_b(u)]
    def flat(m: LstmRegressor.LstmRegressionModel): Array[Double] =
      m.wx ++ m.wh ++ m.b ++ m.headW.take(u) ++ Array(m.headB) ++
        m.wx2 ++ m.wh2 ++ m.b2 ++ m.headW.drop(u)
    val m0 = LstmRegressor.fit(df, "y", conf, dropout = drop,
      recurrentDropout = rDrop)
    assert(m0.bidirectional && m0.headW.length == 2 * u)
    val w0 = flat(m0)
    val w1 = flat(LstmRegressor.fit(df, "y", conf.copy(epochs = 1),
      dropout = drop, recurrentDropout = rDrop))
    val n = data.length
    val analytic = w0.zip(w1).map { case (a, b) => (a - b) * n / lr }
    val allX = data.flatMap(_._1.toArray)
    val fMean = allX.sum / allX.length
    val fStd = { val v = allX.map(x => (x - fMean) * (x - fMean)).sum / allX.length
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val yMean = data.map(_._2).sum / n
    val yStd = { val v = data.map(r => math.pow(r._2 - yMean, 2)).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val mkHead = Array.tabulate(2 * u)(i =>
      if (McDropout.uniform(seed, 0L, -1, 0, i) < drop) 0.0 else 1.0 / (1.0 - drop))
    val mkR = Array.tabulate(u)(i =>
      if (McDropout.uniform(seed, 0L, -1, 1, i) < rDrop) 0.0 else 1.0 / (1.0 - rDrop))
    val mkR2 = Array.tabulate(u)(i =>
      if (McDropout.uniform(seed, 0L, -1, 2, i) < rDrop) 0.0 else 1.0 / (1.0 - rDrop))
    def loss(w: Array[Double]): Double = {
      var off = 0
      def take(m: Int) = { val a = java.util.Arrays.copyOfRange(w, off, off + m); off += m; a }
      val wx = take(4 * u); val wh = take(4 * u * u); val b = take(4 * u)
      val hwF = take(u); val headB = take(1)(0)
      val wx2 = take(4 * u); val wh2 = take(4 * u * u); val b2 = take(4 * u)
      val hwB = take(u)
      val headW = (hwF ++ hwB).zip(mkHead).map { case (x, m) => x * m }
      data.map { case (xv, y) =>
        val x = xv.toArray.map(v => (v - fMean) / fStd)
        val out = LstmRegressor.forwardMasked(x, u, wx, wh, b, headW, headB,
          (l, v) => if (l == 0) mkR(v) else mkR2(v), wx2, wh2, b2)
        val e = out - (y - yMean) / yStd
        0.5 * e * e
      }.sum
    }
    checkAll(w0, analytic, loss)
  }

  test("nbeats gradient vs its own masked forward (pins the residual stack)") {
    val t = 6
    val conf = NBeatsRegressor.NBeatsConfig(blocks = 2, layers = 2, units = 3,
      epochs = 0, lr = 0.3, seed = 19L)
    val drop = 0.5
    val rnd = new scala.util.Random(43)
    val data = Seq.fill(6)((Vectors.dense(Array.fill(t)(rnd.nextGaussian())),
      rnd.nextGaussian()))
    val df = data.toDF("features", "y")
    val w0 = NBeatsRegressor.fit(df, "y", conf, dropout = drop).weights
    val w1 = NBeatsRegressor.fit(df, "y", conf.copy(epochs = 1), dropout = drop).weights
    val n = data.length
    val analytic = w0.zip(w1).map { case (a, b) => (a - b) * n / conf.lr }
    val allX = data.flatMap(_._1.toArray)
    val fMean = allX.sum / allX.length
    val fStd = { val v = allX.map(x => (x - fMean) * (x - fMean)).sum / allX.length
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val yMean = data.map(_._2).sum / n
    val yStd = { val v = data.map(r => math.pow(r._2 - yMean, 2)).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val mk = Array.tabulate(conf.units)(i =>
      if (McDropout.uniform(conf.seed, 0L, -1, 0, i) < drop) 0.0 else 1.0 / (1.0 - drop))
    def loss(w: Array[Double]): Double =
      data.map { case (xv, y) =>
        val x = xv.toArray.map(v => (v - fMean) / fStd)
        val out = NBeatsRegressor.forward(x, conf, t, w, null, null, mk)
        val e = out - (y - yMean) / yStd
        0.5 * e * e
      }.sum
    // this head clips the mean gradient's global norm UNCONDITIONALLY —
    // apply the same conditional scale to the numeric vector
    val numeric = w0.indices.map { i =>
      val wp = w0.clone(); wp(i) += Eps
      val wm = w0.clone(); wm(i) -= Eps
      (loss(wp) - loss(wm)) / (2 * Eps)
    }.toArray
    val meanNorm = math.sqrt(numeric.map(g => (g / n) * (g / n)).sum)
    val scaled = numeric.map(g => if (meanNorm > 1.0) g / meanNorm else g)
    for (i <- w0.indices) {
      val err = math.abs(scaled(i) - analytic(i)) / math.max(1.0, math.abs(scaled(i)))
      assert(err < Tol, s"weight $i: analytic=${analytic(i)} numeric=${scaled(i)}")
    }
  }

  test("attention gradient vs its own masked forward (pins the multi-head softmax backprop)") {
    // heads = 2 over dim 4: the check covers the per-head slicing, the
    // per-head softmax jacobian, and the 1/√(D/H) scale all at once
    val d = 4; val nH = 2; val t = 4
    val drop = 0.5; val lr = 0.3; val seed = 17L
    val rnd = new scala.util.Random(41)
    val data = Seq.fill(6)((Vectors.dense(Array.fill(t)(rnd.nextGaussian())),
      rnd.nextGaussian()))
    val df = data.toDF("features", "y")
    val conf = AttentionRegressor.AttnConfig(dim = d, heads = nH, epochs = 0,
      lr = lr, seed = seed)
    def flat(m: AttentionRegressor.AttentionRegressionModel): Array[Double] =
      m.wE ++ m.pos ++ m.wq ++ m.wk ++ m.wv ++ m.headW ++ Array(m.headB)
    val w0 = flat(AttentionRegressor.fit(df, "y", conf, dropout = drop))
    val w1 = flat(AttentionRegressor.fit(df, "y", conf.copy(epochs = 1), dropout = drop))
    val n = data.length
    val analytic = w0.zip(w1).map { case (a, b) => (a - b) * n / lr }
    val allX = data.flatMap(_._1.toArray)
    val fMean = allX.sum / allX.length
    val fStd = { val v = allX.map(x => (x - fMean) * (x - fMean)).sum / allX.length
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val yMean = data.map(_._2).sum / n
    val yStd = { val v = data.map(r => math.pow(r._2 - yMean, 2)).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val mkHead = Array.tabulate(d)(i =>
      if (McDropout.uniform(seed, 0L, -1, 0, i) < drop) 0.0 else 1.0 / (1.0 - drop))
    def loss(w: Array[Double]): Double = {
      var off = 0
      def take(m: Int) = { val a = java.util.Arrays.copyOfRange(w, off, off + m); off += m; a }
      val wE = take(d); val pos = take(t * d)
      val wq = take(d * d); val wk = take(d * d); val wv = take(d * d)
      val headW = take(d).zip(mkHead).map { case (x, m) => x * m }
      val headB = take(1)(0)
      data.map { case (xv, y) =>
        val x = xv.toArray.map(v => (v - fMean) / fStd)
        val out = AttentionRegressor.forwardMasked(x, d, nH, wE, pos, wq, wk, wv,
          headW, headB, (_, _) => 1.0)
        val e = out - (y - yMean) / yStd
        0.5 * e * e
      }.sum
    }
    checkAll(w0, analytic, loss)
  }

  test("attention gradient with layerNorm (pins the residual + LN backward)") {
    // the reference transformer's post-attention block
    // (predictor_plugin_transformer.py:73-74): Add(e, a) then
    // LayerNormalization — the check covers the LN gain/bias and the
    // residual's split gradient alongside the attention weights
    val d = 4; val nH = 2; val t = 4
    val drop = 0.5; val lr = 0.3; val seed = 17L
    val rnd = new scala.util.Random(43)
    val data = Seq.fill(6)((Vectors.dense(Array.fill(t)(rnd.nextGaussian())),
      rnd.nextGaussian()))
    val df = data.toDF("features", "y")
    val conf = AttentionRegressor.AttnConfig(dim = d, heads = nH, epochs = 0,
      lr = lr, seed = seed, layerNorm = true)
    def flat(m: AttentionRegressor.AttentionRegressionModel): Array[Double] =
      m.wE ++ m.pos ++ m.wq ++ m.wk ++ m.wv ++ m.headW ++ Array(m.headB) ++
        m.lnG ++ m.lnB
    val w0 = flat(AttentionRegressor.fit(df, "y", conf, dropout = drop))
    val w1 = flat(AttentionRegressor.fit(df, "y", conf.copy(epochs = 1), dropout = drop))
    val n = data.length
    val analytic = w0.zip(w1).map { case (a, b) => (a - b) * n / lr }
    val allX = data.flatMap(_._1.toArray)
    val fMean = allX.sum / allX.length
    val fStd = { val v = allX.map(x => (x - fMean) * (x - fMean)).sum / allX.length
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val yMean = data.map(_._2).sum / n
    val yStd = { val v = data.map(r => math.pow(r._2 - yMean, 2)).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val mkHead = Array.tabulate(d)(i =>
      if (McDropout.uniform(seed, 0L, -1, 0, i) < drop) 0.0 else 1.0 / (1.0 - drop))
    assert(mkHead.contains(0.0), "seed must drop a unit to exercise the mask")
    def loss(w: Array[Double]): Double = {
      var off = 0
      def take(m: Int) = { val a = java.util.Arrays.copyOfRange(w, off, off + m); off += m; a }
      val wE = take(d); val pos = take(t * d)
      val wq = take(d * d); val wk = take(d * d); val wv = take(d * d)
      val headW = take(d)
      val headB = take(1)(0)
      val lnG = take(d); val lnB = take(d)
      data.map { case (xv, y) =>
        val x = xv.toArray.map(v => (v - fMean) / fStd)
        // LN mode masks per attended entry (constant across positions)
        val out = AttentionRegressor.forwardMasked(x, d, nH, wE, pos, wq, wk, wv,
          headW, headB, (_, idx) => mkHead(idx % d), lnG, lnB)
        val e = out - (y - yMean) / yStd
        0.5 * e * e
      }.sum
    }
    checkAll(w0, analytic, loss)
  }
}
