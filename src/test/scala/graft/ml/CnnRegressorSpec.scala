package graft.ml

import org.apache.spark.ml.linalg.Vectors
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CnnRegressorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Teacher inside the model family: a stride-2 causal conv (kernel
  // [0.3, -0.6, 0.3] = a scaled curvature detector sampled every other
  // step), tanh, average-pooled — exactly one CnnRegressor layer.
  private val T = 16
  private def teacher(x: Array[Double]): Double = {
    val tOut = (T + 1) / 2
    var s = 0.0
    var ti = 0
    while (ti < tOut) {
      val i0 = 2 * ti
      val x0 = x(i0)
      val x1 = if (i0 >= 1) x(i0 - 1) else 0.0
      val x2 = if (i0 >= 2) x(i0 - 2) else 0.0
      s += math.tanh(0.3 * x0 - 0.6 * x1 + 0.3 * x2)
      ti += 1
    }
    s / tOut
  }

  private def windows(n: Int, seed: Long) = {
    val rnd = new java.util.Random(seed)
    (0 until n).map { _ =>
      val x = Array.fill(T)(rnd.nextGaussian())
      (Vectors.dense(x), teacher(x))
    }
  }

  test("M8 CNN head recovers a strided-conv teacher") {
    val train = windows(400, 11L).toDF("features", "label").cache()
    val test = windows(100, 12L)
    try {
      val m = CnnRegressor.fit(train, "label",
        CnnRegressor.CnnConfig(channels = 2, kernel = 3, layers = 1,
          epochs = 300, lr = 0.3))
      val errs = test.map { case (v, y) => val e = m.predict(v) - y; e * e }
      val mse = errs.sum / errs.size
      assert(mse < 0.005, s"CNN should nearly recover the teacher, mse=$mse")
    } finally { train.unpersist(); () }
  }

  test("channel plan and strided lengths follow the reference size formula") {
    val conf = CnnRegressor.CnnConfig(channels = 8, layers = 3, divisor = 2,
      minChannels = 2)
    assert(conf.sizes.toSeq == Seq(8, 4, 2))
    // odd length through two stride-2 layers: 7 -> 4 -> 2; fit+predict
    // must agree on the arithmetic end-to-end
    val rnd = new java.util.Random(5L)
    val rows = (0 until 60).map { _ =>
      val x = Array.fill(7)(rnd.nextGaussian())
      (Vectors.dense(x), x.sum / 7)
    }
    val df = rows.toDF("features", "label")
    val m = CnnRegressor.fit(df, "label",
      CnnRegressor.CnnConfig(channels = 4, layers = 2, epochs = 30, lr = 0.2))
    assert(rows.forall { case (v, _) => java.lang.Double.isFinite(m.predict(v)) })
  }

  test("fit is bitwise reproducible (OrderedAgg partition-id-ordered merges)") {
    // the zoo determinism contract: identical data + partitioning ⇒
    // identical weights run-to-run (OrderedAgg makes the merge order a
    // pure function of the partitioning, killing arrival-order ulps)
    val rows = windows(120, 17L)
    val df = rows.toDF("features", "label").repartition(13).cache()
    try {
      def go() = CnnRegressor.fit(df, "label",
        CnnRegressor.CnnConfig(channels = 2, layers = 2, epochs = 40, lr = 0.2))
      val (a, b) = (go(), go())
      assert(a.convW.flatten.toSeq == b.convW.flatten.toSeq)
      assert(a.headW.toSeq == b.headW.toSeq && a.headB == b.headB)
    } finally { df.unpersist(); () }
  }

  test("cnn dropout gradient vs its own masked forward (finite differences)") {
    val t = 6
    val drop = 0.5; val lr = 0.3; val seed = 13L
    val conf = CnnRegressor.CnnConfig(channels = 2, kernel = 3, layers = 2,
      minChannels = 2, epochs = 0, lr = lr, seed = seed)
    val rnd = new scala.util.Random(41)
    val data = Seq.fill(6)((Vectors.dense(Array.fill(t)(rnd.nextGaussian())),
      rnd.nextGaussian()))
    val df = data.toDF("features", "y")
    def flat(m: CnnRegressor.CnnRegressionModel): Array[Double] =
      m.convW.zip(m.convB).flatMap { case (w, b) => w ++ b } ++
        m.headW ++ Array(m.headB)
    val m0 = CnnRegressor.fit(df, "y", conf, dropout = drop)
    val m1 = CnnRegressor.fit(df, "y", conf.copy(epochs = 1), dropout = drop)
    val w0 = flat(m0)
    val n = data.length
    val analytic = w0.zip(flat(m1)).map { case (a, b) => (a - b) * n / lr }
    val sizes = conf.sizes
    val allX = data.flatMap(_._1.toArray)
    val fMean = allX.sum / allX.length
    val fStd = { val v = allX.map(x => (x - fMean) * (x - fMean)).sum / allX.length
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val yMean = data.map(_._2).sum / n
    val yStd = { val v = data.map(r => math.pow(r._2 - yMean, 2)).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val cL = sizes.last
    val mkHead = Array.tabulate(cL)(i =>
      if (McDropout.uniform(seed, 0L, -1, 0, i) < drop) 0.0 else 1.0 / (1.0 - drop))
    val mkSp = Array.tabulate(sizes.length)(l => Array.tabulate(sizes(l))(i =>
      if (McDropout.uniform(seed, 0L, -1, 1 + l, i) < drop) 0.0
      else 1.0 / (1.0 - drop)))
    def loss(w: Array[Double]): Double = {
      // unflatten in fit's layout: [W0|b0|W1|b1|headW|headB]
      var off = 0
      val convW = Array.tabulate(sizes.length) { l =>
        val cin = if (l == 0) 1 else sizes(l - 1)
        val sz = cin * sizes(l) * conf.kernel
        val a = java.util.Arrays.copyOfRange(w, off, off + sz); off += sz; a
      }
      val convB = Array.tabulate(sizes.length) { l =>
        val a = java.util.Arrays.copyOfRange(w, off, off + sizes(l))
        off += sizes(l); a
      }
      val headW = java.util.Arrays.copyOfRange(w, off, off + cL)
        .zip(mkHead).map { case (x, m) => x * m }
      off += cL
      val headB = w(off)
      data.map { case (xv, y) =>
        val x = xv.toArray.map(v => (v - fMean) / fStd)
        val out = CnnRegressor.forwardMasked(x, conf.kernel, conf.stride,
          sizes, convW, convB, headW, headB,
          (l, idx) => mkSp(l)(idx % sizes(l)))
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
      assert(err < 1e-4, s"weight $i: analytic=${analytic(i)} numeric=$num")
    }
    // the dropout masks must actually be live in this fixture
    assert(mkHead.contains(0.0) || mkSp.exists(_.contains(0.0)),
      "fixture should drop at least one unit")
  }

  for (act <- Seq("relu", "elu"))
  test(s"cnn $act gradient vs its own forward (activation routing, $act)") {
    // the reference CNN family defaults relu (predictor_plugin_cnn.py:27,66)
    val t = 6; val lr = 0.3
    val conf = CnnRegressor.CnnConfig(channels = 2, kernel = 3, layers = 2,
      minChannels = 2, epochs = 0, lr = lr, seed = 13L, activation = act)
    val rnd = new scala.util.Random(47)
    val data = Seq.fill(6)((Vectors.dense(Array.fill(t)(rnd.nextGaussian())),
      rnd.nextGaussian()))
    val df = data.toDF("features", "y")
    val sizes = conf.sizes
    // fit's true flat layout: [W0|b0|W1|b1|headW|headB]
    def flat(m: CnnRegressor.CnnRegressionModel): Array[Double] =
      m.convW.zip(m.convB).flatMap { case (w, b) => w ++ b } ++
        m.headW ++ Array(m.headB)
    val m0 = CnnRegressor.fit(df, "y", conf)
    val m1 = CnnRegressor.fit(df, "y", conf.copy(epochs = 1))
    assert(m0.activation == act)
    val w0 = flat(m0)
    val n = data.length
    val analytic = w0.zip(flat(m1)).map { case (a, b) => (a - b) * n / lr }
    val allX = data.flatMap(_._1.toArray)
    val fMean = allX.sum / allX.length
    val fStd = { val v = allX.map(x => (x - fMean) * (x - fMean)).sum / allX.length
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val yMean = data.map(_._2).sum / n
    val yStd = { val v = data.map(r => math.pow(r._2 - yMean, 2)).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s }
    val cL = sizes.last
    def loss(w: Array[Double]): Double = {
      var off = 0
      def take(m: Int) = { val a = java.util.Arrays.copyOfRange(w, off, off + m); off += m; a }
      val convW = new Array[Array[Double]](sizes.length)
      val convB = new Array[Array[Double]](sizes.length)
      for (l <- sizes.indices) {
        val cin = if (l == 0) 1 else sizes(l - 1)
        convW(l) = take(cin * sizes(l) * conf.kernel)
        convB(l) = take(sizes(l))
      }
      val headW = take(cL)
      val headB = take(1)(0)
      data.map { case (xv, y) =>
        val x = xv.toArray.map(v => (v - fMean) / fStd)
        val out = CnnRegressor.forwardMasked(x, conf.kernel, conf.stride,
          sizes, convW, convB, headW, headB, (_, _) => 1.0, act)
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

  test("activation default-off keeps the former fit bit-for-bit; S11 routes it") {
    val rows = windows(60, 31L)
    val df = rows.toDF("features", "label")
    val base = CnnRegressor.CnnConfig(channels = 2, layers = 2, epochs = 10, lr = 0.2)
    val a = CnnRegressor.fit(df, "label", base)
    val b = CnnRegressor.fit(df, "label", base.copy(activation = "tanh"))
    assert(a.convW.flatten.toSeq == b.convW.flatten.toSeq)
    val m = CnnRegressor.fit(df, "label", base.copy(activation = "relu", epochs = 25))
    val dir = java.nio.file.Files.createTempDirectory("cnn_act").toString
    CnnRegressor.save(m, s"$dir/model")
    val back = CnnRegressor.load(spark, s"$dir/model")
    assert(back.activation == "relu")
    rows.take(5).foreach { case (v, _) =>
      assert(java.lang.Double.doubleToRawLongBits(back.predict(v)) ==
        java.lang.Double.doubleToRawLongBits(m.predict(v)))
    }
  }

  test("S11: CNN model round-trips through save/load with identical predictions") {
    val rows = windows(80, 29L)
    val df = rows.toDF("features", "label")
    val m = CnnRegressor.fit(df, "label",
      CnnRegressor.CnnConfig(channels = 3, layers = 2, epochs = 30, lr = 0.2))
    val dir = java.nio.file.Files.createTempDirectory("cnn_s11").toString
    CnnRegressor.save(m, s"$dir/model")
    val m2 = CnnRegressor.load(spark, s"$dir/model")
    assert(rows.forall { case (v, _) => m.predict(v) == m2.predict(v) })
    assert(m2.sizes.toSeq == m.sizes.toSeq && m2.stride == m.stride)
  }

  test("MC-dropout: rate 0 equals predict; rate > 0 yields deterministic positive uncertainty") {
    val rows = windows(60, 31L)
    val df = rows.toDF("features", "label")
    val m = CnnRegressor.fit(df, "label",
      CnnRegressor.CnnConfig(channels = 2, layers = 2, epochs = 40, lr = 0.2))
    val withId = df.withColumn("id",
      org.apache.spark.sql.functions.monotonically_increasing_id())
    val zero = McDropout.predictWithUncertainty(m, withId, "id", "features",
      passes = 5, rate = 0.0, seed = 7L)
      .select("id", "pred_mean", "pred_unc").collect()
    val fromPredict = withId.collect().map(r =>
      r.getAs[Long]("id") -> m.predict(r.getAs[org.apache.spark.ml.linalg.Vector]("features"))).toMap
    zero.foreach { r =>
      assert(math.abs(r.getDouble(1) - fromPredict(r.getLong(0))) < 1e-9)
      assert(r.getDouble(2) == 0.0)
    }
    def run() = McDropout.predictWithUncertainty(m, withId, "id", "features",
      passes = 20, rate = 0.3, seed = 7L)
      .select("id", "pred_mean", "pred_unc").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1).toSeq
    val a = run(); val b = run()
    assert(a == b, "MC-dropout must be deterministic under a fixed seed")
    assert(a.exists(_._3 > 0.0), "dropout passes must produce spread")
  }

  test("M11 callbacks stop a CNN fit early") {
    val rows = windows(60, 37L)
    val df = rows.toDF("features", "label")
    val hist = new Callbacks.History
    val es = new Callbacks.EarlyStopping(patience = 2, minDelta = 1e9)
    CnnRegressor.fit(df, "label",
      CnnRegressor.CnnConfig(channels = 2, layers = 1, epochs = 50, lr = 0.2),
      callbacks = Seq(hist, es))
    // epoch 0 improves on +∞, then minDelta makes every later epoch a
    // stall → stop at epoch 2; history records exactly epochs 0..2
    assert(es.stoppedEpoch == 2, s"stoppedEpoch=${es.stoppedEpoch}")
    assert(hist.rows.size == 3, s"expected 3 epochs, got ${hist.rows.size}")
  }
}
