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
