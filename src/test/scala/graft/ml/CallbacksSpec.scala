package graft.ml

import graft.TestSpark
import org.apache.spark.ml.feature.VectorAssembler
import org.scalatest.funsuite.AnyFunSuite

class CallbacksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val assembled = {
    val rnd = new scala.util.Random(9)
    val df = Seq.tabulate(200) { _ =>
      val x1 = rnd.nextDouble(); val x2 = rnd.nextDouble()
      (x1, x2, 2.0 * x1 - x2 + 0.1 * rnd.nextGaussian())
    }.toDF("x1", "x2", "y")
    new VectorAssembler().setInputCols(Array("x1", "x2"))
      .setOutputCol("features").transform(df).select($"features", $"y")
  }

  test("M11 unit: EarlyStopping / ReduceLrOnPlateau state machines") {
    val es = new Callbacks.EarlyStopping(patience = 2, minDelta = 0.1)
    assert(es.onEpochEnd(0, 1.0, 0.1) == Callbacks.Continue) // improves
    assert(es.onEpochEnd(1, 0.95, 0.1) == Callbacks.Continue) // < minDelta
    assert(es.onEpochEnd(2, 0.94, 0.1) == Callbacks.Stop) // patience hit
    assert(es.stoppedEpoch == 2)
    val rp = new Callbacks.ReduceLrOnPlateau(factor = 0.5, patience = 1,
      minLr = 0.02)
    assert(rp.onEpochEnd(0, 1.0, 0.1) == Callbacks.Continue)
    assert(rp.onEpochEnd(1, 1.0, 0.1) == Callbacks.SetLr(0.05))
    assert(rp.onEpochEnd(2, 1.0, 0.05) == Callbacks.SetLr(0.025))
    assert(rp.onEpochEnd(3, 1.0, 0.025) == Callbacks.SetLr(0.02)) // floor
    assert(rp.onEpochEnd(4, 1.0, 0.02) == Callbacks.Continue) // at floor
    assert(rp.reductions == 3)
  }

  test("M11 fit loop: history records every epoch; loss decreases") {
    val h = new Callbacks.History
    MlpRegressor.fitLayers(assembled, "y", Seq(4), epochs = 40, lr = 0.1,
      callbacks = Seq(h))
    assert(h.rows.length == 40)
    val losses = h.rows.map(_._2)
    assert(losses.forall(java.lang.Double.isFinite))
    assert(losses.last < losses.head, s"${losses.head} -> ${losses.last}")
  }

  test("M11 fit loop: early stopping halts before the epoch budget") {
    val h = new Callbacks.History
    val es = new Callbacks.EarlyStopping(patience = 2, minDelta = 1e9)
    MlpRegressor.fitLayers(assembled, "y", Seq(4), epochs = 100, lr = 0.1,
      callbacks = Seq(h, es))
    assert(h.rows.length == 3, s"ran ${h.rows.length} epochs") // 1 improve + 2 patience
    assert(es.stoppedEpoch == 2)
  }

  test("M11 val-loss monitor: callbacks see VALIDATION loss on the mini-batch path") {
    // val set with the label relationship INVERTED: as the net fits
    // train, val loss must end far above train loss — the monitored
    // sequence proves the callbacks watch the val split, not train
    val rnd = new scala.util.Random(11)
    val valDf = Seq.tabulate(120) { _ =>
      val x1 = rnd.nextDouble(); val x2 = rnd.nextDouble()
      (x1, x2, -2.0 * x1 + x2)
    }.toDF("x1", "x2", "y")
    val valAssembled = new VectorAssembler().setInputCols(Array("x1", "x2"))
      .setOutputCol("features").transform(valDf).select($"features", $"y")
    val opt = Optimizer.OptConfig(method = "adamw", batches = 2)
    val hTrain = new Callbacks.History
    val m1 = MlpRegressor.fitLayers(assembled, "y", Seq(4), epochs = 30, lr = 0.05,
      callbacks = Seq(hTrain), opt = opt)
    val hVal = new Callbacks.History
    val m2 = MlpRegressor.fitLayers(assembled, "y", Seq(4), epochs = 30, lr = 0.05,
      callbacks = Seq(hVal), opt = opt, valData = Some(valAssembled))
    assert(hVal.rows.length == 30 && hTrain.rows.length == 30)
    assert(hVal.rows.map(_._2).forall(java.lang.Double.isFinite))
    // the monitor pass is forward-only: it must not perturb the fit
    val probe = assembled.head().getAs[org.apache.spark.ml.linalg.Vector]("features")
    assert(m1.predict(probe) == m2.predict(probe),
      "val-loss monitoring changed the fitted weights")
    // only the MONITORED value differs, and the anti-correlated val
    // loss ends well above train
    assert(hVal.rows.last._2 > 4.0 * hTrain.rows.last._2,
      s"val ${hVal.rows.last._2} vs train ${hTrain.rows.last._2}")
  }

  test("M11 val-loss monitor: early stopping fires on a worsening val split") {
    // train is learnable; val is anti-correlated, so val loss RISES as
    // train loss falls -> EarlyStopping(patience=3) must halt early
    val rnd = new scala.util.Random(13)
    val valDf = Seq.tabulate(120) { _ =>
      val x1 = rnd.nextDouble(); val x2 = rnd.nextDouble()
      (x1, x2, -2.0 * x1 + x2)
    }.toDF("x1", "x2", "y")
    val valAssembled = new VectorAssembler().setInputCols(Array("x1", "x2"))
      .setOutputCol("features").transform(valDf).select($"features", $"y")
    val es = new Callbacks.EarlyStopping(patience = 3, minDelta = 0.0)
    val h = new Callbacks.History
    MlpRegressor.fitLayers(assembled, "y", Seq(4), epochs = 100, lr = 0.05,
      callbacks = Seq(h, es), opt = Optimizer.OptConfig(method = "adamw", batches = 2),
      valData = Some(valAssembled))
    assert(es.stoppedEpoch >= 0, "early stopping never fired on a worsening val loss")
    assert(h.rows.length < 100, s"ran all ${h.rows.length} epochs")
  }

  test("M11 val-loss monitor: ReduceLrOnPlateau reacts to the val split (Keras monitor='val_loss')") {
    // anti-correlated val -> monitored loss plateaus/rises immediately
    // -> the plateau callback must cut the lr within the patience
    val rnd = new scala.util.Random(17)
    val valDf = Seq.tabulate(120) { _ =>
      val x1 = rnd.nextDouble(); val x2 = rnd.nextDouble()
      (x1, x2, -2.0 * x1 + x2)
    }.toDF("x1", "x2", "y")
    val valAssembled = new VectorAssembler().setInputCols(Array("x1", "x2"))
      .setOutputCol("features").transform(valDf).select($"features", $"y")
    val rp = new Callbacks.ReduceLrOnPlateau(factor = 0.5, patience = 2, minLr = 1e-4)
    val h = new Callbacks.History
    MlpRegressor.fitLayers(assembled, "y", Seq(4), epochs = 25, lr = 0.05,
      callbacks = Seq(h, rp), opt = Optimizer.OptConfig(method = "adamw", batches = 2),
      valData = Some(valAssembled))
    assert(rp.reductions >= 1, "plateau callback never fired on a worsening val loss")
    assert(h.rows.last._3 < 0.05, s"lr never dropped: ${h.rows.last._3}")
  }

  test("M11 fit loop: plateau callback lowers the live learning rate") {
    val h = new Callbacks.History
    val rp = new Callbacks.ReduceLrOnPlateau(factor = 0.5, patience = 1,
      minLr = 1e-4, minDelta = 1e9)
    MlpRegressor.fitLayers(assembled, "y", Seq(4), epochs = 6, lr = 0.1,
      callbacks = Seq(h, rp))
    val lrs = h.rows.map(_._3)
    assert(lrs.head == 0.1 && lrs.last < 0.01, s"lrs=$lrs")
    assert(rp.reductions >= 4)
  }

  test("M11 fit loop: time budget of zero stops after the first epoch") {
    val h = new Callbacks.History
    val tb = new Callbacks.TimeBudget(0.0)
    MlpRegressor.fitLayers(assembled, "y", Seq(4), epochs = 50, lr = 0.1,
      callbacks = Seq(h, tb))
    assert(h.rows.length == 1 && tb.tripped)
  }

  test("M11: per-horizon callback factory isolates state between heads") {
    val rnd = new scala.util.Random(17)
    val df = Seq.tabulate(150) { _ =>
      val x1 = rnd.nextDouble(); val x2 = rnd.nextDouble()
      (x1, x2, x1 + x2, x1 - x2)
    }.toDF("x1", "x2", "target_h1", "target_h2")
    val hist = scala.collection.mutable.Map.empty[Int, Callbacks.History]
    val models = Forecaster.fitPerHorizonDeepMlp(df, Seq("x1", "x2"), Seq(1, 2),
      layers = Seq(4), epochs = 12, lr = 0.1,
      callbacks = h => { val hh = new Callbacks.History; hist(h) = hh; Seq(hh) })
    assert(models.keySet == Set(1, 2))
    assert(hist(1).rows.length == 12 && hist(2).rows.length == 12)
    // distinct labels → distinct loss trajectories: state was not shared
    assert(hist(1).rows.map(_._2) != hist(2).rows.map(_._2))
  }

  test("M11: no callbacks leaves the fit bit-for-bit unchanged") {
    def w(m: MlpRegressor.MlpRegressionModel) = m.weights.flatten.toSeq
    val a = MlpRegressor.fitLayers(assembled, "y", Seq(4), epochs = 15, lr = 0.1)
    val b = MlpRegressor.fitLayers(assembled, "y", Seq(4), epochs = 15, lr = 0.1,
      callbacks = Seq(new Callbacks.History))
    assert(w(a) == w(b))
  }

  test("M11 unit: restore_best_weights snapshots each new best and restores on Stop only") {
    // Keras EarlyStopping(restore_best_weights=True) semantics
    // (predictor_plugin_ann_best.py:631): restore happens inside the
    // stop branch — never when the epoch budget runs out first.
    val w = Array(1.0, 2.0)
    val es = new Callbacks.EarlyStopping(patience = 2, restoreBestWeights = true)
    assert(es.onEpochEnd(0, 1.0, 0.1, w) == Callbacks.Continue) // best @ (1,2)
    w(0) = 3.0; w(1) = 4.0
    assert(es.onEpochEnd(1, 0.5, 0.1, w) == Callbacks.Continue) // new best @ (3,4)
    w(0) = 5.0; w(1) = 6.0
    assert(es.onEpochEnd(2, 0.6, 0.1, w) == Callbacks.Continue) // stall 1
    w(0) = 7.0; w(1) = 8.0
    assert(es.onEpochEnd(3, 0.7, 0.1, w) == Callbacks.Stop) // stall 2 -> restore
    assert(w.toSeq == Seq(3.0, 4.0) && es.restored)
    // budget exhaustion (caller stops calling): weights stay last-epoch
    val w2 = Array(1.0)
    val es2 = new Callbacks.EarlyStopping(patience = 5, restoreBestWeights = true)
    assert(es2.onEpochEnd(0, 1.0, 0.1, w2) == Callbacks.Continue)
    w2(0) = 9.0
    assert(es2.onEpochEnd(1, 2.0, 0.1, w2) == Callbacks.Continue)
    assert(w2(0) == 9.0 && !es2.restored)
  }

  test("M11: restore_best_weights returns the best-epoch weights bit-for-bit (full-batch path)") {
    def w(m: MlpRegressor.MlpRegressionModel) = m.weights.flatten.toSeq
    // minDelta = 1e9: only epoch 0 ever counts as an improvement, so the
    // best snapshot is the weights after exactly one epoch — the
    // restored fit must equal a 1-epoch fit bit-for-bit, not the
    // 3-epoch weights the loop actually reached before stopping.
    val es = new Callbacks.EarlyStopping(patience = 2, minDelta = 1e9,
      restoreBestWeights = true)
    val restored = MlpRegressor.fitLayers(assembled, "y", Seq(4), epochs = 100,
      lr = 0.1, callbacks = Seq(es))
    assert(es.stoppedEpoch == 2 && es.restored)
    val oneEpoch = MlpRegressor.fitLayers(assembled, "y", Seq(4), epochs = 1, lr = 0.1)
    val threeEpochs = MlpRegressor.fitLayers(assembled, "y", Seq(4), epochs = 3, lr = 0.1)
    assert(w(restored) == w(oneEpoch), "restore did not return the best-epoch weights")
    assert(w(restored) != w(threeEpochs), "restore was a no-op (last-epoch weights)")
  }

  test("M11: restore_best_weights on the val-monitored mini-batch path never loses to last-epoch weights") {
    // anti-correlated val split: val loss rises as the net fits train,
    // so stopping is 3 epochs past the val optimum; restoring must hand
    // back a model at-or-below the non-restored run's val MSE
    val rnd = new scala.util.Random(13)
    val valDf = Seq.tabulate(120) { _ =>
      val x1 = rnd.nextDouble(); val x2 = rnd.nextDouble()
      (x1, x2, -2.0 * x1 + x2)
    }.toDF("x1", "x2", "y")
    val valAssembled = new VectorAssembler().setInputCols(Array("x1", "x2"))
      .setOutputCol("features").transform(valDf).select($"features", $"y")
    val opt = Optimizer.OptConfig(method = "adamw", batches = 2)
    def valMse(m: MlpRegressor.MlpRegressionModel): Double = {
      val rows = valAssembled.collect()
      rows.map { r =>
        val e = m.predict(r.getAs[org.apache.spark.ml.linalg.Vector](0)) - r.getDouble(1)
        e * e
      }.sum / rows.length
    }
    val esPlain = new Callbacks.EarlyStopping(patience = 3)
    val plain = MlpRegressor.fitLayers(assembled, "y", Seq(4), epochs = 100,
      lr = 0.05, callbacks = Seq(esPlain), opt = opt, valData = Some(valAssembled))
    val esRestore = new Callbacks.EarlyStopping(patience = 3, restoreBestWeights = true)
    val best = MlpRegressor.fitLayers(assembled, "y", Seq(4), epochs = 100,
      lr = 0.05, callbacks = Seq(esRestore), opt = opt, valData = Some(valAssembled))
    assert(esPlain.stoppedEpoch == esRestore.stoppedEpoch,
      "restore changed the training trajectory itself")
    assert(esRestore.restored)
    assert(valMse(best) <= valMse(plain),
      s"restored val MSE ${valMse(best)} above last-epoch ${valMse(plain)}")
  }
}
