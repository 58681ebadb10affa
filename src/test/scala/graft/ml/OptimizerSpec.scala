package graft.ml

import org.apache.spark.ml.linalg.Vectors
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The r7-verdict optimizer-fidelity gate: the native heads' optional
  * deterministic mini-batch Adam face must (1) reach a loss full-batch
  * GD needs more epochs for, (2) fit bitwise identically under any
  * partitioning, (3) keep the M11 callbacks firing. Plus unit pins on
  * the batch-assignment and fixed-point machinery.
  */
class OptimizerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // nonlinear teacher: enough structure that GD at a safe lr crawls
  // while curvature-adaptive Adam moves
  private def rows(n: Int, seed: Long) = {
    val rnd = new java.util.Random(seed)
    (0 until n).map { _ =>
      val x = Array.fill(4)(rnd.nextGaussian())
      val y = math.sin(1.7 * x(0)) + 0.5 * x(1) * x(2) - 0.8 * math.tanh(x(3)) +
        0.05 * rnd.nextGaussian()
      (Vectors.dense(x), y)
    }
  }

  test("batchOf partitions rows exactly and re-deals per epoch") {
    val keys = (0 until 2000).map(i => Optimizer.mix64(i.toLong))
    for (b <- Seq(2, 7)) {
      val byBatch = keys.groupBy(k => Optimizer.batchOf(k, epoch = 3, b))
      assert(byBatch.keySet == (0 until b).toSet)
      // roughly even deal: no batch under half or over double its share
      byBatch.values.foreach(g =>
        assert(g.size > keys.size / b / 2 && g.size < keys.size / b * 2))
    }
    // different epochs re-deal: assignments must not be identical
    val e0 = keys.map(k => Optimizer.batchOf(k, 0, 4))
    val e1 = keys.map(k => Optimizer.batchOf(k, 1, 4))
    assert(e0 != e1)
    // same epoch: pure function
    assert(e0 == keys.map(k => Optimizer.batchOf(k, 0, 4)))
  }

  test("nano fixed-point: order-independent sums, loud overflow") {
    val vs = Seq(1.25e-3, -7.5e-4, 3.333333333e-1, -1.0e-9, 42.0)
    val fwd = vs.map(Optimizer.nano).foldLeft(0L)(Math.addExact)
    val rev = vs.reverse.map(Optimizer.nano).foldLeft(0L)(Math.addExact)
    assert(fwd == rev)
    assert(Optimizer.fromNano(Optimizer.nano(1.5)) == 1.5)
    intercept[IllegalArgumentException] { Optimizer.nano(1e10) }
  }

  test("mini-batch Adam reaches the loss full-batch GD needs more epochs for") {
    val df = rows(300, 11L).toDF("features", "label").cache()
    def lossCurve(opt: Optimizer.OptConfig, epochs: Int, lr: Double): Seq[Double] = {
      val hist = new Callbacks.History
      MlpRegressor.fitLayers(df, "label", Seq(8), epochs = epochs, lr = lr,
        seed = 7L, callbacks = Seq(hist), opt = opt)
      hist.rows.map(_._2)
    }
    val epochs = 60
    val gd = lossCurve(Optimizer.FullBatchGd, epochs, lr = 0.1)
    val adam = lossCurve(Optimizer.OptConfig(method = "adam", batches = 4),
      epochs, lr = 0.02)
    val target = gd.last // what GD achieved with the FULL epoch budget
    val adamEpochsToTarget = adam.indexWhere(_ <= target)
    assert(adamEpochsToTarget >= 0 && adamEpochsToTarget < epochs - 1,
      s"adam never reached GD's final loss $target: ${adam.take(5)}...${adam.last}")
    info(f"GD reached $target%.6f in $epochs epochs; " +
      s"mini-batch Adam passed it at epoch $adamEpochsToTarget")
    df.unpersist()
  }

  test("mini-batch fit is bitwise identical under any partitioning") {
    val base = rows(240, 23L).toDF("features", "label")
    def fitW(parts: Int): Array[Double] = {
      val m = MlpRegressor.fitLayers(base.repartition(parts), "label", Seq(6),
        epochs = 15, lr = 0.05, seed = 13L, dropout = 0.25,
        opt = Optimizer.OptConfig(method = "adamw", batches = 3, weightDecay = 1e-3))
      m.weights.flatten ++ m.biases.flatten
    }
    val w1 = fitW(1)
    val w7 = fitW(7)
    assert(w1.length == w7.length)
    w1.zip(w7).zipWithIndex.foreach { case ((a, b), i) =>
      assert(java.lang.Double.doubleToRawLongBits(a) ==
        java.lang.Double.doubleToRawLongBits(b), s"weight $i differs: $a vs $b")
    }
  }

  test("TCN head: mini-batch adamw fit is bitwise partition-independent and converges") {
    val base = rows(180, 41L).toDF("features", "label")
    def fitW(parts: Int) = {
      val hist = new Callbacks.History
      val m = TcnRegressor.fit(base.repartition(parts), "label",
        TcnRegressor.TcnConfig(channels = 3, blocks = 2, epochs = 12, lr = 0.03, seed = 19L),
        dropout = 0.2, callbacks = Seq(hist),
        opt = Optimizer.OptConfig(method = "adamw", batches = 3, weightDecay = 1e-3))
      (m.convW.flatten ++ m.convB.flatten ++ m.headW :+ m.headB, hist.rows)
    }
    val (w1, h1) = fitW(1)
    val (w5, h5) = fitW(5)
    w1.zip(w5).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToRawLongBits(a) ==
        java.lang.Double.doubleToRawLongBits(b))
    }
    assert(h1 == h5, "loss history must match bitwise too")
    assert(h1.size == 12 && h1.last._2 < h1.head._2, s"loss not decreasing: ${h1.head._2} -> ${h1.last._2}")
  }

  test("zoo-wide: every deep head's mini-batch adam fit is bitwise partition-independent") {
    val base = rows(120, 61L).toDF("features", "label")
    val oc = Optimizer.OptConfig(method = "adam", batches = 2)
    def weightsOf(head: String, parts: Int): (Array[Double], Seq[(Int, Double, Double)]) = {
      val df = base.repartition(parts)
      val hist = new Callbacks.History
      val cbs = Seq(hist)
      val w = head match {
        case "cnn" =>
          val m = CnnRegressor.fit(df, "label",
            CnnRegressor.CnnConfig(channels = 3, layers = 1, epochs = 8, lr = 0.02, seed = 3L),
            dropout = 0.2, callbacks = cbs, opt = oc)
          m.convW.flatten ++ m.convB.flatten ++ m.headW :+ m.headB
        case "lstm" =>
          val m = LstmRegressor.fit(df, "label",
            LstmRegressor.LstmConfig(units = 3, epochs = 8, lr = 0.02, seed = 3L),
            dropout = 0.2, callbacks = cbs, opt = oc)
          m.wx ++ m.wh ++ m.b ++ m.headW :+ m.headB
        case "attention" =>
          val m = AttentionRegressor.fit(df, "label",
            AttentionRegressor.AttnConfig(dim = 4, heads = 2, epochs = 8, lr = 0.02, seed = 3L),
            dropout = 0.2, callbacks = cbs, opt = oc)
          m.wE ++ m.pos ++ m.wq ++ m.wk ++ m.wv ++ m.headW :+ m.headB
        case "tft" =>
          val m = TftRegressor.fit(df, "label",
            TftRegressor.TftConfig(units = 4, heads = 2, epochs = 6, lr = 0.02, seed = 3L),
            dropout = 0.2, callbacks = cbs, opt = oc)
          m.weights
        case "nbeats" =>
          val m = NBeatsRegressor.fit(df, "label",
            NBeatsRegressor.NBeatsConfig(blocks = 2, layers = 1, units = 4,
              epochs = 8, lr = 0.02, seed = 3L),
            dropout = 0.2, callbacks = cbs, opt = oc)
          m.weights
      }
      (w, hist.rows)
    }
    for (head <- Seq("cnn", "lstm", "attention", "tft", "nbeats")) {
      val (w1, h1) = weightsOf(head, 1)
      val (w5, h5) = weightsOf(head, 5)
      assert(w1.length == w5.length, s"$head: weight count differs")
      w1.zip(w5).zipWithIndex.foreach { case ((a, b), i) =>
        assert(java.lang.Double.doubleToRawLongBits(a) ==
          java.lang.Double.doubleToRawLongBits(b), s"$head weight $i: $a vs $b")
      }
      assert(h1 == h5, s"$head: loss history differs across partitionings")
      assert(h1.last._2 < h1.head._2,
        s"$head: adam loss not decreasing (${h1.head._2} -> ${h1.last._2})")
    }
  }

  test("callbacks fire on the mini-batch path: early stopping truncates") {
    val df = rows(200, 31L).toDF("features", "label")
    val hist = new Callbacks.History
    val es = new Callbacks.EarlyStopping(patience = 3, minDelta = 1e9) // no epoch 'improves'
    MlpRegressor.fitLayers(df, "label", Seq(6), epochs = 50, lr = 0.02,
      seed = 5L, callbacks = Seq(hist, es),
      opt = Optimizer.OptConfig(method = "adam", batches = 4))
    assert(hist.rows.size < 50 && hist.rows.size >= 3,
      s"early stopping did not truncate: ${hist.rows.size} epochs ran")
  }
}
