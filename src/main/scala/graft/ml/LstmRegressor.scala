package graft.ml

import org.apache.spark.ml.PredictionModel
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** M8 recurrent head: a single-layer LSTM regressor — the Spark-native
  * re-expression of the reference's recurrent predictors
  * (`predictor_plugins/predictor_plugin_lstm.py`; standard LSTM cell,
  * Hochreiter & Schmidhuber 1997). The assembled features vector is read
  * as a univariate time sequence; one LSTM cell of `units` hidden state
  * walks it left to right and a linear readout of the final hidden state
  * produces the prediction. What recurrence buys over the dense/conv
  * heads is NONLINEAR STATE: the cell carries a composed function of the
  * whole prefix, which a fixed-depth feed-forward net must approximate
  * with depth it doesn't have (spec-pinned on a recursive teacher).
  *
  * Training is the same DISTRIBUTED full-batch pattern as
  * [[MlpRegressor]]/[[TcnRegressor]]: per epoch one `treeAggregate`
  * computes the exact MSE gradient — forward + backprop-through-time per
  * row (the T-step loop lives INSIDE the row kernel; rows stay
  * independent, so the pass parallelizes exactly like the other heads) —
  * partials merge tree-wise, the driver applies a momentum update, new
  * weights broadcast. Re-expression boundaries: single layer, no
  * dropout/recurrent-dropout (full-batch exact gradients), linear
  * readout of h_T rather than per-horizon stacked heads (the per-horizon
  * split lives in `Forecaster.fitPerHorizonWith`).
  *
  * Gate layout per unit u: z_g(u) = Wx(g,u)·x_t + Σ_v Wh(g,u,v)·h(v) +
  * b(g,u) for gates g ∈ {input, forget, cell, output}; c' = f⊙c + i⊙g̃;
  * h' = o⊙tanh(c'). Forget bias initialized to 1 (standard practice —
  * gradients flow through the cell path from epoch 0).
  */
// Serializable: fit's row-gradient helper is a local def lifted onto this
// object; Spark task closures referencing it serialize the stateless object.
object LstmRegressor extends Serializable {

  case class LstmConfig(units: Int = 6, epochs: Int = 200, lr: Double = 0.1,
      momentum: Double = 0.9, seed: Long = 42L)

  /** Fitted model; weight arrays are row-major over [gate][unit](+[unit])
    * with gate order (input, forget, cell, output).
    */
  class LstmRegressionModel(
      override val uid: String,
      val units: Int,
      val wx: Array[Double], // 4*units: input weight per gate/unit
      val wh: Array[Double], // 4*units*units: recurrent weights
      val b: Array[Double], // 4*units
      val headW: Array[Double],
      val headB: Double,
      val seqLen: Int,
      val featMean: Double,
      val featStd: Double,
      val labelMean: Double,
      val labelStd: Double)
    extends PredictionModel[Vector, LstmRegressionModel] {

    override def numFeatures: Int = seqLen

    override def predict(features: Vector): Double = {
      val t = seqLen
      val x = new Array[Double](t)
      var i = 0
      while (i < t) { x(i) = (features(i) - featMean) / featStd; i += 1 }
      val out = forward(x, units, wx, wh, b, headW, headB, null)
      out * labelStd + labelMean
    }

    override def copy(extra: ParamMap): LstmRegressionModel = copyValues(
      new LstmRegressionModel(uid, units, wx, wh, b, headW, headB, seqLen,
        featMean, featStd, labelMean, labelStd), extra)

    override def toString: String =
      s"LstmRegressionModel(uid=$uid, units=$units, T=$seqLen)"
  }

  /** Forward pass; when `keep` != null it receives per-step
    * (i, f, g̃, o, c, h) rows for BPTT: keep(t) = Array of 6*units.
    * Returns the standardized-space prediction.
    *
    * `mask` (null = off) is the MC-dropout hook: a multiplier on each
    * hidden-state unit, indexed (0, unit) and CONSTANT across
    * timesteps — the variational-RNN dropout of Gal & Ghahramani
    * (NeurIPS 2016): one mask per sequence, applied to h as it feeds
    * both the recurrence and the head; the cell state stays unmasked
    * so long-range memory survives the drop. Training passes null.
    */
  private def forward(x: Array[Double], u: Int, wx: Array[Double],
      wh: Array[Double], b: Array[Double], headW: Array[Double],
      headB: Double, keep: Array[Array[Double]],
      mask: (Int, Int) => Double = null): Double = {
    val t = x.length
    var h = new Array[Double](u)
    var c = new Array[Double](u)
    var ti = 0
    while (ti < t) {
      val xi = x(ti)
      val nh = new Array[Double](u)
      val nc = new Array[Double](u)
      val row = if (keep != null) new Array[Double](6 * u) else null
      var v = 0
      while (v < u) {
        // gate pre-activations: g*u + v indexes (gate, unit)
        var zi = b(v) + wx(v) * xi
        var zf = b(u + v) + wx(u + v) * xi
        var zg = b(2 * u + v) + wx(2 * u + v) * xi
        var zo = b(3 * u + v) + wx(3 * u + v) * xi
        var w2 = 0
        while (w2 < u) {
          val hv = h(w2)
          zi += wh((v) * u + w2) * hv
          zf += wh((u + v) * u + w2) * hv
          zg += wh((2 * u + v) * u + w2) * hv
          zo += wh((3 * u + v) * u + w2) * hv
          w2 += 1
        }
        val ig = sigmoid(zi)
        val fg = sigmoid(zf)
        val gg = math.tanh(zg)
        val og = sigmoid(zo)
        val cc = fg * c(v) + ig * gg
        val hh0 = og * math.tanh(cc)
        val hh = if (mask != null) hh0 * mask(0, v) else hh0
        nc(v) = cc
        nh(v) = hh
        if (row != null) {
          row(v) = ig; row(u + v) = fg; row(2 * u + v) = gg
          row(3 * u + v) = og; row(4 * u + v) = cc; row(5 * u + v) = hh
        }
        v += 1
      }
      if (keep != null) keep(ti) = row
      h = nh
      c = nc
      ti += 1
    }
    var y = headB
    var v = 0
    while (v < u) { y += headW(v) * h(v); v += 1 }
    y
  }

  @inline private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** MC-dropout bridge for [[graft.ml.McDropout]]: the shared forward
    * with a variational hidden-unit mask, on a pre-standardized window.
    * Returns the STANDARDIZED-space prediction.
    */
  private[ml] def forwardMasked(x: Array[Double], u: Int, wx: Array[Double],
      wh: Array[Double], b: Array[Double], headW: Array[Double],
      headB: Double, mask: (Int, Int) => Double): Double =
    forward(x, u, wx, wh, b, headW, headB, null, mask)

  /** Fit on an assembled frame (featuresCol: MLlib Vector read as a
    * sequence, labelCol numeric) — the `fitPerHorizonWith` contract.
    *
    * `dropout` > 0 enables TRAIN-TIME dropout of the final hidden state
    * feeding the linear head (the reference's post-recurrent `Dropout`,
    * `predictor_plugin_lstm.py`): per-epoch inverted masks from the
    * McDropout counter hash, applied by masking `headW` in the
    * forward/backprop — `dropout = 0` stays bit-for-bit.
    * `recurrentDropout` > 0 additionally masks each hidden unit's
    * output INSIDE the recurrence with one per-epoch variational mask
    * shared across time steps (Gal & Ghahramani 2016; Keras
    * `LSTM(recurrent_dropout=…)`, `predictor_plugin_tft.py:115`) — the
    * masked h feeds both the next step's gates and the head, and the
    * BPTT folds the same mask into dOut. `callbacks` (M11): epoch-end
    * training control from the same gradient pass.
    */
  def fit(df: DataFrame, labelCol: String, conf: LstmConfig = LstmConfig(),
      featuresCol: String = "features", dropout: Double = 0.0,
      callbacks: Seq[Callbacks.TrainingCallback] = Nil,
      recurrentDropout: Double = 0.0,
      opt: Optimizer.OptConfig = Optimizer.FullBatchGd): LstmRegressionModel = {
    val u = conf.units
    require(u > 0, s"LstmRegressor.fit: bad config $conf")
    require(dropout >= 0.0 && dropout < 1.0,
      s"LstmRegressor.fit: dropout must be in [0, 1), got $dropout")
    require(recurrentDropout >= 0.0 && recurrentDropout < 1.0,
      s"LstmRegressor.fit: recurrentDropout must be in [0, 1), got $recurrentDropout")
    val sc = df.sparkSession.sparkContext
    val data = df.select(col(featuresCol), col(labelCol).cast("double"))
      .rdd.map(r => (r.getAs[Vector](0), r.getDouble(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val head = data.take(1)
      require(head.nonEmpty, "LstmRegressor.fit: empty training set")
      val t = head(0)._1.size
      val (sx, sxx, sy, syy, n) = OrderedAgg(data, (0.0, 0.0, 0.0, 0.0, 0L))(
        seqOp = { case ((sx, sxx, sy, syy, n), (x, y)) =>
          var a = sx; var aa = sxx
          var j = 0
          while (j < t) { val v = x(j); a += v; aa += v * v; j += 1 }
          (a, aa, sy + y, syy + y * y, n + 1)
        },
        combOp = { case ((ax, axx, ay, ayy, an), (bx, bxx, by, byy, bn)) =>
          (ax + bx, axx + bxx, ay + by, ayy + byy, an + bn)
        })
      require(n > 0, "LstmRegressor.fit: empty training set")
      def std(sum: Double, sumsq: Double, cnt: Double): Double = {
        val v = math.max(sumsq / cnt - (sum / cnt) * (sum / cnt), 0.0)
        val s = math.sqrt(v)
        if (s < 1e-12) 1.0 else s
      }
      var fMean = sx / (n.toDouble * t)
      var fStd = std(sx, sxx, n.toDouble * t)
      var yMean = sy / n
      var yStd = std(sy, syy, n.toDouble)
      if (!opt.isFullBatchGd) {
        // order-independent stats for the mini-batch path's
        // bitwise-under-any-partitioning contract (see Optimizer.micro)
        val (mx, mxx, my, myy) = Optimizer.microStatsGlobal(data, t)
        fMean = mx / (n.toDouble * t)
        fStd = std(mx, mxx, n.toDouble * t)
        yMean = my / n
        yStd = std(my, myy, n.toDouble)
      }

      // flat layout: [wx (4u) | wh (4u*u) | b (4u) | headW (u) | headB]
      val wxOff = 0
      val whOff = 4 * u
      val bOff = whOff + 4 * u * u
      val hOff = bOff + 4 * u
      val hbOff = hOff + u
      val nW = hbOff + 1
      val rnd = new java.util.Random(conf.seed)
      val weights = new Array[Double](nW)
      var i = 0
      while (i < 4 * u) { weights(wxOff + i) = rnd.nextGaussian() * 0.5; i += 1 }
      i = 0
      val rScale = math.sqrt(1.0 / u)
      while (i < 4 * u * u) { weights(whOff + i) = rnd.nextGaussian() * rScale; i += 1 }
      i = 0
      while (i < u) { weights(bOff + u + i) = 1.0; i += 1 } // forget bias = 1
      i = 0
      while (i < u) { weights(hOff + i) = rnd.nextGaussian() * rScale; i += 1 }
      val velocity = new Array[Double](nW)

      // Row-local BPTT shared by BOTH training paths: accumulates the
      // row's gradient into g(0 until nW) and its loss into g(nW); the
      // full-batch aggregate hands its accumulator in directly
      // (per-slot op order unchanged, bit-for-bit), the mini-batch loop
      // a fresh scratch.
      def rowGradInto(wf: Array[Double], mk: Array[Double],
          mkR: Array[Double], xv: Vector, y: Double,
          g: Array[Double]): Unit = {
            val wx = java.util.Arrays.copyOfRange(wf, wxOff, wxOff + 4 * u)
            val wh = java.util.Arrays.copyOfRange(wf, whOff, whOff + 4 * u * u)
            val bArr = java.util.Arrays.copyOfRange(wf, bOff, bOff + 4 * u)
            val headW = java.util.Arrays.copyOfRange(wf, hOff, hOff + u)
            val headB = wf(hbOff)
            // masked head = dropout on h_T (see scaladoc)
            val headWm =
              if (mk == null) headW
              else Array.tabulate(u)(i => headW(i) * mk(i))
            val x = new Array[Double](t)
            var j = 0
            while (j < t) { x(j) = (xv(j) - fMean) / fStd; j += 1 }
            val keep = new Array[Array[Double]](t)
            val out = forward(x, u, wx, wh, bArr, headWm, headB, keep,
              mask = if (mkR == null) null else (_, v) => mkR(v))
            val err = out - (y - yMean) / yStd
            g(nW) += 0.5 * err * err // epoch loss accumulator
            // head gradients on h_T
            val hT = keep(t - 1)
            var v = 0
            while (v < u) {
              g(hOff + v) += err * hT(5 * u + v) * (if (mk == null) 1.0 else mk(v))
              v += 1
            }
            g(hbOff) += err
            // BPTT
            val dh = new Array[Double](u)
            val dc = new Array[Double](u)
            v = 0
            while (v < u) { dh(v) = err * headWm(v); v += 1 }
            var ti = t - 1
            while (ti >= 0) {
              val row = keep(ti)
              val prevH: Array[Double] = if (ti == 0) null else keep(ti - 1)
              val dhNext = new Array[Double](u)
              val dcNext = new Array[Double](u)
              v = 0
              while (v < u) {
                val ig = row(v); val fg = row(u + v); val gg = row(2 * u + v)
                val og = row(3 * u + v); val cc = row(4 * u + v)
                val tc = math.tanh(cc)
                // hh = mR·og·tanh(cc): dh carries dL/d(masked h), so the
                // raw og·tanh(cc) delta gains the variational mask factor
                // (identity when recurrent dropout is off)
                val dOut = if (mkR == null) dh(v) else dh(v) * mkR(v)
                val dCc = dc(v) + dOut * og * (1.0 - tc * tc)
                val cPrev = if (ti == 0) 0.0 else prevH(4 * u + v)
                // gate pre-activation deltas
                val dZo = dOut * tc * og * (1.0 - og)
                val dZi = dCc * gg * ig * (1.0 - ig)
                val dZf = dCc * cPrev * fg * (1.0 - fg)
                val dZg = dCc * ig * (1.0 - gg * gg)
                dcNext(v) += dCc * fg
                val xi = x(ti)
                g(wxOff + v) += dZi * xi
                g(wxOff + u + v) += dZf * xi
                g(wxOff + 2 * u + v) += dZg * xi
                g(wxOff + 3 * u + v) += dZo * xi
                g(bOff + v) += dZi
                g(bOff + u + v) += dZf
                g(bOff + 2 * u + v) += dZg
                g(bOff + 3 * u + v) += dZo
                var w2 = 0
                while (w2 < u) {
                  val hPrev = if (ti == 0) 0.0 else prevH(5 * u + w2)
                  g(whOff + (v) * u + w2) += dZi * hPrev
                  g(whOff + (u + v) * u + w2) += dZf * hPrev
                  g(whOff + (2 * u + v) * u + w2) += dZg * hPrev
                  g(whOff + (3 * u + v) * u + w2) += dZo * hPrev
                  dhNext(w2) += dZi * wh((v) * u + w2) +
                    dZf * wh((u + v) * u + w2) +
                    dZg * wh((2 * u + v) * u + w2) +
                    dZo * wh((3 * u + v) * u + w2)
                  w2 += 1
                }
                v += 1
              }
              System.arraycopy(dhNext, 0, dh, 0, u)
              System.arraycopy(dcNext, 0, dc, 0, u)
              ti -= 1
            }
      }

      // per-step inverted-dropout masks (null = off): head input
      // (layer 0) and the variational recurrent mask (layer 1); stepId =
      // epoch (full-batch) or epoch*B + b (mini-batch, Keras semantics)
      def mkMask(stepId: Long): (Array[Double], Array[Double]) = (
        if (dropout == 0.0) null
        else Array.tabulate(u)(i =>
          if (McDropout.uniform(conf.seed, stepId, -1, 0, i) < dropout) 0.0
          else 1.0 / (1.0 - dropout)),
        if (recurrentDropout == 0.0) null
        else Array.tabulate(u)(i =>
          if (McDropout.uniform(conf.seed, stepId, -1, 1, i) < recurrentDropout) 0.0
          else 1.0 / (1.0 - recurrentDropout)))

      var lrCur = conf.lr
      var stopped = false
      var epoch = 0
      if (!opt.isFullBatchGd) {
        // optional mini-batch Adam/AdamW/SGD face — see Optimizer
        Optimizer.miniBatchLoop(sc, data, weights, opt, conf.epochs,
          conf.lr, conf.momentum, n, callbacks)(mkMask) {
          case (w, (mk, mkR), xv, y, scratch) =>
            rowGradInto(w, mk, mkR, xv, y, scratch)
        }
      } else
      while (epoch < conf.epochs && !stopped) {
        val (mk, mkR) = mkMask(epoch.toLong)
        val bcW = sc.broadcast(weights.clone())
        val grad = OrderedAgg(data, new Array[Double](nW + 1))(
          seqOp = { case (g, (xv, y)) =>
            rowGradInto(bcW.value, mk, mkR, xv, y, g); g
          },
          combOp = { (a2, b2) =>
            var k2 = 0
            while (k2 < nW + 1) { a2(k2) += b2(k2); k2 += 1 }
            a2
          })
        bcW.destroy()
        var k3 = 0
        while (k3 < nW) {
          velocity(k3) = conf.momentum * velocity(k3) - lrCur * grad(k3) / n
          weights(k3) += velocity(k3)
          k3 += 1
        }
        if (callbacks.nonEmpty) {
          val loss = grad(nW) / n
          callbacks.foreach { cb =>
            cb.onEpochEnd(epoch, loss, lrCur) match {
              case Callbacks.Stop      => stopped = true
              case Callbacks.SetLr(nl) => lrCur = nl
              case Callbacks.Continue  => ()
            }
          }
        }
        epoch += 1
      }

      new LstmRegressionModel(
        s"lstm_${java.util.UUID.randomUUID().toString.take(8)}", u,
        java.util.Arrays.copyOfRange(weights, wxOff, wxOff + 4 * u),
        java.util.Arrays.copyOfRange(weights, whOff, whOff + 4 * u * u),
        java.util.Arrays.copyOfRange(weights, bOff, bOff + 4 * u),
        java.util.Arrays.copyOfRange(weights, hOff, hOff + u),
        weights(hbOff), t, fMean, fStd, yMean, yStd)
    } finally { data.unpersist(blocking = false); () }
  }

  /** S11 artifact sink: architecture + weights as one parquet row. */
  def save(model: LstmRegressionModel, path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    Seq((model.uid, model.units, model.wx.toSeq, model.wh.toSeq, model.b.toSeq,
        model.headW.toSeq, model.headB, model.seqLen,
        model.featMean, model.featStd, model.labelMean, model.labelStd))
      .toDF("uid", "units", "wx", "wh", "b", "head_w", "head_b", "seq_len",
        "feat_mean", "feat_std", "label_mean", "label_std")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** S11 artifact source. */
  def load(spark: SparkSession, path: String): LstmRegressionModel = {
    val r = spark.read.parquet(path).head()
    new LstmRegressionModel(
      r.getAs[String]("uid"), r.getAs[Int]("units"),
      r.getAs[scala.collection.Seq[Double]]("wx").toArray,
      r.getAs[scala.collection.Seq[Double]]("wh").toArray,
      r.getAs[scala.collection.Seq[Double]]("b").toArray,
      r.getAs[scala.collection.Seq[Double]]("head_w").toArray,
      r.getAs[Double]("head_b"), r.getAs[Int]("seq_len"),
      r.getAs[Double]("feat_mean"), r.getAs[Double]("feat_std"),
      r.getAs[Double]("label_mean"), r.getAs[Double]("label_std"))
  }
}
