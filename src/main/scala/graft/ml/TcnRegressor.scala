package graft.ml

import org.apache.spark.ml.PredictionModel
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** M8 temporal-convolutional head: a dilated causal Conv1D regressor —
  * the Spark-native re-expression of the reference's champion TCN
  * predictor (`predictor_plugins/predictor_plugin_tcn.py:87-140`,
  * architecture from Bai, Kolter & Koltun 2018). The input row is a lag
  * window (the assembled features vector read as a time sequence); the
  * network is a stack of residual blocks, block b applying a causal
  * convolution with dilation 2^b (receptive field grows exponentially
  * with depth), tanh activation, and an identity skip (1×1 projection on
  * the channel-expanding first block); a global average pool over time
  * feeds a linear output. Weight sharing across time is the point: a
  * pattern detector learned once applies at every window position,
  * which a dense head must re-learn per position.
  *
  * Re-expression boundaries (documented, not hidden): one convolution
  * per residual block (the reference stacks two — equivalent receptive
  * field via one more block), no dropout/LayerNorm (full-batch exact
  * gradients don't need the stochastic regularizers; the reference
  * trains minibatch Adam); the conv activation routes through
  * `TcnConfig.activation` (tanh default — the zoo's bounded-gradient
  * convention, bit-for-bit the former path — with relu/elu options
  * matching the reference conv family's defaults).
  *
  * Training is the same DISTRIBUTED full-batch pattern as
  * [[MlpRegressor]]: per epoch one `treeAggregate` computes the exact
  * MSE gradient (forward + backprop per row, partials merged tree-wise),
  * the driver applies a momentum update, new weights broadcast. Per-epoch
  * cost is one pass over the cached rows; nothing data-proportional ever
  * concentrates on the driver. Inputs are standardized GLOBALLY (one
  * scalar mean/std over every window position — per-position stats would
  * break the translation invariance the convolution assumes); the label
  * by its own moments; scaling folds into the model so `predict` takes
  * raw features.
  */
// Serializable: fit's row-gradient helper is a local def (it closes over
// the layer geometry), which scalac lifts onto this object — Spark task
// closures referencing it then serialize the (stateless) object itself.
object TcnRegressor extends Serializable {

  /** `blocks` residual blocks of `channels` filters, kernel width
    * `kernel`, dilation 2^b in block b. `activation` routes the conv
    * nonlinearity — tanh (the zoo default, bit-for-bit the former
    * path), relu (the reference conv family's default,
    * `predictor_plugin_cnn.py:27`), or elu.
    */
  case class TcnConfig(channels: Int = 4, kernel: Int = 3, blocks: Int = 2,
      epochs: Int = 200, lr: Double = 0.1, momentum: Double = 0.9,
      seed: Long = 42L, activation: String = "tanh")

  /** Fitted model. Parameter layout per block b:
    * `convW(b)` row-major [out-channel][in-channel][tap] (in-channels = 1
    * for block 0, `channels` after), `convB(b)` per-out-channel bias;
    * `skipP` the 1×1 input projection of block 0 (empty when channels
    * == 1, where the skip is the identity); `headW`/`headB` the linear
    * readout over the pooled channels.
    */
  class TcnRegressionModel(
      override val uid: String,
      val channels: Int,
      val kernel: Int,
      val blocks: Int,
      val convW: Array[Array[Double]],
      val convB: Array[Array[Double]],
      val skipP: Array[Double],
      val headW: Array[Double],
      val headB: Double,
      val seqLen: Int,
      val featMean: Double,
      val featStd: Double,
      val labelMean: Double,
      val labelStd: Double,
      val activation: String = "tanh")
    extends PredictionModel[Vector, TcnRegressionModel] {

    override def numFeatures: Int = seqLen

    override def predict(features: Vector): Double = {
      val t = seqLen
      val x = new Array[Double](t)
      var i = 0
      while (i < t) { x(i) = (features(i) - featMean) / featStd; i += 1 }
      val out = forward(x, channels, kernel, blocks, convW, convB, skipP,
        headW, headB, null, act = activation)
      out * labelStd + labelMean
    }

    override def copy(extra: ParamMap): TcnRegressionModel = copyValues(
      new TcnRegressionModel(uid, channels, kernel, blocks, convW, convB,
        skipP, headW, headB, seqLen, featMean, featStd, labelMean, labelStd,
        activation),
      extra)

    override def toString: String =
      s"TcnRegressionModel(uid=$uid, channels=$channels, kernel=$kernel, blocks=$blocks, T=$seqLen)"
  }

  /** Shared forward pass. When `keep` is non-null it receives the
    * per-block pre-skip activations and block outputs for backprop:
    * keep(2b) = tanh activations of block b (T×C row-major),
    * keep(2b+1) = block output. Returns the scalar prediction (in
    * standardized space).
    *
    * `mask` (null = off) is the MC-dropout hook: a multiplier applied
    * to each tanh activation BEFORE the residual add, indexed by
    * (block, position·C + channel) — the per-hidden-unit dropout site,
    * matching the reference's dropout-on-hidden-representations
    * placement (`predictor_plugin_tcn.py`: SpatialDropout after each
    * conv block). Training always passes null.
    */
  private def forward(x: Array[Double], c: Int, k: Int, blocks: Int,
      convW: Array[Array[Double]], convB: Array[Array[Double]],
      skipP: Array[Double], headW: Array[Double], headB: Double,
      keep: Array[Array[Double]],
      mask: (Int, Int) => Double = null,
      act: String = "tanh"): Double = {
    val relu = act == "relu"
    val elu = act == "elu"
    val t = x.length
    var prev: Array[Double] = null // T×C row-major after block 0
    var b = 0
    while (b < blocks) {
      val dil = 1 << b
      val cin = if (b == 0) 1 else c
      val w = convW(b); val bias = convB(b)
      val out = new Array[Double](t * c)
      val actArr = new Array[Double](t * c)
      var ti = 0
      while (ti < t) {
        var co = 0
        while (co < c) {
          var z = bias(co)
          var j = 0
          while (j < k) {
            val src = ti - j * dil
            if (src >= 0) {
              if (b == 0) z += w(co * k + j) * x(src)
              else {
                var ci = 0
                while (ci < cin) {
                  z += w((co * cin + ci) * k + j) * prev(src * c + ci)
                  ci += 1
                }
              }
            }
            j += 1
          }
          val a0 =
            if (relu) { if (z > 0) z else 0.0 }
            else if (elu) { if (z > 0) z else math.exp(z) - 1.0 }
            else math.tanh(z)
          val a = if (mask != null) a0 * mask(b, ti * c + co) else a0
          actArr(ti * c + co) = a
          val skip =
            if (b == 0) { if (c == 1) x(ti) else skipP(co) * x(ti) }
            else prev(ti * c + co)
          out(ti * c + co) = skip + a
          co += 1
        }
        ti += 1
      }
      if (keep != null) { keep(2 * b) = actArr; keep(2 * b + 1) = out }
      prev = out
      b += 1
    }
    // global average pool + linear head
    var y = headB
    var co = 0
    while (co < c) {
      var s = 0.0
      var ti = 0
      while (ti < t) { s += prev(ti * c + co); ti += 1 }
      y += headW(co) * (s / t)
      co += 1
    }
    y
  }

  /** MC-dropout bridge for [[graft.ml.McDropout]]: the shared forward
    * with a per-unit mask, on a pre-standardized window. Returns the
    * STANDARDIZED-space prediction (the caller denormalizes).
    */
  private[ml] def forwardMasked(x: Array[Double], c: Int, k: Int, blocks: Int,
      convW: Array[Array[Double]], convB: Array[Array[Double]],
      skipP: Array[Double], headW: Array[Double], headB: Double,
      mask: (Int, Int) => Double, act: String = "tanh"): Double =
    forward(x, c, k, blocks, convW, convB, skipP, headW, headB, null, mask, act)

  /** Fit on an assembled frame (featuresCol: MLlib Vector = the lag
    * window read as a sequence, labelCol numeric) — the
    * `fitPerHorizonWith` callback contract.
    *
    * `dropout` > 0 enables TRAIN-TIME dropout at BOTH reference
    * placements (`predictor_plugin_tcn.py:112,126` SpatialDropout1D
    * inside each block; `:198` head `Dropout`): per EPOCH, one
    * inverted-dropout mask per (block, channel) applied to the block's
    * tanh activation before the residual add (spatial = shared across
    * time steps, exactly SpatialDropout1D), plus one per pooled channel
    * applied by masking `headW`. All masks come from the McDropout
    * counter hash, so fits are deterministic and the `dropout = 0` path
    * stays the original code bit-for-bit; the residual skip is never
    * masked (identity paths carry gradient past dropped units, the
    * He et al. residual contract). `callbacks` (M11): epoch-end
    * training control fed by the loss accumulated in the same gradient
    * pass.
    */
  def fit(df: DataFrame, labelCol: String, conf: TcnConfig = TcnConfig(),
      featuresCol: String = "features", dropout: Double = 0.0,
      callbacks: Seq[Callbacks.TrainingCallback] = Nil,
      opt: Optimizer.OptConfig = Optimizer.FullBatchGd): TcnRegressionModel = {
    val c = conf.channels; val k = conf.kernel; val blocks = conf.blocks
    val act = conf.activation
    require(c > 0 && k > 0 && blocks > 0, s"TcnRegressor.fit: bad config $conf")
    require(Set("tanh", "relu", "elu").contains(act),
      s"TcnRegressor.fit: unknown activation '$act' (tanh | relu | elu)")
    require(dropout >= 0.0 && dropout < 1.0,
      s"TcnRegressor.fit: dropout must be in [0, 1), got $dropout")
    val sc = df.sparkSession.sparkContext
    val data = df.select(col(featuresCol), col(labelCol).cast("double"))
      .rdd.map(r => (r.getAs[Vector](0), r.getDouble(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val head = data.take(1)
      require(head.nonEmpty, "TcnRegressor.fit: empty training set")
      val t = head(0)._1.size
      // global standardization: one scalar mean/std over all positions
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
      require(n > 0, "TcnRegressor.fit: empty training set")
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

      // flat parameter vector: [W0|b0|P?|W1|b1|...|headW|headB]
      val wSize = Array.tabulate(blocks)(b => (if (b == 0) 1 else c) * c * k)
      val wOff = new Array[Int](blocks)
      val bOff = new Array[Int](blocks)
      var off = 0
      var b = 0
      while (b < blocks) {
        wOff(b) = off; off += wSize(b)
        bOff(b) = off; off += c
        b += 1
      }
      val pOff = off
      val hasProj = c != 1
      if (hasProj) off += c
      val hOff = off; off += c
      val hbOff = off; off += 1
      val nW = off
      val rnd = new java.util.Random(conf.seed)
      val weights = new Array[Double](nW)
      b = 0
      while (b < blocks) {
        val fanIn = (if (b == 0) 1 else c) * k
        val scale = math.sqrt(1.0 / fanIn)
        var i = wOff(b)
        while (i < wOff(b) + wSize(b)) { weights(i) = rnd.nextGaussian() * scale; i += 1 }
        b += 1
      }
      if (hasProj) {
        var i = pOff
        while (i < pOff + c) { weights(i) = rnd.nextGaussian(); i += 1 }
      }
      var i = hOff
      while (i < hOff + c) { weights(i) = rnd.nextGaussian() * math.sqrt(1.0 / c); i += 1 }
      val velocity = new Array[Double](nW)

      // Row-local forward+backward shared by BOTH training paths:
      // accumulates the row's gradient into g(0 until nW) and its loss
      // into g(nW). The full-batch aggregate hands its accumulator in
      // directly (per-slot op order unchanged ⇒ that path stays
      // bit-for-bit); the mini-batch loop hands a fresh scratch.
      def rowGradInto(wFlat: Array[Double], mk: Array[Double],
          mkB: Array[Array[Double]], xv: Vector, y: Double,
          g: Array[Double]): Unit = {
            val convW = Array.tabulate(blocks)(b =>
              java.util.Arrays.copyOfRange(wFlat, wOff(b), wOff(b) + wSize(b)))
            val convB = Array.tabulate(blocks)(b =>
              java.util.Arrays.copyOfRange(wFlat, bOff(b), bOff(b) + c))
            val skipP =
              if (hasProj) java.util.Arrays.copyOfRange(wFlat, pOff, pOff + c)
              else Array.empty[Double]
            val headW = java.util.Arrays.copyOfRange(wFlat, hOff, hOff + c)
            val headB = wFlat(hbOff)
            // masked head = dropout on the pooled representation: the
            // forward uses headW·m, d/dheadW gains the same m factor
            val headWm =
              if (mk == null) headW
              else Array.tabulate(c)(i => headW(i) * mk(i))
            val x = new Array[Double](t)
            var j = 0
            while (j < t) { x(j) = (xv(j) - fMean) / fStd; j += 1 }
            val keep = new Array[Array[Double]](2 * blocks)
            val out = forward(x, c, k, blocks, convW, convB, skipP, headWm,
              headB, keep,
              mask = if (mkB == null) null else (b, idx) => mkB(b)(idx % c),
              act = act)
            val err = out - (y - yMean) / yStd
            g(nW) += 0.5 * err * err // epoch loss accumulator
            // head gradients; delta on the final block output = err·w/T
            val lastOut = keep(2 * blocks - 1)
            var co = 0
            while (co < c) {
              var s = 0.0
              var ti = 0
              while (ti < t) { s += lastOut(ti * c + co); ti += 1 }
              g(hOff + co) += err * (s / t) * (if (mk == null) 1.0 else mk(co))
              co += 1
            }
            g(hbOff) += err
            var delta = new Array[Double](t * c)
            var ti = 0
            while (ti < t) {
              var co2 = 0
              while (co2 < c) {
                delta(ti * c + co2) = err * headWm(co2) / t
                co2 += 1
              }
              ti += 1
            }
            // activation dispatch hoisted out of the per-element hot
            // loop (the forward does the same at method scope)
            val bpRelu = act == "relu"
            val bpElu = act == "elu"
            // backprop through blocks (reverse)
            var b2 = blocks - 1
            while (b2 >= 0) {
              val dil = 1 << b2
              val cin = if (b2 == 0) 1 else c
              val actMap = keep(2 * b2)
              val prevOut: Array[Double] = if (b2 == 0) null else keep(2 * b2 - 1)
              val w = convW(b2)
              val dPrev = new Array[Double](t * (if (b2 == 0) 1 else c))
              var ti2 = 0
              while (ti2 < t) {
                var co3 = 0
                while (co3 < c) {
                  val d = delta(ti2 * c + co3)
                  if (d != 0.0) {
                    val a = actMap(ti2 * c + co3)
                    // masked activation a = m·F(z) ⇒ da/dz = m·F'(z) with
                    // F' recovered from the activation value (tanh' =
                    // 1−a², relu' = [a>0], elu' = if a>0 1 else a+1); a
                    // dropped channel (m = 0) passes no conv-path gradient
                    // (the skip path below is untouched — residuals are
                    // never masked)
                    def fp(raw: Double): Double =
                      if (bpRelu) { if (raw > 0) 1.0 else 0.0 }
                      else if (bpElu) { if (raw > 0) 1.0 else raw + 1.0 }
                      else 1.0 - raw * raw
                    val dz =
                      if (mkB == null) d * fp(a)
                      else {
                        val m = mkB(b2)(co3)
                        if (m == 0.0) 0.0
                        else d * m * fp(a / m)
                      }
                    g(bOff(b2) + co3) += dz
                    var j2 = 0
                    while (j2 < k) {
                      val src = ti2 - j2 * dil
                      if (src >= 0) {
                        if (b2 == 0) {
                          g(wOff(b2) + co3 * k + j2) += dz * x(src)
                        } else {
                          var ci = 0
                          while (ci < cin) {
                            g(wOff(b2) + (co3 * cin + ci) * k + j2) +=
                              dz * prevOut(src * c + ci)
                            dPrev(src * c + ci) +=
                              dz * w((co3 * cin + ci) * k + j2)
                            ci += 1
                          }
                        }
                      }
                      j2 += 1
                    }
                    // skip path
                    if (b2 == 0) {
                      if (hasProj) g(pOff + co3) += d * x(ti2)
                    } else {
                      dPrev(ti2 * c + co3) += d
                    }
                  }
                  co3 += 1
                }
                ti2 += 1
              }
              if (b2 > 0) delta = dPrev
              b2 -= 1
            }
      }

      // per-step inverted-dropout masks (null = off): head input
      // (layer 0) and one spatial mask per block channel (layer 1+b);
      // stepId = epoch on the full-batch path, epoch·B + b on the
      // mini-batch path (Keras per-minibatch resampling)
      def mkMask(stepId: Long): (Array[Double], Array[Array[Double]]) =
        if (dropout == 0.0) (null, null)
        else (
          Array.tabulate(c)(i =>
            if (McDropout.uniform(conf.seed, stepId, -1, 0, i) < dropout) 0.0
            else 1.0 / (1.0 - dropout)),
          Array.tabulate(blocks)(b => Array.tabulate(c)(i =>
            if (McDropout.uniform(conf.seed, stepId, -1, 1 + b, i) < dropout) 0.0
            else 1.0 / (1.0 - dropout))))

      var lrCur = conf.lr
      var stopped = false
      var epoch = 0
      if (!opt.isFullBatchGd) {
        // optional mini-batch Adam/AdamW/SGD face — see Optimizer
        Optimizer.miniBatchLoop(sc, data, weights, opt, conf.epochs,
          conf.lr, conf.momentum, n, callbacks)(mkMask) {
          case (w, (mk, mkB), xv, y, scratch) =>
            rowGradInto(w, mk, mkB, xv, y, scratch)
        }
      } else
      while (epoch < conf.epochs && !stopped) {
        val (mk, mkB) = mkMask(epoch.toLong)
        val bcW = sc.broadcast(weights.clone())
        val grad = OrderedAgg(data, new Array[Double](nW + 1))(
          seqOp = { case (g, (xv, y)) =>
            rowGradInto(bcW.value, mk, mkB, xv, y, g); g
          },
          combOp = { (a2, b3) =>
            var k2 = 0
            while (k2 < nW + 1) { a2(k2) += b3(k2); k2 += 1 }
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
            cb.onEpochEnd(epoch, loss, lrCur, weights) match {
              case Callbacks.Stop      => stopped = true
              case Callbacks.SetLr(nl) => lrCur = nl
              case Callbacks.Continue  => ()
            }
          }
        }
        epoch += 1
      }

      new TcnRegressionModel(
        s"tcn_${java.util.UUID.randomUUID().toString.take(8)}",
        c, k, blocks,
        Array.tabulate(blocks)(b =>
          java.util.Arrays.copyOfRange(weights, wOff(b), wOff(b) + wSize(b))),
        Array.tabulate(blocks)(b =>
          java.util.Arrays.copyOfRange(weights, bOff(b), bOff(b) + c)),
        if (hasProj) java.util.Arrays.copyOfRange(weights, pOff, pOff + c)
        else Array.empty[Double],
        java.util.Arrays.copyOfRange(weights, hOff, hOff + c),
        weights(hbOff),
        t, fMean, fStd, yMean, yStd, act)
    } finally { data.unpersist(blocking = false); () }
  }

  /** S11 artifact sink: architecture + weights as one parquet row. */
  def save(model: TcnRegressionModel, path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    Seq((model.uid, model.channels, model.kernel, model.blocks,
        model.convW.map(_.toSeq).toSeq, model.convB.map(_.toSeq).toSeq,
        model.skipP.toSeq, model.headW.toSeq, model.headB, model.seqLen,
        model.featMean, model.featStd, model.labelMean, model.labelStd,
        model.activation))
      .toDF("uid", "channels", "kernel", "blocks", "conv_w", "conv_b",
        "skip_p", "head_w", "head_b", "seq_len",
        "feat_mean", "feat_std", "label_mean", "label_std", "activation")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** S11 artifact source. Artifacts written before the activation
    * option lack the column; they were tanh (the S11 back-compat
    * contract, as MlpRegressor). */
  def load(spark: SparkSession, path: String): TcnRegressionModel = {
    val r = spark.read.parquet(path).head()
    val act =
      if (r.schema.fieldNames.contains("activation")) r.getAs[String]("activation")
      else "tanh"
    new TcnRegressionModel(
      r.getAs[String]("uid"), r.getAs[Int]("channels"), r.getAs[Int]("kernel"),
      r.getAs[Int]("blocks"),
      r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("conv_w").map(_.toArray).toArray,
      r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("conv_b").map(_.toArray).toArray,
      r.getAs[scala.collection.Seq[Double]]("skip_p").toArray,
      r.getAs[scala.collection.Seq[Double]]("head_w").toArray,
      r.getAs[Double]("head_b"), r.getAs[Int]("seq_len"),
      r.getAs[Double]("feat_mean"), r.getAs[Double]("feat_std"),
      r.getAs[Double]("label_mean"), r.getAs[Double]("label_std"), act)
  }
}
