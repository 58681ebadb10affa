package graft.ml

import org.apache.spark.ml.PredictionModel
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** M8 CNN head: a strided causal Conv1D regressor — the Spark-native
  * re-expression of the reference's CNN predictor family (the zoo's
  * largest: `predictor_plugins/predictor_plugin_cnn.py:82-100` and its
  * six `cnn_*` siblings), whose trunk is a stack of `Conv1D(kernel=3,
  * strides=2, padding="causal")` layers with geometrically decreasing
  * filter counts (`sizes = [initial] + [max(8, initial // div**i)]`,
  * `:87-89`). Stride-2 downsampling halves the sequence per layer, so
  * depth buys exponentially growing receptive field at *decreasing*
  * per-layer cost — the hierarchical-feature inductive bias that
  * distinguishes this family from the TCN's dilation (which keeps full
  * resolution at every level).
  *
  * Re-expression boundaries (documented, not hidden): one shared trunk
  * + pooled linear readout instead of per-horizon conv branches (the
  * per-horizon structure lives in [[Forecaster.fitPerHorizonCnn]] —
  * one net per horizon, the zoo's uniform contract); the reference's
  * BiLSTM readout is covered by the zoo's dedicated [[LstmRegressor]]
  * head; its DenseFlipout Bayesian output becomes the zoo-wide
  * MC-dropout stochastic forward ([[McDropout]]). The conv activation
  * routes through `CnnConfig.activation`: tanh (the zoo's
  * bounded-gradient default, bit-for-bit the former path), relu (the
  * reference family's default, `predictor_plugin_cnn.py:27,66`), or
  * elu — each pinned by its own finite-difference gradient check.
  *
  * Training is the zoo's DISTRIBUTED full-batch pattern: per epoch one
  * `treeAggregate` ([[OrderedAgg]] — partition-id-ordered merges, so
  * fits are bitwise reproducible) computes the exact MSE gradient, the
  * driver applies a momentum update, new weights broadcast. Nothing
  * data-proportional ever concentrates on the driver; per-epoch cost is
  * one pass over the cached rows.
  */
// Serializable: fit's row-gradient helper is a local def lifted onto this
// object; Spark task closures referencing it serialize the stateless object.
object CnnRegressor extends Serializable {

  /** `layers` strided causal conv layers; layer i has
    * `max(minChannels, channels / divisor^i)` filters (the reference's
    * size plan with a configurable floor), kernel width `kernel`,
    * stride `stride`. `activation` routes the conv nonlinearity —
    * `tanh` (the zoo default, bit-for-bit the former path), `relu`
    * (the reference CNN family's default,
    * `predictor_plugin_cnn.py:27,66`), or `elu`. */
  case class CnnConfig(channels: Int = 8, kernel: Int = 3, layers: Int = 2,
      divisor: Int = 2, minChannels: Int = 2, stride: Int = 2,
      epochs: Int = 200, lr: Double = 0.1, momentum: Double = 0.9,
      seed: Long = 42L, activation: String = "tanh") {
    /** Per-layer filter counts (`predictor_plugin_cnn.py:87-89`). */
    def sizes: Array[Int] = {
      var s = channels
      Array.tabulate(layers) { i =>
        if (i == 0) channels
        else { s = math.max(minChannels, s / divisor); s }
      }
    }
  }

  /** Output length of a stride-`s` causal conv over `n` steps
    * (Keras `padding="causal"`: ceil(n / s)). */
  private def outLen(n: Int, s: Int): Int = (n + s - 1) / s

  /** Per-layer input lengths: lens(0) = T, lens(l+1) = ceil(lens(l)/s). */
  private def lensOf(t: Int, layers: Int, stride: Int): Array[Int] = {
    val lens = new Array[Int](layers + 1)
    lens(0) = t
    var l = 0
    while (l < layers) { lens(l + 1) = outLen(lens(l), stride); l += 1 }
    lens
  }

  /** Fitted model. `convW(l)` row-major [out-ch][in-ch][tap],
    * `convB(l)` per-out-channel; `headW`/`headB` the linear readout over
    * the final layer's time-pooled channels. */
  class CnnRegressionModel(
      override val uid: String,
      val kernel: Int,
      val stride: Int,
      val sizes: Array[Int],
      val convW: Array[Array[Double]],
      val convB: Array[Array[Double]],
      val headW: Array[Double],
      val headB: Double,
      val seqLen: Int,
      val featMean: Double,
      val featStd: Double,
      val labelMean: Double,
      val labelStd: Double,
      val activation: String = "tanh")
    extends PredictionModel[Vector, CnnRegressionModel] {

    override def numFeatures: Int = seqLen

    override def predict(features: Vector): Double = {
      val x = new Array[Double](seqLen)
      var i = 0
      while (i < seqLen) { x(i) = (features(i) - featMean) / featStd; i += 1 }
      val out = forward(x, kernel, stride, sizes, convW, convB, headW, headB,
        null, act = activation)
      out * labelStd + labelMean
    }

    override def copy(extra: ParamMap): CnnRegressionModel = copyValues(
      new CnnRegressionModel(uid, kernel, stride, sizes, convW, convB,
        headW, headB, seqLen, featMean, featStd, labelMean, labelStd,
        activation),
      extra)

    override def toString: String =
      s"CnnRegressionModel(uid=$uid, sizes=${sizes.mkString("[", ",", "]")}, k=$kernel, s=$stride, T=$seqLen)"
  }

  /** Shared forward pass. When `keep` is non-null it receives each
    * layer's (masked) activation map for backprop: keep(l) = layer-l
    * output, T_{l+1}×C_l row-major. `mask` (null = off) is the
    * MC-dropout hook: a multiplier on each tanh activation, indexed by
    * (layer, position·C + channel). Returns the standardized-space
    * prediction. */
  private def forward(x: Array[Double], k: Int, stride: Int,
      sizes: Array[Int], convW: Array[Array[Double]],
      convB: Array[Array[Double]], headW: Array[Double], headB: Double,
      keep: Array[Array[Double]],
      mask: (Int, Int) => Double = null,
      act: String = "tanh"): Double = {
    val relu = act == "relu"
    val elu = act == "elu"
    val layers = sizes.length
    val lens = lensOf(x.length, layers, stride)
    var prev = x
    var l = 0
    while (l < layers) {
      val cin = if (l == 0) 1 else sizes(l - 1)
      val cout = sizes(l)
      val tout = lens(l + 1)
      val w = convW(l); val bias = convB(l)
      val out = new Array[Double](tout * cout)
      var ti = 0
      while (ti < tout) {
        var co = 0
        while (co < cout) {
          var z = bias(co)
          var j = 0
          while (j < k) {
            val src = ti * stride - j
            if (src >= 0) {
              var ci = 0
              while (ci < cin) {
                z += w((co * cin + ci) * k + j) * prev(src * cin + ci)
                ci += 1
              }
            }
            j += 1
          }
          val a0 =
            if (relu) { if (z > 0) z else 0.0 }
            else if (elu) { if (z > 0) z else math.exp(z) - 1.0 }
            else math.tanh(z)
          out(ti * cout + co) =
            if (mask != null) a0 * mask(l, ti * cout + co) else a0
          co += 1
        }
        ti += 1
      }
      if (keep != null) keep(l) = out
      prev = out
      l += 1
    }
    // global average pool over the final layer's time axis + linear head
    val cL = sizes(layers - 1)
    val tL = lens(layers)
    var y = headB
    var co = 0
    while (co < cL) {
      var s = 0.0
      var ti = 0
      while (ti < tL) { s += prev(ti * cL + co); ti += 1 }
      y += headW(co) * (s / tL)
      co += 1
    }
    y
  }

  /** MC-dropout bridge for [[graft.ml.McDropout]]: the shared forward
    * with a per-unit mask on a pre-standardized window; returns the
    * STANDARDIZED-space prediction. */
  private[ml] def forwardMasked(x: Array[Double], k: Int, stride: Int,
      sizes: Array[Int], convW: Array[Array[Double]],
      convB: Array[Array[Double]], headW: Array[Double], headB: Double,
      mask: (Int, Int) => Double, act: String = "tanh"): Double =
    forward(x, k, stride, sizes, convW, convB, headW, headB, null, mask, act)

  /** Fit on an assembled frame (featuresCol: MLlib Vector = the lag
    * window read as a sequence, labelCol numeric) — the
    * `fitPerHorizonWith` callback contract.
    *
    * `dropout` > 0 enables train-time spatial dropout: per epoch one
    * inverted-dropout mask per (layer, channel) shared across time
    * steps, plus one per pooled channel on the head (the zoo's uniform
    * placements; the reference CNN itself regularizes via L2 + its
    * Bayesian output layer — kernel L2 folds into weight decay, which
    * momentum-GD approximates with `lr`-scaled shrinkage, and the
    * Bayesian part is served by MC-dropout instead). Masks come from
    * the [[McDropout]] counter hash, so fits stay deterministic and the
    * `dropout = 0` path is the original code bit-for-bit. `callbacks`
    * (M11): epoch-end training control fed by the loss accumulated in
    * the same gradient pass. */
  def fit(df: DataFrame, labelCol: String, conf: CnnConfig = CnnConfig(),
      featuresCol: String = "features", dropout: Double = 0.0,
      callbacks: Seq[Callbacks.TrainingCallback] = Nil,
      opt: Optimizer.OptConfig = Optimizer.FullBatchGd,
      // val-loss monitor set (same shape as df) — mini-batch path only;
      // the full-batch path's callbacks keep seeing train loss
      valData: Option[DataFrame] = None): CnnRegressionModel = {
    val k = conf.kernel
    val stride = conf.stride
    val sizes = conf.sizes
    val act = conf.activation
    val layers = sizes.length
    require(layers > 0 && k > 0 && stride > 0 && sizes.forall(_ > 0),
      s"CnnRegressor.fit: bad config $conf")
    require(Set("tanh", "relu", "elu").contains(act),
      s"CnnRegressor.fit: unknown activation '$act' (tanh | relu | elu)")
    require(dropout >= 0.0 && dropout < 1.0,
      s"CnnRegressor.fit: dropout must be in [0, 1), got $dropout")
    val sc = df.sparkSession.sparkContext
    val data = df.select(col(featuresCol), col(labelCol).cast("double"))
      .rdd.map(r => (r.getAs[Vector](0), r.getDouble(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val head = data.take(1)
      require(head.nonEmpty, "CnnRegressor.fit: empty training set")
      val t = head(0)._1.size
      val lens = lensOf(t, layers, stride)
      // global standardization (one scalar mean/std over all positions —
      // per-position stats would break the conv's translation invariance)
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
      require(n > 0, "CnnRegressor.fit: empty training set")
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

      // flat parameter vector: [W0|b0|W1|b1|...|headW|headB]
      val wSize = Array.tabulate(layers)(l =>
        (if (l == 0) 1 else sizes(l - 1)) * sizes(l) * k)
      val wOff = new Array[Int](layers)
      val bOff = new Array[Int](layers)
      var off = 0
      var l = 0
      while (l < layers) {
        wOff(l) = off; off += wSize(l)
        bOff(l) = off; off += sizes(l)
        l += 1
      }
      val cL = sizes(layers - 1)
      val hOff = off; off += cL
      val hbOff = off; off += 1
      val nW = off
      val rnd = new java.util.Random(conf.seed)
      val weights = new Array[Double](nW)
      l = 0
      while (l < layers) {
        val fanIn = (if (l == 0) 1 else sizes(l - 1)) * k
        val scale = math.sqrt(1.0 / fanIn)
        var i = wOff(l)
        while (i < wOff(l) + wSize(l)) { weights(i) = rnd.nextGaussian() * scale; i += 1 }
        l += 1
      }
      var i = hOff
      while (i < hOff + cL) { weights(i) = rnd.nextGaussian() * math.sqrt(1.0 / cL); i += 1 }
      val velocity = new Array[Double](nW)

      // Row-local forward+backward shared by BOTH training paths:
      // accumulates the row's gradient into g(0 until nW) and its loss
      // into g(nW); the full-batch aggregate hands its accumulator in
      // directly (per-slot op order unchanged, bit-for-bit), the
      // mini-batch loop a fresh scratch.
      def rowGradInto(wFlat: Array[Double], mk: Array[Double],
          mkL: Array[Array[Double]], xv: Vector, y: Double,
          g: Array[Double]): Unit = {
            val convW = Array.tabulate(layers)(l =>
              java.util.Arrays.copyOfRange(wFlat, wOff(l), wOff(l) + wSize(l)))
            val convB = Array.tabulate(layers)(l =>
              java.util.Arrays.copyOfRange(wFlat, bOff(l), bOff(l) + sizes(l)))
            val headW = java.util.Arrays.copyOfRange(wFlat, hOff, hOff + cL)
            val headB = wFlat(hbOff)
            val headWm =
              if (mk == null) headW
              else Array.tabulate(cL)(i => headW(i) * mk(i))
            val x = new Array[Double](t)
            var j = 0
            while (j < t) { x(j) = (xv(j) - fMean) / fStd; j += 1 }
            val keep = new Array[Array[Double]](layers)
            val out = forward(x, k, stride, sizes, convW, convB, headWm,
              headB, keep,
              mask = if (mkL == null) null
              else (l, idx) => mkL(l)(idx % sizes(l)),
              act = act)
            val err = out - (y - yMean) / yStd
            g(nW) += 0.5 * err * err // epoch loss accumulator
            val tL = lens(layers)
            val lastOut = keep(layers - 1)
            var co = 0
            while (co < cL) {
              var s = 0.0
              var ti = 0
              while (ti < tL) { s += lastOut(ti * cL + co); ti += 1 }
              g(hOff + co) += err * (s / tL) * (if (mk == null) 1.0 else mk(co))
              co += 1
            }
            g(hbOff) += err
            var delta = new Array[Double](tL * cL)
            var ti = 0
            while (ti < tL) {
              var co2 = 0
              while (co2 < cL) {
                delta(ti * cL + co2) = err * headWm(co2) / tL
                co2 += 1
              }
              ti += 1
            }
            // activation dispatch hoisted out of the per-element hot
            // loop (the forward does the same at method scope)
            val bpRelu = act == "relu"
            val bpElu = act == "elu"
            // backprop through layers (reverse)
            var l2 = layers - 1
            while (l2 >= 0) {
              val cin = if (l2 == 0) 1 else sizes(l2 - 1)
              val cout = sizes(l2)
              val tout = lens(l2 + 1)
              val in: Array[Double] = if (l2 == 0) x else keep(l2 - 1)
              val actMap = keep(l2)
              val w = convW(l2)
              val dPrev = new Array[Double](lens(l2) * cin)
              var ti2 = 0
              while (ti2 < tout) {
                var co3 = 0
                while (co3 < cout) {
                  val d = delta(ti2 * cout + co3)
                  if (d != 0.0) {
                    val a = actMap(ti2 * cout + co3)
                    // masked activation a = m·F(z) ⇒ da/dz = m·F'(z);
                    // F' recovered from the activation value: tanh' =
                    // 1−a², relu' = [a>0], elu' = if a>0 1 else a+1
                    def fp(raw: Double): Double =
                      if (bpRelu) { if (raw > 0) 1.0 else 0.0 }
                      else if (bpElu) { if (raw > 0) 1.0 else raw + 1.0 }
                      else 1.0 - raw * raw
                    val dz =
                      if (mkL == null) d * fp(a)
                      else {
                        val m = mkL(l2)(co3)
                        if (m == 0.0) 0.0
                        else d * m * fp(a / m)
                      }
                    if (dz != 0.0) {
                      g(bOff(l2) + co3) += dz
                      var j2 = 0
                      while (j2 < k) {
                        val src = ti2 * stride - j2
                        if (src >= 0) {
                          var ci = 0
                          while (ci < cin) {
                            g(wOff(l2) + (co3 * cin + ci) * k + j2) +=
                              dz * in(src * cin + ci)
                            if (l2 > 0)
                              dPrev(src * cin + ci) +=
                                dz * w((co3 * cin + ci) * k + j2)
                            ci += 1
                          }
                        }
                        j2 += 1
                      }
                    }
                  }
                  co3 += 1
                }
                ti2 += 1
              }
              if (l2 > 0) delta = dPrev
              l2 -= 1
            }
      }

      // per-step inverted-dropout masks (null = off): layer 0 = head
      // channels, layer 1+l = spatial mask per conv channel; stepId =
      // epoch (full-batch) or epoch*B + b (mini-batch, Keras semantics)
      def mkMask(stepId: Long): (Array[Double], Array[Array[Double]]) =
        if (dropout == 0.0) (null, null)
        else (
          Array.tabulate(cL)(i =>
            if (McDropout.uniform(conf.seed, stepId, -1, 0, i) < dropout) 0.0
            else 1.0 / (1.0 - dropout)),
          Array.tabulate(layers)(l => Array.tabulate(sizes(l))(i =>
            if (McDropout.uniform(conf.seed, stepId, -1, 1 + l, i) < dropout) 0.0
            else 1.0 / (1.0 - dropout))))

      var lrCur = conf.lr
      var stopped = false
      var epoch = 0
      if (!opt.isFullBatchGd) {
        // optional mini-batch Adam/AdamW/SGD face — see Optimizer
        val valRdd = Optimizer.valRddOf(valData, featuresCol, labelCol)
        try Optimizer.miniBatchLoop(sc, data, weights, opt, conf.epochs,
          conf.lr, conf.momentum, n, callbacks, valRdd,
          valMasks = (null: Array[Double], null: Array[Array[Double]]))(mkMask) {
          case (w, (mk, mkL), xv, y, scratch) =>
            rowGradInto(w, mk, mkL, xv, y, scratch)
        } finally valRdd.foreach(_._1.unpersist())
      } else
      while (epoch < conf.epochs && !stopped) {
        val (mk, mkL) = mkMask(epoch.toLong)
        val bcW = sc.broadcast(weights.clone())
        val grad = OrderedAgg(data, new Array[Double](nW + 1))(
          seqOp = { case (g, (xv, y)) =>
            rowGradInto(bcW.value, mk, mkL, xv, y, g); g
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

      new CnnRegressionModel(
        s"cnn_${java.util.UUID.randomUUID().toString.take(8)}",
        k, stride, sizes,
        Array.tabulate(layers)(l =>
          java.util.Arrays.copyOfRange(weights, wOff(l), wOff(l) + wSize(l))),
        Array.tabulate(layers)(l =>
          java.util.Arrays.copyOfRange(weights, bOff(l), bOff(l) + sizes(l))),
        java.util.Arrays.copyOfRange(weights, hOff, hOff + cL),
        weights(hbOff),
        t, fMean, fStd, yMean, yStd, act)
    } finally { data.unpersist(blocking = false); () }
  }

  /** S11 artifact sink: architecture + weights as one parquet row. */
  def save(model: CnnRegressionModel, path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    Seq((model.uid, model.kernel, model.stride, model.sizes.toSeq,
        model.convW.map(_.toSeq).toSeq, model.convB.map(_.toSeq).toSeq,
        model.headW.toSeq, model.headB, model.seqLen,
        model.featMean, model.featStd, model.labelMean, model.labelStd,
        model.activation))
      .toDF("uid", "kernel", "stride", "sizes", "conv_w", "conv_b",
        "head_w", "head_b", "seq_len",
        "feat_mean", "feat_std", "label_mean", "label_std", "activation")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** S11 artifact source. Artifacts written before the activation
    * option lack the column; they were tanh (the S11 back-compat
    * contract, as MlpRegressor). */
  def load(spark: SparkSession, path: String): CnnRegressionModel = {
    val r = spark.read.parquet(path).head()
    val act =
      if (r.schema.fieldNames.contains("activation")) r.getAs[String]("activation")
      else "tanh"
    new CnnRegressionModel(
      r.getAs[String]("uid"), r.getAs[Int]("kernel"), r.getAs[Int]("stride"),
      r.getAs[scala.collection.Seq[Int]]("sizes").toArray,
      r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("conv_w").map(_.toArray).toArray,
      r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("conv_b").map(_.toArray).toArray,
      r.getAs[scala.collection.Seq[Double]]("head_w").toArray,
      r.getAs[Double]("head_b"), r.getAs[Int]("seq_len"),
      r.getAs[Double]("feat_mean"), r.getAs[Double]("feat_std"),
      r.getAs[Double]("label_mean"), r.getAs[Double]("label_std"), act)
  }
}
