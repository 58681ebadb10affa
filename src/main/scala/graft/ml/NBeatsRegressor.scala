package graft.ml

import org.apache.spark.ml.PredictionModel
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** M8 N-BEATS head: the generic-basis N-BEATS regressor — the
  * Spark-native re-expression of the reference's
  * `predictor_plugins/predictor_plugin_n_beats.py:71-106` (Oreshkin et
  * al. 2020, generic block form): each block runs an FC stack on the
  * running residual, emits a linear BACKCAST (subtracted from the
  * residual so later blocks model what earlier ones missed) and a
  * linear FORECAST (accumulated across blocks); the head reads the
  * accumulated forecast vector. What the doubly-residual structure buys
  * over a plain deep MLP is additive decomposition: each block owns a
  * slice of the signal, which the spec pins by showing the backcast
  * residual SHRINKS block over block on a structured series.
  *
  * Re-expression boundaries (documented like the rest of the zoo): tanh
  * activations (reference default swish), one stack, no L2/dropout on
  * the FC interiors beyond the shared head-dropout scheme, full-batch
  * exact gradients instead of minibatch Adam.
  *
  * Training: the zoo's distributed full-batch pattern — per epoch one
  * `OrderedAgg` gradient pass (partition-id merge order ⇒ bitwise
  * reproducible), loss accumulated in the same pass for M11 callbacks,
  * driver momentum update, weights broadcast. The backprop is verified
  * coordinate-wise against finite differences (`GradCheckSpec`).
  */
// Serializable: fit's row-gradient helper is a local def lifted onto this
// object; Spark task closures referencing it serialize the stateless object.
object NBeatsRegressor extends Serializable {

  /** `blocks` generic blocks, each an FC stack of `layers` tanh layers
    * of width `units`, then linear backcast (input width) + forecast
    * (`units` wide) — `predictor_plugin_n_beats.py:24-26` defaults
    * scaled to the zoo's spec sizes. */
  case class NBeatsConfig(blocks: Int = 2, layers: Int = 2, units: Int = 8,
      epochs: Int = 200, lr: Double = 0.1, momentum: Double = 0.9,
      seed: Long = 42L)

  class NBeatsRegressionModel(
      override val uid: String,
      val conf: NBeatsConfig,
      val weights: Array[Double], // flat, layout of [[offsets]]
      val seqLen: Int,
      val featMean: Double,
      val featStd: Double,
      val labelMean: Double,
      val labelStd: Double)
    extends PredictionModel[Vector, NBeatsRegressionModel] {

    override def numFeatures: Int = seqLen

    override def predict(features: Vector): Double = {
      val x = new Array[Double](seqLen)
      var i = 0
      while (i < seqLen) { x(i) = (features(i) - featMean) / featStd; i += 1 }
      val out = forward(x, conf, seqLen, weights, null, null)
      out * labelStd + labelMean
    }

    override def copy(extra: ParamMap): NBeatsRegressionModel = copyValues(
      new NBeatsRegressionModel(uid, conf, weights, seqLen, featMean,
        featStd, labelMean, labelStd), extra)

    override def toString: String =
      s"NBeatsRegressionModel(uid=$uid, blocks=${conf.blocks}, " +
        s"layers=${conf.layers}, units=${conf.units}, T=$seqLen)"
  }

  /** Flat layout per block: FC W/b per layer (layer 0 is units×t, the
    * rest units×units), then backcast W (t×units) + b (t), then
    * forecast W (units×units) + b (units); after all blocks, head W
    * (units) + b. Returns (total size, per-block FC offsets). */
  private[ml] def nWeights(conf: NBeatsConfig, t: Int): Int = {
    val h = conf.units
    val perBlock = (h * t + h) + (conf.layers - 1) * (h * h + h) +
      (t * h + t) + (h * h + h)
    conf.blocks * perBlock + h + 1
  }

  /** Shared forward. `keepA(b)(l)` receives layer l's tanh output of
    * block b; `keepRes(b)` the residual ENTERING block b — both only
    * when non-null (backprop). `headMask` (null = off) multiplies the
    * accumulated forecast per unit (the zoo's head-dropout placement).
    * Returns the standardized-space prediction. */
  private[ml] def forward(x: Array[Double], conf: NBeatsConfig, t: Int,
      w: Array[Double], keepA: Array[Array[Array[Double]]],
      keepRes: Array[Array[Double]],
      headMask: Array[Double] = null): Double = {
    val h = conf.units
    var res = x.clone()
    val accum = new Array[Double](h)
    var off = 0
    var b = 0
    while (b < conf.blocks) {
      if (keepRes != null) keepRes(b) = res.clone()
      var a = res
      var l = 0
      while (l < conf.layers) {
        val in = if (l == 0) t else h
        val nxt = new Array[Double](h)
        var o = 0
        while (o < h) {
          var z = w(off + h * in + o)
          var k = 0
          while (k < in) { z += w(off + o * in + k) * a(k); k += 1 }
          nxt(o) = math.tanh(z)
          o += 1
        }
        if (keepA != null) keepA(b)(l) = nxt
        off += h * in + h
        a = nxt
        l += 1
      }
      // backcast (linear, t wide): res -= back
      var i = 0
      while (i < t) {
        var z = w(off + t * h + i)
        var k = 0
        while (k < h) { z += w(off + i * h + k) * a(k); k += 1 }
        res(i) -= z
        i += 1
      }
      off += t * h + t
      // forecast (linear, h wide): accum += fore
      var o = 0
      while (o < h) {
        var z = w(off + h * h + o)
        var k = 0
        while (k < h) { z += w(off + o * h + k) * a(k); k += 1 }
        accum(o) += z
        o += 1
      }
      off += h * h + h
      b += 1
    }
    var y = w(off + h) // headB
    var o = 0
    while (o < h) {
      val av = if (headMask != null) accum(o) * headMask(o) else accum(o)
      y += w(off + o) * av
      o += 1
    }
    y
  }

  /** Fit on an assembled frame — the `fitPerHorizonWith` contract.
    * `dropout` masks the accumulated-forecast units feeding the head
    * (per-epoch inverted masks, the zoo scheme); `callbacks` = M11. */
  def fit(df: DataFrame, labelCol: String, conf: NBeatsConfig = NBeatsConfig(),
      featuresCol: String = "features", dropout: Double = 0.0,
      callbacks: Seq[Callbacks.TrainingCallback] = Nil,
      opt: Optimizer.OptConfig = Optimizer.FullBatchGd): NBeatsRegressionModel = {
    require(conf.blocks > 0 && conf.layers > 0 && conf.units > 0,
      s"NBeatsRegressor.fit: bad config $conf")
    require(dropout >= 0.0 && dropout < 1.0,
      s"NBeatsRegressor.fit: dropout must be in [0, 1), got $dropout")
    val sc = df.sparkSession.sparkContext
    val data = df.select(col(featuresCol), col(labelCol).cast("double"))
      .rdd.map(r => (r.getAs[Vector](0), r.getDouble(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val head0 = data.take(1)
      require(head0.nonEmpty, "NBeatsRegressor.fit: empty training set")
      val t = head0(0)._1.size
      val h = conf.units
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
      require(n > 0, "NBeatsRegressor.fit: empty training set")
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

      val nW = nWeights(conf, t)
      val rnd = new java.util.Random(conf.seed)
      val weights = new Array[Double](nW)
      // seeded init: Xavier-ish per matrix, biases zero — walk the layout
      locally {
        var off = 0
        var b = 0
        while (b < conf.blocks) {
          var l = 0
          while (l < conf.layers) {
            val in = if (l == 0) t else h
            val sc0 = math.sqrt(1.0 / in)
            var i = off
            while (i < off + h * in) { weights(i) = rnd.nextGaussian() * sc0; i += 1 }
            off += h * in + h
            l += 1
          }
          val scB = math.sqrt(1.0 / h)
          var i = off
          while (i < off + t * h) { weights(i) = rnd.nextGaussian() * scB; i += 1 }
          off += t * h + t
          i = off
          while (i < off + h * h) { weights(i) = rnd.nextGaussian() * scB; i += 1 }
          off += h * h + h
          b += 1
        }
        var i = off
        while (i < off + h) { weights(i) = rnd.nextGaussian() * math.sqrt(1.0 / h); i += 1 }
      }
      val velocity = new Array[Double](nW)

      // Row-local forward+backward shared by BOTH training paths:
      // gradient into g(0 until nW), loss into g(nW); the full-batch
      // aggregate hands its accumulator in directly (bit-for-bit), the
      // mini-batch loop a fresh scratch.
      def rowGradInto(w: Array[Double], mk: Array[Double], xv: Vector,
          y: Double, g: Array[Double]): Unit = {
            val x = new Array[Double](t)
            var j = 0
            while (j < t) { x(j) = (xv(j) - fMean) / fStd; j += 1 }
            val keepA = Array.fill(conf.blocks)(new Array[Array[Double]](conf.layers))
            val keepRes = new Array[Array[Double]](conf.blocks)
            val out = forward(x, conf, t, w, keepA, keepRes, mk)
            val err = out - (y - yMean) / yStd
            g(nW) += 0.5 * err * err
            // offsets of each block's sections (recompute the walk)
            val perBlock = (h * t + h) + (conf.layers - 1) * (h * h + h) +
              (t * h + t) + (h * h + h)
            val headOff = conf.blocks * perBlock
            // head grads; dAccum = err·headW·mask (same for every block's
            // forecast — accumulation is a sum)
            val dAccum = new Array[Double](h)
            var o = 0
            while (o < h) {
              // reconstruct accum from forecasts? cheaper: accumulate
              // per-block below; here only dAccum and headB grad
              dAccum(o) = err * w(headOff + o) * (if (mk == null) 1.0 else mk(o))
              o += 1
            }
            g(headOff + h) += err
            // accumulate head-W grads: needs accum — recompute from keeps
            // (forecast of block b = linear of its last FC activation)
            val accum = new Array[Double](h)
            var b = 0
            while (b < conf.blocks) {
              val aLast = keepA(b)(conf.layers - 1)
              val foreOff = b * perBlock + (h * t + h) +
                (conf.layers - 1) * (h * h + h) + (t * h + t)
              var o2 = 0
              while (o2 < h) {
                var z = w(foreOff + h * h + o2)
                var k = 0
                while (k < h) { z += w(foreOff + o2 * h + k) * aLast(k); k += 1 }
                accum(o2) += z
                o2 += 1
              }
              b += 1
            }
            o = 0
            while (o < h) {
              val av = if (mk == null) accum(o) else accum(o) * mk(o)
              g(headOff + o) += err * av
              o += 1
            }
            // reverse through blocks: dRes = grad wrt the residual
            // LEAVING block b (unused after the last block → zeros)
            var dRes = new Array[Double](t)
            b = conf.blocks - 1
            while (b >= 0) {
              val blockOff = b * perBlock
              val backOff = blockOff + (h * t + h) + (conf.layers - 1) * (h * h + h)
              val foreOff = backOff + (t * h + t)
              val aLast = keepA(b)(conf.layers - 1)
              // dFore = dAccum; grads + da from the forecast head
              val da = new Array[Double](h)
              var o3 = 0
              while (o3 < h) {
                val d = dAccum(o3)
                g(foreOff + h * h + o3) += d
                var k = 0
                while (k < h) {
                  g(foreOff + o3 * h + k) += d * aLast(k)
                  da(k) += d * w(foreOff + o3 * h + k)
                  k += 1
                }
                o3 += 1
              }
              // dBack = −dRes; grads + da from the backcast head
              var i2 = 0
              while (i2 < t) {
                val d = -dRes(i2)
                if (d != 0.0) {
                  g(backOff + t * h + i2) += d
                  var k = 0
                  while (k < h) {
                    g(backOff + i2 * h + k) += d * aLast(k)
                    da(k) += d * w(backOff + i2 * h + k)
                    k += 1
                  }
                }
                i2 += 1
              }
              // back through the FC stack (tanh chain)
              var dA = da
              var l = conf.layers - 1
              while (l >= 0) {
                val in = if (l == 0) t else h
                val prev: Array[Double] =
                  if (l == 0) keepRes(b) else keepA(b)(l - 1)
                val lOff = blockOff + (if (l == 0) 0
                  else (h * t + h) + (l - 1) * (h * h + h))
                val dPrev = new Array[Double](in)
                var o4 = 0
                while (o4 < h) {
                  val a = keepA(b)(l)(o4)
                  val dz = dA(o4) * (1.0 - a * a)
                  g(lOff + h * in + o4) += dz
                  var k = 0
                  while (k < in) {
                    g(lOff + o4 * in + k) += dz * prev(k)
                    dPrev(k) += dz * w(lOff + o4 * in + k)
                    k += 1
                  }
                  o4 += 1
                }
                dA = dPrev
                l -= 1
              }
              // residual entering block b: flows to the FC stack (dA) and
              // straight through the subtraction (dRes) — sum of both
              var i3 = 0
              while (i3 < t) { dRes(i3) += dA(i3); i3 += 1 }
              b -= 1
            }
      }

      // per-step inverted-dropout mask (null = off); stepId = epoch
      // (full-batch) or epoch*B + b (mini-batch, Keras semantics)
      def mkMask(stepId: Long): Array[Double] =
        if (dropout == 0.0) null
        else Array.tabulate(h)(i =>
          if (McDropout.uniform(conf.seed, stepId, -1, 0, i) < dropout) 0.0
          else 1.0 / (1.0 - dropout))

      var lrCur = conf.lr
      var stopped = false
      var epoch = 0
      if (!opt.isFullBatchGd) {
        // optional mini-batch Adam/AdamW/SGD face — see Optimizer. The
        // global-norm clip this head applies unconditionally on its
        // full-batch path (spikes compound through the backcast
        // subtractions) is forced on here too unless the caller set one.
        val optC = if (opt.clipNorm > 0.0) opt else opt.copy(clipNorm = 1.0)
        Optimizer.miniBatchLoop(sc, data, weights, optC, conf.epochs,
          conf.lr, conf.momentum, n, callbacks)(mkMask) {
          (w, mk, xv, y, scratch) => rowGradInto(w, mk, xv, y, scratch)
        }
      } else
      while (epoch < conf.epochs && !stopped) {
        val mk = mkMask(epoch.toLong)
        val bcW = sc.broadcast(weights.clone())
        val grad = OrderedAgg(data, new Array[Double](nW + 1))(
          seqOp = { case (g, (xv, y)) =>
            rowGradInto(bcW.value, mk, xv, y, g); g
          },
          combOp = { (a2, b2) =>
            var k2 = 0
            while (k2 < nW + 1) { a2(k2) += b2(k2); k2 += 1 }
            a2
          })
        bcW.destroy()
        // The backcast subtraction feeds each block's output back into
        // the next block's input, so gradient spikes compound through
        // the stack and momentum can resonate them into divergence —
        // clip the mean gradient's global L2 norm unconditionally (the
        // MLP's dropout-path stabilizer, always-on for this head).
        val gScale = {
          var ss = 0.0
          var k0 = 0
          while (k0 < nW) { val gm = grad(k0) / n; ss += gm * gm; k0 += 1 }
          val norm = math.sqrt(ss)
          if (norm > 1.0) 1.0 / (n * norm) else 1.0 / n
        }
        var k3 = 0
        while (k3 < nW) {
          velocity(k3) = conf.momentum * velocity(k3) - lrCur * grad(k3) * gScale
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

      new NBeatsRegressionModel(
        s"nbeats_${java.util.UUID.randomUUID().toString.take(8)}",
        conf, weights, t, fMean, fStd, yMean, yStd)
    } finally { data.unpersist(blocking = false); () }
  }

  /** Per-block backcast residual norms for one window — the additive-
    * decomposition diagnostic the spec pins (later blocks should have
    * less left to explain). */
  private[ml] def residualNorms(model: NBeatsRegressionModel,
      features: Vector): Seq[Double] = {
    val t = model.seqLen
    val x = Array.tabulate(t)(i => (features(i) - model.featMean) / model.featStd)
    val keepRes = new Array[Array[Double]](model.conf.blocks)
    forward(x, model.conf, t, model.weights,
      Array.fill(model.conf.blocks)(new Array[Array[Double]](model.conf.layers)),
      keepRes)
    keepRes.toSeq.map(r => math.sqrt(r.map(v => v * v).sum))
  }

  /** S11 artifact sink: config + flat weights as one parquet row. */
  def save(model: NBeatsRegressionModel, path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    Seq((model.uid, model.conf.blocks, model.conf.layers, model.conf.units,
        model.weights.toSeq, model.seqLen,
        model.featMean, model.featStd, model.labelMean, model.labelStd))
      .toDF("uid", "blocks", "layers", "units", "weights", "seq_len",
        "feat_mean", "feat_std", "label_mean", "label_std")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): NBeatsRegressionModel = {
    val r = spark.read.parquet(path).head()
    new NBeatsRegressionModel(
      r.getAs[String]("uid"),
      NBeatsConfig(blocks = r.getAs[Int]("blocks"),
        layers = r.getAs[Int]("layers"), units = r.getAs[Int]("units")),
      r.getAs[scala.collection.Seq[Double]]("weights").toArray,
      r.getAs[Int]("seq_len"),
      r.getAs[Double]("feat_mean"), r.getAs[Double]("feat_std"),
      r.getAs[Double]("label_mean"), r.getAs[Double]("label_std"))
  }
}
