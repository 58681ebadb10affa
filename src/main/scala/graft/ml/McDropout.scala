package graft.ml

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-forward-pass MC-dropout uncertainty — the reference's Bayesian
  * inference mode (`common/bayesian.py:70-134`: K stochastic forward
  * passes with dropout ACTIVE at inference; mean = prediction, std =
  * epistemic uncertainty), re-expressed Spark-first for EVERY native
  * head in the zoo: [[MlpRegressor]] (per-hidden-unit masks),
  * [[TcnRegressor]] (per-position-channel masks on the conv
  * activations), [[LstmRegressor]] (variational per-sequence masks on
  * the hidden state, Gal & Ghahramani 2016), [[AttentionRegressor]]
  * (masks on the attended output) — mirroring the reference's
  * dropout-wrapped Keras plugins (`predictor_plugins/common/base.py:350-352`).
  * This closes the gap the K-model `Forecaster.ensembleUncertainty`
  * bootstrap only approximates: here the variance comes from dropout
  * masks on ONE model's hidden units, exactly the reference semantics.
  *
  * 100 TB shape: a single map-side projection — the model's weight
  * arrays ride the closure (O(Σ wₗ·wₗ₊₁), broadcast by Spark), each row
  * computes its K masked forwards inline, and no shuffle, collect, or
  * per-pass job exists. K scales compute, not data movement.
  *
  * Determinism: masks come from a counter-mode splitmix64 hash of
  * (seed, row id, pass, layer, unit), so results are independent of
  * partitioning and bitwise repeatable — the property the specs pin.
  */
object McDropout {

  /** splitmix64 finalizer — a public-domain mixing constant set. */
  private def hash64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Uniform [0,1) for one (seed, id, pass, layer, unit) counter. */
  private[ml] def uniform(seed: Long, id: Long, pass: Int, layer: Int, unit: Int): Double = {
    val h = hash64(hash64(hash64(seed ^ id) + pass) + ((layer.toLong << 32) | unit.toLong))
    (h >>> 11) * (1.0 / (1L << 53))
  }

  /** K dropout forward passes per row; adds `pred_mean` (MC mean, the
    * prediction) and `pred_unc` (MC population std, the uncertainty).
    * `rate` is the hidden-unit drop probability; kept activations are
    * scaled 1/(1−rate) (inverted dropout), so `rate = 0` reproduces
    * `model.predict` exactly with `pred_unc = 0`.
    */
  def predictWithUncertainty(model: MlpRegressor.MlpRegressionModel, df: DataFrame,
      idCol: String, featuresCol: String = "features", passes: Int = 30,
      rate: Double = 0.1, seed: Long = 42L): DataFrame = {
    require(passes >= 1, s"mcDropout: passes must be >= 1, got $passes")
    require(rate >= 0.0 && rate < 1.0, s"mcDropout: rate must be in [0, 1), got $rate")
    val layers = model.layers
    val weights = model.weights
    val biases = model.biases
    val fm = model.featMean
    val fs = model.featStd
    val lm = model.labelMean
    val ls = model.labelStd
    // honor the model's hidden activation: an ELU-trained MLP must run
    // an ELU MC forward, or rate = 0 would not reproduce model.predict
    val elu = model.activation == "elu"
    val kScale = 1.0 / (1.0 - rate)
    val fn = udf { (id: Long, v: Vector) =>
      val d = fm.length
      val x = new Array[Double](d)
      var j = 0
      while (j < d) { x(j) = (v(j) - fm(j)) / fs(j); j += 1 }
      // Welford: exact 0 variance for identical passes (rate = 0), no
      // catastrophic cancellation for near-identical ones
      var mean = 0.0
      var m2 = 0.0
      var p = 0
      while (p < passes) {
        var a = x
        var l = 0
        while (l < layers.length) {
          val out = layers(l)
          val in = a.length
          val w = weights(l); val b = biases(l)
          val next = new Array[Double](out)
          var h = 0
          while (h < out) {
            var z = b(h)
            var k = 0
            while (k < in) { z += w(h * in + k) * a(k); k += 1 }
            next(h) =
              if (rate == 0.0 || uniform(seed, id, p, l, h) >= rate) {
                val av = if (elu) { if (z > 0) z else math.exp(z) - 1.0 }
                  else math.tanh(z)
                av * kScale
              } else 0.0
            h += 1
          }
          a = next
          l += 1
        }
        val wOut = weights(layers.length)
        var y = biases(layers.length)(0)
        var k = 0
        while (k < a.length) { y += wOut(k) * a(k); k += 1 }
        val yd = y * ls + lm
        val delta = yd - mean
        mean += delta / (p + 1)
        m2 += delta * (yd - mean)
        p += 1
      }
      (mean, math.sqrt(math.max(0.0, m2 / passes)))
    }
    df.withColumn("__mc", fn(col(idCol).cast("long"), col(featuresCol)))
      .withColumn("pred_mean", col("__mc._1"))
      .withColumn("pred_unc", col("__mc._2"))
      .drop("__mc")
  }

  /** Shared Welford mean/population-std over `passes` forward passes —
    * exact 0 variance for identical passes, no catastrophic
    * cancellation for near-identical ones.
    */
  private def welford(passes: Int)(f: Int => Double): (Double, Double) = {
    var mean = 0.0
    var m2 = 0.0
    var p = 0
    while (p < passes) {
      val yd = f(p)
      val delta = yd - mean
      mean += delta / (p + 1)
      m2 += delta * (yd - mean)
      p += 1
    }
    (mean, math.sqrt(math.max(0.0, m2 / passes)))
  }

  private def checkArgs(passes: Int, rate: Double): Unit = {
    require(passes >= 1, s"mcDropout: passes must be >= 1, got $passes")
    require(rate >= 0.0 && rate < 1.0, s"mcDropout: rate must be in [0, 1), got $rate")
  }

  /** Standardize a sequence window by the head's scalar moments. */
  private def stdWindow(v: Vector, t: Int, fm: Double, fs: Double): Array[Double] = {
    val x = new Array[Double](t)
    var i = 0
    while (i < t) { x(i) = (v(i) - fm) / fs; i += 1 }
    x
  }

  private def emit(df: DataFrame, idCol: String, featuresCol: String,
      fn: org.apache.spark.sql.expressions.UserDefinedFunction): DataFrame =
    df.withColumn("__mc", fn(col(idCol).cast("long"), col(featuresCol)))
      .withColumn("pred_mean", col("__mc._1"))
      .withColumn("pred_unc", col("__mc._2"))
      .drop("__mc")

  /** [[TcnRegressor]] MC-dropout: masks on every conv tanh activation
    * (block, position·C + channel). Same output contract as the MLP
    * overload: `pred_mean` / `pred_unc`, `rate = 0` ≡ `predict`.
    */
  def predictWithUncertainty(model: TcnRegressor.TcnRegressionModel, df: DataFrame,
      idCol: String, featuresCol: String, passes: Int,
      rate: Double, seed: Long): DataFrame = {
    checkArgs(passes, rate)
    val (c, k, blocks) = (model.channels, model.kernel, model.blocks)
    val (convW, convB, skipP) = (model.convW, model.convB, model.skipP)
    val (headW, headB) = (model.headW, model.headB)
    val act = model.activation
    val t = model.seqLen
    val (fm, fs, lm, ls) = (model.featMean, model.featStd, model.labelMean, model.labelStd)
    val kScale = 1.0 / (1.0 - rate)
    val fn = udf { (id: Long, v: Vector) =>
      val x = stdWindow(v, t, fm, fs)
      welford(passes) { p =>
        val mask = (l: Int, u: Int) =>
          if (rate == 0.0 || uniform(seed, id, p, l, u) >= rate) kScale else 0.0
        TcnRegressor.forwardMasked(x, c, k, blocks, convW, convB, skipP,
          headW, headB, mask, act) * ls + lm
      }
    }
    emit(df, idCol, featuresCol, fn)
  }

  /** [[CnnRegressor]] MC-dropout: masks on every conv tanh activation
    * (layer, position·C + channel) — the zoo's re-expression of the
    * reference CNN's DenseFlipout stochastic forward. Same output
    * contract: `pred_mean` / `pred_unc`, `rate = 0` ≡ `predict`.
    */
  def predictWithUncertainty(model: CnnRegressor.CnnRegressionModel, df: DataFrame,
      idCol: String, featuresCol: String, passes: Int,
      rate: Double, seed: Long): DataFrame = {
    checkArgs(passes, rate)
    val (k, stride, sizes) = (model.kernel, model.stride, model.sizes)
    val (convW, convB) = (model.convW, model.convB)
    val (headW, headB) = (model.headW, model.headB)
    val act = model.activation
    val t = model.seqLen
    val (fm, fs, lm, ls) = (model.featMean, model.featStd, model.labelMean, model.labelStd)
    val kScale = 1.0 / (1.0 - rate)
    val fn = udf { (id: Long, v: Vector) =>
      val x = stdWindow(v, t, fm, fs)
      welford(passes) { p =>
        val mask = (l: Int, u: Int) =>
          if (rate == 0.0 || uniform(seed, id, p, l, u) >= rate) kScale else 0.0
        CnnRegressor.forwardMasked(x, k, stride, sizes, convW, convB,
          headW, headB, mask, act) * ls + lm
      }
    }
    emit(df, idCol, featuresCol, fn)
  }

  /** [[LstmRegressor]] MC-dropout: one variational mask per (pass,
    * sequence) on the hidden-state units, constant across timesteps
    * (Gal & Ghahramani, NeurIPS 2016). `rate = 0` ≡ `predict`.
    */
  def predictWithUncertainty(model: LstmRegressor.LstmRegressionModel, df: DataFrame,
      idCol: String, featuresCol: String, passes: Int,
      rate: Double, seed: Long): DataFrame = {
    checkArgs(passes, rate)
    val u = model.units
    val (wx, wh, b) = (model.wx, model.wh, model.b)
    val (wx2, wh2, b2) = (model.wx2, model.wh2, model.b2)
    val (headW, headB) = (model.headW, model.headB)
    val t = model.seqLen
    val (fm, fs, lm, ls) = (model.featMean, model.featStd, model.labelMean, model.labelStd)
    val kScale = 1.0 / (1.0 - rate)
    val fn = udf { (id: Long, v: Vector) =>
      val x = stdWindow(v, t, fm, fs)
      welford(passes) { p =>
        val mask = (l: Int, un: Int) =>
          if (rate == 0.0 || uniform(seed, id, p, l, un) >= rate) kScale else 0.0
        LstmRegressor.forwardMasked(x, u, wx, wh, b, headW, headB, mask,
          wx2, wh2, b2) * ls + lm
      }
    }
    emit(df, idCol, featuresCol, fn)
  }

  /** [[AttentionRegressor]] MC-dropout: masks on the attended output
    * entries (position·D + dim) between attention and the pooled head.
    * `rate = 0` ≡ `predict`.
    */
  /** N-BEATS face: variational masks on the accumulated-forecast units
    * feeding the head (the same placement train-time dropout uses). */
  def predictWithUncertainty(model: NBeatsRegressor.NBeatsRegressionModel,
      df: DataFrame, idCol: String, featuresCol: String, passes: Int,
      rate: Double, seed: Long): DataFrame = {
    checkArgs(passes, rate)
    val conf = model.conf
    val w = model.weights
    val t = model.seqLen
    val (fm, fs, lm, ls) = (model.featMean, model.featStd, model.labelMean, model.labelStd)
    val kScale = 1.0 / (1.0 - rate)
    val h = conf.units
    val fn = udf { (id: Long, v: Vector) =>
      val x = stdWindow(v, t, fm, fs)
      welford(passes) { p =>
        val mask = Array.tabulate(h)(u =>
          if (rate == 0.0 || uniform(seed, id, p, 0, u) >= rate) kScale else 0.0)
        NBeatsRegressor.forward(x, conf, t, w, null, null, mask) * ls + lm
      }
    }
    emit(df, idCol, featuresCol, fn)
  }

  /** [[TftRegressor]] MC-dropout: masks on the GRN3 context units
    * feeding the head (the reference's `tft_dropout` output placement).
    * Same contract: `pred_mean` / `pred_unc`, `rate = 0` ≡ `predict`. */
  def predictWithUncertainty(model: TftRegressor.TftRegressionModel,
      df: DataFrame, idCol: String, featuresCol: String, passes: Int,
      rate: Double, seed: Long): DataFrame = {
    checkArgs(passes, rate)
    val (u, nH, wts) = (model.units, model.heads, model.weights)
    val (nL, ln) = (model.lstmLayers, model.layerNorm)
    val t = model.seqLen
    val (fm, fs, lm, ls) = (model.featMean, model.featStd, model.labelMean, model.labelStd)
    val kScale = 1.0 / (1.0 - rate)
    val fn = udf { (id: Long, v: Vector) =>
      val x = stdWindow(v, t, fm, fs)
      welford(passes) { p =>
        val mask = (l: Int, un: Int) =>
          if (rate == 0.0 || uniform(seed, id, p, l, un) >= rate) kScale else 0.0
        TftRegressor.forwardMasked(x, u, nH, wts, mask, nL, ln) * ls + lm
      }
    }
    emit(df, idCol, featuresCol, fn)
  }

  def predictWithUncertainty(model: AttentionRegressor.AttentionRegressionModel,
      df: DataFrame, idCol: String, featuresCol: String, passes: Int,
      rate: Double, seed: Long): DataFrame = {
    checkArgs(passes, rate)
    val d = model.dim
    val nH = model.heads
    val (wE, pos) = (model.wE, model.pos)
    val (wq, wk, wv) = (model.wq, model.wk, model.wv)
    val (headW, headB) = (model.headW, model.headB)
    val (lnG, lnB) = (model.lnG, model.lnB)
    val t = model.seqLen
    val (fm, fs, lm, ls) = (model.featMean, model.featStd, model.labelMean, model.labelStd)
    val kScale = 1.0 / (1.0 - rate)
    val fn = udf { (id: Long, v: Vector) =>
      val x = stdWindow(v, t, fm, fs)
      welford(passes) { p =>
        val mask = (l: Int, un: Int) =>
          if (rate == 0.0 || uniform(seed, id, p, l, un) >= rate) kScale else 0.0
        AttentionRegressor.forwardMasked(x, d, nH, wE, pos, wq, wk, wv,
          headW, headB, mask, lnG, lnB) * ls + lm
      }
    }
    emit(df, idCol, featuresCol, fn)
  }
}
