package graft.ml

import org.apache.spark.ml.PredictionModel
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** M8 attention head: a multi-head self-attention regressor — the
  * Spark-native re-expression of the reference's Transformer predictors
  * (`predictor_plugins/predictor_plugin_transformer.py:5,65-66`:
  * `MultiHeadAttention` over the window with positional encoding;
  * scaled dot-product attention from Vaswani et al. 2017 §3.2.2). The
  * assembled features vector is read as a univariate sequence; each
  * position is embedded as `e_t = x_t·wE + pos_t` (learned positional
  * embedding — without it attention over a scalar window would be
  * permutation-invariant), one attention layer with `heads` parallel
  * heads mixes the positions — head h attends over its own D/H-wide
  * subspace of Q/K/V with scale 1/√(D/H), and the per-head outputs
  * concatenate by construction of the slicing — and a mean-pool +
  * linear readout produces the prediction. What attention buys over
  * the conv/recurrent heads is CONTENT-BASED routing: position t
  * attends to wherever the relevant signal IS, not to a fixed
  * receptive field or a decaying state (spec-pinned on a
  * soft-retrieval teacher); extra heads buy INDEPENDENT routing
  * patterns per subspace.
  *
  * `AttnConfig(layerNorm = true)` adds the reference's post-attention
  * residual + LayerNormalization
  * (`predictor_plugin_transformer.py:73-74`: `Add()([x, attn])` then
  * `LayerNormalization()`): `z_t = LN(e_t + a_t)` with learned
  * gain/bias over the embedding dim (Keras epsilon 1e-3, row-local so
  * the fit stays partition-independent), mean-pooled into the head.
  * Off (the default) keeps the former pool-over-`a` path bit-for-bit.
  *
  * Remaining re-expression boundaries: one layer, no FFN sublayer and
  * no output projection W_O (the head slices concatenate directly into
  * the pooled readout — W_O folds into `headW` under mean pooling),
  * mean pooling instead of per-horizon stacked heads (the per-horizon
  * split lives in `Forecaster.fitPerHorizonWith`). `heads = 1`
  * reproduces the former single-head code path bit-for-bit.
  *
  * Training: identical distributed full-batch pattern as
  * [[MlpRegressor]]/[[TcnRegressor]]/[[LstmRegressor]] — one exact
  * gradient `treeAggregate` per epoch (the O(T²·D) attention forward +
  * backward lives inside the row kernel), tree-merged partials, driver
  * momentum update, weights broadcast.
  */
// Serializable: fit's row-gradient helper is a local def lifted onto this
// object; Spark task closures referencing it serialize the stateless object.
object AttentionRegressor extends Serializable {

  /** `dim` = embedding width D; `heads` = parallel attention heads H
    * (D must divide evenly into H subspaces); `layerNorm` = the
    * reference's post-attention residual + LN (off = former path). */
  case class AttnConfig(dim: Int = 4, heads: Int = 1, epochs: Int = 200,
      lr: Double = 0.1, momentum: Double = 0.9, seed: Long = 42L,
      layerNorm: Boolean = false)

  // Keras LayerNormalization default epsilon. NOTE: TftRegressor.LnEps
  // and its packed-offset lnForward/lnBackward implement the SAME
  // kernel under a different weight layout — a numerical change here
  // (epsilon, stabilization) must be mirrored there.
  private val LnEps = 1e-3

  /** LN over the embedding dim with learned γ/β; out may alias p. */
  private def lnForward(lnG: Array[Double], lnB: Array[Double], d: Int,
      p: Array[Double], pOff: Int, out: Array[Double], outOff: Int): Unit = {
    var mu = 0.0
    var j = 0
    while (j < d) { mu += p(pOff + j); j += 1 }
    mu /= d
    var va = 0.0
    j = 0
    while (j < d) { val d0 = p(pOff + j) - mu; va += d0 * d0; j += 1 }
    val inv = 1.0 / math.sqrt(va / d + LnEps)
    j = 0
    while (j < d) {
      out(outOff + j) = lnG(j) * ((p(pOff + j) - mu) * inv) + lnB(j)
      j += 1
    }
  }

  class AttentionRegressionModel(
      override val uid: String,
      val dim: Int,
      val heads: Int,
      val wE: Array[Double], // D: scalar input -> embedding
      val pos: Array[Double], // T×D row-major learned positional embedding
      val wq: Array[Double], // D×D row-major
      val wk: Array[Double],
      val wv: Array[Double],
      val headW: Array[Double], // D
      val headB: Double,
      val seqLen: Int,
      val featMean: Double,
      val featStd: Double,
      val labelMean: Double,
      val labelStd: Double,
      val lnG: Array[Double] = null, // LN gain/bias; null = LN off
      val lnB: Array[Double] = null)
    extends PredictionModel[Vector, AttentionRegressionModel] {

    override def numFeatures: Int = seqLen

    override def predict(features: Vector): Double = {
      val t = seqLen
      val x = new Array[Double](t)
      var i = 0
      while (i < t) { x(i) = (features(i) - featMean) / featStd; i += 1 }
      val out = forward(x, dim, heads, wE, pos, wq, wk, wv, headW, headB,
        lnG, lnB, null)
      out * labelStd + labelMean
    }

    override def copy(extra: ParamMap): AttentionRegressionModel = copyValues(
      new AttentionRegressionModel(uid, dim, heads, wE, pos, wq, wk, wv, headW,
        headB, seqLen, featMean, featStd, labelMean, labelStd, lnG, lnB), extra)

    override def toString: String =
      s"AttentionRegressionModel(uid=$uid, dim=$dim, heads=$heads, T=$seqLen, ln=${lnG != null})"
  }

  /** Forward pass; with `keep` non-null stores (e, q, k, v, alpha, a,
    * p) flattened for backprop — p (the pre-LN residual sums, T×D) only
    * in LN mode. Returns the standardized-space prediction.
    *
    * `mask` (null = off) is the MC-dropout hook: a multiplier on each
    * attended-output entry, indexed (0, position·D + dim), applied
    * between attention and what follows (the pooled head, or the
    * residual + LN when on) — the reference's dropout-after-attention
    * placement (`predictor_plugin_transformer.py`: Dropout on the
    * block output). Training passes null.
    */
  private def forward(x: Array[Double], d: Int, nH: Int, wE: Array[Double],
      pos: Array[Double], wq: Array[Double], wk: Array[Double],
      wv: Array[Double], headW: Array[Double], headB: Double,
      lnG: Array[Double], lnB: Array[Double],
      keep: Array[Array[Double]],
      mask: (Int, Int) => Double = null): Double = {
    val t = x.length
    val e = new Array[Double](t * d)
    val q = new Array[Double](t * d)
    val k = new Array[Double](t * d)
    val v = new Array[Double](t * d)
    var ti = 0
    while (ti < t) {
      var j = 0
      while (j < d) { e(ti * d + j) = x(ti) * wE(j) + pos(ti * d + j); j += 1 }
      var r = 0
      while (r < d) {
        var zq = 0.0; var zk = 0.0; var zv = 0.0
        var c = 0
        while (c < d) {
          val ec = e(ti * d + c)
          zq += wq(r * d + c) * ec
          zk += wk(r * d + c) * ec
          zv += wv(r * d + c) * ec
          c += 1
        }
        q(ti * d + r) = zq; k(ti * d + r) = zk; v(ti * d + r) = zv
        r += 1
      }
      ti += 1
    }
    // per-head scaled dot-product attention over the D/H-wide slices;
    // alpha is H×T×T, indexed ((h·T + t)·T + s)
    val dh = d / nH
    val scale = 1.0 / math.sqrt(dh.toDouble)
    val alpha = new Array[Double](nH * t * t)
    val a = new Array[Double](t * d)
    ti = 0
    while (ti < t) {
      var hh = 0
      while (hh < nH) {
        val base = hh * dh
        // softmax over s of q_t·k_s/sqrt(D/H), max-subtracted for stability
        var mx = Double.NegativeInfinity
        var s = 0
        while (s < t) {
          var l = 0.0
          var j = 0
          while (j < dh) { l += q(ti * d + base + j) * k(s * d + base + j); j += 1 }
          l *= scale
          alpha((hh * t + ti) * t + s) = l
          if (l > mx) mx = l
          s += 1
        }
        var z = 0.0
        s = 0
        while (s < t) {
          val ex = math.exp(alpha((hh * t + ti) * t + s) - mx)
          alpha((hh * t + ti) * t + s) = ex
          z += ex
          s += 1
        }
        s = 0
        while (s < t) {
          val al = alpha((hh * t + ti) * t + s) / z
          alpha((hh * t + ti) * t + s) = al
          var j = 0
          while (j < dh) { a(ti * d + base + j) += al * v(s * d + base + j); j += 1 }
          s += 1
        }
        hh += 1
      }
      ti += 1
    }
    if (lnG != null) {
      // reference post-attention block: z_t = LN(e_t + a_t), mean-pool z
      val p = new Array[Double](t * d)
      val zt = new Array[Double](d)
      var y = headB
      val pooled = new Array[Double](d)
      ti = 0
      while (ti < t) {
        var j = 0
        while (j < d) {
          val av = a(ti * d + j)
          val am = if (mask != null) av * mask(0, ti * d + j) else av
          p(ti * d + j) = e(ti * d + j) + am
          j += 1
        }
        lnForward(lnG, lnB, d, p, ti * d, zt, 0)
        j = 0
        while (j < d) { pooled(j) += zt(j); j += 1 }
        ti += 1
      }
      var j = 0
      while (j < d) { y += headW(j) * (pooled(j) / t); j += 1 }
      if (keep != null) {
        keep(0) = e; keep(1) = q; keep(2) = k; keep(3) = v
        keep(4) = alpha; keep(5) = a; keep(6) = p
      }
      y
    } else {
      if (keep != null) {
        keep(0) = e; keep(1) = q; keep(2) = k; keep(3) = v
        keep(4) = alpha; keep(5) = a
      }
      var y = headB
      var j = 0
      while (j < d) {
        var sm = 0.0
        var ti2 = 0
        while (ti2 < t) {
          val av = a(ti2 * d + j)
          sm += (if (mask != null) av * mask(0, ti2 * d + j) else av)
          ti2 += 1
        }
        y += headW(j) * (sm / t)
        j += 1
      }
      y
    }
  }

  /** MC-dropout bridge for [[graft.ml.McDropout]]: the shared forward
    * with a per-attended-unit mask, on a pre-standardized window.
    * Returns the STANDARDIZED-space prediction.
    */
  private[ml] def forwardMasked(x: Array[Double], d: Int, nH: Int,
      wE: Array[Double], pos: Array[Double], wq: Array[Double],
      wk: Array[Double], wv: Array[Double], headW: Array[Double],
      headB: Double, mask: (Int, Int) => Double,
      lnG: Array[Double] = null, lnB: Array[Double] = null): Double =
    forward(x, d, nH, wE, pos, wq, wk, wv, headW, headB, lnG, lnB, null, mask)

  /** Fit on an assembled frame — the `fitPerHorizonWith` contract.
    *
    * `dropout` > 0: TRAIN-TIME dropout of the attended representation
    * feeding what follows (the reference's post-attention `Dropout`,
    * `predictor_plugin_tft.py:81`): per-epoch inverted masks from the
    * McDropout counter hash — `dropout = 0` stays bit-for-bit.
    * `callbacks` (M11): epoch-end control from the same gradient pass.
    */
  def fit(df: DataFrame, labelCol: String, conf: AttnConfig = AttnConfig(),
      featuresCol: String = "features", dropout: Double = 0.0,
      callbacks: Seq[Callbacks.TrainingCallback] = Nil,
      opt: Optimizer.OptConfig = Optimizer.FullBatchGd,
      // val-loss monitor set (same shape as df) — mini-batch path only;
      // the full-batch path's callbacks keep seeing train loss
      valData: Option[DataFrame] = None): AttentionRegressionModel = {
    val d = conf.dim
    val nH = conf.heads
    val ln = conf.layerNorm
    require(d > 0 && nH > 0 && d % nH == 0,
      s"AttentionRegressor.fit: dim must split evenly across heads, got $conf")
    require(dropout >= 0.0 && dropout < 1.0,
      s"AttentionRegressor.fit: dropout must be in [0, 1), got $dropout")
    val sc = df.sparkSession.sparkContext
    val data = df.select(col(featuresCol), col(labelCol).cast("double"))
      .rdd.map(r => (r.getAs[Vector](0), r.getDouble(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val head = data.take(1)
      require(head.nonEmpty, "AttentionRegressor.fit: empty training set")
      val t = head(0)._1.size
      val (sx, sxx, sy, syy, n) = OrderedAgg(data, (0.0, 0.0, 0.0, 0.0, 0L))(
        seqOp = { case ((sx, sxx, sy, syy, n2), (x, y)) =>
          var a = sx; var aa = sxx
          var j = 0
          while (j < t) { val w = x(j); a += w; aa += w * w; j += 1 }
          (a, aa, sy + y, syy + y * y, n2 + 1)
        },
        combOp = { case ((ax, axx, ay, ayy, an), (bx, bxx, by, byy, bn)) =>
          (ax + bx, axx + bxx, ay + by, ayy + byy, an + bn)
        })
      require(n > 0, "AttentionRegressor.fit: empty training set")
      def stdOf(sum: Double, sumsq: Double, cnt: Double): Double = {
        val vr = math.max(sumsq / cnt - (sum / cnt) * (sum / cnt), 0.0)
        val s = math.sqrt(vr)
        if (s < 1e-12) 1.0 else s
      }
      var fMean = sx / (n.toDouble * t)
      var fStd = stdOf(sx, sxx, n.toDouble * t)
      var yMean = sy / n
      var yStd = stdOf(sy, syy, n.toDouble)
      if (!opt.isFullBatchGd) {
        // order-independent stats for the mini-batch path's
        // bitwise-under-any-partitioning contract (see Optimizer.micro)
        val (mx, mxx, my, myy) = Optimizer.microStatsGlobal(data, t)
        fMean = mx / (n.toDouble * t)
        fStd = stdOf(mx, mxx, n.toDouble * t)
        yMean = my / n
        yStd = stdOf(my, myy, n.toDouble)
      }

      // flat layout: [wE (d) | pos (t·d) | wq | wk | wv (d² each) |
      // headW (d) | headB] + LN mode appends [γ (d) | β (d)] so the
      // default layout — and its seeded init draws — are unchanged
      val eOff = 0
      val pOff = d
      val qOff = pOff + t * d
      val kOff = qOff + d * d
      val vOff = kOff + d * d
      val hOff = vOff + d * d
      val hbOff = hOff + d
      val gOff = hbOff + 1
      val bOff = gOff + d
      val nW = if (ln) bOff + d else hbOff + 1
      val rnd = new java.util.Random(conf.seed)
      val weights = new Array[Double](nW)
      var i = 0
      while (i < d) { weights(eOff + i) = rnd.nextGaussian(); i += 1 }
      i = 0
      while (i < t * d) { weights(pOff + i) = rnd.nextGaussian() * 0.1; i += 1 }
      val mScale = math.sqrt(1.0 / d)
      i = qOff
      while (i < hOff) { weights(i) = rnd.nextGaussian() * mScale; i += 1 }
      i = 0
      while (i < d) { weights(hOff + i) = rnd.nextGaussian() * mScale; i += 1 }
      if (ln) {
        i = 0
        while (i < d) { weights(gOff + i) = 1.0; weights(bOff + i) = 0.0; i += 1 }
      }
      val velocity = new Array[Double](nW)
      val dh = d / nH
      val scale = 1.0 / math.sqrt(dh.toDouble)

      // Row-local forward+backward shared by BOTH training paths:
      // accumulates the row's gradient into g(0 until nW) and its loss
      // into g(nW); the full-batch aggregate hands its accumulator in
      // directly (per-slot op order unchanged, bit-for-bit), the
      // mini-batch loop a fresh scratch.
      def rowGradInto(wf: Array[Double], mk: Array[Double], xv: Vector,
          y: Double, g: Array[Double]): Unit = {
            val wE = java.util.Arrays.copyOfRange(wf, eOff, eOff + d)
            val pos = java.util.Arrays.copyOfRange(wf, pOff, pOff + t * d)
            val wq = java.util.Arrays.copyOfRange(wf, qOff, qOff + d * d)
            val wk = java.util.Arrays.copyOfRange(wf, kOff, kOff + d * d)
            val wv = java.util.Arrays.copyOfRange(wf, vOff, vOff + d * d)
            val headW = java.util.Arrays.copyOfRange(wf, hOff, hOff + d)
            val headB = wf(hbOff)
            val lnG = if (ln) java.util.Arrays.copyOfRange(wf, gOff, gOff + d) else null
            val lnB = if (ln) java.util.Arrays.copyOfRange(wf, bOff, bOff + d) else null
            // legacy path: masked head = dropout on the pooled attended
            // vector (equivalent to per-entry masks under linear pooling)
            val headWm =
              if (mk == null || ln) headW
              else Array.tabulate(d)(i => headW(i) * mk(i))
            val x = new Array[Double](t)
            var j = 0
            while (j < t) { x(j) = (xv(j) - fMean) / fStd; j += 1 }
            val keep = new Array[Array[Double]](7)
            // LN path: masks are per attended entry (constant across t)
            val fwdMask: (Int, Int) => Double =
              if (ln && mk != null) (_: Int, idx: Int) => mk(idx % d) else null
            val out = forward(x, d, nH, wE, pos, wq, wk, wv, headWm, headB,
              lnG, lnB, keep, fwdMask)
            val err = out - (y - yMean) / yStd
            g(nW) += 0.5 * err * err // epoch loss accumulator
            val e = keep(0); val q = keep(1); val k = keep(2)
            val v = keep(3); val alpha = keep(4); val a = keep(5)
            val p = keep(6) // pre-LN residual sums (LN mode)
            // da_t(j): LN mode varies by position (through LN backward);
            // legacy is the constant err·headW_m(j)/T, evaluated inline
            // below to keep the former float-op sequence bit-for-bit
            val daArr = if (ln) new Array[Double](t * d) else null
            // dp contribution to the embedding path (LN mode residual)
            val dpArr = if (ln) new Array[Double](t * d) else null
            if (ln) {
              // head: y = headB + headW · mean_t z_t
              val zt = new Array[Double](d)
              val pooled = new Array[Double](d)
              var ti0 = 0
              while (ti0 < t) {
                lnForward(lnG, lnB, d, p, ti0 * d, zt, 0)
                var j0 = 0
                while (j0 < d) { pooled(j0) += zt(j0); j0 += 1 }
                ti0 += 1
              }
              var j0 = 0
              while (j0 < d) { g(hOff + j0) += err * (pooled(j0) / t); j0 += 1 }
              g(hbOff) += err
              // LN backward per position: dz_t(j) = err·headW(j)/T
              ti0 = 0
              while (ti0 < t) {
                var mu = 0.0
                var j1 = 0
                while (j1 < d) { mu += p(ti0 * d + j1); j1 += 1 }
                mu /= d
                var va = 0.0
                j1 = 0
                while (j1 < d) { val d0 = p(ti0 * d + j1) - mu; va += d0 * d0; j1 += 1 }
                val inv = 1.0 / math.sqrt(va / d + LnEps)
                var mDx = 0.0
                var mDxX = 0.0
                j1 = 0
                while (j1 < d) {
                  val xh = (p(ti0 * d + j1) - mu) * inv
                  val dy = err * headW(j1) / t
                  g(gOff + j1) += dy * xh
                  g(bOff + j1) += dy
                  val dxh = dy * lnG(j1)
                  mDx += dxh
                  mDxX += dxh * xh
                  j1 += 1
                }
                mDx /= d
                mDxX /= d
                j1 = 0
                while (j1 < d) {
                  val xh = (p(ti0 * d + j1) - mu) * inv
                  val dxh = (err * headW(j1) / t) * lnG(j1)
                  val dp = (dxh - mDx - xh * mDxX) * inv
                  dpArr(ti0 * d + j1) = dp
                  // residual p = e + a·m: the a path carries the mask factor
                  daArr(ti0 * d + j1) = if (mk == null) dp else dp * mk(j1)
                  j1 += 1
                }
                ti0 += 1
              }
            } else {
              // head (legacy pooled-a path)
              var j2 = 0
              while (j2 < d) {
                var sm = 0.0
                var ti = 0
                while (ti < t) { sm += a(ti * d + j2); ti += 1 }
                g(hOff + j2) += err * (sm / t) * (if (mk == null) 1.0 else mk(j2))
                j2 += 1
              }
              g(hbOff) += err
            }
            // attention backward from da_t (LN: daArr; legacy: err·headWm/T)
            @inline def daOf(ti: Int, j: Int): Double =
              if (ln) daArr(ti * d + j) else err * headWm(j) / t
            val dq = new Array[Double](t * d)
            val dk = new Array[Double](t * d)
            val dv = new Array[Double](t * d)
            var ti = 0
            while (ti < t) {
              var hh = 0
              while (hh < nH) {
                val base = hh * dh
                // dα_{t,s} = da_t·v_s over head h's slice; softmax
                // backward per (t, h); dv_s += α·da_t within the slice
                val dal = new Array[Double](t)
                var s = 0
                while (s < t) {
                  var acc = 0.0
                  var j3 = 0
                  while (j3 < dh) {
                    acc += daOf(ti, base + j3) * v(s * d + base + j3)
                    j3 += 1
                  }
                  dal(s) = acc
                  s += 1
                }
                var dot = 0.0
                s = 0
                while (s < t) { dot += alpha((hh * t + ti) * t + s) * dal(s); s += 1 }
                s = 0
                while (s < t) {
                  val al = alpha((hh * t + ti) * t + s)
                  val dl = al * (dal(s) - dot) * scale
                  // dq_t += dl·k_s ; dk_s += dl·q_t ; dv via alpha
                  var j4 = 0
                  while (j4 < dh) {
                    dq(ti * d + base + j4) += dl * k(s * d + base + j4)
                    dk(s * d + base + j4) += dl * q(ti * d + base + j4)
                    dv(s * d + base + j4) += al * daOf(ti, base + j4)
                    j4 += 1
                  }
                  s += 1
                }
                hh += 1
              }
              ti += 1
            }
            // matrices + embedding backward (+ the LN residual's de)
            ti = 0
            while (ti < t) {
              val de = new Array[Double](d)
              var r = 0
              while (r < d) {
                val dqr = dq(ti * d + r); val dkr = dk(ti * d + r); val dvr = dv(ti * d + r)
                var c = 0
                while (c < d) {
                  val ec = e(ti * d + c)
                  g(qOff + r * d + c) += dqr * ec
                  g(kOff + r * d + c) += dkr * ec
                  g(vOff + r * d + c) += dvr * ec
                  de(c) += dqr * wq(r * d + c) + dkr * wk(r * d + c) + dvr * wv(r * d + c)
                  c += 1
                }
                r += 1
              }
              var j5 = 0
              while (j5 < d) {
                val dev = de(j5) + (if (ln) dpArr(ti * d + j5) else 0.0)
                g(pOff + ti * d + j5) += dev
                g(eOff + j5) += dev * x(ti)
                j5 += 1
              }
              ti += 1
            }
      }

      // per-step inverted-dropout mask on the head input (null = off);
      // stepId = epoch (full-batch) or epoch*B + b (mini-batch)
      def mkMask(stepId: Long): Array[Double] =
        if (dropout == 0.0) null
        else Array.tabulate(d)(i =>
          if (McDropout.uniform(conf.seed, stepId, -1, 0, i) < dropout) 0.0
          else 1.0 / (1.0 - dropout))

      var lrCur = conf.lr
      var stopped = false
      var epoch = 0
      if (!opt.isFullBatchGd) {
        // optional mini-batch Adam/AdamW/SGD face — see Optimizer
        val valRdd = Optimizer.valRddOf(valData, featuresCol, labelCol)
        try Optimizer.miniBatchLoop(sc, data, weights, opt, conf.epochs,
          conf.lr, conf.momentum, n, callbacks, valRdd)(mkMask) {
          (w, mk, xv, y, scratch) => rowGradInto(w, mk, xv, y, scratch)
        } finally valRdd.foreach(_._1.unpersist())
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

      new AttentionRegressionModel(
        s"attn_${java.util.UUID.randomUUID().toString.take(8)}", d, nH,
        java.util.Arrays.copyOfRange(weights, eOff, eOff + d),
        java.util.Arrays.copyOfRange(weights, pOff, pOff + t * d),
        java.util.Arrays.copyOfRange(weights, qOff, qOff + d * d),
        java.util.Arrays.copyOfRange(weights, kOff, kOff + d * d),
        java.util.Arrays.copyOfRange(weights, vOff, vOff + d * d),
        java.util.Arrays.copyOfRange(weights, hOff, hOff + d),
        weights(hbOff), t, fMean, fStd, yMean, yStd,
        if (ln) java.util.Arrays.copyOfRange(weights, gOff, gOff + d) else null,
        if (ln) java.util.Arrays.copyOfRange(weights, bOff, bOff + d) else null)
    } finally { data.unpersist(blocking = false); () }
  }

  /** S11 artifact sink. */
  def save(model: AttentionRegressionModel, path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    Seq((model.uid, model.dim, model.heads, model.wE.toSeq, model.pos.toSeq,
        model.wq.toSeq, model.wk.toSeq, model.wv.toSeq, model.headW.toSeq,
        model.headB, model.seqLen, model.featMean, model.featStd,
        model.labelMean, model.labelStd,
        if (model.lnG == null) Seq.empty[Double] else model.lnG.toSeq,
        if (model.lnB == null) Seq.empty[Double] else model.lnB.toSeq))
      .toDF("uid", "dim", "heads", "w_e", "pos", "wq", "wk", "wv", "head_w",
        "head_b", "seq_len", "feat_mean", "feat_std", "label_mean", "label_std",
        "ln_g", "ln_b")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** S11 artifact source. Artifacts written before the multi-head change
    * lack the `heads` column (single-head, default 1); before the LN
    * change they lack `ln_g`/`ln_b` (LN off, default null) — keeps the
    * S11 round-trip loadable for existing modelDir checkpoints. */
  def load(spark: SparkSession, path: String): AttentionRegressionModel = {
    val r = spark.read.parquet(path).head()
    def arr(c: String) = r.getAs[scala.collection.Seq[Double]](c).toArray
    val fields = r.schema.fieldNames.toSet
    val heads =
      if (fields.contains("heads")) r.getAs[Int]("heads") else 1
    val lnG =
      if (fields.contains("ln_g") && arr("ln_g").nonEmpty) arr("ln_g") else null
    val lnB =
      if (fields.contains("ln_b") && arr("ln_b").nonEmpty) arr("ln_b") else null
    new AttentionRegressionModel(
      r.getAs[String]("uid"), r.getAs[Int]("dim"), heads,
      arr("w_e"), arr("pos"), arr("wq"), arr("wk"), arr("wv"), arr("head_w"),
      r.getAs[Double]("head_b"), r.getAs[Int]("seq_len"),
      r.getAs[Double]("feat_mean"), r.getAs[Double]("feat_std"),
      r.getAs[Double]("label_mean"), r.getAs[Double]("label_std"),
      lnG, lnB)
  }
}
