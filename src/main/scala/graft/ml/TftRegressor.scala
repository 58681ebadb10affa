package graft.ml

import org.apache.spark.ml.PredictionModel
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** M8 TFT head: a Temporal-Fusion-Transformer-style regressor — the
  * Spark-native re-expression of the reference's TFT predictor
  * (`predictor_plugins/predictor_plugin_tft.py:106-140`, after Lim et
  * al. 2021): GRN embedding → LSTM encoder stack (+ per-position GRN
  * after each layer, `tft_lstm_layers` at `:113-116`) → multi-head
  * self-attention temporal fusion → post-attention GRN with residual
  * skip → last-timestep context → GRN output head. The Gated Residual
  * Network (`_grn`, `:73-87`) is the reference's building block:
  * `out = skip(x) + GLU(W2·act(W1·x))` with
  * `GLU(h) = σ(Wg·h) ⊙ (Wv·h)` — gating lets each block learn how much
  * nonlinear processing to apply, which is the TFT's distinguishing
  * inductive bias over the plain LSTM/attention heads.
  *
  * `TftConfig(layerNorm = true)` adds the reference's
  * `LayerNormalization` at its exact sites — the tail of every GRN
  * (`predictor_plugin_tft.py:85`) and after the post-attention residual
  * add (`:127`) — as a per-position normalization over the hidden dim
  * with learned gain/bias (Keras epsilon 1e-3); row-local, so the fit
  * stays partition-independent. `lstmLayers` stacks the encoder
  * (reference default `tft_lstm_layers = 2`), each layer followed by
  * its own GRN exactly as the reference's loop. BOTH default to the
  * former single-layer, no-LN path bit-for-bit (the flag adds appended
  * weight blocks that are never touched when off).
  *
  * Remaining re-expression boundaries (documented, not hidden): tanh
  * GRN dense activation (the zoo's bounded-gradient convention;
  * reference uses ELU inside `_grn`), the GRN skip is always a learned
  * projection (the reference projects only on width mismatch), and the
  * per-horizon split lives in `Forecaster.fitPerHorizonWith` as for
  * every other head. The MHA is the SAME per-head-subspace attention
  * as [[AttentionRegressor]].
  *
  * Training is the zoo's DISTRIBUTED full-batch pattern: per epoch one
  * [[OrderedAgg]] pass computes the exact MSE gradient (the
  * GRN→LSTM→MHA→GRN backward chain lives inside the row kernel; the
  * whole composition — including the LN and stacked-encoder paths — is
  * pinned by finite-difference gradient checks in `TftRegressorSpec`),
  * the driver applies a momentum update, new weights broadcast. Nothing
  * data-proportional concentrates on the driver.
  */
// Serializable: fit's row-gradient helper is a local def lifted onto this
// object; Spark task closures referencing it serialize the stateless object.
object TftRegressor extends Serializable {

  /** `units` = hidden width U (must split across `heads`);
    * `lstmLayers` = encoder depth (reference `tft_lstm_layers`);
    * `layerNorm` = the reference's LayerNormalization sites (off =
    * the former path bit-for-bit). */
  case class TftConfig(units: Int = 6, heads: Int = 2, epochs: Int = 200,
      lr: Double = 0.1, momentum: Double = 0.9, seed: Long = 42L,
      lstmLayers: Int = 1, layerNorm: Boolean = false)

  // ── GRN parameter block ────────────────────────────────────────────
  // [W1 (U×I) | b1 (U) | W2 (U×U) | b2 (U) | Wg (U×U) | bg (U) |
  //  Wv (U×U) | bv (U) | Ws (U×I)] — row-major r*I+c / r*U+c
  private def grnSize(u: Int, in: Int): Int =
    2 * u * in + 3 * u * u + 4 * u

  /** GRN forward at one position. Writes cache (h1 | h2 | sg | vRaw),
    * 4U doubles, when non-null. */
  private def grnForward(w: Array[Double], off: Int, u: Int, in: Int,
      x: Array[Double], xOff: Int, out: Array[Double], outOff: Int,
      cache: Array[Double], cOff: Int): Unit = {
    val w1 = off; val b1 = w1 + u * in
    val w2 = b1 + u; val b2 = w2 + u * u
    val wg = b2 + u; val bg = wg + u * u
    val wv = bg + u; val bv = wv + u * u
    val ws = bv + u
    val h1 = new Array[Double](u)
    val h2 = new Array[Double](u)
    var r = 0
    while (r < u) {
      var z = w(b1 + r)
      var c = 0
      while (c < in) { z += w(w1 + r * in + c) * x(xOff + c); c += 1 }
      h1(r) = math.tanh(z)
      r += 1
    }
    r = 0
    while (r < u) {
      var z = w(b2 + r)
      var c = 0
      while (c < u) { z += w(w2 + r * u + c) * h1(c); c += 1 }
      h2(r) = z
      r += 1
    }
    r = 0
    while (r < u) {
      var zg = w(bg + r); var zv = w(bv + r)
      var c = 0
      while (c < u) {
        val h2c = h2(c)
        zg += w(wg + r * u + c) * h2c
        zv += w(wv + r * u + c) * h2c
        c += 1
      }
      val sg = 1.0 / (1.0 + math.exp(-zg))
      var skip = 0.0
      var c2 = 0
      while (c2 < in) { skip += w(ws + r * in + c2) * x(xOff + c2); c2 += 1 }
      out(outOff + r) = skip + sg * zv
      if (cache != null) {
        cache(cOff + r) = h1(r)
        cache(cOff + u + r) = h2(r)
        cache(cOff + 2 * u + r) = sg
        cache(cOff + 3 * u + r) = zv
      }
      r += 1
    }
  }

  /** GRN backward at one position: consumes dOut, accumulates weight
    * grads into `g` (same offsets) and input grads into dx. */
  private def grnBackward(w: Array[Double], g: Array[Double], off: Int,
      u: Int, in: Int, x: Array[Double], xOff: Int,
      cache: Array[Double], cOff: Int,
      dOut: Array[Double], dOutOff: Int,
      dx: Array[Double], dxOff: Int): Unit = {
    val w1 = off; val b1 = w1 + u * in
    val w2 = b1 + u; val b2 = w2 + u * u
    val wg = b2 + u; val bg = wg + u * u
    val wv = bg + u; val bv = wv + u * u
    val ws = bv + u
    val dh2 = new Array[Double](u)
    var r = 0
    while (r < u) {
      val d = dOut(dOutOff + r)
      if (d != 0.0) {
        // skip path
        var c = 0
        while (c < in) {
          g(ws + r * in + c) += d * x(xOff + c)
          dx(dxOff + c) += w(ws + r * in + c) * d
          c += 1
        }
        // GLU path: out += σ(zg)·zv
        val sg = cache(cOff + 2 * u + r)
        val zv = cache(cOff + 3 * u + r)
        val dzv = d * sg
        val dzg = d * zv * sg * (1.0 - sg)
        g(bv + r) += dzv
        g(bg + r) += dzg
        c = 0
        while (c < u) {
          val h2c = cache(cOff + u + c)
          g(wv + r * u + c) += dzv * h2c
          g(wg + r * u + c) += dzg * h2c
          dh2(c) += w(wv + r * u + c) * dzv + w(wg + r * u + c) * dzg
          c += 1
        }
      }
      r += 1
    }
    r = 0
    while (r < u) {
      val d2 = dh2(r)
      if (d2 != 0.0) {
        g(b2 + r) += d2
        var c = 0
        while (c < u) {
          g(w2 + r * u + c) += d2 * cache(cOff + c) // h1(c)
          c += 1
        }
      }
      r += 1
    }
    // dh1(c) = Σ_r W2(r,c)·dh2(r); dz1 = dh1·(1−h1²)
    var c = 0
    while (c < u) {
      var dh1 = 0.0
      var r2 = 0
      while (r2 < u) { dh1 += w(w2 + r2 * u + c) * dh2(r2); r2 += 1 }
      val h1c = cache(cOff + c)
      val dz1 = dh1 * (1.0 - h1c * h1c)
      if (dz1 != 0.0) {
        g(b1 + c) += dz1
        var c2 = 0
        while (c2 < in) {
          g(w1 + c * in + c2) += dz1 * x(xOff + c2)
          dx(dxOff + c2) += w(w1 + c * in + c2) * dz1
          c2 += 1
        }
      }
      c += 1
    }
  }

  // ── LayerNormalization (Keras default epsilon 1e-3) ────────────────
  // params at off: [γ (U) | β (U)]; y_j = γ_j·(p_j − μ)/√(σ² + ε) + β_j
  // with μ/σ² over the hidden dim — row-local, so the fit stays
  // partition-independent.
  // Keras LayerNormalization default epsilon; AttentionRegressor.LnEps
  // + its separate-array LN kernel mirror this — keep numerics in sync.
  private val LnEps = 1e-3

  private def lnForward(w: Array[Double], off: Int, u: Int,
      p: Array[Double], pOff: Int, out: Array[Double], outOff: Int): Unit = {
    var mu = 0.0
    var j = 0
    while (j < u) { mu += p(pOff + j); j += 1 }
    mu /= u
    var va = 0.0
    j = 0
    while (j < u) { val d0 = p(pOff + j) - mu; va += d0 * d0; j += 1 }
    val inv = 1.0 / math.sqrt(va / u + LnEps)
    j = 0
    while (j < u) {
      out(outOff + j) = w(off + j) * ((p(pOff + j) - mu) * inv) + w(off + u + j)
      j += 1
    }
  }

  /** LN backward: consumes dOut, accumulates γ/β grads into `g` and
    * input grads into dp (+=). μ/σ/x̂ recomputed from the cached pre-LN
    * vector p — no extra forward state. */
  private def lnBackward(w: Array[Double], g: Array[Double], off: Int,
      u: Int, p: Array[Double], pOff: Int,
      dOut: Array[Double], dOutOff: Int,
      dp: Array[Double], dpOff: Int): Unit = {
    var mu = 0.0
    var j = 0
    while (j < u) { mu += p(pOff + j); j += 1 }
    mu /= u
    var va = 0.0
    j = 0
    while (j < u) { val d0 = p(pOff + j) - mu; va += d0 * d0; j += 1 }
    val inv = 1.0 / math.sqrt(va / u + LnEps)
    var mDx = 0.0  // mean over j of dx̂_j
    var mDxX = 0.0 // mean over j of dx̂_j·x̂_j
    j = 0
    while (j < u) {
      val xh = (p(pOff + j) - mu) * inv
      val dy = dOut(dOutOff + j)
      g(off + j) += dy * xh // dγ
      g(off + u + j) += dy  // dβ
      val dxh = dy * w(off + j)
      mDx += dxh
      mDxX += dxh * xh
      j += 1
    }
    mDx /= u
    mDxX /= u
    j = 0
    while (j < u) {
      val xh = (p(pOff + j) - mu) * inv
      val dxh = dOut(dOutOff + j) * w(off + j)
      dp(dpOff + j) += (dxh - mDx - xh * mDxX) * inv
      j += 1
    }
  }

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  class TftRegressionModel(
      override val uid: String,
      val units: Int,
      val heads: Int,
      val weights: Array[Double],
      val seqLen: Int,
      val featMean: Double,
      val featStd: Double,
      val labelMean: Double,
      val labelStd: Double,
      val lstmLayers: Int = 1,
      val layerNorm: Boolean = false)
    extends PredictionModel[Vector, TftRegressionModel] {

    override def numFeatures: Int = seqLen

    override def predict(features: Vector): Double = {
      val x = new Array[Double](seqLen)
      var i = 0
      while (i < seqLen) { x(i) = (features(i) - featMean) / featStd; i += 1 }
      val out = forward(x, units, heads, lstmLayers, layerNorm, weights, null, null)
      out * labelStd + labelMean
    }

    override def copy(extra: ParamMap): TftRegressionModel = copyValues(
      new TftRegressionModel(uid, units, heads, weights, seqLen,
        featMean, featStd, labelMean, labelStd, lstmLayers, layerNorm), extra)

    override def toString: String =
      s"TftRegressionModel(uid=$uid, units=$units, heads=$heads, T=$seqLen, L=$lstmLayers, ln=$layerNorm)"
  }

  // flat layout offsets for a given (u, layers, ln): the legacy block
  // (4 GRNs, LSTM layer 0, MHA, head) keeps its exact former offsets;
  // extra encoder layers, then the LN γ/β sites, are APPENDED so the
  // default (1 layer, no LN) layout — and its seeded init draw
  // sequence — is unchanged bit-for-bit.
  private final case class Offsets(u: Int, layers: Int = 1, ln: Boolean = false) {
    val grn0: Int = 0 // in = 1 (scalar embed)
    val grn1: Int = grn0 + grnSize(u, 1)
    val grn2: Int = grn1 + grnSize(u, u)
    val grn3: Int = grn2 + grnSize(u, u)
    val lstmWx: Int = grn3 + grnSize(u, u) // 4u×u
    val lstmWh: Int = lstmWx + 4 * u * u
    val lstmB: Int = lstmWh + 4 * u * u
    val wq: Int = lstmB + 4 * u
    val wk: Int = wq + u * u
    val wv: Int = wk + u * u
    val headW: Int = wv + u * u
    val headB: Int = headW + u
    private val legacyTotal: Int = headB + 1
    // extra encoder layer l ∈ [1, layers): [Wx | Wh | B | encGRN]
    private val extraStride: Int = 8 * u * u + 4 * u + grnSize(u, u)
    def xWx(l: Int): Int = legacyTotal + (l - 1) * extraStride
    def xWh(l: Int): Int = xWx(l) + 4 * u * u
    def xB(l: Int): Int = xWh(l) + 4 * u * u
    def xGrn(l: Int): Int = xB(l) + 4 * u
    private val afterExtra: Int = legacyTotal + (layers - 1) * extraStride
    // LN sites (γ+β = 2u each), reference order: GRN0 tail, each
    // encoder GRN tail, GRN2 tail, post-attention residual, GRN3 tail
    private def lnSite(i: Int): Int = afterExtra + i * 2 * u
    val lnGrn0: Int = lnSite(0)
    def lnEnc(l: Int): Int = lnSite(1 + l)
    val lnGrn2: Int = lnSite(1 + layers)
    val lnPost: Int = lnSite(2 + layers)
    val lnGrn3: Int = lnSite(3 + layers)
    val total: Int = if (ln) lnSite(4 + layers) else afterExtra
    // per-layer LSTM/GRN routing (layer 0 = the legacy block)
    def wxOf(l: Int): Int = if (l == 0) lstmWx else xWx(l)
    def whOf(l: Int): Int = if (l == 0) lstmWh else xWh(l)
    def bOf(l: Int): Int = if (l == 0) lstmB else xB(l)
    def grnEncOf(l: Int): Int = if (l == 0) grn1 else xGrn(l)
  }

  /** Forward pass. `keep` (non-null for training) receives the cached
    * intermediates; `mask` (null = off) is the MC-dropout hook: a
    * multiplier on the GRN3 output units feeding the linear head,
    * indexed (0, unit) — the reference's head-side `tft_dropout`
    * placement. Returns the standardized-space prediction.
    *
    * keep layout: 0=e (T×U, post-LN when on), 1=lstm gates
    * (L×T×6U: i,f,g̃,o,c,h), 2=s (L×T×U, post-GRN(+LN) per layer),
    * 3=q, 4=k, 5=v (T×U), 6=alpha (H×T×T), 7=a (T×U),
    * 8=grn0 cache (T×4U), 9=enc GRN caches (L×T×4U), 10=grn2 cache
    * (T×4U), 11=grn3 cache (4U), 12=ctx (U), 13=raw LSTM states
    * (L×T×U), 14=z (T×U, post-LN when on), and — LN mode only — the
    * pre-LN vectors: 15=GRN0 out (T×U), 16=enc GRN outs (L×T×U),
    * 17=GRN2 out (T×U), 18=residual sums (T×U), 19=GRN3 out (U).
    */
  private def forward(x: Array[Double], u: Int, nH: Int, layers: Int,
      ln: Boolean, w: Array[Double], keep: Array[Array[Double]],
      mask: (Int, Int) => Double): Double = {
    val t = x.length
    val o = Offsets(u, layers, ln)
    // 1. GRN embed per position (scalar → U) [+ LN site 0]
    val e = new Array[Double](t * u)
    val c0 = if (keep != null) new Array[Double](t * 4 * u) else null
    val p0 = if (ln) new Array[Double](t * u) else null
    var ti = 0
    while (ti < t) {
      if (ln) {
        grnForward(w, o.grn0, u, 1, x, ti, p0, ti * u,
          c0, if (c0 != null) ti * 4 * u else 0)
        lnForward(w, o.lnGrn0, u, p0, ti * u, e, ti * u)
      } else
        grnForward(w, o.grn0, u, 1, x, ti, e, ti * u,
          c0, if (c0 != null) ti * 4 * u else 0)
      ti += 1
    }
    // 2. LSTM encoder stack over e; each layer's states go through its
    // GRN [+ LN], producing that layer's s — the next layer's input
    val gAll = if (keep != null) new Array[Double](layers * t * 6 * u) else null
    val hAll = new Array[Double](layers * t * u)
    val sAll = new Array[Double](layers * t * u)
    val cEnc = if (keep != null) new Array[Double](layers * t * 4 * u) else null
    val pEnc = if (ln) new Array[Double](layers * t * u) else null
    var li = 0
    while (li < layers) {
      val wxB = o.wxOf(li); val whB = o.whOf(li); val bB = o.bOf(li)
      val inArr = if (li == 0) e else sAll
      val inBase = if (li == 0) 0 else (li - 1) * t * u
      var h = new Array[Double](u)
      var cc = new Array[Double](u)
      ti = 0
      while (ti < t) {
        val nh = new Array[Double](u)
        val nc = new Array[Double](u)
        var v = 0
        while (v < u) {
          var zi = w(bB + v)
          var zf = w(bB + u + v)
          var zg = w(bB + 2 * u + v)
          var zo = w(bB + 3 * u + v)
          var j = 0
          while (j < u) {
            val ej = inArr(inBase + ti * u + j)
            zi += w(wxB + (v) * u + j) * ej
            zf += w(wxB + (u + v) * u + j) * ej
            zg += w(wxB + (2 * u + v) * u + j) * ej
            zo += w(wxB + (3 * u + v) * u + j) * ej
            val hj = h(j)
            zi += w(whB + (v) * u + j) * hj
            zf += w(whB + (u + v) * u + j) * hj
            zg += w(whB + (2 * u + v) * u + j) * hj
            zo += w(whB + (3 * u + v) * u + j) * hj
            j += 1
          }
          val ig = sigmoid(zi)
          val fg = sigmoid(zf)
          val gg = math.tanh(zg)
          val og = sigmoid(zo)
          val ncv = fg * cc(v) + ig * gg
          val nhv = og * math.tanh(ncv)
          nc(v) = ncv
          nh(v) = nhv
          if (gAll != null) {
            val go = (li * t + ti) * 6 * u
            gAll(go + v) = ig
            gAll(go + u + v) = fg
            gAll(go + 2 * u + v) = gg
            gAll(go + 3 * u + v) = og
            gAll(go + 4 * u + v) = ncv
            gAll(go + 5 * u + v) = nhv
          }
          v += 1
        }
        System.arraycopy(nh, 0, hAll, (li * t + ti) * u, u)
        h = nh; cc = nc
        ti += 1
      }
      // per-position GRN on this layer's LSTM states [+ LN]
      val grnB = o.grnEncOf(li)
      ti = 0
      while (ti < t) {
        if (ln) {
          grnForward(w, grnB, u, u, hAll, (li * t + ti) * u, pEnc, (li * t + ti) * u,
            cEnc, if (cEnc != null) (li * t + ti) * 4 * u else 0)
          lnForward(w, o.lnEnc(li), u, pEnc, (li * t + ti) * u, sAll, (li * t + ti) * u)
        } else
          grnForward(w, grnB, u, u, hAll, (li * t + ti) * u, sAll, (li * t + ti) * u,
            cEnc, if (cEnc != null) (li * t + ti) * 4 * u else 0)
        ti += 1
      }
      li += 1
    }
    val sTop = (layers - 1) * t * u
    // 4. multi-head self-attention over the top s (AttentionRegressor math)
    val q = new Array[Double](t * u)
    val k = new Array[Double](t * u)
    val vv = new Array[Double](t * u)
    ti = 0
    while (ti < t) {
      var r = 0
      while (r < u) {
        var zq = 0.0; var zk = 0.0; var zv = 0.0
        var c = 0
        while (c < u) {
          val sc = sAll(sTop + ti * u + c)
          zq += w(o.wq + r * u + c) * sc
          zk += w(o.wk + r * u + c) * sc
          zv += w(o.wv + r * u + c) * sc
          c += 1
        }
        q(ti * u + r) = zq; k(ti * u + r) = zk; vv(ti * u + r) = zv
        r += 1
      }
      ti += 1
    }
    val dh = u / nH
    val scale = 1.0 / math.sqrt(dh.toDouble)
    val alpha = new Array[Double](nH * t * t)
    val a = new Array[Double](t * u)
    ti = 0
    while (ti < t) {
      var hh = 0
      while (hh < nH) {
        val base = hh * dh
        var mx = Double.NegativeInfinity
        var sIdx = 0
        while (sIdx < t) {
          var l = 0.0
          var j = 0
          while (j < dh) { l += q(ti * u + base + j) * k(sIdx * u + base + j); j += 1 }
          l *= scale
          alpha((hh * t + ti) * t + sIdx) = l
          if (l > mx) mx = l
          sIdx += 1
        }
        var z = 0.0
        sIdx = 0
        while (sIdx < t) {
          val ex = math.exp(alpha((hh * t + ti) * t + sIdx) - mx)
          alpha((hh * t + ti) * t + sIdx) = ex
          z += ex
          sIdx += 1
        }
        sIdx = 0
        while (sIdx < t) {
          val al = alpha((hh * t + ti) * t + sIdx) / z
          alpha((hh * t + ti) * t + sIdx) = al
          var j = 0
          while (j < dh) { a(ti * u + base + j) += al * vv(sIdx * u + base + j); j += 1 }
          sIdx += 1
        }
        hh += 1
      }
      ti += 1
    }
    // 5. post-attention GRN2 [+ LN] + residual skip [+ post-LN]:
    // legacy z_t = s_t + GRN2(a_t);
    // LN    z_t = LNpost(s_t + LN2(GRN2(a_t)))  (reference :125-127)
    val zSeq = new Array[Double](t * u)
    val c2 = if (keep != null) new Array[Double](t * 4 * u) else null
    val p2 = if (ln) new Array[Double](t * u) else null
    val pPost = if (ln) new Array[Double](t * u) else null
    ti = 0
    while (ti < t) {
      if (ln) {
        grnForward(w, o.grn2, u, u, a, ti * u, p2, ti * u,
          c2, if (c2 != null) ti * 4 * u else 0)
        val g2 = new Array[Double](u)
        lnForward(w, o.lnGrn2, u, p2, ti * u, g2, 0)
        var j = 0
        while (j < u) { pPost(ti * u + j) = sAll(sTop + ti * u + j) + g2(j); j += 1 }
        lnForward(w, o.lnPost, u, pPost, ti * u, zSeq, ti * u)
      } else {
        grnForward(w, o.grn2, u, u, a, ti * u, zSeq, ti * u,
          c2, if (c2 != null) ti * 4 * u else 0)
        var j = 0
        while (j < u) { zSeq(ti * u + j) += sAll(sTop + ti * u + j); j += 1 }
      }
      ti += 1
    }
    // 6. last-timestep context → GRN3 [+ LN] → linear head
    val ctx = new Array[Double](u)
    val c3 = if (keep != null) new Array[Double](4 * u) else null
    val p3 = if (ln) new Array[Double](u) else null
    if (ln) {
      grnForward(w, o.grn3, u, u, zSeq, (t - 1) * u, p3, 0, c3, 0)
      lnForward(w, o.lnGrn3, u, p3, 0, ctx, 0)
    } else
      grnForward(w, o.grn3, u, u, zSeq, (t - 1) * u, ctx, 0, c3, 0)
    var y = w(o.headB)
    var j = 0
    while (j < u) {
      val cj = if (mask != null) ctx(j) * mask(0, j) else ctx(j)
      y += w(o.headW + j) * cj
      j += 1
    }
    if (keep != null) {
      keep(0) = e; keep(1) = gAll; keep(2) = sAll
      keep(3) = q; keep(4) = k; keep(5) = vv
      keep(6) = alpha; keep(7) = a
      keep(8) = c0; keep(9) = cEnc; keep(10) = c2; keep(11) = c3
      keep(12) = ctx; keep(13) = hAll; keep(14) = zSeq
      keep(15) = p0; keep(16) = pEnc; keep(17) = p2
      keep(18) = pPost; keep(19) = p3
    }
    y
  }

  /** MC-dropout bridge for [[graft.ml.McDropout]]. */
  private[ml] def forwardMasked(x: Array[Double], u: Int, nH: Int,
      w: Array[Double], mask: (Int, Int) => Double,
      layers: Int = 1, ln: Boolean = false): Double =
    forward(x, u, nH, layers, ln, w, null, mask)

  /** Fit on an assembled frame — the `fitPerHorizonWith` contract.
    * `dropout` > 0: per-epoch inverted masks on the GRN3 context units
    * feeding the head (the reference's `tft_dropout` at the output
    * block), from the [[McDropout]] counter hash; `dropout = 0` stays
    * the mask-free path bit-for-bit. `callbacks` (M11) as elsewhere. */
  def fit(df: DataFrame, labelCol: String, conf: TftConfig = TftConfig(),
      featuresCol: String = "features", dropout: Double = 0.0,
      callbacks: Seq[Callbacks.TrainingCallback] = Nil,
      opt: Optimizer.OptConfig = Optimizer.FullBatchGd,
      // val-loss monitor set (same shape as df) — mini-batch path only;
      // the full-batch path's callbacks keep seeing train loss
      valData: Option[DataFrame] = None): TftRegressionModel = {
    val u = conf.units
    val nH = conf.heads
    val layers = conf.lstmLayers
    val ln = conf.layerNorm
    require(u > 0 && nH > 0 && u % nH == 0,
      s"TftRegressor.fit: units must split evenly across heads, got $conf")
    require(layers >= 1, s"TftRegressor.fit: lstmLayers must be >= 1, got $layers")
    require(dropout >= 0.0 && dropout < 1.0,
      s"TftRegressor.fit: dropout must be in [0, 1), got $dropout")
    val o = Offsets(u, layers, ln)
    val sc = df.sparkSession.sparkContext
    val data = df.select(col(featuresCol), col(labelCol).cast("double"))
      .rdd.map(r => (r.getAs[Vector](0), r.getDouble(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val head0 = data.take(1)
      require(head0.nonEmpty, "TftRegressor.fit: empty training set")
      val t = head0(0)._1.size
      val (sx, sxx, sy, syy, n) = OrderedAgg(data, (0.0, 0.0, 0.0, 0.0, 0L))(
        seqOp = { case ((sx, sxx, sy, syy, n2), (x, y)) =>
          var a = sx; var aa = sxx
          var j = 0
          while (j < t) { val v = x(j); a += v; aa += v * v; j += 1 }
          (a, aa, sy + y, syy + y * y, n2 + 1)
        },
        combOp = { case ((ax, axx, ay, ayy, an), (bx, bxx, by, byy, bn)) =>
          (ax + bx, axx + bxx, ay + by, ayy + byy, an + bn)
        })
      require(n > 0, "TftRegressor.fit: empty training set")
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

      val rnd = new java.util.Random(conf.seed)
      val weights = new Array[Double](o.total)
      var i = 0
      while (i < o.total) {
        weights(i) = rnd.nextGaussian() * math.sqrt(1.0 / u)
        i += 1
      }
      // standard practice: LSTM forget bias 1 so memory flows from epoch 0
      var li0 = 0
      while (li0 < layers) {
        var v0 = 0
        while (v0 < u) { weights(o.bOf(li0) + u + v0) = 1.0; v0 += 1 }
        li0 += 1
      }
      // LN sites init γ = 1, β = 0 (Keras defaults) — appended after the
      // legacy block, so the legacy draws are untouched
      if (ln) {
        var s0 = 0
        while (s0 < 4 + layers) {
          val base = o.lnGrn0 + s0 * 2 * u
          var j0 = 0
          while (j0 < u) {
            weights(base + j0) = 1.0
            weights(base + u + j0) = 0.0
            j0 += 1
          }
          s0 += 1
        }
      }
      val velocity = new Array[Double](o.total)
      val dhh = u / nH
      val scale = 1.0 / math.sqrt(dhh.toDouble)

      // Row-local forward+backward shared by BOTH training paths:
      // gradient into g(0 until o.total), loss into g(o.total); the
      // full-batch aggregate hands its accumulator in directly
      // (bit-for-bit), the mini-batch loop a fresh scratch.
      def rowGradInto(w: Array[Double], mk: Array[Double], xv: Vector,
          y: Double, g: Array[Double]): Unit = {
            val x = new Array[Double](t)
            var j = 0
            while (j < t) { x(j) = (xv(j) - fMean) / fStd; j += 1 }
            val keep = new Array[Array[Double]](20)
            val out = forward(x, u, nH, layers, ln, w, keep,
              if (mk == null) null else (_: Int, i2: Int) => mk(i2))
            val err = out - (y - yMean) / yStd
            g(o.total) += 0.5 * err * err
            val e = keep(0); val gAll = keep(1); val sAll = keep(2)
            val q = keep(3); val k = keep(4); val vv = keep(5)
            val alpha = keep(6)
            val c0 = keep(8); val cEnc = keep(9); val c2 = keep(10)
            val c3 = keep(11); val ctx = keep(12)
            val hAll = keep(13); val zSeq = keep(14)
            val p0 = keep(15); val pEnc = keep(16); val p2 = keep(17)
            val pPost = keep(18); val p3 = keep(19)
            val sTop = (layers - 1) * t * u

            // head + GRN3 [+ LN3] backward (mask folds into the head path)
            val dCtx = new Array[Double](u)
            var j2 = 0
            while (j2 < u) {
              val m = if (mk == null) 1.0 else mk(j2)
              g(o.headW + j2) += err * ctx(j2) * m
              dCtx(j2) = err * w(o.headW + j2) * m
              j2 += 1
            }
            g(o.headB) += err
            val dz = new Array[Double](t * u) // grads on z_t (only T−1 seeded)
            if (ln) {
              val dp3 = new Array[Double](u)
              lnBackward(w, g, o.lnGrn3, u, p3, 0, dCtx, 0, dp3, 0)
              grnBackward(w, g, o.grn3, u, u, zSeq, (t - 1) * u, c3, 0,
                dp3, 0, dz, (t - 1) * u)
            } else
              grnBackward(w, g, o.grn3, u, u, zSeq, (t - 1) * u, c3, 0,
                dCtx, 0, dz, (t - 1) * u)

            // z path: legacy z_t = s_t + GRN2(a_t);
            // LN z_t = LNpost(s_t + LN2(GRN2(a_t)))
            val ds = new Array[Double](t * u) // grads on the TOP layer's s
            val da = new Array[Double](t * u)
            var ti = 0
            while (ti < t) {
              if (ln) {
                val dzp = new Array[Double](u) // d(residual sum)
                lnBackward(w, g, o.lnPost, u, pPost, ti * u, dz, ti * u, dzp, 0)
                var j3 = 0
                while (j3 < u) { ds(ti * u + j3) += dzp(j3); j3 += 1 }
                val dg2 = new Array[Double](u) // d(GRN2 pre-LN out)
                lnBackward(w, g, o.lnGrn2, u, p2, ti * u, dzp, 0, dg2, 0)
                grnBackward(w, g, o.grn2, u, u, keep(7), ti * u, c2, ti * 4 * u,
                  dg2, 0, da, ti * u)
              } else {
                var j3 = 0
                while (j3 < u) { ds(ti * u + j3) += dz(ti * u + j3); j3 += 1 }
                grnBackward(w, g, o.grn2, u, u, keep(7), ti * u, c2, ti * 4 * u,
                  dz, ti * u, da, ti * u)
              }
              ti += 1
            }

            // MHA backward: da → dq/dk/dv → dWq/Wk/Wv and ds (top layer)
            val dq = new Array[Double](t * u)
            val dk = new Array[Double](t * u)
            val dv = new Array[Double](t * u)
            ti = 0
            while (ti < t) {
              var hh = 0
              while (hh < nH) {
                val base = hh * dhh
                val dal = new Array[Double](t)
                var sI = 0
                while (sI < t) {
                  var acc = 0.0
                  var j4 = 0
                  while (j4 < dhh) {
                    acc += da(ti * u + base + j4) * vv(sI * u + base + j4)
                    j4 += 1
                  }
                  dal(sI) = acc
                  sI += 1
                }
                var dot = 0.0
                sI = 0
                while (sI < t) { dot += alpha((hh * t + ti) * t + sI) * dal(sI); sI += 1 }
                sI = 0
                while (sI < t) {
                  val al = alpha((hh * t + ti) * t + sI)
                  val dl = al * (dal(sI) - dot) * scale
                  var j4 = 0
                  while (j4 < dhh) {
                    dq(ti * u + base + j4) += dl * k(sI * u + base + j4)
                    dk(sI * u + base + j4) += dl * q(ti * u + base + j4)
                    dv(sI * u + base + j4) += al * da(ti * u + base + j4)
                    j4 += 1
                  }
                  sI += 1
                }
                hh += 1
              }
              ti += 1
            }
            ti = 0
            while (ti < t) {
              var r = 0
              while (r < u) {
                val dqr = dq(ti * u + r); val dkr = dk(ti * u + r); val dvr = dv(ti * u + r)
                var c = 0
                while (c < u) {
                  val scc = sAll(sTop + ti * u + c)
                  g(o.wq + r * u + c) += dqr * scc
                  g(o.wk + r * u + c) += dkr * scc
                  g(o.wv + r * u + c) += dvr * scc
                  ds(ti * u + c) += dqr * w(o.wq + r * u + c) +
                    dkr * w(o.wk + r * u + c) + dvr * w(o.wv + r * u + c)
                  c += 1
                }
                r += 1
              }
              ti += 1
            }

            // encoder stack backward, top layer down: s-grads → (LN +)
            // GRN backward → LSTM state grads → BPTT → input grads
            // (= the layer below's s-grads, or the embed grads at L0)
            var dsl = ds
            var li = layers - 1
            var de: Array[Double] = null
            while (li >= 0) {
              val dhSeq = new Array[Double](t * u)
              val grnB = o.grnEncOf(li)
              ti = 0
              while (ti < t) {
                if (ln) {
                  val dsp = new Array[Double](u)
                  lnBackward(w, g, o.lnEnc(li), u, pEnc, (li * t + ti) * u,
                    dsl, ti * u, dsp, 0)
                  grnBackward(w, g, grnB, u, u, hAll, (li * t + ti) * u,
                    cEnc, (li * t + ti) * 4 * u, dsp, 0, dhSeq, ti * u)
                } else
                  grnBackward(w, g, grnB, u, u, hAll, (li * t + ti) * u,
                    cEnc, (li * t + ti) * 4 * u, dsl, ti * u, dhSeq, ti * u)
                ti += 1
              }
              // LSTM BPTT for layer li with per-step incoming dh,
              // emitting input grads dIn
              val wxB = o.wxOf(li); val whB = o.whOf(li); val bB = o.bOf(li)
              val inArr = if (li == 0) e else sAll
              val inBase = if (li == 0) 0 else (li - 1) * t * u
              val dIn = new Array[Double](t * u)
              var dhNext = new Array[Double](u)
              val dcNext = new Array[Double](u)
              val dzStep = new Array[Double](4 * u) // (dzi|dzf|dzg|dzo)
              ti = t - 1
              while (ti >= 0) {
                val go = (li * t + ti) * 6 * u
                var v = 0
                while (v < u) {
                  val dhv = dhSeq(ti * u + v) + dhNext(v)
                  val ig = gAll(go + v)
                  val fg = gAll(go + u + v)
                  val gg = gAll(go + 2 * u + v)
                  val og = gAll(go + 3 * u + v)
                  val cv = gAll(go + 4 * u + v)
                  val tc = math.tanh(cv)
                  val dzo = dhv * tc * og * (1.0 - og)
                  val dcv = dcNext(v) + dhv * og * (1.0 - tc * tc)
                  val cPrev = if (ti == 0) 0.0 else gAll((li * t + ti - 1) * 6 * u + 4 * u + v)
                  val dzi = dcv * gg * ig * (1.0 - ig)
                  val dzf = dcv * cPrev * fg * (1.0 - fg)
                  val dzg = dcv * ig * (1.0 - gg * gg)
                  dcNext(v) = dcv * fg
                  dzStep(v) = dzi
                  dzStep(u + v) = dzf
                  dzStep(2 * u + v) = dzg
                  dzStep(3 * u + v) = dzo
                  g(bB + v) += dzi
                  g(bB + u + v) += dzf
                  g(bB + 2 * u + v) += dzg
                  g(bB + 3 * u + v) += dzo
                  var j5 = 0
                  while (j5 < u) {
                    val ej = inArr(inBase + ti * u + j5)
                    g(wxB + (v) * u + j5) += dzi * ej
                    g(wxB + (u + v) * u + j5) += dzf * ej
                    g(wxB + (2 * u + v) * u + j5) += dzg * ej
                    g(wxB + (3 * u + v) * u + j5) += dzo * ej
                    dIn(ti * u + j5) += dzi * w(wxB + (v) * u + j5) +
                      dzf * w(wxB + (u + v) * u + j5) +
                      dzg * w(wxB + (2 * u + v) * u + j5) +
                      dzo * w(wxB + (3 * u + v) * u + j5)
                    if (ti > 0) {
                      val hj = gAll((li * t + ti - 1) * 6 * u + 5 * u + j5)
                      g(whB + (v) * u + j5) += dzi * hj
                      g(whB + (u + v) * u + j5) += dzf * hj
                      g(whB + (2 * u + v) * u + j5) += dzg * hj
                      g(whB + (3 * u + v) * u + j5) += dzo * hj
                    }
                    j5 += 1
                  }
                  v += 1
                }
                // dhPrev(j) = Σ over this step's gate deltas via Wh
                val dhPrev = new Array[Double](u)
                if (ti > 0) {
                  var j6 = 0
                  while (j6 < u) {
                    var acc = 0.0
                    var v2 = 0
                    while (v2 < u) {
                      acc += dzStep(v2) * w(whB + (v2) * u + j6) +
                        dzStep(u + v2) * w(whB + (u + v2) * u + j6) +
                        dzStep(2 * u + v2) * w(whB + (2 * u + v2) * u + j6) +
                        dzStep(3 * u + v2) * w(whB + (3 * u + v2) * u + j6)
                      v2 += 1
                    }
                    dhPrev(j6) = acc
                    j6 += 1
                  }
                }
                dhNext = dhPrev
                ti -= 1
              }
              if (li == 0) de = dIn else dsl = dIn
              li -= 1
            }

            // GRN0 [+ LN0] backward per position (input grads discarded)
            val dxSink = new Array[Double](1)
            ti = 0
            while (ti < t) {
              dxSink(0) = 0.0
              if (ln) {
                val dp0 = new Array[Double](u)
                lnBackward(w, g, o.lnGrn0, u, p0, ti * u, de, ti * u, dp0, 0)
                grnBackward(w, g, o.grn0, u, 1, x, ti, c0, ti * 4 * u,
                  dp0, 0, dxSink, 0)
              } else
                grnBackward(w, g, o.grn0, u, 1, x, ti, c0, ti * 4 * u,
                  de, ti * u, dxSink, 0)
              ti += 1
            }
      }

      // per-step inverted-dropout mask (null = off); stepId = epoch
      // (full-batch) or epoch*B + b (mini-batch, Keras semantics)
      def mkMask(stepId: Long): Array[Double] =
        if (dropout == 0.0) null
        else Array.tabulate(u)(i =>
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
        val grad = OrderedAgg(data, new Array[Double](o.total + 1))(
          seqOp = { case (g, (xv, y)) =>
            rowGradInto(bcW.value, mk, xv, y, g); g
          },
          combOp = { (a2, b2) =>
            var k2 = 0
            while (k2 < o.total + 1) { a2(k2) += b2(k2); k2 += 1 }
            a2
          })
        bcW.destroy()
        var k3 = 0
        while (k3 < o.total) {
          velocity(k3) = conf.momentum * velocity(k3) - lrCur * grad(k3) / n
          weights(k3) += velocity(k3)
          k3 += 1
        }
        if (callbacks.nonEmpty) {
          val loss = grad(o.total) / n
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

      new TftRegressionModel(
        s"tft_${java.util.UUID.randomUUID().toString.take(8)}",
        u, nH, weights.clone(), t, fMean, fStd, yMean, yStd, layers, ln)
    } finally { data.unpersist(blocking = false); () }
  }

  /** S11 artifact sink. */
  def save(model: TftRegressionModel, path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    Seq((model.uid, model.units, model.heads, model.weights.toSeq,
        model.seqLen, model.featMean, model.featStd, model.labelMean,
        model.labelStd, model.lstmLayers, model.layerNorm))
      .toDF("uid", "units", "heads", "w", "seq_len", "feat_mean", "feat_std",
        "label_mean", "label_std", "lstm_layers", "layer_norm")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** S11 artifact source. Artifacts written before the lstmLayers /
    * layerNorm options lack those columns; they were single-layer
    * no-LN fits, so default 1 / false (the S11 back-compat contract). */
  def load(spark: SparkSession, path: String): TftRegressionModel = {
    val r = spark.read.parquet(path).head()
    val fields = r.schema.fieldNames.toSet
    val layers = if (fields.contains("lstm_layers")) r.getAs[Int]("lstm_layers") else 1
    val ln = if (fields.contains("layer_norm")) r.getAs[Boolean]("layer_norm") else false
    new TftRegressionModel(
      r.getAs[String]("uid"), r.getAs[Int]("units"), r.getAs[Int]("heads"),
      r.getAs[scala.collection.Seq[Double]]("w").toArray,
      r.getAs[Int]("seq_len"),
      r.getAs[Double]("feat_mean"), r.getAs[Double]("feat_std"),
      r.getAs[Double]("label_mean"), r.getAs[Double]("label_std"),
      layers, ln)
  }
}
