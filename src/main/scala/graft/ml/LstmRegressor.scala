package graft.ml

import org.apache.spark.ml.PredictionModel
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** M8 recurrent head: an LSTM regressor — the Spark-native
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
  * `LstmConfig(bidirectional = true)` adds the reference's
  * `Bidirectional(LSTM(...))` wrapper (`predictor_plugin_lstm.py:506-510`,
  * also the transformer head's BiLSTM readout,
  * `predictor_plugin_transformer.py:89`): an independently-parameterized
  * second cell walks the REVERSED sequence and the readout concatenates
  * both final states (Keras `merge_mode="concat"` for
  * `return_sequences=False`) — the backward walk reads early positions
  * LAST, so direction-asymmetric signal the forward cell must carry
  * across T steps is one step away (spec-pinned on an early-position
  * teacher). Off (the default) keeps the former single-cell path
  * bit-for-bit.
  *
  * Training is the same DISTRIBUTED full-batch pattern as
  * [[MlpRegressor]]/[[TcnRegressor]]: per epoch one `treeAggregate`
  * computes the exact MSE gradient — forward + backprop-through-time per
  * row (the T-step loop lives INSIDE the row kernel; rows stay
  * independent, so the pass parallelizes exactly like the other heads) —
  * partials merge tree-wise, the driver applies a momentum update, new
  * weights broadcast. Re-expression boundaries: single layer per
  * direction, linear readout of the final state(s) rather than
  * per-horizon stacked heads (the per-horizon split lives in
  * `Forecaster.fitPerHorizonWith`).
  *
  * Gate layout per unit u: z_g(u) = Wx(g,u)·x_t + Σ_v Wh(g,u,v)·h(v) +
  * b(g,u) for gates g ∈ {input, forget, cell, output}; c' = f⊙c + i⊙g̃;
  * h' = o⊙tanh(c'). Forget bias initialized to 1 (standard practice —
  * gradients flow through the cell path from epoch 0).
  */
// Serializable: fit's row-gradient helper is a local def lifted onto this
// object; Spark task closures referencing it serialize the stateless object.
object LstmRegressor extends Serializable {

  /** `bidirectional` = the reference's `Bidirectional(LSTM)` wrapper
    * (off = the former single-cell path bit-for-bit). */
  case class LstmConfig(units: Int = 6, epochs: Int = 200, lr: Double = 0.1,
      momentum: Double = 0.9, seed: Long = 42L, bidirectional: Boolean = false)

  /** Fitted model; weight arrays are row-major over [gate][unit](+[unit])
    * with gate order (input, forget, cell, output). Bidirectional models
    * carry the backward cell in `wx2`/`wh2`/`b2` (null = forward-only)
    * and a 2·units `headW` over the concatenated final states.
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
      val labelStd: Double,
      val wx2: Array[Double] = null, // backward cell (bidirectional only)
      val wh2: Array[Double] = null,
      val b2: Array[Double] = null)
    extends PredictionModel[Vector, LstmRegressionModel] {

    def bidirectional: Boolean = wx2 != null

    override def numFeatures: Int = seqLen

    override def predict(features: Vector): Double = {
      val t = seqLen
      val x = new Array[Double](t)
      var i = 0
      while (i < t) { x(i) = (features(i) - featMean) / featStd; i += 1 }
      val out =
        if (wx2 == null) forward(x, units, wx, wh, b, headW, headB, null)
        else forwardBi(x, units, wx, wh, b, wx2, wh2, b2, headW, headB,
          null, null, null)
      out * labelStd + labelMean
    }

    override def copy(extra: ParamMap): LstmRegressionModel = copyValues(
      new LstmRegressionModel(uid, units, wx, wh, b, headW, headB, seqLen,
        featMean, featStd, labelMean, labelStd, wx2, wh2, b2), extra)

    override def toString: String =
      s"LstmRegressionModel(uid=$uid, units=$units, T=$seqLen, bi=$bidirectional)"
  }

  /** One direction's cell walk over `x`; fills `keep` (per-step 6u rows
    * of i, f, g̃, o, c, h) when non-null and returns the final hidden
    * state. `mask` (null = off) is the variational hidden-unit mask,
    * indexed (maskLayer, unit) and CONSTANT across timesteps (Gal &
    * Ghahramani, NeurIPS 2016) — applied to h as it feeds both the
    * recurrence and the readout; the cell state stays unmasked. */
  private def runCell(x: Array[Double], u: Int, wx: Array[Double],
      wh: Array[Double], b: Array[Double], keep: Array[Array[Double]],
      mask: (Int, Int) => Double, maskLayer: Int): Array[Double] = {
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
        val hh = if (mask != null) hh0 * mask(maskLayer, v) else hh0
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
    h
  }

  /** Forward pass; when `keep` != null it receives per-step
    * (i, f, g̃, o, c, h) rows for BPTT: keep(t) = Array of 6*units.
    * Returns the standardized-space prediction.
    *
    * `mask` (null = off) is the MC-dropout hook — see [[runCell]];
    * forward-only models use mask layer 0.
    */
  private def forward(x: Array[Double], u: Int, wx: Array[Double],
      wh: Array[Double], b: Array[Double], headW: Array[Double],
      headB: Double, keep: Array[Array[Double]],
      mask: (Int, Int) => Double = null): Double = {
    val h = runCell(x, u, wx, wh, b, keep, mask, 0)
    var y = headB
    var v = 0
    while (v < u) { y += headW(v) * h(v); v += 1 }
    y
  }

  /** Bidirectional forward: the forward cell walks `x`, the backward
    * cell walks `x` reversed (mask layer 1), and the 2u-wide head reads
    * the concatenated final states — Keras `Bidirectional(LSTM(
    * return_sequences=False), merge_mode="concat")`. `keepF`/`keepB`
    * receive the per-direction step rows for BPTT. */
  private def forwardBi(x: Array[Double], u: Int, wx: Array[Double],
      wh: Array[Double], b: Array[Double], wx2: Array[Double],
      wh2: Array[Double], b2: Array[Double], headW: Array[Double],
      headB: Double, keepF: Array[Array[Double]], keepB: Array[Array[Double]],
      mask: (Int, Int) => Double): Double = {
    val t = x.length
    val xr = new Array[Double](t)
    var i = 0
    while (i < t) { xr(i) = x(t - 1 - i); i += 1 }
    val hf = runCell(x, u, wx, wh, b, keepF, mask, 0)
    val hb = runCell(xr, u, wx2, wh2, b2, keepB, mask, 1)
    var y = headB
    var v = 0
    while (v < u) { y += headW(v) * hf(v); v += 1 }
    v = 0
    while (v < u) { y += headW(u + v) * hb(v); v += 1 }
    y
  }

  @inline private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** MC-dropout bridge for [[graft.ml.McDropout]]: the shared forward
    * with a variational hidden-unit mask, on a pre-standardized window.
    * Returns the STANDARDIZED-space prediction. Bidirectional models
    * pass their backward cell; masks index layer 0 (forward hidden) and
    * layer 1 (backward hidden).
    */
  private[ml] def forwardMasked(x: Array[Double], u: Int, wx: Array[Double],
      wh: Array[Double], b: Array[Double], headW: Array[Double],
      headB: Double, mask: (Int, Int) => Double,
      wx2: Array[Double] = null, wh2: Array[Double] = null,
      b2: Array[Double] = null): Double =
    if (wx2 == null) forward(x, u, wx, wh, b, headW, headB, null, mask)
    else forwardBi(x, u, wx, wh, b, wx2, wh2, b2, headW, headB, null, null, mask)

  /** One direction's BPTT: consumes the per-step `keep` rows of a
    * [[runCell]] walk over `x`, seeds the final-state delta with `dh0`,
    * and accumulates gate-weight gradients into `g` at the direction's
    * offsets. `mkR` (null = off) is the direction's variational mask. */
  private def bpttInto(g: Array[Double], x: Array[Double],
      keep: Array[Array[Double]], u: Int, wxO: Int, whO: Int, bO: Int,
      wh: Array[Double], dh0: Array[Double], mkR: Array[Double]): Unit = {
    val t = x.length
    val dh = new Array[Double](u)
    val dc = new Array[Double](u)
    System.arraycopy(dh0, 0, dh, 0, u)
    var ti = t - 1
    while (ti >= 0) {
      val row = keep(ti)
      val prevH: Array[Double] = if (ti == 0) null else keep(ti - 1)
      val dhNext = new Array[Double](u)
      val dcNext = new Array[Double](u)
      var v = 0
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
        g(wxO + v) += dZi * xi
        g(wxO + u + v) += dZf * xi
        g(wxO + 2 * u + v) += dZg * xi
        g(wxO + 3 * u + v) += dZo * xi
        g(bO + v) += dZi
        g(bO + u + v) += dZf
        g(bO + 2 * u + v) += dZg
        g(bO + 3 * u + v) += dZo
        var w2 = 0
        while (w2 < u) {
          val hPrev = if (ti == 0) 0.0 else prevH(5 * u + w2)
          g(whO + (v) * u + w2) += dZi * hPrev
          g(whO + (u + v) * u + w2) += dZf * hPrev
          g(whO + (2 * u + v) * u + w2) += dZg * hPrev
          g(whO + (3 * u + v) * u + w2) += dZo * hPrev
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
    * BPTT folds the same mask into dOut; bidirectional fits draw an
    * independent mask per direction. `callbacks` (M11): epoch-end
    * training control from the same gradient pass.
    */
  def fit(df: DataFrame, labelCol: String, conf: LstmConfig = LstmConfig(),
      featuresCol: String = "features", dropout: Double = 0.0,
      callbacks: Seq[Callbacks.TrainingCallback] = Nil,
      recurrentDropout: Double = 0.0,
      opt: Optimizer.OptConfig = Optimizer.FullBatchGd,
      // val-loss monitor set (same shape as df) — mini-batch path only;
      // the full-batch path's callbacks keep seeing train loss
      valData: Option[DataFrame] = None): LstmRegressionModel = {
    val u = conf.units
    val bi = conf.bidirectional
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
      // + bidirectional appends [wx2 | wh2 | b2 | headW2 (u)] so the
      // default layout — and its seeded init draws — are unchanged
      val wxOff = 0
      val whOff = 4 * u
      val bOff = whOff + 4 * u * u
      val hOff = bOff + 4 * u
      val hbOff = hOff + u
      val wx2Off = hbOff + 1
      val wh2Off = wx2Off + 4 * u
      val b2Off = wh2Off + 4 * u * u
      val h2Off = b2Off + 4 * u
      val nW = if (bi) h2Off + u else hbOff + 1
      val rnd = new java.util.Random(conf.seed)
      val weights = new Array[Double](nW)
      val rScale = math.sqrt(1.0 / u)
      var i = 0
      while (i < 4 * u) { weights(wxOff + i) = rnd.nextGaussian() * 0.5; i += 1 }
      i = 0
      while (i < 4 * u * u) { weights(whOff + i) = rnd.nextGaussian() * rScale; i += 1 }
      i = 0
      while (i < u) { weights(bOff + u + i) = 1.0; i += 1 } // forget bias = 1
      i = 0
      while (i < u) { weights(hOff + i) = rnd.nextGaussian() * rScale; i += 1 }
      if (bi) {
        i = 0
        while (i < 4 * u) { weights(wx2Off + i) = rnd.nextGaussian() * 0.5; i += 1 }
        i = 0
        while (i < 4 * u * u) { weights(wh2Off + i) = rnd.nextGaussian() * rScale; i += 1 }
        i = 0
        while (i < u) { weights(b2Off + u + i) = 1.0; i += 1 }
        i = 0
        while (i < u) { weights(h2Off + i) = rnd.nextGaussian() * rScale; i += 1 }
      }
      val velocity = new Array[Double](nW)

      // Row-local BPTT shared by BOTH training paths: accumulates the
      // row's gradient into g(0 until nW) and its loss into g(nW); the
      // full-batch aggregate hands its accumulator in directly
      // (per-slot op order unchanged, bit-for-bit), the mini-batch loop
      // a fresh scratch. Bidirectional masks: mk spans 2u head units,
      // mkR/mkR2 are the per-direction variational masks.
      def rowGradInto(wf: Array[Double], mk: Array[Double],
          mkR: Array[Double], mkR2: Array[Double], xv: Vector, y: Double,
          g: Array[Double]): Unit = {
            val wx = java.util.Arrays.copyOfRange(wf, wxOff, wxOff + 4 * u)
            val wh = java.util.Arrays.copyOfRange(wf, whOff, whOff + 4 * u * u)
            val bArr = java.util.Arrays.copyOfRange(wf, bOff, bOff + 4 * u)
            val headW =
              if (!bi) java.util.Arrays.copyOfRange(wf, hOff, hOff + u)
              else java.util.Arrays.copyOfRange(wf, hOff, hOff + u) ++
                java.util.Arrays.copyOfRange(wf, h2Off, h2Off + u)
            val headB = wf(hbOff)
            // masked head = dropout on the final state(s) (see scaladoc)
            val headWm =
              if (mk == null) headW
              else Array.tabulate(headW.length)(i => headW(i) * mk(i))
            val x = new Array[Double](t)
            var j = 0
            while (j < t) { x(j) = (xv(j) - fMean) / fStd; j += 1 }
            if (!bi) {
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
              val dh0 = new Array[Double](u)
              v = 0
              while (v < u) { dh0(v) = err * headWm(v); v += 1 }
              bpttInto(g, x, keep, u, wxOff, whOff, bOff, wh, dh0, mkR)
            } else {
              val wx2 = java.util.Arrays.copyOfRange(wf, wx2Off, wx2Off + 4 * u)
              val wh2 = java.util.Arrays.copyOfRange(wf, wh2Off, wh2Off + 4 * u * u)
              val b2Arr = java.util.Arrays.copyOfRange(wf, b2Off, b2Off + 4 * u)
              val keepF = new Array[Array[Double]](t)
              val keepB = new Array[Array[Double]](t)
              val mask: (Int, Int) => Double =
                if (mkR == null && mkR2 == null) null
                else (l, v) =>
                  if (l == 0) { if (mkR == null) 1.0 else mkR(v) }
                  else { if (mkR2 == null) 1.0 else mkR2(v) }
              val out = forwardBi(x, u, wx, wh, bArr, wx2, wh2, b2Arr,
                headWm, headB, keepF, keepB, mask)
              val err = out - (y - yMean) / yStd
              g(nW) += 0.5 * err * err
              val hfT = keepF(t - 1)
              val hbT = keepB(t - 1)
              var v = 0
              while (v < u) {
                g(hOff + v) += err * hfT(5 * u + v) * (if (mk == null) 1.0 else mk(v))
                g(h2Off + v) += err * hbT(5 * u + v) * (if (mk == null) 1.0 else mk(u + v))
                v += 1
              }
              g(hbOff) += err
              val dh0f = new Array[Double](u)
              val dh0b = new Array[Double](u)
              v = 0
              while (v < u) {
                dh0f(v) = err * headWm(v)
                dh0b(v) = err * headWm(u + v)
                v += 1
              }
              val xr = new Array[Double](t)
              var i2 = 0
              while (i2 < t) { xr(i2) = x(t - 1 - i2); i2 += 1 }
              bpttInto(g, x, keepF, u, wxOff, whOff, bOff, wh, dh0f, mkR)
              bpttInto(g, xr, keepB, u, wx2Off, wh2Off, b2Off, wh2, dh0b, mkR2)
            }
      }

      // per-step inverted-dropout masks (null = off): head input
      // (layer 0, spanning both directions when bidirectional) and the
      // per-direction variational recurrent masks (layers 1 and 2);
      // stepId = epoch (full-batch) or epoch*B + b (mini-batch)
      val headUnits = if (bi) 2 * u else u
      def mkMask(stepId: Long): (Array[Double], Array[Double], Array[Double]) = (
        if (dropout == 0.0) null
        else Array.tabulate(headUnits)(i =>
          if (McDropout.uniform(conf.seed, stepId, -1, 0, i) < dropout) 0.0
          else 1.0 / (1.0 - dropout)),
        if (recurrentDropout == 0.0) null
        else Array.tabulate(u)(i =>
          if (McDropout.uniform(conf.seed, stepId, -1, 1, i) < recurrentDropout) 0.0
          else 1.0 / (1.0 - recurrentDropout)),
        if (recurrentDropout == 0.0 || !bi) null
        else Array.tabulate(u)(i =>
          if (McDropout.uniform(conf.seed, stepId, -1, 2, i) < recurrentDropout) 0.0
          else 1.0 / (1.0 - recurrentDropout)))

      var lrCur = conf.lr
      var stopped = false
      var epoch = 0
      if (!opt.isFullBatchGd) {
        // optional mini-batch Adam/AdamW/SGD face — see Optimizer
        val valRdd = Optimizer.valRddOf(valData, featuresCol, labelCol)
        try Optimizer.miniBatchLoop(sc, data, weights, opt, conf.epochs,
          conf.lr, conf.momentum, n, callbacks, valRdd,
          valMasks = (null: Array[Double], null: Array[Double], null: Array[Double]))(mkMask) {
          case (w, (mk, mkR, mkR2), xv, y, scratch) =>
            rowGradInto(w, mk, mkR, mkR2, xv, y, scratch)
        } finally valRdd.foreach(_._1.unpersist())
      } else
      while (epoch < conf.epochs && !stopped) {
        val (mk, mkR, mkR2) = mkMask(epoch.toLong)
        val bcW = sc.broadcast(weights.clone())
        val grad = OrderedAgg(data, new Array[Double](nW + 1))(
          seqOp = { case (g, (xv, y)) =>
            rowGradInto(bcW.value, mk, mkR, mkR2, xv, y, g); g
          },
          combOp = { (a2, b2) =>
            var k2 = 0
            while (k2 < nW + 1) { a2(k2) += b2(k2); k2 += 1 }
            a2
          })
        bcW.destroy()
        var k3 = 0
        while (k3 < nW) {
          velocity(k3) = momentumStep(velocity(k3), conf.momentum, lrCur, grad(k3), n)
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

      new LstmRegressionModel(
        s"lstm_${java.util.UUID.randomUUID().toString.take(8)}", u,
        java.util.Arrays.copyOfRange(weights, wxOff, wxOff + 4 * u),
        java.util.Arrays.copyOfRange(weights, whOff, whOff + 4 * u * u),
        java.util.Arrays.copyOfRange(weights, bOff, bOff + 4 * u),
        if (!bi) java.util.Arrays.copyOfRange(weights, hOff, hOff + u)
        else java.util.Arrays.copyOfRange(weights, hOff, hOff + u) ++
          java.util.Arrays.copyOfRange(weights, h2Off, h2Off + u),
        weights(hbOff), t, fMean, fStd, yMean, yStd,
        if (bi) java.util.Arrays.copyOfRange(weights, wx2Off, wx2Off + 4 * u) else null,
        if (bi) java.util.Arrays.copyOfRange(weights, wh2Off, wh2Off + 4 * u * u) else null,
        if (bi) java.util.Arrays.copyOfRange(weights, b2Off, b2Off + 4 * u) else null)
    } finally { data.unpersist(blocking = false); () }
  }

  // the former inline momentum update, factored for reuse; identical
  // float expression: v' = momentum·v − lr·g/n
  @inline private def momentumStep(v: Double, momentum: Double, lr: Double,
      g: Double, n: Long): Double = momentum * v - lr * g / n

  /** S11 artifact sink: architecture + weights as one parquet row. */
  def save(model: LstmRegressionModel, path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    def opt(a: Array[Double]) = if (a == null) Seq.empty[Double] else a.toSeq
    Seq((model.uid, model.units, model.wx.toSeq, model.wh.toSeq, model.b.toSeq,
        model.headW.toSeq, model.headB, model.seqLen,
        model.featMean, model.featStd, model.labelMean, model.labelStd,
        opt(model.wx2), opt(model.wh2), opt(model.b2)))
      .toDF("uid", "units", "wx", "wh", "b", "head_w", "head_b", "seq_len",
        "feat_mean", "feat_std", "label_mean", "label_std",
        "wx2", "wh2", "b2")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** S11 artifact source. Artifacts written before the bidirectional
    * option lack the backward-cell columns; they were forward-only
    * (the S11 back-compat contract). */
  def load(spark: SparkSession, path: String): LstmRegressionModel = {
    val r = spark.read.parquet(path).head()
    val fields = r.schema.fieldNames.toSet
    def arr(c: String) = r.getAs[scala.collection.Seq[Double]](c).toArray
    def optArr(c: String) =
      if (fields.contains(c) && arr(c).nonEmpty) arr(c) else null
    new LstmRegressionModel(
      r.getAs[String]("uid"), r.getAs[Int]("units"),
      arr("wx"), arr("wh"), arr("b"), arr("head_w"),
      r.getAs[Double]("head_b"), r.getAs[Int]("seq_len"),
      r.getAs[Double]("feat_mean"), r.getAs[Double]("feat_std"),
      r.getAs[Double]("label_mean"), r.getAs[Double]("label_std"),
      optArr("wx2"), optArr("wh2"), optArr("b2"))
  }
}
