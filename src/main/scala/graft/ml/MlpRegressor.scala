package graft.ml

import org.apache.spark.ml.PredictionModel
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** M8 nonlinear-NN head: a multi-layer tanh MLP regressor — the
  * Spark-native step past linear/GBT toward the reference's Keras model
  * zoo (`predictor_plugins/predictor_plugin_*.py`), within public Spark
  * (MLlib ships `MultilayerPerceptronClassifier` but no regressor). The
  * reference's dense heads are 2-3 stacked layers per branch
  * (`predictor_plugin_ann_best.py:222-226`, `num_branch_layers=2` at
  * :314); `fitLayers(Seq(h1, h2, ...))` covers that depth, and the
  * 1-hidden-layer `fit(hidden = …)` remains the simple entry point.
  *
  * Training is DISTRIBUTED full-batch gradient descent in the same
  * architecture MLlib's own optimizers use: per epoch, one
  * `treeAggregate` over the cached (features, label) rows computes the
  * exact MSE gradient (forward + backprop per row, partial sums merged
  * tree-wise), the driver applies a momentum update to the O(Σ wl·wl+1)
  * weight vector, and the new weights broadcast for the next epoch. Data
  * never concentrates: per-epoch cost is one pass, identical in shape to
  * a `LinearRegression` LBFGS iteration, so the head scales exactly as
  * far as the other heads do. Inputs/labels are standardized (fit from
  * one aggregate) for conditioning; scaling folds into the model so
  * `predict` takes raw features.
  *
  * Determinism: seeded Xavier init, fixed epoch count, tree-merged
  * gradient sums (floating addition order varies with partitioning like
  * every distributed LinearRegression fit — fits are spec-checked by
  * quality, not bitwise, same as the GBT head).
  */
object MlpRegressor {

  /** Fitted model; `predict` = tanh MLP forward pass on raw features.
    * `layers` holds the HIDDEN sizes (e.g. Array(8) or Array(16, 8));
    * `weights(l)`/`biases(l)` are the row-major out×in matrix and bias
    * of layer l over sizes d → layers(0) → … → layers(L-1) → 1, the
    * final layer linear.
    */
  class MlpRegressionModel(
      override val uid: String,
      val layers: Array[Int],
      val weights: Array[Array[Double]],
      val biases: Array[Array[Double]],
      val featMean: Array[Double],
      val featStd: Array[Double],
      val labelMean: Double,
      val labelStd: Double,
      val activation: String = "tanh")
    extends PredictionModel[Vector, MlpRegressionModel] {

    /** Back-compat accessor: first hidden width. */
    def hidden: Int = layers(0)

    override def numFeatures: Int = featMean.length

    override def predict(features: Vector): Double = {
      val d = featMean.length
      var a = new Array[Double](d)
      var j = 0
      while (j < d) { a(j) = (features(j) - featMean(j)) / featStd(j); j += 1 }
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
            if (activation == "elu") { if (z > 0) z else math.exp(z) - 1.0 }
            else math.tanh(z)
          h += 1
        }
        a = next
        l += 1
      }
      val wOut = weights(layers.length)
      var y = biases(layers.length)(0)
      var k = 0
      while (k < a.length) { y += wOut(k) * a(k); k += 1 }
      y * labelStd + labelMean
    }

    override def copy(extra: ParamMap): MlpRegressionModel = copyValues(
      new MlpRegressionModel(uid, layers, weights, biases,
        featMean, featStd, labelMean, labelStd, activation), extra)

    override def toString: String =
      s"MlpRegressionModel(uid=$uid, layers=${layers.mkString("[", ",", "]")}, d=$numFeatures)"
  }

  /** 1-hidden-layer fit — the original API, now a depth-1 special case. */
  def fit(df: DataFrame, labelCol: String, hidden: Int = 8, epochs: Int = 300,
      lr: Double = 0.1, momentum: Double = 0.9, seed: Long = 42L,
      featuresCol: String = "features"): MlpRegressionModel =
    fitLayers(df, labelCol, Seq(hidden), epochs, lr, momentum, seed, featuresCol)

  /** Fit a tanh MLP with the given hidden-layer widths on an assembled
    * frame (featuresCol: MLlib Vector, labelCol numeric) — the
    * `fitPerHorizonWith` callback contract. `layers = Seq(16, 8)` is the
    * reference's 2-layer dense-branch shape.
    *
    * `dropout` > 0 enables TRAIN-TIME hidden-unit dropout (the
    * reference's dense-branch `Dropout` layers,
    * `predictor_plugin_ann_best.py`): one inverted-dropout mask per
    * EPOCH per hidden unit, resampled deterministically from the
    * McDropout counter hash — the variational full-batch analogue of
    * Keras's per-minibatch masks (a full-batch step IS one batch, so
    * epoch-resampled masks are the per-batch draw; shared-across-rows
    * masks keep the gradient exactly aggregable and the fit
    * partition-independent). Inference stays unmasked (standard
    * inverted-dropout semantics); `dropout = 0` takes the original
    * mask-free code path bit-for-bit.
    *
    * `callbacks` (M11, `common/callbacks.py`): epoch-end training
    * control — early stopping, LR-on-plateau, time budget, history —
    * fed by the per-epoch loss accumulated inside the same distributed
    * gradient pass. Empty (the default) leaves the loop untouched.
    *
    * `opt` (the [[Optimizer]] face): the default full-batch GD+momentum
    * keeps the original loop bit-for-bit; any other config (mini-batch,
    * Adam, AdamW — the reference's AdamW mini-batch training,
    * `optimizer_plugins/base.py:260-322`) takes the deterministic
    * mini-batch path: hash-assigned epoch-shuffled batches, one
    * distributed pass per batch step, order-independent fixed-point
    * gradient sums ⇒ bitwise-identical fits under any partitioning.
    */
  def fitLayers(df: DataFrame, labelCol: String, layers: Seq[Int],
      epochs: Int = 300, lr: Double = 0.1, momentum: Double = 0.9,
      seed: Long = 42L, featuresCol: String = "features",
      dropout: Double = 0.0,
      callbacks: Seq[Callbacks.TrainingCallback] = Nil,
      opt: Optimizer.OptConfig = Optimizer.FullBatchGd,
      activation: String = "tanh",
      // val-loss monitor set (same shape as df) — mini-batch path only;
      // the full-batch path's callbacks keep seeing train loss
      valData: Option[DataFrame] = None): MlpRegressionModel = {
    require(layers.nonEmpty && layers.forall(_ > 0),
      s"MlpRegressor.fitLayers: need at least one positive hidden width, got $layers")
    require(Set("tanh", "elu").contains(activation),
      s"MlpRegressor.fitLayers: unknown activation '$activation' (tanh | elu)")
    require(dropout >= 0.0 && dropout < 1.0,
      s"MlpRegressor.fitLayers: dropout must be in [0, 1), got $dropout")
    val sc = df.sparkSession.sparkContext
    val data = df.select(col(featuresCol), col(labelCol).cast("double"))
      .rdd.map(r => (r.getAs[Vector](0), r.getDouble(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val head = data.take(1)
      require(head.nonEmpty, "MlpRegressor.fit: empty training set")
      val d = head(0)._1.size
      // standardization stats in one pass: per-dim sum/sumsq + label
      // moments — OrderedAgg (partition-id merge order) so the stats,
      // and thus the whole fit, are bitwise reproducible run-to-run
      val (sx, sxx, sy, syy, n) = OrderedAgg(data,
        (new Array[Double](d), new Array[Double](d), 0.0, 0.0, 0L))(
        seqOp = { case ((sx, sxx, sy, syy, n), (x, y)) =>
          var j = 0
          while (j < d) { val v = x(j); sx(j) += v; sxx(j) += v * v; j += 1 }
          (sx, sxx, sy + y, syy + y * y, n + 1)
        },
        combOp = { case ((ax, axx, ay, ayy, an), (bx, bxx, by, byy, bn)) =>
          var j = 0
          while (j < d) { ax(j) += bx(j); axx(j) += bxx(j); j += 1 }
          (ax, axx, ay + by, ayy + byy, an + bn)
        })
      require(n > 0, "MlpRegressor.fit: empty training set")
      def std(sum: Double, sumsq: Double): Double = {
        val v = math.max(sumsq / n - (sum / n) * (sum / n), 0.0)
        val s = math.sqrt(v)
        if (s < 1e-12) 1.0 else s // constant column: center only
      }
      var fMean = Array.tabulate(d)(j => sx(j) / n)
      var fStd = Array.tabulate(d)(j => std(sx(j), sxx(j)))
      var yMean = sy / n
      var yStd = std(sy, syy)
      if (!opt.isFullBatchGd) {
        // re-derive the stats from order-independent 1e-6 fixed-point
        // sums: the double-sum stats above are partitioning-dependent in
        // the low bits, which would leak into every standardized value
        // and break the mini-batch path's bitwise-under-any-partitioning
        // contract (see Optimizer.micro).
        val (mx, mxx, my, myy) = Optimizer.microStatsPerDim(data, d)
        fMean = Array.tabulate(d)(j => mx(j) / n)
        fStd = Array.tabulate(d)(j => std(mx(j), mxx(j)))
        yMean = my / n
        yStd = std(my, myy)
      }

      // layer sizes d → h1 → … → hL → 1; flat vector [W0|b0|W1|b1|…]
      val sizes = (d +: layers :+ 1).toArray
      val nLayers = sizes.length - 1 // hidden layers + linear output
      val wOff = new Array[Int](nLayers)
      val bOff = new Array[Int](nLayers)
      var off = 0
      var l = 0
      while (l < nLayers) {
        wOff(l) = off; off += sizes(l + 1) * sizes(l)
        bOff(l) = off; off += sizes(l + 1)
        l += 1
      }
      val nW = off
      // seeded Xavier init per layer (biases zero)
      val rnd = new java.util.Random(seed)
      val weights = new Array[Double](nW)
      l = 0
      while (l < nLayers) {
        val scale = math.sqrt(1.0 / sizes(l))
        var i = wOff(l)
        while (i < wOff(l) + sizes(l + 1) * sizes(l)) {
          weights(i) = rnd.nextGaussian() * scale; i += 1
        }
        l += 1
      }
      val velocity = new Array[Double](nW)

      val kScale = if (dropout > 0.0) 1.0 / (1.0 - dropout) else 1.0
      // F(z): tanh (the original path, bit-for-bit - identical op
      // sequence when selected) or ELU (the reference heads' hidden
      // activation, predictor_plugin_tft.py:106-140); the derivative
      // is recovered from the ACTIVATION VALUE so masked backprop
      // needs no extra stored state: tanh' = 1-a^2,
      // elu' = if (a > 0) 1 else a+1 (= e^z).
      val elu = activation == "elu"
      // M11: callbacks observe the per-epoch training loss, accumulated
      // in ONE extra slot of the same gradient aggregate — no extra job.
      var lrCur = lr
      var stopped = false
      var epoch = 0
      if (!opt.isFullBatchGd) {
        // ---- optional mini-batch Adam/AdamW/SGD face: the shared
        // Optimizer.miniBatchLoop drives hash-assigned epoch-shuffled
        // batches with order-independent fixed-point gradient sums
        // (bitwise identical under any partitioning); this head supplies
        // only its row-local forward/backward and per-step dropout masks.
        val yM = yMean; val yS = yStd; val fM = fMean; val fS = fStd
        val valRdd = Optimizer.valRddOf(valData, featuresCol, labelCol)
        try Optimizer.miniBatchLoop(sc, data, weights, opt, epochs, lr,
          momentum, n, callbacks, valRdd)(
          stepId =>
            if (dropout == 0.0) null
            else Array.tabulate(nLayers - 1)(l => Array.tabulate(sizes(l + 1))(h =>
              if (McDropout.uniform(seed, stepId, -1, l, h) < dropout) 0.0
              else kScale))
        ) { (w, mk, x, y, scratch) =>
          rowGradInto(x, (y - yM) / yS, w, mk, sizes, wOff, bOff, fM, fS, scratch, elu)
        } finally valRdd.foreach(_._1.unpersist())
      } else
      while (epoch < epochs && !stopped) {
        // one inverted-dropout mask per hidden unit per EPOCH, from the
        // deterministic counter hash (pass = -1 separates the training
        // stream from inference MC-dropout draws). null when off — the
        // dropout = 0 path stays the original code bit-for-bit.
        val masks: Array[Array[Double]] =
          if (dropout == 0.0) null
          else Array.tabulate(nLayers - 1)(l => Array.tabulate(sizes(l + 1))(h =>
            if (McDropout.uniform(seed, epoch.toLong, -1, l, h) < dropout) 0.0
            else kScale))
        val bc = sc.broadcast((weights.clone(), masks))
        // OrderedAgg, not treeAggregate: deterministic merge order makes
        // the fit bitwise reproducible (see OrderedAgg's scaladoc)
        val grad = OrderedAgg(data, new Array[Double](nW + 1))(
          seqOp = { case (g, (x, y)) =>
            val w = bc.value._1
            val mk = bc.value._2
            val ys = (y - yMean) / yStd
            // forward, keeping every activation for backprop. acts(0) is
            // the standardized input; acts(l+1) the tanh output of layer
            // l (the final linear layer writes its scalar into acts(last)(0)).
            val acts = new Array[Array[Double]](nLayers + 1)
            val a0 = new Array[Double](d)
            var j = 0
            while (j < d) { a0(j) = (x(j) - fMean(j)) / fStd(j); j += 1 }
            acts(0) = a0
            var l = 0
            while (l < nLayers) {
              val in = sizes(l); val out = sizes(l + 1)
              val prev = acts(l)
              val cur = new Array[Double](out)
              var h = 0
              while (h < out) {
                var z = w(bOff(l) + h)
                var k = 0
                while (k < in) { z += w(wOff(l) + h * in + k) * prev(k); k += 1 }
                cur(h) =
                  if (l >= nLayers - 1) z
                  else {
                    val av = if (elu) { if (z > 0) z else math.exp(z) - 1.0 }
                      else math.tanh(z)
                    if (mk == null) av else av * mk(l)(h) // 0 or 1/(1−rate): inverted dropout
                  }
                h += 1
              }
              acts(l + 1) = cur
              l += 1
            }
            // backprop of ½(out − ys)²: delta starts as the scalar error
            // on the linear output, then flows through Wᵀ · tanh'.
            var delta = new Array[Double](1)
            delta(0) = acts(nLayers)(0) - ys
            g(nW) += 0.5 * delta(0) * delta(0) // epoch loss accumulator
            l = nLayers - 1
            while (l >= 0) {
              val in = sizes(l); val out = sizes(l + 1)
              val prev = acts(l)
              var h = 0
              while (h < out) {
                val dh = delta(h)
                g(bOff(l) + h) += dh
                var k = 0
                while (k < in) { g(wOff(l) + h * in + k) += dh * prev(k); k += 1 }
                h += 1
              }
              if (l > 0) {
                val nd = new Array[Double](in)
                var k = 0
                while (k < in) {
                  var s = 0.0
                  var h2 = 0
                  while (h2 < out) { s += w(wOff(l) + h2 * in + k) * delta(h2); h2 += 1 }
                  val a = prev(k) // masked activation when dropout is on
                  def fp(raw: Double): Double =
                    if (elu) { if (raw > 0) 1.0 else raw + 1.0 }
                    else 1.0 - raw * raw
                  nd(k) =
                    if (mk == null) s * fp(a) // prev is an activation output for l>0
                    else {
                      val mv = mk(l - 1)(k)
                      // d(m·F(z))/dz = m·F'(z); dropped units (m=0)
                      // pass no gradient
                      if (mv == 0.0) 0.0
                      else s * mv * fp(a / mv)
                    }
                  k += 1
                }
                delta = nd
              }
              l -= 1
            }
            g
          },
          combOp = { (a, b) =>
            var k = 0
            while (k < nW + 1) { a(k) += b(k); k += 1 }
            a
          })
        bc.destroy()
        // Per-epoch mask resampling makes the full-batch gradient noisy;
        // with momentum the noise can resonate into divergence. Clip the
        // mean gradient's global L2 norm (a standard stabilizer) — but
        // ONLY on the dropout path, so dropout = 0 keeps the documented
        // bit-for-bit original update.
        val gScale =
          if (dropout == 0.0) 1.0 / n
          else {
            var ss = 0.0
            var k0 = 0
            while (k0 < nW) { val gm = grad(k0) / n; ss += gm * gm; k0 += 1 }
            val norm = math.sqrt(ss)
            if (norm > 1.0) 1.0 / (n * norm) else 1.0 / n
          }
        var k = 0
        while (k < nW) {
          velocity(k) = momentum * velocity(k) - lrCur * grad(k) * gScale
          weights(k) += velocity(k)
          k += 1
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

      val wMats = Array.tabulate(nLayers)(l =>
        java.util.Arrays.copyOfRange(weights, wOff(l), wOff(l) + sizes(l + 1) * sizes(l)))
      val bVecs = Array.tabulate(nLayers)(l =>
        java.util.Arrays.copyOfRange(weights, bOff(l), bOff(l) + sizes(l + 1)))
      new MlpRegressionModel(
        s"mlp_${java.util.UUID.randomUUID().toString.take(8)}",
        layers.toArray, wMats, bVecs, fMean, fStd, yMean, yStd, activation)
    } finally { data.unpersist(blocking = false); () }
  }

  /** One row's forward + backprop for the mini-batch path: accumulates
    * the row's ½(out − ys)² gradient into `scratch(0 until nW)` and the
    * loss into `scratch(nW)` (the miniBatchLoop slot convention).
    * Row-local and partitioning-independent by construction; the
    * full-batch path keeps its original inline accumulation
    * bit-for-bit, so the two share semantics but not float-op order.
    */
  private def rowGradInto(x: Vector, ys: Double, w: Array[Double],
      mk: Array[Array[Double]], sizes: Array[Int], wOff: Array[Int],
      bOff: Array[Int], fMean: Array[Double], fStd: Array[Double],
      scratch: Array[Double], elu: Boolean = false): Unit = {
    val d = fMean.length
    val nLayers = sizes.length - 1
    val acts = new Array[Array[Double]](nLayers + 1)
    val a0 = new Array[Double](d)
    var j = 0
    while (j < d) { a0(j) = (x(j) - fMean(j)) / fStd(j); j += 1 }
    acts(0) = a0
    var l = 0
    while (l < nLayers) {
      val in = sizes(l); val out = sizes(l + 1)
      val prev = acts(l)
      val cur = new Array[Double](out)
      var h = 0
      while (h < out) {
        var z = w(bOff(l) + h)
        var k = 0
        while (k < in) { z += w(wOff(l) + h * in + k) * prev(k); k += 1 }
        cur(h) =
          if (l >= nLayers - 1) z
          else {
            val av = if (elu) { if (z > 0) z else math.exp(z) - 1.0 }
              else math.tanh(z)
            if (mk == null) av else av * mk(l)(h)
          }
        h += 1
      }
      acts(l + 1) = cur
      l += 1
    }
    var delta = new Array[Double](1)
    delta(0) = acts(nLayers)(0) - ys
    scratch(scratch.length - 1) += 0.5 * delta(0) * delta(0)
    l = nLayers - 1
    while (l >= 0) {
      val in = sizes(l); val out = sizes(l + 1)
      val prev = acts(l)
      var h = 0
      while (h < out) {
        val dh = delta(h)
        scratch(bOff(l) + h) += dh
        var k = 0
        while (k < in) { scratch(wOff(l) + h * in + k) += dh * prev(k); k += 1 }
        h += 1
      }
      if (l > 0) {
        val nd = new Array[Double](in)
        var k = 0
        while (k < in) {
          var s = 0.0
          var h2 = 0
          while (h2 < out) { s += w(wOff(l) + h2 * in + k) * delta(h2); h2 += 1 }
          val a = prev(k)
          def fp(raw: Double): Double =
            if (elu) { if (raw > 0) 1.0 else raw + 1.0 }
            else 1.0 - raw * raw
          nd(k) =
            if (mk == null) s * fp(a)
            else {
              val mv = mk(l - 1)(k)
              if (mv == 0.0) 0.0
              else s * mv * fp(a / mv)
            }
          k += 1
        }
        delta = nd
      }
      l -= 1
    }
  }

  /** S11 artifact sink: layer widths + per-layer weights as one parquet row. */
  def save(model: MlpRegressionModel, path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    Seq((model.uid, model.layers.toSeq,
        model.weights.map(_.toSeq).toSeq, model.biases.map(_.toSeq).toSeq,
        model.featMean.toSeq, model.featStd.toSeq,
        model.labelMean, model.labelStd, model.activation))
      .toDF("uid", "layers", "weights", "biases",
        "feat_mean", "feat_std", "label_mean", "label_std", "activation")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** S11 artifact source. */
  def load(spark: SparkSession, path: String): MlpRegressionModel = {
    val r = spark.read.parquet(path).head()
    // artifacts written before the activation option lack the column;
    // they were tanh (the S11 back-compat contract, as AttentionRegressor)
    val act =
      if (r.schema.fieldNames.contains("activation")) r.getAs[String]("activation")
      else "tanh"
    new MlpRegressionModel(
      r.getAs[String]("uid"),
      r.getAs[scala.collection.Seq[Int]]("layers").toArray,
      r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("weights").map(_.toArray).toArray,
      r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("biases").map(_.toArray).toArray,
      r.getAs[Seq[Double]]("feat_mean").toArray, r.getAs[Seq[Double]]("feat_std").toArray,
      r.getAs[Double]("label_mean"), r.getAs[Double]("label_std"), act)
  }
}
