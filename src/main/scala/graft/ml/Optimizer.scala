package graft.ml

/** Optimizer face for the native heads (M8): the original full-batch
  * GD+momentum, plus an optional deterministic mini-batch Adam / AdamW —
  * the reference trains every Keras head with AdamW mini-batches
  * (`predictor_plugins/predictor_plugin_tft.py:143`,
  * `optimizer_plugins/base.py:260-322`), and this closes that disclosed
  * training-fidelity boundary.
  *
  * Distributed mini-batch semantics, re-expressed for Spark instead of
  * transliterated from a single-process framework:
  *
  *   - **Batch assignment is a pure function of (row content, epoch)** —
  *     `batchOf(rowKey, epoch, B)` mixes a content hash with the epoch
  *     through splitmix64. No `zipWithIndex` (partitioning-dependent), no
  *     global sort (a shuffle per epoch), and epoch-varying assignment IS
  *     the distributed analogue of Keras `shuffle=True`: each epoch
  *     re-deals rows into B batches deterministically.
  *   - **Each batch step is one distributed pass**: the per-batch
  *     gradient aggregates over the cached bounded fit input with
  *     non-members skipped (a scan costs far less than the per-row
  *     forward/backward that members pay, so an epoch's B passes cost
  *     about one full-batch epoch plus B job launches). The sequential
  *     dependency BETWEEN batches — weights for batch b+1 depend on the
  *     update from batch b — is inherent to SGD semantics; within a
  *     batch, everything is data-parallel.
  *   - **Gradient sums are order-independent**: per-row gradients are
  *     computed row-locally into a scratch array, then accumulated as
  *     1e-9 fixed-point longs (`nano`) with `Math.addExact` — addition
  *     on longs is associative and commutative, so the fit is bitwise
  *     identical under ANY partitioning (stronger than the OrderedAgg
  *     contract, which pins merge order for a GIVEN partitioning).
  *     Overflow is loud (`addExact` throws), and the per-term bound is
  *     checked in `nano`.
  *
  * The driver holds O(nW) optimizer state (first/second moments), same
  * as it already holds the weights; nothing data-proportional crosses
  * the driver.
  */
object Optimizer {

  /** `method`: "gd" (momentum SGD — with `batches = 1` the heads'
    * original full-batch path, kept bit-for-bit), "adam" (Kingma & Ba
    * 2015, bias-corrected), or "adamw" (Loshchilov & Hutter 2019,
    * decoupled weight decay). `batches` = mini-batches per epoch; 1 =
    * full batch.
    */
  final case class OptConfig(
      method: String = "gd",
      batches: Int = 1,
      beta1: Double = 0.9,
      beta2: Double = 0.999,
      eps: Double = 1e-8,
      weightDecay: Double = 0.0,
      clipNorm: Double = 0.0) {
    require(Set("gd", "adam", "adamw").contains(method),
      s"unknown optimizer method '$method' (gd | adam | adamw)")
    require(batches >= 1, s"batches must be >= 1, got $batches")
    require(clipNorm >= 0.0, s"clipNorm must be >= 0 (0 = off), got $clipNorm")
    /** True when this is exactly the heads' original full-batch GD path. */
    def isFullBatchGd: Boolean = method == "gd" && batches == 1
  }

  val FullBatchGd: OptConfig = OptConfig()

  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic content hash of a training row — the row's identity
    * for batch assignment, independent of partitioning and arrival
    * order. Identical duplicate rows land in the same batch every
    * epoch; that is the defined (and documented) semantics.
    */
  def rowKey(features: org.apache.spark.ml.linalg.Vector, label: Double): Long = {
    var h = 0x243f6a8885a308d3L // pi digits — an arbitrary fixed seed
    var j = 0
    val d = features.size
    while (j < d) {
      h = mix64(h ^ java.lang.Double.doubleToRawLongBits(features(j)))
      j += 1
    }
    mix64(h ^ java.lang.Double.doubleToRawLongBits(label))
  }

  /** Batch index of a row in epoch `epoch` with `batches` batches. */
  def batchOf(key: Long, epoch: Int, batches: Int): Int =
    if (batches == 1) 0
    else Math.floorMod(mix64(key ^ mix64(epoch.toLong)), batches.toLong).toInt

  /** 1e-9 fixed-point encode for order-independent sums. The guard keeps
    * `Math.round` away from its silent Long.MAX saturation; a gradient
    * term beyond 9e9 on standardized data is a diverged fit and should
    * fail loudly.
    */
  def nano(v: Double): Long = {
    require(math.abs(v) < 9.0e9, s"gradient term overflows 1e-9 fixed-point: $v")
    Math.round(v * 1e9)
  }

  def fromNano(l: Long): Double = l / 1e9

  /** 1e-6 fixed-point for the standardization-stat sums on the
    * mini-batch path (coarser than `nano` because the terms include
    * squares of RAW feature values): the full-batch path's double-sum
    * stats are merge-order deterministic but partitioning-dependent in
    * the low bits, which would leak into every later float op and break
    * the bitwise-under-any-partitioning contract.
    */
  def micro(v: Double): Long = {
    require(math.abs(v) < 9.0e12, s"stat term overflows 1e-6 fixed-point: $v")
    Math.round(v * 1e6)
  }

  def fromMicro(l: Long): Double = l / 1e6

  /** The shared mini-batch training loop every native head delegates to
    * when `opt` is not the full-batch default. `rowGrad` is the head's
    * row-local forward+backward: it accumulates the row's gradient into
    * `scratch(0 until nW)` and its ½-squared-error loss into
    * `scratch(nW)` — the same slot convention as the heads' full-batch
    * aggregates, so a head implements ONE row-gradient function and
    * both paths share it (the full-batch path hands `rowGrad` its
    * accumulator directly; per-slot addition order is unchanged, so
    * that path stays bit-for-bit). `mkMasks` builds the head's dropout
    * masks for a batch step (stepId = epoch·B + b — per-BATCH
    * resampling, the Keras semantics); it is broadcast with the
    * weights.
    *
    * `valData`: optional (rows, count) monitor set in the same raw
    * (features, label) form as `data`. When present, the loss handed to
    * `callbacks` at each epoch end is the VALIDATION loss — one extra
    * forward-only pass per epoch over the val rows with the weights of
    * that epoch and dropout OFF (`valMasks`, the head's inference-mode
    * mask value — null or a tuple of nulls depending on the head's mask
    * shape) — the Keras `EarlyStopping(monitor='val_loss')` /
    * `ReduceLROnPlateau(monitor='val_loss')` semantics
    * (`predictor_plugins/common/callbacks.py:12-30`). Absent, callbacks
    * see the train loss as before (bit-for-bit unchanged).
    */
  def miniBatchLoop[M](
      sc: org.apache.spark.SparkContext,
      data: org.apache.spark.rdd.RDD[(org.apache.spark.ml.linalg.Vector, Double)],
      weights: Array[Double],
      conf: OptConfig,
      epochs: Int,
      lr: Double,
      momentum: Double,
      n: Long,
      callbacks: Seq[Callbacks.TrainingCallback],
      valData: Option[(org.apache.spark.rdd.RDD[(org.apache.spark.ml.linalg.Vector, Double)], Long)] = None,
      valMasks: M = null.asInstanceOf[M])(
      mkMasks: Long => M)(
      rowGrad: (Array[Double], M, org.apache.spark.ml.linalg.Vector, Double, Array[Double]) => Unit): Unit = {
    val nW = weights.length
    val keyed = data.map { case (x, y) => (x, y, rowKey(x, y)) }
    val st = new OptState(nW, conf, momentum)
    var lrCur = lr
    var stopped = false
    var epoch = 0
    while (epoch < epochs && !stopped) {
      var epochLossNano = 0L
      var b = 0
      while (b < conf.batches && !stopped) {
        val stepId = epoch.toLong * conf.batches + b
        val bc = sc.broadcast((weights.clone(), mkMasks(stepId)))
        val (gN, nb) = OrderedAgg(keyed, (new Array[Long](nW + 1), 0L))(
          seqOp = { case (acc, (x, y, key)) =>
            if (batchOf(key, epoch, conf.batches) != b) acc
            else {
              val (g, cnt) = acc
              val scratch = new Array[Double](nW + 1)
              rowGrad(bc.value._1, bc.value._2, x, y, scratch)
              var k = 0
              while (k <= nW) {
                if (scratch(k) != 0.0) g(k) = Math.addExact(g(k), nano(scratch(k)))
                k += 1
              }
              (g, cnt + 1)
            }
          },
          combOp = { case ((ag, an), (bg, bn)) =>
            var k = 0
            while (k <= nW) { ag(k) = Math.addExact(ag(k), bg(k)); k += 1 }
            (ag, an + bn)
          })
        bc.destroy()
        if (nb > 0) {
          val gm = Array.tabulate(nW)(k => fromNano(gN(k)) / nb)
          st.step(weights, gm, lrCur)
        }
        epochLossNano = Math.addExact(epochLossNano, gN(nW))
        b += 1
      }
      if (callbacks.nonEmpty) {
        val loss = valData match {
          case Some((vd, vn)) if vn > 0 =>
            // val monitor pass: same rowGrad, inference-mode masks,
            // only the loss slot consumed; fixed-point sum keeps the
            // monitored value partition-order independent like the
            // train loss it replaces. One scratch is allocated per
            // PARTITION and reused row-to-row (rowGrad accumulates, so
            // the unused gradient slots just stay dirty); only the loss
            // slot is zeroed per row — no O(valRows × nW) allocation.
            val bcW = sc.broadcast((weights.clone(), valMasks))
            val lossN = OrderedAgg(vd, (0L, null: Array[Double]))(
              seqOp = { case ((acc, s0), (x, y)) =>
                val scratch = if (s0 != null) s0 else new Array[Double](nW + 1)
                scratch(nW) = 0.0
                rowGrad(bcW.value._1, bcW.value._2, x, y, scratch)
                (Math.addExact(acc, nano(scratch(nW))), scratch)
              },
              combOp = { case ((a, _), (b, _)) => (Math.addExact(a, b), null) })._1
            bcW.destroy()
            fromNano(lossN) / vn
          case _ => fromNano(epochLossNano) / n
        }
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
  }

  /** [[miniBatchLoop]]'s `valData` from a DataFrame in the head's
    * (featuresCol, labelCol) shape — the same selection the heads apply
    * to their train input, so the monitored loss is the head's own loss
    * function on raw val rows (standardized inside `rowGrad` with the
    * TRAIN-fit stats, the Keras semantics). Caller unpersists the RDD.
    */
  def valRddOf(df: Option[org.apache.spark.sql.DataFrame], featuresCol: String,
      labelCol: String): Option[(org.apache.spark.rdd.RDD[(org.apache.spark.ml.linalg.Vector, Double)], Long)] =
    df.map { v =>
      val r = v.select(org.apache.spark.sql.functions.col(featuresCol),
          org.apache.spark.sql.functions.col(labelCol).cast("double"))
        .rdd.map(rr => (rr.getAs[org.apache.spark.ml.linalg.Vector](0), rr.getDouble(1)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (r, r.count())
    }

  /** Order-independent per-dimension standardization sums (1e-6
    * fixed-point): (Σx_j, Σx²_j per dim, Σy, Σy²) — the mini-batch
    * paths' replacement for the heads' double-sum stats (see `micro`).
    */
  def microStatsPerDim(data: org.apache.spark.rdd.RDD[(org.apache.spark.ml.linalg.Vector, Double)],
      d: Int): (Array[Double], Array[Double], Double, Double) = {
    val (mx, mxx, my, myy) = OrderedAgg(data,
      (new Array[Long](d), new Array[Long](d), 0L, 0L))(
      seqOp = { case ((ax, axx, ay, ayy), (x, y)) =>
        var j = 0
        while (j < d) {
          val v = x(j)
          ax(j) = Math.addExact(ax(j), micro(v))
          axx(j) = Math.addExact(axx(j), micro(v * v))
          j += 1
        }
        (ax, axx, Math.addExact(ay, micro(y)), Math.addExact(ayy, micro(y * y)))
      },
      combOp = { case ((ax, axx, ay, ayy), (bx, bxx, by, byy)) =>
        var j = 0
        while (j < d) {
          ax(j) = Math.addExact(ax(j), bx(j))
          axx(j) = Math.addExact(axx(j), bxx(j))
          j += 1
        }
        (ax, axx, Math.addExact(ay, by), Math.addExact(ayy, byy))
      })
    (mx.map(fromMicro), mxx.map(fromMicro), fromMicro(my), fromMicro(myy))
  }

  /** Order-independent GLOBAL standardization sums (one scalar over all
    * positions — the sequence heads' convention): (Σx, Σx², Σy, Σy²).
    */
  def microStatsGlobal(data: org.apache.spark.rdd.RDD[(org.apache.spark.ml.linalg.Vector, Double)],
      t: Int): (Double, Double, Double, Double) = {
    val (mx, mxx, my, myy) = OrderedAgg(data, (0L, 0L, 0L, 0L))(
      seqOp = { case ((ax, axx, ay, ayy), (x, y)) =>
        var a = ax; var aa = axx
        var j = 0
        while (j < t) {
          val v = x(j)
          a = Math.addExact(a, micro(v))
          aa = Math.addExact(aa, micro(v * v))
          j += 1
        }
        (a, aa, Math.addExact(ay, micro(y)), Math.addExact(ayy, micro(y * y)))
      },
      combOp = { case ((ax, axx, ay, ayy), (bx, bxx, by, byy)) =>
        (Math.addExact(ax, bx), Math.addExact(axx, bxx),
          Math.addExact(ay, by), Math.addExact(ayy, byy))
      })
    (fromMicro(mx), fromMicro(mxx), fromMicro(my), fromMicro(myy))
  }

  /** Driver-side optimizer state + one `step` per (mini-)batch.
    * For "gd", `m` doubles as the momentum velocity.
    */
  final class OptState(nW: Int, conf: OptConfig, momentum: Double) {
    private val m = new Array[Double](nW)
    private val v = new Array[Double](nW)
    private var t = 0

    def step(w: Array[Double], gradMean: Array[Double], lr: Double): Unit = {
      if (conf.clipNorm > 0.0) {
        // global-L2 clip of the mean gradient (the heads' stabilizer
        // for residual stacks where spikes compound, e.g. N-BEATS)
        var ss = 0.0
        var k = 0
        while (k < nW) { ss += gradMean(k) * gradMean(k); k += 1 }
        val norm = math.sqrt(ss)
        if (norm > conf.clipNorm) {
          val sc = conf.clipNorm / norm
          k = 0
          while (k < nW) { gradMean(k) *= sc; k += 1 }
        }
      }
      if (conf.method == "gd") {
        var k = 0
        while (k < nW) {
          m(k) = momentum * m(k) - lr * gradMean(k)
          w(k) += m(k)
          k += 1
        }
      } else {
        t += 1
        val bc1 = 1.0 - math.pow(conf.beta1, t)
        val bc2 = 1.0 - math.pow(conf.beta2, t)
        var k = 0
        while (k < nW) {
          val g = gradMean(k)
          m(k) = conf.beta1 * m(k) + (1.0 - conf.beta1) * g
          v(k) = conf.beta2 * v(k) + (1.0 - conf.beta2) * g * g
          val upd = (m(k) / bc1) / (math.sqrt(v(k) / bc2) + conf.eps)
          val wd = if (conf.method == "adamw") conf.weightDecay * w(k) else 0.0
          w(k) -= lr * (upd + wd)
          k += 1
        }
      }
    }
  }
}
