package graft.ml

/** M11 training-control callbacks (SURVEY §2.9): the reference's Keras
  * callback stack (`predictor_plugins/common/callbacks.py:12-357`) —
  * early stopping and LR-plateau with patience counters, plus a
  * resource guard — re-expressed for the native full-batch fit loops.
  *
  * The driver-side control loop is inherently sequential (one decision
  * per epoch), so this is plain driver code by design; the per-epoch
  * LOSS it reacts to is computed inside the distributed gradient pass
  * (one extra accumulator slot — no extra job, no extra scan).
  */
object Callbacks {

  /** What the fit loop should do after an epoch. */
  sealed trait Action
  case object Continue extends Action
  case object Stop extends Action
  /** Continue, but with a new learning rate from the next epoch on. */
  final case class SetLr(lr: Double) extends Action

  /** Epoch-end observer: sees (epoch, training loss, current lr). */
  trait TrainingCallback {
    def onEpochEnd(epoch: Int, loss: Double, lr: Double): Action

    /** Weight-aware variant the fit loops call: `weights` is the LIVE
      * weight array of the fit — a callback may snapshot it and, on
      * `Stop`, write a snapshot back (the Keras
      * `restore_best_weights` contract). Default delegates to the
      * plain observer, ignoring the weights.
      */
    def onEpochEnd(epoch: Int, loss: Double, lr: Double,
        weights: Array[Double]): Action = onEpochEnd(epoch, loss, lr)
  }

  /** `EarlyStoppingWithPatienceCounter` (`callbacks.py:22-30`, Keras
    * semantics): stop after `patience` epochs without the monitored loss
    * improving by more than `minDelta`.
    *
    * `restoreBestWeights` mirrors Keras
    * `EarlyStopping(restore_best_weights=True)` — the instantiation the
    * reference's plugins actually use
    * (`predictor_plugin_ann_best.py:631`): snapshot the weights at each
    * new best monitored loss and write them back when stopping
    * triggers. Like Keras, NO restore happens if the epoch budget runs
    * out before the patience trips (Keras restores inside the
    * stop branch of `on_epoch_end`, not unconditionally at train end).
    * Requires the fit loop to call the weight-aware `onEpochEnd`; every
    * native head and the shared mini-batch loop do.
    */
  final class EarlyStopping(patience: Int, minDelta: Double = 0.0,
      restoreBestWeights: Boolean = false) extends TrainingCallback {
    require(patience >= 1, s"patience must be >= 1, got $patience")
    private var best = Double.PositiveInfinity
    private var bestWeights: Array[Double] = null
    private var stall = 0
    var stoppedEpoch: Int = -1
    var restored: Boolean = false
    def onEpochEnd(epoch: Int, loss: Double, lr: Double): Action =
      onEpochEnd(epoch, loss, lr, null)
    override def onEpochEnd(epoch: Int, loss: Double, lr: Double,
        weights: Array[Double]): Action = {
      if (loss < best - minDelta) {
        best = loss; stall = 0
        if (restoreBestWeights) {
          require(weights != null,
            "restoreBestWeights needs a weight-aware fit loop")
          bestWeights = weights.clone()
        }
        Continue
      } else {
        stall += 1
        if (stall >= patience) {
          stoppedEpoch = epoch
          if (restoreBestWeights && bestWeights != null) {
            System.arraycopy(bestWeights, 0, weights, 0, weights.length)
            restored = true
          }
          Stop
        } else Continue
      }
    }
  }

  /** `ReduceLROnPlateauWithCounter` (`callbacks.py:12-20`): multiply the
    * lr by `factor` after `patience` stalled epochs, never below
    * `minLr`; the patience counter resets on each reduction. */
  final class ReduceLrOnPlateau(factor: Double, patience: Int,
      minLr: Double = 1e-6, minDelta: Double = 0.0) extends TrainingCallback {
    require(factor > 0 && factor < 1, s"factor must be in (0,1), got $factor")
    require(patience >= 1, s"patience must be >= 1, got $patience")
    private var best = Double.PositiveInfinity
    private var stall = 0
    var reductions: Int = 0
    def onEpochEnd(epoch: Int, loss: Double, lr: Double): Action = {
      if (loss < best - minDelta) { best = loss; stall = 0; Continue }
      else {
        stall += 1
        if (stall >= patience && lr > minLr) {
          stall = 0
          reductions += 1
          SetLr(math.max(lr * factor, minLr))
        } else Continue
      }
    }
  }

  /** `ResourceGuard` (`callbacks.py:246-…`) analog: hard wall-clock
    * budget for the whole fit — stop cleanly when exceeded instead of
    * letting a runaway training hold the cluster. */
  final class TimeBudget(maxSeconds: Double) extends TrainingCallback {
    private val t0 = System.nanoTime()
    var tripped: Boolean = false
    def onEpochEnd(epoch: Int, loss: Double, lr: Double): Action =
      if ((System.nanoTime() - t0) / 1e9 > maxSeconds) { tripped = true; Stop }
      else Continue
  }

  /** `MemoryUsageLogger`/CSV-history analog: records (epoch, loss, lr)
    * so the caller can sink it through S6 `write_csv`. */
  final class History extends TrainingCallback {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double)]
    def rows: Seq[(Int, Double, Double)] = buf.toSeq
    def onEpochEnd(epoch: Int, loss: Double, lr: Double): Action = {
      buf += ((epoch, loss, lr)); Continue
    }
  }
}
