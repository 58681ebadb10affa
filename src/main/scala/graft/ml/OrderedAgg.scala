package graft.ml

import org.apache.spark.rdd.RDD

/** Deterministic replacement for `treeAggregate` in the native fit
  * loops: IEEE addition is not associative, and `treeAggregate`'s final
  * merge folds task results in ARRIVAL order — so two identical fits
  * could differ by a few ulps depending on task scheduling. Folding
  * per-partition partials sorted by partition id makes the merge order
  * a pure function of the data's partitioning: bitwise-reproducible
  * fits (the repo-wide determinism discipline, and what the bitwise
  * fit-equality specs pin).
  *
  * Driver cost is P partials per call instead of a tree reduction —
  * fine here because fit inputs are bounded samples per the fit
  * contract, so P stays small even at 100 TB corpus scale.
  */
object OrderedAgg {
  def apply[T, B](rdd: RDD[T], zero: => B)(
      seqOp: (B, T) => B, combOp: (B, B) => B): B =
    rdd.mapPartitionsWithIndex { (pid, it) =>
      Iterator((pid, it.foldLeft(zero)(seqOp)))
    }.collect().sortBy(_._1).foldLeft(zero)((a, p) => combOp(a, p._2))
}
