package graft.metrics

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Merging t-digest (Dunning & Ertl's sketch) as a typed Spark
  * `Aggregator` — the custom-UDAF face of the quantile scale path.
  *
  * `approx_percentile` (q61) stays the engine default; this exists to
  * (a) prove the surface: a hand-rolled MERGEABLE sketch with bounded
  * memory per group — `reduce` buffers raw values and collapses them
  * into O(δ·log W) centroids under the k₁ size bound 4·W·q(1−q)/δ
  * (tail capacities shrink like q(1−q), so singleton tail centroids
  * accumulate logarithmically in the total weight W — ~18 KB/group at
  * W=10¹⁰, δ=100), `merge` concatenates partials and re-compresses, so
  * map-side partial aggregation works exactly like a built-in; (b) give better TAIL
  * accuracy than a uniform-error sketch: centroid capacity shrinks like
  * q(1−q), so p99/p999 on skewed data keep sub-percent rank error.
  *
  * The buffer is CAPACITY-TRACKED: the first `used` slots of the arrays
  * are live, the tail is pre-allocated append room that grows
  * geometrically to `maxUnmerged`, so the per-row `reduce` is an O(1)
  * in-place write (the r14 fix — the original exact-sized `:+` append
  * copied the whole ~2 KB buffer per input row and dominated the
  * aggregate at ~40 µs/row on 10M-row groups). The encoder serializes
  * the capacity tail too (garbage beyond `used`, ≤ 2 KB/group on the
  * wire — merge/finish read only the live prefix). Rank error is
  * spec-bounded against the exact q60 path on skewed data.
  */
object TDigest {

  /** Sorted centroid set + raw tail in capacity-tracked,
    * encoder-friendly arrays: live prefix `[0, used)`, append room
    * after. Construct exact-sized buffers with the 2-arg companion
    * apply; [[compact]] trims the tail off (e.g. before persisting in
    * streaming state).
    */
  case class Buf(means: Array[Double], weights: Array[Double], used: Int)

  object Buf {
    def apply(means: Array[Double], weights: Array[Double]): Buf =
      Buf(means, weights, means.length)
  }

  /** `b` with the capacity tail trimmed off (exact-length arrays). */
  def compact(b: Buf): Buf =
    if (b.means.length == b.used) b
    else Buf(java.util.Arrays.copyOf(b.means, b.used),
      java.util.Arrays.copyOf(b.weights, b.used), b.used)

  private def live(a: Array[Double], used: Int): Array[Double] =
    if (a.length == used) a else java.util.Arrays.copyOf(a, used)

  /** The live prefix of `b`, compressed — the one trimming idiom every
    * finish/compress site shares. */
  private def compressed(b: Buf,
      compression: Double): (Array[Double], Array[Double]) =
    compress(live(b.means, b.used), live(b.weights, b.used), compression)

  /** Append one WEIGHTED point with amortized-O(1) buffering: in-place
    * while there is room, geometric capacity growth up to
    * `maxUnmerged`, then one compress that leaves append room
    * proportional to the centroid count (the k₁ rule keeps
    * O(δ·log W) centroids — a fixed cap would degrade to one full
    * compress PER APPEND once centroids exceed it; measured 25 µs/row
    * at W=1M before this, ~0.5 µs/row after). Shared by the raw-value
    * UDAF (w=1) and the digest rollup (w=centroid weight), so both
    * amortize identically — small stored digests in particular must
    * not pay a full compress per digest.
    */
  private[metrics] def appendPoint(b: Buf, x: Double, w: Double,
      compression: Double, maxUnmerged: Int): Buf = {
    if (b.used < b.means.length) {
      b.means(b.used) = x
      b.weights(b.used) = w
      Buf(b.means, b.weights, b.used + 1)
    } else if (b.means.length < maxUnmerged) {
      val cap = math.min(maxUnmerged, math.max(8, b.means.length * 2))
      val m = java.util.Arrays.copyOf(b.means, cap)
      val wts = java.util.Arrays.copyOf(b.weights, cap)
      m(b.used) = x; wts(b.used) = w
      Buf(m, wts, b.used + 1)
    } else {
      val (cm, cw) = compressed(b, compression)
      val cap = math.max(maxUnmerged, 2 * cm.length)
      val m = java.util.Arrays.copyOf(cm, cap)
      val wts = java.util.Arrays.copyOf(cw, cap)
      m(cm.length) = x; wts(cm.length) = w
      Buf(m, wts, cm.length + 1)
    }
  }

  /** Merge-compress (mean, weight) pairs to the k₁ bound. */
  def compress(means: Array[Double], weights: Array[Double],
      compression: Double): (Array[Double], Array[Double]) = {
    val n = means.length
    if (n <= 1) return (means, weights)
    val order = Array.range(0, n).sortBy(means(_))
    val totalW = weights.sum
    val outM = new Array[Double](n)
    val outW = new Array[Double](n)
    var k = 0
    var curM = means(order(0))
    var curW = weights(order(0))
    var wBefore = 0.0 // total weight already emitted
    var i = 1
    while (i < n) {
      val m = means(order(i))
      val w = weights(order(i))
      val mergedW = curW + w
      val q = (wBefore + mergedW / 2) / totalW
      val limit = 4.0 * totalW * q * (1.0 - q) / compression
      if (mergedW <= math.max(limit, 1.0)) {
        curM += (m - curM) * w / mergedW // weighted mean, stable form
        curW = mergedW
      } else {
        outM(k) = curM; outW(k) = curW; k += 1
        wBefore += curW
        curM = m; curW = w
      }
      i += 1
    }
    outM(k) = curM; outW(k) = curW; k += 1
    (java.util.Arrays.copyOf(outM, k), java.util.Arrays.copyOf(outW, k))
  }

  /** Quantile estimate: linear interpolation between centroid midpoints
    * (assumes compressed, i.e. mean-sorted, centroids).
    */
  def quantile(means: Array[Double], weights: Array[Double], p: Double): Double = {
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val totalW = weights.sum
    val target = p * totalW
    var cumBefore = 0.0
    var i = 0
    while (i < n) {
      val mid = cumBefore + weights(i) / 2
      if (target <= mid) {
        if (i == 0) return means(0) // below the first midpoint: clamp
        val prevMid = cumBefore - weights(i - 1) / 2
        val frac = (target - prevMid) / (mid - prevMid)
        return means(i - 1) + frac * (means(i) - means(i - 1))
      }
      cumBefore += weights(i)
      i += 1
    }
    means(n - 1) // above the last midpoint: clamp
  }

  /** Typed mergeable Aggregator: Double column → quantile estimates for
    * `ps`, one t-digest per group.
    */
  class QuantilesAgg(ps: Seq[Double], compression: Double = 100.0,
      maxUnmerged: Int = 256)
    extends Aggregator[Double, Buf, Seq[Double]] with Serializable {

    override def zero: Buf = Buf(Array.emptyDoubleArray, Array.emptyDoubleArray, 0)

    /** Amortized-O(1) in-place append — see [[appendPoint]]. */
    override def reduce(b: Buf, x: Double): Buf =
      appendPoint(b, x, 1.0, compression, maxUnmerged)

    override def merge(a: Buf, b: Buf): Buf = {
      if (a.used == 0) return b
      if (b.used == 0) return a
      val (cm, cw) = compress(
        live(a.means, a.used) ++ live(b.means, b.used),
        live(a.weights, a.used) ++ live(b.weights, b.used), compression)
      Buf(cm, cw, cm.length)
    }

    override def finish(b: Buf): Seq[Double] = {
      val (cm, cw) = compressed(b, compression)
      ps.map(p => quantile(cm, cw, p))
    }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** A FINISHED digest as a storable column value (struct<means,
    * weights>): the sketch-column warehouse pattern — persist one
    * digest per (key, time-grain) at ingest, then answer any later
    * percentile question by re-aggregating digests with
    * [[MergeDigestsAgg]] instead of rescanning 10¹⁰ raw values. Always
    * exact-length (no capacity tail).
    */
  case class Digest(means: Array[Double], weights: Array[Double])

  /** Values → storable [[Digest]] (the ingest-side half of the rollup
    * pattern). Same mergeable fold as [[QuantilesAgg]]; `finish`
    * compresses and trims.
    */
  class DigestAgg(compression: Double = 100.0, maxUnmerged: Int = 256)
    extends Aggregator[Double, Buf, Digest] with Serializable {
    private val inner = new QuantilesAgg(Nil, compression, maxUnmerged)
    override def zero: Buf = inner.zero
    override def reduce(b: Buf, x: Double): Buf = inner.reduce(b, x)
    override def merge(a: Buf, b: Buf): Buf = inner.merge(a, b)
    override def finish(b: Buf): Digest = {
      val (cm, cw) = compressed(b, compression)
      Digest(cm, cw)
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Digest] = Encoders.product[Digest]
  }

  /** Stored [[Digest]] columns → quantiles (the query-side half): each
    * reduce step merge-compresses a whole pre-aggregated digest into
    * the buffer, so re-aggregating a year of hourly sketches touches
    * O(grains · δ·log W) doubles, never the raw values. The result is
    * one more merge tree over the same centroids — q115's rank bound
    * (whose factor-2 slack absorbs merge-tree degradation) applies
    * unchanged, and `MergeInvarianceSpec` pins it across grain widths.
    */
  class MergeDigestsAgg(ps: Seq[Double], compression: Double = 100.0,
      maxUnmerged: Int = 256)
    extends Aggregator[Digest, Buf, Seq[Double]] with Serializable {
    private val inner = new QuantilesAgg(ps, compression, maxUnmerged)
    override def zero: Buf = inner.zero
    /** Buffered centroid appends, NOT a compress per digest: small
      * stored digests (fine grains, few values per bucket — the common
      * ingest shape) must amortize exactly like raw values do. */
    override def reduce(b: Buf, d: Digest): Buf = {
      var buf = b
      var i = 0
      while (i < d.means.length) {
        buf = appendPoint(buf, d.means(i), d.weights(i), compression, maxUnmerged)
        i += 1
      }
      buf
    }
    override def merge(a: Buf, b: Buf): Buf = inner.merge(a, b)
    override def finish(b: Buf): Seq[Double] = inner.finish(b)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** Stored [[Digest]] columns → a merged storable [[Digest]] (digest
    * in, digest out — [[MergeDigestsAgg]] finishes to quantiles; this
    * one re-materializes): the multi-level-rollup and
    * merge-on-collision ingest face (`OlapEtl.loadFactSketches` merge
    * mode — hourly micro-batch digests folding into a daily grain row
    * without re-reading the grain's history). The result is one more
    * merge tree over the same k₁-capped centroids, so the q115 rank
    * bound (whose factor-2 slack absorbs merge-tree degradation)
    * applies to any question later answered from the merged digest.
    */
  class RollupDigestsAgg(compression: Double = 100.0, maxUnmerged: Int = 256)
    extends Aggregator[Digest, Buf, Digest] with Serializable {
    private val inner = new MergeDigestsAgg(Nil, compression, maxUnmerged)
    override def zero: Buf = inner.zero
    override def reduce(b: Buf, d: Digest): Buf = inner.reduce(b, d)
    override def merge(a: Buf, b: Buf): Buf = inner.merge(a, b)
    override def finish(b: Buf): Digest = {
      val (cm, cw) = compressed(b, compression)
      Digest(cm, cw)
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Digest] = Encoders.product[Digest]
  }

  /** One step of the DETERMINISTIC ascending-input t-digest fold (the
    * q113 value-exact face): a new unit-weight point merges into the
    * LAST centroid when [[compress]]'s k₁ size bound — computed against
    * the group's TOTAL weight `totalW`, known upfront from a count pass
    * (the fit-statistic pattern) — allows, else opens a new centroid.
    * This is exactly `compress`'s greedy left-to-right rule applied
    * online: input ascending means the candidate centroid is always the
    * last one and means stay sorted, so the whole construction is a
    * per-group sequential state machine with a fixed IEEE op order —
    * bit-exact replayable in DuckDB as a recursive CTE carrying the
    * centroid lists (`oracle/TDigestOracle`), unlike the
    * merge-tree-dependent [[QuantilesAgg]] whose values vary with
    * partition boundaries. (Using the weight seen SO FAR instead of
    * `totalW` degenerates: the open centroid always sits at q≈1 where
    * k₁ capacity is ~1, so nothing ever merges.) Mutates
    * `means`/`weights` in place; returns the new weight sum.
    */
  def sortedStep(means: scala.collection.mutable.ArrayBuffer[Double],
      weights: scala.collection.mutable.ArrayBuffer[Double],
      wSum: Double, x: Double, totalW: Double, compression: Double): Double = {
    if (means.isEmpty) { means += x; weights += 1.0; return 1.0 }
    val lastW = weights(weights.size - 1)
    val mergedW = lastW + 1.0
    val wBefore = wSum - lastW
    val q = (wBefore + mergedW / 2.0) / totalW
    val limit = 4.0 * totalW * q * (1.0 - q) / compression
    if (mergedW <= math.max(limit, 1.0)) {
      means(means.size - 1) =
        means(means.size - 1) + (x - means(means.size - 1)) * 1.0 / mergedW
      weights(weights.size - 1) = mergedW
    } else { means += x; weights += 1.0 }
    wSum + 1.0
  }

  /** Fold [[sortedStep]] over ascending values (spec/oracle-prototyping
    * convenience; the distributed face streams the step inside
    * `mapPartitions`).
    */
  def sortedDigest(ascending: Iterable[Double],
      compression: Double): (Array[Double], Array[Double]) = {
    val m = scala.collection.mutable.ArrayBuffer.empty[Double]
    val w = scala.collection.mutable.ArrayBuffer.empty[Double]
    val totalW = ascending.size.toDouble
    var s = 0.0
    ascending.foreach(x => s = sortedStep(m, w, s, x, totalW, compression))
    (m.toArray, w.toArray)
  }

  /** Grouped t-digest quantiles with the same output shape/labels as
    * `Quantiles.groupedApprox` (p50, p99_5, …). NULL values are dropped
    * first — the typed Double input would coerce them to 0.0 and skew the
    * sketch silently — but groups whose values are ALL NULL still appear
    * (with NULL quantiles), matching `groupedApprox`'s contract: the
    * value filter must not make whole groups vanish.
    */
  def grouped(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double], compression: Double = 100.0): DataFrame = {
    val labels = ps.map(Quantiles.label)
    require(labels.distinct.size == labels.size,
      s"duplicate quantile labels from ps=$ps") // same guard as Quantiles.grouped
    val digest = udaf(new QuantilesAgg(ps, compression), Encoders.scalaDouble)
    val withArr = df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(digest(col(valueCol)).as("__qs"))
    val quantiled = ps.zipWithIndex.foldLeft(withArr) { case (d, (p, i)) =>
      d.withColumn(Quantiles.label(p), element_at(col("__qs"), i + 1))
    }.drop("__qs")
    // null-safe (<=>) re-join against the unfiltered group set: plain
    // `join(using)` equality would also drop groups keyed by NULL
    val groups = df.select(groupCols.map(col): _*).distinct()
    val cond = groupCols.map(c => groups(c) <=> quantiled(c)).reduce(_ && _)
    groups.join(quantiled, cond, "left")
      .select(groupCols.map(groups(_)) ++ labels.map(quantiled(_)): _*)
  }
}
