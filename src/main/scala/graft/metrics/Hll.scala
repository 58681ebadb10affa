package graft.metrics

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Hand-rolled mergeable HyperLogLog (Flajolet–Fuss–Gandouet–Meunier
  * 2007, with the linear-counting small-range correction) — the
  * cardinality sibling of [[TDigest]]'s quantile sketches, kept
  * deliberately register-transparent so the THREE properties the
  * built-in `approx_count_distinct` (q118) cannot expose become
  * first-class, testable surfaces:
  *
  *  1. **Lossless merge**: `merge` is register-wise max — commutative,
  *     associative, and IDEMPOTENT. A sketch rolled up from stored
  *     per-grain sketches is bit-identical to one built from the raw
  *     values (q119 emits that equality as data; `MergeInvarianceSpec`
  *     pins estimates from 1 to 200 shuffle partitions), and re-adding
  *     a value is a no-op — exactly the algebra a 100 TB warehouse
  *     needs to persist one sketch per (key, day) and answer any later
  *     distinct-count question without rescanning raw data.
  *  2. **Set algebra**: union is register max of STORED sketches (no
  *     raw-data access), intersection follows by inclusion–exclusion
  *     (q120) — the corpus-overlap / decontamination-coverage estimate
  *     between two snapshots without a distinct-pair join.
  *  3. **Streaming state**: the register array is fixed-size (2^p
  *     bytes), so a per-key `flatMapGroupsWithState` fold
  *     (`StreamOps.streamingDistinct`) carries O(1) state per key and —
  *     because the fold is order-insensitive, unlike the t-digest's —
  *     the terminal streaming estimate EXACTLY equals the batch
  *     aggregate, a stronger batch≡streaming differential than the
  *     quantile family's rank bound.
  *
  * Hashing: 64-bit splitmix64 finalizer (Steele/Lea/Vigna, public
  * domain) — deterministic across engines, partitions, and rounds, so
  * every estimate here is a pure function of the distinct value set.
  * Register index = top `p` hash bits; rank ρ = leading zeros of the
  * remaining 64−p bits + 1 (≤ 64−p+1 = 53 at p=12, fits a Byte).
  * Relative standard deviation ≈ 1.04/√(2^p): p=12 → 4096 one-byte
  * registers, rsd ≈ 1.625%.
  *
  * Reference anchor: the reference engine exposes only exact
  * `COUNT(DISTINCT …)` (e.g. the per-group distincts its OLAP rollups
  * compute, `sql/olap_schema_postgres.sql`); this is the scale path —
  * the q55 exact form shuffles every distinct (group, value) pair,
  * while this ships 2^p bytes per group regardless of cardinality.
  */
object Hll {

  /** rsd ≈ 1.04/√m for m = 2^p registers. */
  def rsd(p: Int): Double = 1.04 / math.sqrt((1 << p).toDouble)

  /** splitmix64 finalizer over the raw Long value (golden-gamma add
    * first, so small consecutive ids still avalanche). */
  def hash64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def emptyRegs(p: Int): Array[Byte] = new Array[Byte](1 << p)

  /** Fold one value into `regs` in place. `regs` must have been built
    * at the SAME p: a checkpointed/stored sketch from a different
    * precision would otherwise index silently wrong (smaller p) or
    * throw an opaque ArrayIndexOutOfBounds (larger p) — a config
    * change over a streaming checkpoint must fail loudly here, exactly
    * like [[mergeInto]] does. */
  def add(regs: Array[Byte], p: Int, x: Long): Unit = {
    require(regs.length == (1 << p),
      s"HLL register width mismatch: array has ${regs.length} registers " +
        s"but p=$p implies ${1 << p} — was this sketch built at a different p?")
    val h = hash64(x)
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rho = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    val r = math.min(rho, 64 - p + 1).toByte
    if (r > regs(idx)) regs(idx) = r
  }

  /** Register-wise max of `src` into `dst` (in place): the lossless,
    * idempotent merge. Both arrays must share the same p. */
  def mergeInto(dst: Array[Byte], src: Array[Byte]): Unit = {
    require(dst.length == src.length,
      s"HLL register width mismatch: ${dst.length} vs ${src.length}")
    var i = 0
    while (i < dst.length) {
      if (src(i) > dst(i)) dst(i) = src(i)
      i += 1
    }
  }

  /** Register max as a fresh array (functional merge for set algebra
    * over STORED sketches — q120's union). */
  def merged(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = java.util.Arrays.copyOf(a, a.length)
    mergeInto(out, b)
    out
  }

  private def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Cardinality estimate: the raw harmonic-mean estimator with the
    * standard small-range linear-counting switch (E ≤ 2.5m with empty
    * registers → m·ln(m/V)); the 2^64 large-range correction is moot at
    * realistic cardinalities and omitted. Deterministic: a pure
    * function of the register array. */
  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.scalb(1.0, -regs(i).toInt) // 2^-reg, exact
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha(m) * m.toDouble * m.toDouble / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.rint(corrected).toLong
  }

  /** Encoder-friendly aggregation buffer: one fixed-size register
    * array. Empty (length-0) means "no input yet" so `zero` costs
    * nothing per group until data arrives. */
  final case class Regs(regs: Array[Byte])

  /** A FINISHED sketch as a storable column value — the cardinality
    * half of the sketch-column warehouse pattern ([[TDigest.Digest]] is
    * the quantile half): persist one per (key, grain) at ingest, answer
    * later distinct questions by register-max rollup. */
  final case class Sketch(regs: Array[Byte])

  private def foldLong(b: Regs, x: Long, p: Int): Regs = {
    val r = if (b.regs.length == 0) emptyRegs(p) else b.regs
    add(r, p, x)
    Regs(r)
  }

  private def foldMerge(a: Regs, b: Regs): Regs =
    if (a.regs.length == 0) b
    else if (b.regs.length == 0) a
    else { mergeInto(a.regs, b.regs); a }

  /** Long column → distinct-count estimate, one sketch per group.
    * Map-side partials ship 2^p bytes; merge is register max. */
  class DistinctAgg(p: Int) extends Aggregator[Long, Regs, Long]
    with Serializable {
    override def zero: Regs = Regs(Array.emptyByteArray)
    override def reduce(b: Regs, x: Long): Regs = foldLong(b, x, p)
    override def merge(a: Regs, b: Regs): Regs = foldMerge(a, b)
    override def finish(b: Regs): Long =
      if (b.regs.length == 0) 0L else estimate(b.regs)
    override def bufferEncoder: Encoder[Regs] = Encoders.product[Regs]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Long column → storable [[Sketch]] (the ingest-side half of the
    * rollup pattern). */
  class SketchAgg(p: Int) extends Aggregator[Long, Regs, Sketch]
    with Serializable {
    private val inner = new DistinctAgg(p)
    override def zero: Regs = inner.zero
    override def reduce(b: Regs, x: Long): Regs = inner.reduce(b, x)
    override def merge(a: Regs, b: Regs): Regs = inner.merge(a, b)
    override def finish(b: Regs): Sketch =
      Sketch(if (b.regs.length == 0) emptyRegs(p) else b.regs)
    override def bufferEncoder: Encoder[Regs] = Encoders.product[Regs]
    override def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
  }

  /** Stored [[Sketch]] columns → distinct-count estimate (the
    * query-side half): register-max rollup, never the raw values.
    * Because the merge is lossless, the result is BIT-IDENTICAL to a
    * one-level [[DistinctAgg]] over the raw data — q119 emits that
    * equality as a verdict column. */
  class MergeSketchesAgg(p: Int) extends Aggregator[Sketch, Regs, Long]
    with Serializable {
    private val inner = new DistinctAgg(p)
    override def zero: Regs = inner.zero
    /** Copies on first adopt: the in-place merges that follow must
      * never mutate a caller-retained input sketch array. */
    override def reduce(b: Regs, s: Sketch): Regs =
      if (b.regs.length == 0)
        Regs(java.util.Arrays.copyOf(s.regs, s.regs.length))
      else { mergeInto(b.regs, s.regs); b }
    override def merge(a: Regs, b: Regs): Regs = inner.merge(a, b)
    override def finish(b: Regs): Long = inner.finish(b)
    override def bufferEncoder: Encoder[Regs] = Encoders.product[Regs]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Stored [[Sketch]] columns → a merged storable [[Sketch]] (sketch
    * in, sketch out — [[MergeSketchesAgg]] finishes to an estimate;
    * this one re-materializes): the multi-level-rollup and
    * merge-on-collision ingest face (`OlapEtl.loadFactSketches` merge
    * mode — hourly micro-batch sketches folding into a daily grain row
    * without re-reading the grain's history). Register max is lossless
    * and idempotent, so any rollup tree over the same inputs yields
    * the bit-identical sketch. */
  class RollupSketchesAgg(p: Int) extends Aggregator[Sketch, Regs, Sketch]
    with Serializable {
    private val inner = new MergeSketchesAgg(p)
    override def zero: Regs = inner.zero
    override def reduce(b: Regs, s: Sketch): Regs = inner.reduce(b, s)
    override def merge(a: Regs, b: Regs): Regs = inner.merge(a, b)
    override def finish(b: Regs): Sketch =
      Sketch(if (b.regs.length == 0) emptyRegs(p) else b.regs)
    override def bufferEncoder: Encoder[Regs] = Encoders.product[Regs]
    override def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
  }
}
