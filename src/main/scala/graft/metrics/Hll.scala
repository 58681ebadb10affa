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
    * over STORED sketches — q120's union). DENSE-only face (length
    * carries p); encoded/possibly-sparse sketches go through
    * [[encMerge]] with an explicit p. */
  def merged(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    // dense tripwire: a dense register array is 2^p bytes (encoded /
    // possibly-sparse sketches go through encMerge with an explicit p)
    require(java.lang.Long.bitCount(a.length.toLong) == 1 &&
      a.length == b.length,
      s"merged() is the dense face (got lengths ${a.length}/${b.length}) — " +
        "use encMerge(a, b, p) for encoded sketches")
    val out = java.util.Arrays.copyOf(a, a.length)
    mergeInto(out, b)
    out
  }

  // ---------------------------------------------------------------------
  // Sparse encoding (r16 — Heule, Nunkesser, Hall 2013 §5.3, the
  // HyperLogLog++ sparse representation, re-derived for this register
  // layout): below [[sparseMax]] populated registers a sketch is a
  // sorted list of (register index, rank) pairs instead of 2^p mostly-
  // zero bytes. The LONG TAIL of low-cardinality keys then pays O(k)
  // bytes instead of a fixed 4 KiB — the dominant term in per-key
  // streaming state (SCALE-R15 measured 5.6 GiB at 1M keys dense) and
  // in the per-(key, grain) sketch fact. The encoding is LOSSLESS and
  // canonical (a pure function of the register content), so every
  // estimate, merge, and bit-equality contract is unchanged: estimates
  // decode to the identical dense array before the float loop.
  //
  // Wire format, distinguished from dense by LENGTH (a dense array is
  // exactly 2^p ≥ 16 bytes; a sparse one is 1 + 3k with k ≤ 2^p/8, so
  // max 1 + 3·2^p/8 < 2^p for every p ≥ 4 — no collision):
  //   byte 0:        marker 0x01 (room for future encodings)
  //   bytes 1+3i:    register index, big-endian u16 (p ≤ 16)
  //   bytes 3+3i:    rank (1..64-p+1)
  // entries sorted by index, unique. Length 0 stays "no input yet".
  // ---------------------------------------------------------------------

  private val SparseMarker: Byte = 1

  /** Max populated registers before a sparse sketch upgrades to dense:
    * past m/8 the 3-byte-per-entry list approaches dense size and
    * insertion cost stops paying for itself. */
  def sparseMax(p: Int): Int = (1 << p) / 8

  /** Sparse encoding supported for 4 ≤ p ≤ 16 (u16 index); outside
    * that, everything stays dense. */
  private def sparseCapable(p: Int): Boolean = p >= 4 && p <= 16

  /** Encoding discrimination is BY LENGTH AGAINST p — content alone is
    * ambiguous (a sparse length 1+3k can itself be a power of two, and
    * a dense array can begin with byte 0x01), so every encoding-aware
    * entry point carries p. A non-empty encoding that is not exactly
    * 2^p bytes is sparse; the marker byte is a format tripwire, not
    * the discriminator. */
  def isSparse(enc: Array[Byte], p: Int): Boolean = {
    val sparse = enc.length > 0 && enc.length != (1 << p)
    if (sparse) require(enc.length % 3 == 1 && enc(0) == SparseMarker,
      s"unrecognized HLL encoding: length ${enc.length} at p=$p")
    sparse
  }

  private def sparseCount(enc: Array[Byte]): Int = (enc.length - 1) / 3

  private def sparseIdx(enc: Array[Byte], i: Int): Int =
    ((enc(1 + 3 * i) & 0xFF) << 8) | (enc(2 + 3 * i) & 0xFF)

  private def sparseRank(enc: Array[Byte], i: Int): Byte = enc(3 + 3 * i)

  /** Binary search over sparse entries: entry position if found, else
    * -(insertionPoint) - 1 (java.util.Arrays convention). */
  private def sparseFind(enc: Array[Byte], idx: Int): Int = {
    var lo = 0
    var hi = sparseCount(enc) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = sparseIdx(enc, mid)
      if (v < idx) lo = mid + 1
      else if (v > idx) hi = mid - 1
      else return mid
    }
    -(lo + 1)
  }

  /** Decode any encoding to a FRESH dense register array. */
  def toDense(enc: Array[Byte], p: Int): Array[Byte] =
    if (isSparse(enc, p)) {
      val out = emptyRegs(p)
      var i = 0
      val k = sparseCount(enc)
      while (i < k) { out(sparseIdx(enc, i)) = sparseRank(enc, i); i += 1 }
      out
    } else if (enc.length == 0) emptyRegs(p)
    else {
      require(enc.length == (1 << p),
        s"HLL register width mismatch: ${enc.length} vs p=$p")
      java.util.Arrays.copyOf(enc, enc.length)
    }

  private def copyEnc(enc: Array[Byte]): Array[Byte] =
    java.util.Arrays.copyOf(enc, enc.length)

  /** Canonical stored form — a pure function of the register CONTENT
    * (not of the fold path): sparse when ≤ [[sparseMax]] registers are
    * populated, dense otherwise. Two ingest paths reaching the same
    * register content therefore store the same bytes, which is what
    * keeps the bit-equality contracts (q119's rollup ≡ direct, the
    * SketchFactSpec incremental ≡ one-shot leg) meaningful across
    * encodings. */
  def canonical(enc: Array[Byte], p: Int): Array[Byte] = {
    if (enc.length == 0) return enc
    if (!sparseCapable(p)) return toDenseInPlace(enc, p)
    if (isSparse(enc, p)) {
      // sparse arrays are maintained sorted/unique — already canonical
      if (sparseCount(enc) <= sparseMax(p)) enc else toDense(enc, p)
    } else {
      require(enc.length == (1 << p),
        s"HLL register width mismatch: ${enc.length} vs p=$p")
      var nnz = 0
      var i = 0
      while (i < enc.length) { if (enc(i) != 0) nnz += 1; i += 1 }
      if (nnz > sparseMax(p)) enc
      else {
        val out = new Array[Byte](1 + 3 * nnz)
        out(0) = SparseMarker
        var j = 0
        i = 0
        while (i < enc.length) {
          if (enc(i) != 0) {
            out(1 + 3 * j) = ((i >> 8) & 0xFF).toByte
            out(2 + 3 * j) = (i & 0xFF).toByte
            out(3 + 3 * j) = enc(i)
            j += 1
          }
          i += 1
        }
        out
      }
    }
  }

  private def toDenseInPlace(enc: Array[Byte], p: Int): Array[Byte] =
    if (isSparse(enc, p)) toDense(enc, p) else enc

  /** Fold one value into an ENCODED sketch: dense folds in place
    * (returns the same array — the [[add]] hot path, unchanged); a
    * sparse sketch inserts/updates its entry, upgrading to dense past
    * [[sparseMax]]; an empty (length-0) encoding starts sparse. The
    * caller must treat the RETURN value as the new sketch. */
  def encAdd(enc: Array[Byte], p: Int, x: Long): Array[Byte] = {
    if (enc.length == (1 << p)) { add(enc, p, x); return enc }
    if (enc.length == 0) {
      if (!sparseCapable(p)) { val d = emptyRegs(p); add(d, p, x); return d }
      val h = hash64(x)
      val idx = (h >>> (64 - p)).toInt
      val r = rankOf(h, p)
      val out = new Array[Byte](4)
      out(0) = SparseMarker
      out(1) = ((idx >> 8) & 0xFF).toByte
      out(2) = (idx & 0xFF).toByte
      out(3) = r
      return out
    }
    require(isSparse(enc, p),
      s"unrecognized HLL encoding: length ${enc.length} at p=$p")
    val h = hash64(x)
    val idx = (h >>> (64 - p)).toInt
    val r = rankOf(h, p)
    val pos = sparseFind(enc, idx)
    if (pos >= 0) {
      if (r > sparseRank(enc, pos)) enc(3 + 3 * pos) = r
      enc
    } else if (sparseCount(enc) >= sparseMax(p)) {
      val d = toDense(enc, p)
      if (r > d(idx)) d(idx) = r
      d
    } else {
      val ins = -(pos + 1)
      val out = new Array[Byte](enc.length + 3)
      System.arraycopy(enc, 0, out, 0, 1 + 3 * ins)
      out(1 + 3 * ins) = ((idx >> 8) & 0xFF).toByte
      out(2 + 3 * ins) = (idx & 0xFF).toByte
      out(3 + 3 * ins) = r
      System.arraycopy(enc, 1 + 3 * ins, out, 4 + 3 * ins,
        enc.length - 1 - 3 * ins)
      out
    }
  }

  private def rankOf(h: Long, p: Int): Byte = {
    val w = h << p
    val rho = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    math.min(rho, 64 - p + 1).toByte
  }

  /** Merge two ENCODED sketches (register-wise max). May mutate and
    * return either argument — aggregation-buffer semantics, exactly
    * like the dense [[mergeInto]]. Empty operands pass the other side
    * through. */
  def encMerge(a: Array[Byte], b: Array[Byte], p: Int): Array[Byte] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    val aS = isSparse(a, p)
    val bS = isSparse(b, p)
    if (!aS && !bS) { mergeInto(a, b); a }
    else if (!aS) { mergeSparseIntoDense(a, b); a }
    else if (!bS) { mergeSparseIntoDense(b, a); b }
    else {
      // sorted-list union with rank max; densify past the threshold
      val ka = sparseCount(a)
      val kb = sparseCount(b)
      if (ka + kb > sparseMax(p)) {
        val d = toDense(a, p)
        mergeSparseIntoDense(d, b)
        // union may still fit sparse (heavy index overlap) — canonical
        // form is decided by CONTENT, not by this transient; callers
        // that store go through canonical()
        d
      } else {
        val out = new Array[Byte](1 + 3 * (ka + kb))
        out(0) = SparseMarker
        var i = 0; var j = 0; var n = 0
        while (i < ka || j < kb) {
          val takeA =
            j >= kb || (i < ka && sparseIdx(a, i) <= sparseIdx(b, j))
          val (idx, r) =
            if (takeA && j < kb && i < ka && sparseIdx(a, i) == sparseIdx(b, j)) {
              val m = (sparseIdx(a, i),
                if (sparseRank(a, i) >= sparseRank(b, j)) sparseRank(a, i)
                else sparseRank(b, j))
              i += 1; j += 1; m
            } else if (takeA) { val m = (sparseIdx(a, i), sparseRank(a, i)); i += 1; m }
            else { val m = (sparseIdx(b, j), sparseRank(b, j)); j += 1; m }
          out(1 + 3 * n) = ((idx >> 8) & 0xFF).toByte
          out(2 + 3 * n) = (idx & 0xFF).toByte
          out(3 + 3 * n) = r
          n += 1
        }
        if (n == ka + kb) out
        else java.util.Arrays.copyOf(out, 1 + 3 * n) // overlaps collapsed
      }
    }
  }

  private def mergeSparseIntoDense(dst: Array[Byte], sparse: Array[Byte]): Unit = {
    val k = sparseCount(sparse)
    var i = 0
    while (i < k) {
      val idx = sparseIdx(sparse, i)
      val r = sparseRank(sparse, i)
      if (r > dst(idx)) dst(idx) = r
      i += 1
    }
  }

  /** Cardinality estimate of any encoding. Sparse decodes to dense
    * FIRST so the float summation order — hence the estimate — is
    * bit-identical to the dense path (the q119 rollup ≡ direct
    * equality is an exact-equality contract; an O(k) shortcut with a
    * different summation order could drift it by an ulp). */
  def encEstimate(enc: Array[Byte], p: Int): Long =
    if (isSparse(enc, p)) estimate(toDense(enc, p))
    else if (enc.length == 0) 0L
    else estimate(enc)

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
    require(java.lang.Long.bitCount(regs.length.toLong) == 1,
      s"estimate() is the dense face (got length ${regs.length}) — " +
        "use encEstimate(enc, p) for encoded sketches")
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

  /** Long column → distinct-count estimate, one sketch per group.
    * The buffer starts SPARSE (r16) and upgrades to dense past
    * [[sparseMax]] populated registers, so map-side partials for
    * low-cardinality groups ship O(k) bytes instead of a fixed 2^p —
    * estimates are unchanged (lossless encoding, identical float
    * path). Merge is register max under either encoding. */
  class DistinctAgg(p: Int) extends Aggregator[Long, Regs, Long]
    with Serializable {
    override def zero: Regs = Regs(Array.emptyByteArray)
    override def reduce(b: Regs, x: Long): Regs = Regs(encAdd(b.regs, p, x))
    override def merge(a: Regs, b: Regs): Regs =
      Regs(encMerge(a.regs, b.regs, p))
    override def finish(b: Regs): Long = encEstimate(b.regs, p)
    override def bufferEncoder: Encoder[Regs] = Encoders.product[Regs]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Long column → storable [[Sketch]] (the ingest-side half of the
    * rollup pattern). Stored form is [[canonical]] — sparse below the
    * threshold, dense above; a pure function of the register content,
    * so any two fold paths over the same value set store the same
    * bytes (the bit-equality contracts survive the encoding). */
  class SketchAgg(p: Int) extends Aggregator[Long, Regs, Sketch]
    with Serializable {
    private val inner = new DistinctAgg(p)
    override def zero: Regs = inner.zero
    override def reduce(b: Regs, x: Long): Regs = inner.reduce(b, x)
    override def merge(a: Regs, b: Regs): Regs = inner.merge(a, b)
    override def finish(b: Regs): Sketch =
      Sketch(canonical(
        if (b.regs.length == 0) emptyRegs(p) else b.regs, p))
    override def bufferEncoder: Encoder[Regs] = Encoders.product[Regs]
    override def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
  }

  /** Stored [[Sketch]] columns → distinct-count estimate (the
    * query-side half): register-max rollup, never the raw values.
    * Because the merge is lossless, the result is BIT-IDENTICAL to a
    * one-level [[DistinctAgg]] over the raw data — q119 emits that
    * equality as a verdict column. Accepts sparse, dense, and mixed
    * stored encodings. */
  class MergeSketchesAgg(p: Int) extends Aggregator[Sketch, Regs, Long]
    with Serializable {
    private val inner = new DistinctAgg(p)
    override def zero: Regs = inner.zero
    /** Copies on adopt/mutation: the in-place merges must never mutate
      * a caller-retained input sketch array. A dense input is only at
      * risk when the buffer is sparse or empty (encMerge would fold
      * INTO the dense side); a read-only pass needs no copy. */
    override def reduce(b: Regs, s: Sketch): Regs =
      if (b.regs.length == 0) Regs(copyEnc(s.regs))
      else {
        val sIn =
          if (isSparse(b.regs, p) && !isSparse(s.regs, p)) copyEnc(s.regs)
          else s.regs
        Regs(encMerge(b.regs, sIn, p))
      }
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
    * the bit-identical [[canonical]] sketch. */
  class RollupSketchesAgg(p: Int) extends Aggregator[Sketch, Regs, Sketch]
    with Serializable {
    private val inner = new MergeSketchesAgg(p)
    override def zero: Regs = inner.zero
    override def reduce(b: Regs, s: Sketch): Regs = inner.reduce(b, s)
    override def merge(a: Regs, b: Regs): Regs = inner.merge(a, b)
    override def finish(b: Regs): Sketch =
      Sketch(canonical(
        if (b.regs.length == 0) emptyRegs(p) else b.regs, p))
    override def bufferEncoder: Encoder[Regs] = Encoders.product[Regs]
    override def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
  }
}
