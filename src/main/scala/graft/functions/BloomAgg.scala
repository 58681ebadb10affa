package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Distributed Bloom-filter construction as a merging Aggregator over
  * pre-hashed (xxhash64) keys.
  *
  * The buffer is the bit array itself (`Array[Long]` words): partials
  * build map-side, merge is a word-wise OR, and the finished filter is
  * a few hundred KB the driver can broadcast — the membership-prefilter
  * pattern for 100 TB anti-joins where even the DISTINCT key set of the
  * small side is too wide to broadcast raw.
  *
  * Double hashing (Kirsch & Mitzenmacher, ESA'06): position_i =
  * (h1 + i·h2) mod m with h1 = low bits, h2 = high bits forced odd —
  * k probes from one 64-bit hash, no false negatives by construction.
  */
object BloomAgg {

  /** numBits is rounded up to a multiple of 64. FPR ≈ (1−e^{−kn/m})^k;
    * size m ≈ 10·n bits gives <1% at k=5, m ≈ 20·n gives <0.1%.
    */
  class BloomFilterAgg(numBits: Int, numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits >= 64, s"numBits must be >= 64, got $numBits")
    require(numHashes > 0 && numHashes <= 16,
      s"numHashes must be in 1..16, got $numHashes")
    private val words = (numBits + 63) / 64
    private val m = words.toLong * 64L

    override def zero: Array[Long] = new Array[Long](words)

    override def reduce(bits: Array[Long], h: Long): Array[Long] = {
      BloomAgg.set(bits, m, numHashes, h)
      bits
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(bits: Array[Long]): Array[Long] = bits
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  @inline private def probe(m: Long, h: Long, i: Int): Long = {
    val h1 = h & 0x7fffffffffffffffL
    val h2 = (h >>> 32) | 1L // odd => cycles through all positions
    ((h1 + i * h2) & 0x7fffffffffffffffL) % m
  }

  private def set(bits: Array[Long], m: Long, k: Int, h: Long): Unit = {
    var i = 0
    while (i < k) {
      val pos = probe(m, h, i)
      bits((pos >>> 6).toInt) |= 1L << (pos & 63L)
      i += 1
    }
  }

  /** Membership test against a finished filter. False positives possible
    * (rate set by sizing), false negatives impossible.
    */
  def mightContain(bits: Array[Long], numHashes: Int, h: Long): Boolean = {
    val m = bits.length.toLong * 64L
    var i = 0
    while (i < numHashes) {
      val pos = probe(m, h, i)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }
}
