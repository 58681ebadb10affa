package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.dedup.Dedup

/** Bloom aggregator laws (no false negatives, distributed build ==
  * local build, sane FPR) and end-to-end: the bloom-prefiltered
  * decontamination equals the exact one even when the filter is
  * deliberately undersized to force false positives.
  */
class BloomAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives; distributed build == serial build") {
    val hashes = (1 to 5000).map(i => scala.util.hashing.byteswap64(i.toLong))
    val agg = new BloomAgg.BloomFilterAgg(1 << 17, 5)
    val distributed = hashes.toDF("h").repartition(9).as[Long]
      .select(agg.toColumn).head()
    val serial = hashes.foldLeft(agg.zero)((b, h) => agg.reduce(b, h))
    assert(distributed.toSeq === serial.toSeq) // OR-merge is order-free
    assert(hashes.forall(BloomAgg.mightContain(distributed, 5, _)))
  }

  test("FPR stays near theory at ~26 bits/key") {
    val inserted = (1 to 5000).map(i => scala.util.hashing.byteswap64(i.toLong))
    val agg = new BloomAgg.BloomFilterAgg(1 << 17, 5)
    val bits = inserted.foldLeft(agg.zero)((b, h) => agg.reduce(b, h))
    val probes = (100001 to 110000).map(i => scala.util.hashing.byteswap64(i.toLong))
    val fp = probes.count(BloomAgg.mightContain(bits, 5, _))
    assert(fp < probes.size / 50, s"FPR ${fp.toDouble / probes.size} too high")
  }

  test("decontaminateBloom == decontaminate, even with a tiny FP-heavy filter") {
    val rnd = new scala.util.Random(13)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "lam", "mu")
    def doc(i: Int) = (1 to 12).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    val docs = (1 to 200).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val train = docs.filter($"doc_id" % 5 =!= 0)
    val bench = docs.filter($"doc_id" % 5 === 0)
    val exact = Dedup.decontaminate(train, bench, "text", "doc_id", 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    for (bits <- Seq(64, 1 << 16)) { // 64 bits: nearly every probe is a FP
      val got = Dedup.decontaminateBloom(train, bench, "text", "doc_id", 3,
          numBits = bits, numHashes = 3)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got === exact, s"numBits=$bits")
    }
  }
}
