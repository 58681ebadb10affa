package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.metrics.Hll

/** §2.10 face of the cardinality family: `StreamOps.streamingDistinct`
  * is the q119 HLL register fold as per-key group state. Same spec
  * shape as `StreamingQuantilesSpec` (TestGroupState for the timeout
  * branches, real MemoryStream for the happy path) plus the property
  * the quantile face cannot have: the terminal streaming estimate must
  * EXACTLY equal the batch aggregate under any chunking, because
  * register max is order- and duplication-insensitive.
  */
class StreamingDistinctSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val P = 12

  private def tick(key: String, ts: Long, id: Long) =
    StreamOps.DistinctTick(key, ts, id)

  private def batchEstimate(ids: Iterable[Long]): Long = {
    val r = Hll.emptyRegs(P)
    ids.foreach(Hll.add(r, P, _))
    Hll.estimate(r)
  }

  test("e2e MemoryStream: history equals the replay; terminal estimate equals batch EXACTLY") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rnd = new scala.util.Random(13)
    // duplicates on purpose: ids drawn from a pool smaller than the row
    // count, so the stream must count the SET, not the rows
    val ticks = (0 until 4000).map(i =>
      tick(if (i % 3 == 0) "a" else "b", i.toLong, rnd.nextInt(900).toLong))
    val mem = MemoryStream[StreamOps.DistinctTick]
    val q = StreamOps.streamingDistinct(mem.toDS(), P)
      .writeStream.outputMode("update").format("memory")
      .queryName("sd_e2e").start()
    val streamed =
      try {
        ticks.grouped(1000).foreach { c =>
          mem.addData(c: _*); q.processAllAvailable()
        }
        s.table("sd_e2e").as[StreamOps.DistinctRow].collect().toSeq
      } finally q.stop()
    val replay = StreamOps.replayDistinctChunks(
      ticks.grouped(1000).map(_.toSeq), P)
    def norm(rs: Seq[StreamOps.DistinctRow]) =
      rs.sortBy(r => (r.key, r.n)).map(r => (r.key, r.n, r.closed, r.estimate))
    assert(norm(streamed) == norm(replay))
    assert(streamed.size == 8 && streamed.forall(!_.closed)) // 2 keys × 4 chunks
    val byKey = ticks.groupBy(_.key)
    streamed.groupBy(_.key).foreach { case (k, rs) =>
      val fin = rs.maxBy(_.n)
      val ids = byKey(k).map(_.id)
      assert(fin.n == ids.size)
      // bit-exact batch equivalence — not a bound
      assert(fin.estimate == batchEstimate(ids),
        s"key=$k stream=${fin.estimate} batch=${batchEstimate(ids)}")
      // and the estimate is accurate vs the true distinct count
      val exact = ids.distinct.size
      assert(math.abs(fin.estimate - exact) <= 6.0 * Hll.rsd(P) * exact + 1.0)
    }
  }

  test("group step: arrival order and duplication cannot change state or estimate") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val rnd = new scala.util.Random(17)
    val batch = (0 until 600).map(i => tick("x", i % 37, rnd.nextInt(150).toLong))
    def run(in: Seq[StreamOps.DistinctTick]) = {
      val st = TestGroupState.create[StreamOps.HllState](
        Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
        Optional.empty[Long], false)
      val out = StreamOps.distinctGroupStep("x", in.iterator, st, P,
        StreamOps.NeverEvict).toVector
      (out, st.get)
    }
    val (o1, s1) = run(batch)
    val (o2, s2) = run(rnd.shuffle(batch))
    assert(o1.map(r => (r.key, r.n, r.estimate)) ==
      o2.map(r => (r.key, r.n, r.estimate)))
    assert(java.util.Arrays.equals(s1.regs, s2.regs) && s1.n == s2.n)
    // idempotence across batches: replaying the same rows into carried
    // state leaves the registers (hence the estimate) unchanged
    // (snapshot first: the step folds into the state array in place)
    val snap = java.util.Arrays.copyOf(s1.regs, s1.regs.length)
    val st3 = TestGroupState.create[StreamOps.HllState](
      Optional.of(s1), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], false)
    val o3 = StreamOps.distinctGroupStep("x", batch.iterator, st3, P,
      StreamOps.NeverEvict).toVector
    assert(o3.head.estimate == o1.last.estimate)
    assert(o3.head.n == s1.n + batch.size, "n counts rows, not the set")
    assert(java.util.Arrays.equals(st3.get.regs, snap))
  }

  test("group step EventTimeIdle: monotone arming, closed-row eviction, empty-state silence") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import scala.concurrent.duration._
    val idle = StreamOps.EventTimeIdle(10.seconds)
    def st(opt: Optional[StreamOps.HllState], wmMs: Long, timedOut: Boolean) =
      TestGroupState.create[StreamOps.HllState](
        opt, GroupStateTimeout.EventTimeTimeout, 0L,
        Optional.of(java.lang.Long.valueOf(wmMs)), timedOut)
    val s1 = st(Optional.empty(), 1000L, timedOut = false)
    val out1 = StreamOps.distinctGroupStep("x",
      (1L to 50L).map(i => tick("x", i * 1000L, i % 11)).iterator,
      s1, P, idle).toVector
    assert(out1.size == 1 && out1.head.n == 50 && !out1.head.closed)
    assert(s1.getTimeoutTimestampMs.get == 50000L + 10000L)
    // an admitted OLDER batch must not lower the armed point
    val s2 = st(Optional.of(s1.get), 1000L, timedOut = false)
    StreamOps.distinctGroupStep("x", Iterator(tick("x", 5000L, 3L)),
      s2, P, idle).toVector
    assert(s2.getTimeoutTimestampMs.get == 60000L,
      "late batch lowered the monotone eviction point")
    // a key first seen via LATE ticks clamps past the watermark
    val s3 = st(Optional.empty(), 100000L, timedOut = false)
    StreamOps.distinctGroupStep("y", Iterator(tick("y", 1000L, 1L)),
      s3, P, idle).toVector
    assert(s3.getTimeoutTimestampMs.get == 100001L)
    // the timeout fires: one closed terminal row, state removed
    val carried = s1.get
    val s4 = st(Optional.of(carried), 70000L, timedOut = true)
    val out4 = StreamOps.distinctGroupStep("x", Iterator.empty, s4, P, idle)
      .toVector
    assert(out4.size == 1 && out4.head.closed && out4.head.n == 50 && s4.isRemoved)
    assert(out4.head.estimate == Hll.encEstimate(carried.regs, P))
    assert(out4.head.estimate == 11L) // 50 rows over 11 distinct ids, tiny-n exact
    // timed out with nothing seen: silence
    val s5 = st(Optional.of(StreamOps.HllState(Hll.emptyRegs(P), 0L,
      Long.MinValue)), 70000L, timedOut = true)
    assert(StreamOps.distinctGroupStep("x", Iterator.empty, s5, P, idle).isEmpty
      && s5.isRemoved)
  }
}
