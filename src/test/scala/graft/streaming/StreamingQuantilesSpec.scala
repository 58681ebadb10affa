package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.metrics.TDigest

/** §2.10 face of the quantile family: `StreamOps.streamingQuantiles`
  * is the q115 mergeable t-digest folded as per-key group state. The
  * stateful-timeout branches are driven through `TestGroupState` (the
  * r11 lesson: never through MemoryStream wall-clock timeouts); the
  * happy path runs end-to-end through a real MemoryStream in Update
  * mode, where no timer is needed.
  */
class StreamingQuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val ps = Seq(0.5, 0.9, 0.99)
  private def mkAgg = new TDigest.QuantilesAgg(ps, 100.0, 64)

  private def tick(key: String, ts: Long, v: Double) =
    StreamOps.QuantileTick(key, ts, v)

  test("e2e MemoryStream: emission history equals the sequential fold, per chunk") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rnd = new scala.util.Random(7)
    val ticks = (0 until 3000).map(i =>
      tick(if (i % 3 == 0) "a" else "b", i.toLong, math.exp(rnd.nextGaussian())))
    val mem = MemoryStream[StreamOps.QuantileTick]
    val q = StreamOps.streamingQuantiles(mem.toDS(), ps, 100.0, 64)
      .writeStream.outputMode("update").format("memory")
      .queryName("sq_e2e").start()
    val streamed =
      try {
        ticks.grouped(1000).foreach { c =>
          mem.addData(c: _*); q.processAllAvailable()
        }
        s.table("sq_e2e").as[StreamOps.QuantileRow].collect().toSeq
      } finally q.stop()
    // driver-side replay: same chunks through the ONE shared reference fold
    val replay = StreamOps.replayQuantileChunks(
      ticks.grouped(1000).map(_.toSeq), mkAgg)
    def norm(rs: Seq[StreamOps.QuantileRow]) =
      rs.sortBy(r => (r.key, r.n)).map(r => (r.key, r.n, r.closed, r.quantiles.toList))
    assert(norm(streamed) == norm(replay))
    // 2 keys × 3 chunks of live updates, none closed
    assert(streamed.size == 6 && streamed.forall(!_.closed))
    // final digests obey the q115 rank bound vs the exact values
    val byKey = ticks.groupBy(_.key)
    streamed.groupBy(_.key).foreach { case (k, rs) =>
      val fin = rs.maxBy(_.n)
      val values = byKey(k).map(_.value).sorted
      val n = values.length
      assert(fin.n == n)
      ps.zip(fin.quantiles).foreach { case (p, v) =>
        val rle = values.count(_ <= v); val rlt = values.count(_ < v)
        val target = p * n
        val err =
          if (target < rlt + 1) (rlt + 1) - target
          else if (target > rle) target - rle else 0.0
        assert(err <= 8.0 * n * p * (1.0 - p) / 100.0 + 2.0,
          s"key=$k p=$p err=$err")
      }
    }
  }

  test("group step: in-batch arrival order cannot change the fold") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val rnd = new scala.util.Random(11)
    val batch = (0 until 500).map(i => tick("x", i % 37, rnd.nextGaussian()))
    def run(in: Seq[StreamOps.QuantileTick]) = {
      val st = TestGroupState.create[StreamOps.QuantState](
        Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
        Optional.empty[Long], false)
      val out = StreamOps.quantilesGroupStep("x", in.iterator, st, mkAgg,
        StreamOps.NeverEvict).toVector
      (out, st.get)
    }
    val (o1, s1) = run(batch)
    val (o2, s2) = run(rnd.shuffle(batch))
    assert(o1.map(r => (r.key, r.n, r.quantiles.toList)) ==
      o2.map(r => (r.key, r.n, r.quantiles.toList)))
    assert(s1.means.toList == s2.means.toList &&
      s1.weights.toList == s2.weights.toList && s1.n == s2.n)
    assert(!TestGroupState.create[StreamOps.QuantState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], false).getTimeoutTimestampMs.isPresent)
  }

  test("group step EventTimeIdle: monotone arming, closed-row eviction, empty-state silence") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import scala.concurrent.duration._
    val agg = mkAgg
    val idle = StreamOps.EventTimeIdle(10.seconds)
    def st(opt: Optional[StreamOps.QuantState], wmMs: Long, timedOut: Boolean) =
      TestGroupState.create[StreamOps.QuantState](
        opt, GroupStateTimeout.EventTimeTimeout, 0L,
        Optional.of(java.lang.Long.valueOf(wmMs)), timedOut)
    // batch at ts ≤ 50_000 arms maxSeen + timeout
    val s1 = st(Optional.empty(), 1000L, timedOut = false)
    val out1 = StreamOps.quantilesGroupStep("x",
      (1L to 50L).map(i => tick("x", i * 1000L, i.toDouble)).iterator,
      s1, agg, idle).toVector
    assert(out1.size == 1 && out1.head.n == 50 && !out1.head.closed)
    assert(s1.getTimeoutTimestampMs.get == 50000L + 10000L)
    // an admitted OLDER batch must not lower the armed point
    val s2 = st(Optional.of(s1.get), 1000L, timedOut = false)
    StreamOps.quantilesGroupStep("x", Iterator(tick("x", 5000L, 0.5)),
      s2, agg, idle).toVector
    assert(s2.getTimeoutTimestampMs.get == 60000L,
      "late batch lowered the monotone eviction point")
    // a key first seen via LATE ticks clamps past the watermark
    val s3 = st(Optional.empty(), 100000L, timedOut = false)
    StreamOps.quantilesGroupStep("y", Iterator(tick("y", 1000L, 1.0)),
      s3, agg, idle).toVector
    assert(s3.getTimeoutTimestampMs.get == 100001L)
    // the timeout fires: one closed terminal row, state removed
    val carried = s1.get
    val s4 = st(Optional.of(carried), 70000L, timedOut = true)
    val out4 = StreamOps.quantilesGroupStep("x", Iterator.empty, s4, agg, idle)
      .toVector
    assert(out4.size == 1 && out4.head.closed && out4.head.n == 50 && s4.isRemoved)
    // terminal quantiles == finishing the carried buffer directly
    assert(out4.head.quantiles.toList ==
      agg.finish(TDigest.Buf(carried.means, carried.weights)).toList)
    // timed out with nothing seen: silence (no zero-count row)
    val s5 = st(Optional.of(StreamOps.QuantState(Array.empty, Array.empty,
      0L, Long.MinValue)), 70000L, timedOut = true)
    assert(StreamOps.quantilesGroupStep("x", Iterator.empty, s5, agg, idle).isEmpty
      && s5.isRemoved)
  }
}
