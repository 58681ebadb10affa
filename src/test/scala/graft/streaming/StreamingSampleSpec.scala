package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ml.Splits

/** §2.10 face of the sampling family: `StreamOps.streamingSample` is
  * q121's mergeable top-k (`Splits.HashTopKAgg`) as per-key group
  * state. Same spec shape as `StreamingDistinctSpec`, with the same
  * strongest-differential property: top-k-by-(md5, id) membership is
  * decided by a total order, so the terminal streaming sample must
  * EXACTLY equal the batch sample under any chunking or arrival order.
  */
class StreamingSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val K = 5
  private def mkAgg = new Splits.HashTopKAgg(K)

  private def tick(key: String, ts: Long, id: Long) =
    StreamOps.SampleTick(key, ts, id)

  private def batchSample(ids: Iterable[Long]): List[Long] = {
    val agg = mkAgg
    agg.finish(ids.map(id => (StreamOps.samplePriority(id), id))
      .foldLeft(agg.zero)(agg.reduce)).toList
  }

  test("samplePriority == Spark's md5(cast(id as string))") {
    import org.apache.spark.sql.functions.{col, md5}
    val s = spark
    import s.implicits._
    val ids = Seq(0L, 1L, 42L, -7L, 123456789012345L)
    val fromSpark = ids.toDF("id")
      .select(col("id"), md5(col("id").cast("string")))
      .as[(Long, String)].collect().toMap
    ids.foreach(id =>
      assert(StreamOps.samplePriority(id) == fromSpark(id), s"id=$id"))
  }

  test("e2e MemoryStream: history equals the replay; terminal sample equals batch EXACTLY") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rnd = new scala.util.Random(23)
    val ticks = (0 until 3000).map(i =>
      tick(if (i % 3 == 0) "a" else "b", i.toLong, rnd.nextInt(700).toLong))
    val mem = MemoryStream[StreamOps.SampleTick]
    val q = StreamOps.streamingSample(mem.toDS(), K)
      .writeStream.outputMode("update").format("memory")
      .queryName("ss_e2e").start()
    val streamed =
      try {
        ticks.grouped(1000).foreach { c =>
          mem.addData(c: _*); q.processAllAvailable()
        }
        s.table("ss_e2e").as[StreamOps.SampleRow].collect().toSeq
      } finally q.stop()
    val replay = StreamOps.replaySampleChunks(
      ticks.grouped(1000).map(_.toSeq), mkAgg)
    def norm(rs: Seq[StreamOps.SampleRow]) =
      rs.sortBy(r => (r.key, r.n)).map(r => (r.key, r.n, r.closed, r.sample.toList))
    assert(norm(streamed) == norm(replay))
    assert(streamed.size == 6 && streamed.forall(!_.closed)) // 2 keys × 3 chunks
    val byKey = ticks.groupBy(_.key)
    streamed.groupBy(_.key).foreach { case (k, rs) =>
      val fin = rs.maxBy(_.n)
      assert(fin.n == byKey(k).size)
      assert(fin.sample.toList == batchSample(byKey(k).map(_.id)),
        s"key=$k stream sample != batch sample")
      assert(fin.sample.size == K)
    }
  }

  test("group step: arrival order cannot change state; re-delivery of a sampled id is a no-op") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val rnd = new scala.util.Random(29)
    val batch = (0 until 400).map(i => tick("x", i % 37, rnd.nextInt(200).toLong))
    def run(in: Seq[StreamOps.SampleTick]) = {
      val st = TestGroupState.create[StreamOps.SampleState](
        Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
        Optional.empty[Long], false)
      val out = StreamOps.sampleGroupStep("x", in.iterator, st, mkAgg,
        StreamOps.NeverEvict).toVector
      (out, st.get)
    }
    val (o1, s1) = run(batch)
    val (o2, s2) = run(rnd.shuffle(batch))
    assert(o1.map(r => (r.key, r.n, r.sample.toList)) ==
      o2.map(r => (r.key, r.n, r.sample.toList)))
    assert(s1.prios.toList == s2.prios.toList && s1.ids.toList == s2.ids.toList)
    // an already-sampled id arriving again must not occupy two slots
    // (identical (priority, id) fails the strict-less gate)
    val st3 = TestGroupState.create[StreamOps.SampleState](
      Optional.of(s1), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], false)
    val o3 = StreamOps.sampleGroupStep("x",
      Iterator(tick("x", 999L, s1.ids.head)), st3, mkAgg,
      StreamOps.NeverEvict).toVector
    assert(o3.head.sample.toList == s1.ids.toList)
  }

  test("group step EventTimeIdle: monotone arming, closed-row eviction, empty-state silence") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import scala.concurrent.duration._
    val idle = StreamOps.EventTimeIdle(10.seconds)
    def st(opt: Optional[StreamOps.SampleState], wmMs: Long, timedOut: Boolean) =
      TestGroupState.create[StreamOps.SampleState](
        opt, GroupStateTimeout.EventTimeTimeout, 0L,
        Optional.of(java.lang.Long.valueOf(wmMs)), timedOut)
    val s1 = st(Optional.empty(), 1000L, timedOut = false)
    val out1 = StreamOps.sampleGroupStep("x",
      (1L to 50L).map(i => tick("x", i * 1000L, i)).iterator,
      s1, mkAgg, idle).toVector
    assert(out1.size == 1 && out1.head.n == 50 && !out1.head.closed)
    assert(s1.getTimeoutTimestampMs.get == 50000L + 10000L)
    val s2 = st(Optional.of(s1.get), 1000L, timedOut = false)
    StreamOps.sampleGroupStep("x", Iterator(tick("x", 5000L, 3L)),
      s2, mkAgg, idle).toVector
    assert(s2.getTimeoutTimestampMs.get == 60000L,
      "late batch lowered the monotone eviction point")
    val s3 = st(Optional.empty(), 100000L, timedOut = false)
    StreamOps.sampleGroupStep("y", Iterator(tick("y", 1000L, 1L)),
      s3, mkAgg, idle).toVector
    assert(s3.getTimeoutTimestampMs.get == 100001L)
    val carried = s1.get
    val s4 = st(Optional.of(carried), 70000L, timedOut = true)
    val out4 = StreamOps.sampleGroupStep("x", Iterator.empty, s4, mkAgg, idle)
      .toVector
    assert(out4.size == 1 && out4.head.closed && out4.head.n == 50 && s4.isRemoved)
    assert(out4.head.sample.toList == carried.ids.toList)
    assert(out4.head.sample.toList == batchSample(1L to 50L),
      "terminal sample != batch over everything seen")
    val s5 = st(Optional.of(StreamOps.SampleState(Array.empty, Array.empty,
      0L, Long.MinValue)), 70000L, timedOut = true)
    assert(StreamOps.sampleGroupStep("x", Iterator.empty, s5, mkAgg, idle).isEmpty
      && s5.isRemoved)
  }
}
