package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class StreamOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("windowedCounts: tumbling event-time aggregation over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val agg = StreamOps.windowedCounts(events, "ts", "1 hour", "2 hours")
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("wc").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:10:00"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 00:40:00"), "click", 2.0),
        (Timestamp.valueOf("2024-01-01 01:10:00"), "click", 4.0),
        (Timestamp.valueOf("2024-01-01 00:20:00"), "buy", 8.0))
      q.processAllAvailable()
      val out = spark.table("wc")
        .orderBy("window_start", "event_type")
        .select($"event_type", $"n", $"sum_value")
        .as[(String, Long, Double)].collect().toSeq
      assert(out == Seq(("buy", 1L, 8.0), ("click", 2L, 3.0), ("click", 1L, 4.0)))
    } finally q.stop()
  }

  test("featurizeMicroBatches: batch featurizer runs per micro-batch into a sink") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ts.TS
    val sink = java.nio.file.Files.createTempDirectory("feat").toString + "/out"
    val mem = MemoryStream[(Long, Long, Double)]
    val stream = mem.toDF().toDF("sid", "t", "v")
    val q = StreamOps.featurizeMicroBatches(stream,
      batch => batch.withColumn("diff",
        TS.firstDiff(col("v"), TS.seriesWindow(Seq("sid"), Seq("t")))),
      sink)
    try {
      mem.addData((1L, 1L, 10.0), (1L, 2L, 12.0))
      q.processAllAvailable()
      mem.addData((1L, 3L, 15.0))
      q.processAllAvailable()
      val out = spark.read.parquet(sink)
      assert(out.count() == 3)
      assert(out.columns.contains("diff"))
      // per-micro-batch semantics: batch 2 sees only its own rows
      assert(out.filter($"t" === 3L).select("diff").as[Double].head() == 0.0)
    } finally q.stop()
  }

  test("trackPositions: state survives across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Tick]
    val q = StreamOps.trackPositions(mem.toDS()).writeStream
      .outputMode("update").format("memory").queryName("pos").start()
    try {
      mem.addData(StreamOps.Tick(1L, 1L, 10.0), StreamOps.Tick(1L, 2L, 5.0))
      q.processAllAvailable()
      mem.addData(StreamOps.Tick(1L, 3L, 1.0), StreamOps.Tick(2L, 1L, 7.0))
      q.processAllAvailable()
      val out = spark.table("pos").as[StreamOps.Position].collect()
      val u1 = out.filter(_.userId == 1L).maxBy(_.nTicks)
      assert(u1.nTicks == 3 && u1.total == 16.0 && u1.lastValue == 1.0)
      val u2 = out.filter(_.userId == 2L).maxBy(_.nTicks)
      assert(u2.nTicks == 1 && u2.total == 7.0)
    } finally q.stop()
  }
}
