package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.concurrent.duration._

import graft.TestSpark
import graft.metrics.Hll
import graft.olap.{OlapEtl, SnapshotStore}

/** The streaming half of the sketch-fact warehouse ingest
  * (`StreamOps.streamingSketchGrains` → `OlapEtl.loadFactSketchRows`):
  * watermark-closed windows land COMPLETE grains through the plain
  * recompute-replace upsert, so the end-to-end is replay-safe with no
  * fence. Pins, against a real MemoryStream query:
  *
  *   - completeness gate: a grain reaches the fact ONLY after the
  *     watermark closes its window (the still-open day is absent);
  *   - batch ≡ streaming landing: for every closed grain, n_rows is
  *     exact and the HLL registers are BIT-equal to the batch loader
  *     over the same rows (register folds are tree-insensitive); the
  *     digest weights carry the full row count (values are
  *     merge-tree-specific — their contract is the q115 bound, pinned
  *     at the rollup level by SketchFactSpec/MergeInvarianceSpec);
  *   - sink idempotence: re-landing the same emitted rows (an
  *     at-least-once foreachBatch redelivery) changes nothing.
  */
class StreamingSketchGrainsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val DayUs = 86400000000L
  private val P = 12

  // 2024-01-01 in epoch days — the grains the assertions name
  private val Day0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay

  // three keys × four days × 200 rows/day, duplicate-heavy ids
  private def tick(i: Int): StreamOps.FactTick = {
    val day = Day0 + i / 600 // 4 days over 2400 rows
    StreamOps.FactTick("k" + (i % 3), day * DayUs + (i % 600).toLong * 1000000L,
      math.sin(i.toDouble) * 10.0, (i % 97).toLong)
  }

  test("watermark-closed grains land complete, batch-equal, and idempotently") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sketchgrains")
    try {
      val factPath = dir.toString + "/fact"
      val mem = MemoryStream[StreamOps.FactTick]
      var landed = Vector.empty[org.apache.spark.sql.Row]
      val q = StreamOps.streamingSketchGrains(mem.toDS(), DayUs, 0.seconds)
        .writeStream.outputMode("append")
        .foreachBatch { (df: DataFrame, _: Long) =>
          val rows = df.collect()
          if (rows.nonEmpty) {
            landed ++= rows
            OlapEtl.loadFactSketchRows(df.sparkSession, df, factPath)
            ()
          }
        }
        .start()
      try {
        val ticks = (0 until 2400).map(tick)
        // day-by-day batches: day d's window closes when day d+1's
        // first event advances the watermark past the window end
        ticks.grouped(600).foreach { day =>
          mem.addData(day.toIndexedSeq: _*); q.processAllAvailable()
        }
        // completeness gate: days 0-2 closed; day 3 is still OPEN (no
        // later event advanced the watermark past its end) and must be
        // absent from the fact
        val fact = SnapshotStore.read(spark, factPath).get
        val grains = fact.select(col("grain")).distinct()
          .collect().map(_.getLong(0)).sorted
        assert(grains.toSeq == Seq(Day0, Day0 + 1, Day0 + 2),
          s"expected exactly the watermark-closed epoch-day grains: ${grains.toSeq}")
        assert(fact.count() == 9) // 3 keys × 3 closed days

        // batch ≡ streaming landing over the same (closed) rows
        val closed = ticks.filter(_.ts < (Day0 + 3) * DayUs)
        val batchPath = dir.toString + "/batch"
        val batchFact = OlapEtl.loadFactSketches(spark,
          closed.toDF("k", "ts_us", "v", "uid")
            .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us"),
          "k", "ts", "v", "uid", DayUs, batchPath, 100.0, P)
        def byGrain(df: DataFrame) = df.select(col("series_key"), col("grain"),
          col("n_rows"), col("id_sketch.regs"), col("value_digest.weights"),
          col("value_digest.means"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1)) ->
            ((r.getLong(2), r.getAs[Array[Byte]](3).toSeq,
              r.getAs[Seq[Double]](4).sum,
              // the FULL digest bits ride along so the idempotence leg
              // can assert the replay moved nothing, digest included
              (r.getAs[Seq[Double]](5), r.getAs[Seq[Double]](4))))).toMap
        val a = byGrain(batchFact)
        val b = byGrain(fact)
        assert(a.keySet == b.keySet)
        a.foreach { case (kg, (n, regs, _, _)) =>
          assert(b(kg)._1 == n, s"grain $kg n_rows diverged")
          assert(b(kg)._2 == regs, s"grain $kg HLL registers diverged (bit-equal expected)")
          assert(math.rint(b(kg)._3).toLong == n,
            s"grain $kg digest weights must carry the full row count")
        }

        // sink idempotence: re-land EVERYTHING emitted so far (a
        // worst-case at-least-once redelivery) — nothing may move
        val before = byGrain(SnapshotStore.read(spark, factPath).get)
        val replay = spark.createDataFrame(
          spark.sparkContext.parallelize(landed), fact.schema)
        OlapEtl.loadFactSketchRows(spark, replay, factPath)
        val after = byGrain(SnapshotStore.read(spark, factPath).get)
        assert(after == before,
          "redelivered grain rows changed the fact (count, registers, or digest bits)")
      } finally q.stop()
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("composite series keys stream through the DataFrame face and land batch-equal (r16)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sketchgrains2")
    try {
      val factPath = dir.toString + "/fact"
      // (type, region) composite key as separate source columns; the
      // value rides as Option so the feed carries NULL rows — the face
      // must apply the batch loader's null contract (review r16)
      val mem = MemoryStream[(String, String, Long, Option[Double], Long)]
      val grains = StreamOps.streamingSketchGrains(
        mem.toDS().toDF("typ", "region", "ts", "v", "uid"),
        Seq("typ", "region"), "ts", "v", "uid", DayUs, 0.seconds, 100.0, P)
      val q = grains.writeStream.outputMode("append")
        .foreachBatch { (df: DataFrame, _: Long) =>
          if (!df.isEmpty) {
            OlapEtl.loadFactSketchRows(df.sparkSession, df, factPath)
            ()
          }
        }.start()
      val rows = (0 until 1800).map { i =>
        val day = Day0 + i / 600
        // every 7th row is a NULL value: both cadences must drop it
        ("t" + (i % 2), "r" + (i % 3), day * DayUs + (i % 600).toLong * 1000000L,
          if (i % 7 == 0) None else Some(math.cos(i.toDouble)), (i % 53).toLong)
      }
      try {
        rows.grouped(600).foreach { day =>
          mem.addData(day.toIndexedSeq: _*); q.processAllAvailable()
        }
      } finally q.stop()
      val fact = SnapshotStore.read(spark, factPath).get
      // 2 types × 3 regions × 2 closed days (day 2 still open)
      assert(fact.count() == 12)
      // batch-equal against the composite BATCH loader over the same
      // closed rows — struct keys and all
      val closed = rows.filter(_._3 < (Day0 + 2) * DayUs)
      val batchPath = dir.toString + "/batch"
      val batchFact = OlapEtl.loadFactSketches(spark,
        closed.toDF("typ", "region", "ts_us", "v", "uid")
          .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us"),
        Seq("typ", "region"), "ts", "v", "uid", DayUs, batchPath, 100.0, P,
        OlapEtl.ReplaceGrain, None, None,
        graft.olap.PartitionedSnapshotStore.Layout())
      def byKey(df: DataFrame) = df.select(col("series_key.typ"),
        col("series_key.region"), col("grain"), col("n_rows"),
        col("id_sketch.regs")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
          ((r.getLong(3), r.getAs[Array[Byte]](4).toSeq))).toMap
      assert(byKey(fact) == byKey(batchFact),
        "composite-key streaming landing diverged from the batch loader")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }
}
