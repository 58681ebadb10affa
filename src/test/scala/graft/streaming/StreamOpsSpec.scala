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

  test("streamingNearDedup: batch-internal keep-best + cross-batch store rejection") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("snd").toString
    val store = s"$dir/store"
    val out = s"$dir/out"
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.streamingNearDedup(
      mem.toDF().toDF("doc_id", "text"),
      "text", "doc_id", shingleN = 3, b = 4, r = 1, threshold = 0.5,
      storePath = store, outPath = out)
    try {
      val baseText = "the quick brown fox jumps over the lazy dog again and again today"
      // batch 1: two near-dups (keep-best: longer text wins) + one unique
      mem.addData(
        (1L, baseText),
        (2L, baseText + " extended"),           // near-dup of 1, longer → survives
        (3L, "completely different words about spark engines and catalyst plans"))
      q.processAllAvailable()
      val out1 = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      assert(out1 == Set(2L, 3L), s"batch1 survivors: $out1")
      // batch 2: near-dup of the STORED doc 2 (rejected) + a fresh doc
      mem.addData(
        (4L, baseText + " extended slightly"),  // near-dup of stored 2 → dropped
        (5L, "yet another unrelated document mentioning neither foxes nor dogs"))
      q.processAllAvailable()
      val all = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      assert(all == Set(2L, 3L, 5L), s"final survivors: $all")
      // the store holds signatures for exactly the survivors, no raw text
      val st = spark.read.parquet(store)
      assert(st.select("doc_id").as[Long].collect().toSet == Set(2L, 3L, 5L))
      assert(!st.columns.contains("text"))
    } finally q.stop()
  }

  test("streamingExactDedup: duplicate digests within the watermark are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val out = StreamOps.streamingExactDedup(
      mem.toDF().toDF("ts", "digest", "value"), "ts", "10 minutes", Seq("digest"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:00:00"), "d1", 1.0),
        (Timestamp.valueOf("2024-01-01 00:01:00"), "d1", 2.0), // dup in batch
        (Timestamp.valueOf("2024-01-01 00:02:00"), "d2", 3.0))
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2024-01-01 00:03:00"), "d1", 4.0)) // dup across batches
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2024-01-01 00:04:00"), "d3", 5.0))
      q.processAllAvailable()
      val seen = spark.table("dedup").select($"digest").as[String].collect().toSeq.sorted
      assert(seen == Seq("d1", "d2", "d3")) // each digest exactly once
    } finally q.stop()
  }

  test("streamingHeavyHitters: O(k) state tracks the hot keys across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val out = StreamOps.streamingHeavyHitters(mem.toDF().toDF("user_id"), "user_id", k = 4)
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("hh").start()
    try {
      // batch 1: key 7 hot (10 of 16)
      mem.addData(Seq.fill(10)(7L) ++ (100L until 106L): _*)
      q.processAllAvailable()
      val r1 = spark.table("hh").as[(Long, Long, Long)].collect()
        .map(t => t._1 -> t._2).toMap
      val n1 = spark.table("hh").select($"n_total").as[Long].head()
      assert(n1 == 16L)
      assert(r1.contains(7L), s"hot key lost: $r1")
      // MG bound: min_count >= true - n/(k+1)
      assert(r1(7L) >= 10L - 16L / 5)
      // batch 2 folds into the SAME O(k) buffer: key 9 becomes hot too
      mem.addData(Seq.fill(12)(9L) ++ (200L until 204L): _*)
      q.processAllAvailable()
      val rows = spark.table("hh").as[(Long, Long, Long)].collect()
      val r2 = rows.map(t => t._1 -> t._2).toMap
      assert(rows.head._3 == 32L, s"n_total should span both batches: ${rows.toSeq}")
      assert(r2.contains(7L) && r2.contains(9L), s"hot keys lost: $r2")
      assert(rows.length <= 4, s"state must stay O(k): ${rows.toSeq}")
    } finally q.stop()
  }

  test("sessionize: gap-closed sessions emit once, late sessions close by timeout") {
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, t: String, v: Double) =
      StreamOps.SessionEvent(u, Timestamp.valueOf(t), v)
    val mem = MemoryStream[StreamOps.SessionEvent]
    val q = StreamOps.sessionize(mem.toDS(), java.time.Duration.ofMinutes(30), "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sess").start()
    try {
      // user 1: two events 10 min apart (one session), then a 2h gap
      mem.addData(
        ev(1L, "2024-01-01 00:00:00", 1.0),
        ev(1L, "2024-01-01 00:10:00", 2.0))
      q.processAllAvailable()
      // next event is > gap after 00:10 → closes session 1 in-batch;
      // also advances the watermark far past user 2's start below
      mem.addData(ev(1L, "2024-01-01 02:00:00", 4.0))
      q.processAllAvailable()
      val afterBatchClose = spark.table("sess").as[StreamOps.ClosedSession].collect()
      assert(afterBatchClose.length == 1)
      val s1 = afterBatchClose.head
      assert(s1.userId == 1L && s1.nEvents == 2 && s1.sumValue == 3.0)
      assert(s1.sessionStartUs == Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000)
      assert(s1.sessionEndUs == Timestamp.valueOf("2024-01-01 00:10:00").getTime * 1000)
      // user 2 opens a session, then only OTHER keys' events arrive —
      // the event-time timeout must close it (no user-2 event needed)
      mem.addData(ev(2L, "2024-01-01 02:05:00", 9.0))
      q.processAllAvailable()
      mem.addData(ev(3L, "2024-01-01 05:00:00", 0.5)) // watermark → 04:50
      q.processAllAvailable()
      mem.addData(ev(3L, "2024-01-01 05:01:00", 0.5)) // extra batch: fire timeouts
      q.processAllAvailable()
      val closed = spark.table("sess").as[StreamOps.ClosedSession].collect()
      val u2 = closed.filter(_.userId == 2L)
      assert(u2.length == 1 && u2.head.nEvents == 1 && u2.head.sumValue == 9.0)
    } finally q.stop()
  }

  test("streamingAsOfJoin: probes match the newest ref at-or-before their time") {
    implicit val sqlCtx = spark.sqlContext
    def ts(t: String) = Timestamp.valueOf(t)
    val refMem = MemoryStream[StreamOps.RefTick]
    val probeMem = MemoryStream[StreamOps.ProbeTick]
    val q = StreamOps.streamingAsOfJoin(refMem.toDS(), probeMem.toDS(), "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("asof").start()
    try {
      // batch 1: one ref, a matching probe, and a ref-less key
      refMem.addData(StreamOps.RefTick(1L, ts("2024-01-01 10:00:00"), 100.0))
      probeMem.addData(
        StreamOps.ProbeTick(1L, ts("2024-01-01 10:05:00"), 1.0),
        StreamOps.ProbeTick(2L, ts("2024-01-01 10:05:00"), 2.0))
      q.processAllAvailable()
      // batch 2: refs arrive out of order; the 10:30 probe must match
      // the OLD 10:00 ref (not the newer 10:35/11:00 ones) — the buffer
      // semantics a latest-value-only state would get wrong
      refMem.addData(
        StreamOps.RefTick(1L, ts("2024-01-01 11:00:00"), 400.0),
        StreamOps.RefTick(1L, ts("2024-01-01 10:35:00"), 300.0))
      probeMem.addData(
        StreamOps.ProbeTick(1L, ts("2024-01-01 10:40:00"), 3.0),
        StreamOps.ProbeTick(1L, ts("2024-01-01 10:30:00"), 4.0),
        StreamOps.ProbeTick(1L, ts("2024-01-01 11:05:00"), 5.0))
      q.processAllAvailable()
      // batch 3: watermark is now 10:55 — pruning keeps one ref below
      // it (10:35) as the predecessor; this probe must still match it
      probeMem.addData(StreamOps.ProbeTick(1L, ts("2024-01-01 10:58:00"), 6.0))
      q.processAllAvailable()
      val out = spark.table("asof")
        .as[StreamOps.AsOfResult].collect()
        .map(r => r.payload -> (r.refTsMs, r.refValue)).toMap
      assert(out(1.0) == (Some(ts("2024-01-01 10:00:00").getTime), Some(100.0)))
      assert(out(2.0) == (None, None)) // no ref for key 2 yet
      assert(out(4.0) == (Some(ts("2024-01-01 10:00:00").getTime), Some(100.0)))
      assert(out(3.0) == (Some(ts("2024-01-01 10:35:00").getTime), Some(300.0)))
      assert(out(5.0) == (Some(ts("2024-01-01 11:00:00").getTime), Some(400.0)))
      assert(out(6.0) == (Some(ts("2024-01-01 10:35:00").getTime), Some(300.0)))
    } finally q.stop()
  }

  test("streamingAsOfJoin equals batch AsOfJoin.backward on randomized data") {
    // the exact-replay contract: within the watermark the streaming face
    // must reproduce the batch operator, tie-breaks included
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val refs = (1 to 120).map { _ =>
      StreamOps.RefTick(rnd.nextInt(5).toLong,
        new Timestamp(base + rnd.nextInt(50) * 60000L), rnd.nextInt(20).toDouble)
    }
    val probes = (1 to 150).map { i =>
      StreamOps.ProbeTick(rnd.nextInt(6).toLong,
        new Timestamp(base + rnd.nextInt(55) * 60000L), i.toDouble) // unique payload
    }
    val refMem = MemoryStream[StreamOps.RefTick]
    val probeMem = MemoryStream[StreamOps.ProbeTick]
    val q = StreamOps.streamingAsOfJoin(refMem.toDS(), probeMem.toDS(), "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("asofprop").start()
    try {
      refMem.addData(refs)
      probeMem.addData(probes)
      q.processAllAvailable()
      val streamed = spark.table("asofprop").as[StreamOps.AsOfResult].collect()
        .map(r => r.payload -> r.refValue).toMap
      val batch = graft.ts.AsOfJoin.backward(
          probes.toDF(), refs.toDF(), Seq("key"), "ts", "refValue", "asof")
        .select($"payload", $"asof").collect()
        .map(r => r.getDouble(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
        .toMap
      assert(streamed.size == 150 && batch.size == 150)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("map-only curation ops run unchanged on a stream (chunking + quality + langid)") {
    // chunkByTokens/qualityScore/langId are stateless map-side plans
    // (PlanShapeSpec pins: one Generate, no Exchange) — so the SAME
    // operator code is the streaming face, no rewrite. This is the
    // batch/streaming unification contract for the corpus-curation path.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val curated = graft.text.TextAnalysis.chunkByTokens(
        docs.withColumn("quality", graft.text.TextAnalysis.qualityScore(col("text")))
          .withColumn("lang", graft.text.TextAnalysis.langId(col("text")))
          .filter(col("quality") >= 0.0),
        "text", "doc_id", chunkSize = 4, stride = 4)
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("stream_chunks").start()
    try {
      mem.addData(
        (1L, "the cat sat on the mat and it is happy"), // 10 tokens → 3 chunks
        (2L, "el gato que vive en la casa"))             // 7 tokens → 2 chunks
      q.processAllAvailable()
      val out = spark.table("stream_chunks")
        .orderBy("doc_id", "chunk_idx")
        .select("doc_id", "chunk_idx", "n_tok")
        .as[(Long, Int, Int)].collect().toSeq
      assert(out == Seq((1L, 0, 4), (1L, 1, 4), (1L, 2, 2), (2L, 0, 4), (2L, 1, 3)))
    } finally q.stop()
  }

  test("gopherRules runs unchanged on a stream (Generate barrier is map-only)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = graft.text.TextAnalysis.gopherRules(
        mem.toDF().toDF("doc_id", "text"), "text", "doc_id",
        minWords = 3, maxWords = 100, minMeanLen = 2.0, maxMeanLen = 8.0,
        minStopHits = 1, minAlphaFrac = 0.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_gopher").start()
    try {
      mem.addData((1L, "the cat sat on a mat"), (2L, "x1"))
      q.processAllAvailable()
      val out = spark.table("stream_gopher").orderBy("doc_id")
        .select("doc_id", "n_words", "keep").as[(Long, Int, Boolean)].collect().toSeq
      assert(out === Seq((1L, 6, true), (2L, 1, false)))
    } finally q.stop()
  }

  test("MisraGries aggregator runs as a streaming aggregation (merging buffers)") {
    // the sketch IS a merging Aggregator, so the streaming face needs no
    // new operator: a complete-mode global agg keeps O(k) state per
    // trigger and the candidate superset guarantee holds over the union
    // of all batches
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.udaf
    val mem = MemoryStream[Long]
    val agg = udaf(new graft.metrics.Sketches.MisraGriesAgg(8),
      org.apache.spark.sql.Encoders.scalaLong)
    val q = mem.toDF().toDF("k")
      .groupBy().agg(agg(col("k")).as("mg"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_mg").start()
    try {
      mem.addData((1 to 60).map(i => (i % 30).toLong): _*) // near-uniform noise
      q.processAllAvailable()
      mem.addData(Seq.fill(50)(7L): _*) // batch 2: key 7 becomes heavy
      q.processAllAvailable()
      val row = spark.table("stream_mg").head().getStruct(0)
      val keys = row.getAs[scala.collection.Seq[Long]]("keys")
      val n = row.getAs[Long]("n")
      assert(n === 110L)
      // freq(7) = 52 > n/(k+1) = 110/9 — must be tracked
      assert(keys.contains(7L), s"heavy key missing from $keys")
      assert(keys.length <= 8)
    } finally q.stop()
  }

  test("streamingDecontaminate: stream verdicts equal the batch operator's") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "p q r s"), (101L, "x y")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b p q r s c"), // contains the 4-gram -> dropped
      (2L, "a b p q r c d"), // only 3 shared tokens -> kept
      (3L, "x y"),           // short doc == whole-text shingle -> dropped
      (4L, "x y z"))         // kept (no 4-gram, text != any bench shingle)
    val batchKept = graft.dedup.Dedup.decontaminate(
        docs.toDF("doc_id", "text"), bench, "text", "doc_id", 4)
      .select("doc_id").as[Long].collect().toSet
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.streamingDecontaminate(
        mem.toDF().toDF("doc_id", "text"), bench, "text", 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_decon").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val streamKept = spark.table("stream_decon")
        .select("doc_id").as[Long].collect().toSet
      assert(streamKept === batchKept)
      assert(streamKept === Set(2L, 4L))
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

  test("streamingIndicators equals the batch recursive kernel value-for-value") {
    implicit val sqlCtx = spark.sqlContext
    // two interleaved series, long enough that every indicator (incl.
    // the MACD signal at 26+9 and ADX at 2x14) is well past warm-up
    val rnd = new scala.util.Random(31)
    def mkSeries(key: String, n: Int): Seq[StreamOps.IndicatorBar] = {
      var c = 100.0
      (1 to n).map { i =>
        c += rnd.nextGaussian() * 0.4
        val h = c + math.abs(rnd.nextGaussian()) * 0.2
        val l = c - math.abs(rnd.nextGaussian()) * 0.2
        StreamOps.IndicatorBar(key, i.toLong, h, l, c)
      }
    }
    val bars = mkSeries("x", 90) ++ mkSeries("y", 60)
    val mem = MemoryStream[StreamOps.IndicatorBar]
    val q = StreamOps.streamingIndicators(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("ti").start()
    try {
      // deliver in 3 chunks split mid-warm-up to exercise cross-batch state
      bars.grouped(50).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
      val streamed = spark.table("ti").as[StreamOps.IndicatorRow].collect()
        .map(r => (r.key, r.ts) -> r).toMap
      val batch = graft.ts.TechIndicators.withRecursiveIndicators(
        bars.toDF("key", "ts", "high", "low", "close"),
        Seq("key"), Seq("ts"), "high", "low", "close")
        .collect()
      assert(batch.length == bars.length && streamed.size == bars.length)
      batch.foreach { r =>
        val s = streamed((r.getAs[String]("key"), r.getAs[Long]("ts")))
        def b(n: String): Option[Double] =
          if (r.isNullAt(r.fieldIndex(n))) None else Some(r.getAs[Double](n))
        assert(s.ema == b("EMA") && s.rsi == b("RSI") && s.atr == b("ATR") &&
          s.adx == b("ADX") && s.diPlus == b("DI_plus") && s.diMinus == b("DI_minus") &&
          s.macd == b("MACD") && s.macdSignal == b("MACD_Signal") &&
          s.macdHistogram == b("MACD_Histogram"),
          s"batch/stream divergence at ${(r.getAs[String]("key"), r.getAs[Long]("ts"))}")
      }
    } finally q.stop()
  }

  test("streamingIndicators equals the batch kernel under randomized series lengths and chunk boundaries") {
    // adversarial-split differential: 4 series of random lengths
    // (some never leaving warm-up), interleaved arrival, random chunk
    // sizes — so every batch boundary lands at an arbitrary point of
    // every indicator's recursion. Seeded, so failures reproduce.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(20260815L)
    def mkSeries(key: String, n: Int): Seq[StreamOps.IndicatorBar] = {
      var c = 50.0 + rnd.nextDouble() * 100
      (1 to n).map { i =>
        c += rnd.nextGaussian() * 0.7
        val h = c + math.abs(rnd.nextGaussian()) * 0.3
        val l = c - math.abs(rnd.nextGaussian()) * 0.3
        StreamOps.IndicatorBar(key, i.toLong, h, l, c)
      }
    }
    // lengths straddle every warm-up boundary: 5 (< ATR(14) seed),
    // 20 (between EMA(12) and MACD signal 26+9), 40, 120
    val series = Seq("a" -> 5, "b" -> 20, "c" -> 40, "d" -> 120)
      .map { case (k, n) => mkSeries(k, n) }
    // interleave by timestamp so chunks mix series
    val bars = series.flatten.sortBy(b => (b.ts, b.key))
    val chunks = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[StreamOps.IndicatorBar]]
      var rest = bars
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(40)
        buf += rest.take(n); rest = rest.drop(n)
      }
      buf.toSeq
    }
    assert(chunks.size >= 5, s"randomized chunking degenerate: ${chunks.size}")
    val mem = MemoryStream[StreamOps.IndicatorBar]
    val q = StreamOps.streamingIndicators(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("ti_rand").start()
    try {
      chunks.foreach { chunk => mem.addData(chunk: _*); q.processAllAvailable() }
      val streamed = spark.table("ti_rand").as[StreamOps.IndicatorRow].collect()
        .map(r => (r.key, r.ts) -> r).toMap
      val batch = graft.ts.TechIndicators.withRecursiveIndicators(
        bars.toDF("key", "ts", "high", "low", "close"),
        Seq("key"), Seq("ts"), "high", "low", "close").collect()
      assert(batch.length == bars.length && streamed.size == bars.length)
      var defined = 0
      batch.foreach { r =>
        val s = streamed((r.getAs[String]("key"), r.getAs[Long]("ts")))
        def b(n: String): Option[Double] =
          if (r.isNullAt(r.fieldIndex(n))) None else Some(r.getAs[Double](n))
        val cells = Seq(s.ema -> "EMA", s.rsi -> "RSI", s.atr -> "ATR",
          s.adx -> "ADX", s.diPlus -> "DI_plus", s.diMinus -> "DI_minus",
          s.macd -> "MACD", s.macdSignal -> "MACD_Signal",
          s.macdHistogram -> "MACD_Histogram")
        cells.foreach { case (sv, n) =>
          assert(sv == b(n), s"$n diverges at ${(s.key, s.ts)}: stream $sv vs batch ${b(n)}")
          if (sv.isDefined) defined += 1
        }
      }
      // the differential must have exercised real values, not all-warm-up
      assert(defined > 500, s"too few non-null cells compared: $defined")
      // and series "a" (5 bars) must be all warm-up nulls in BOTH faces
      assert(streamed.collect { case ((k, _), r) if k == "a" => r }
        .forall(r => r.ema.isEmpty && r.macd.isEmpty))
    } finally q.stop()
  }

  test("streamingIndicators idleTimeout: timed-out state is evicted; a resumed series restarts warm-up") {
    // the group-step function directly, with Spark's public
    // TestGroupState — the only deterministic way to drive the
    // processing-time timeout branch (a real MemoryStream timeout is
    // wall-clock-coupled)
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import scala.concurrent.duration._
    import graft.ts.TechIndicators
    val conf = TechIndicators.RecursiveConfig()
    def bar(ts: Long) = StreamOps.IndicatorBar("x", ts, 101.0 + ts, 99.0 + ts, 100.0 + ts)
    def freshState(opt: Optional[StreamOps.IndState], timedOut: Boolean) =
      TestGroupState.create[StreamOps.IndState](
        opt, GroupStateTimeout.ProcessingTimeTimeout, 1000L,
        Optional.empty[Long],
        timedOut)
    // batch 1: 20 bars — past the EMA(12) seed, state updated, timeout armed
    val s1 = freshState(Optional.empty(), timedOut = false)
    val out1 = StreamOps.indicatorGroupStep("x", (1L to 20L).map(bar).iterator,
      s1, conf, Some(10.minutes)).toVector
    assert(out1.size == 20 && out1.last.ema.isDefined,
      "series not past warm-up before the eviction probe")
    assert(s1.isUpdated && s1.getTimeoutTimestampMs.isPresent,
      "idleTimeout did not arm a processing-time timeout")
    assert(s1.getTimeoutTimestampMs.get == 1000L + 10.minutes.toMillis)
    // r16 pin: the Option[Duration] convenience MEANS wall-clock
    // ProcessingTimeIdle — kept for source compat; EventTimeIdle is the
    // recommended policy for new code (constructor scaladoc says why)
    val viaPolicy = freshState(Optional.empty(), timedOut = false)
    StreamOps.indicatorGroupStep("x", (1L to 20L).map(bar).iterator,
      viaPolicy, conf, StreamOps.ProcessingTimeIdle(10.minutes)).toVector
    assert(viaPolicy.getTimeoutTimestampMs == s1.getTimeoutTimestampMs,
      "Some(d) convenience must be exactly ProcessingTimeIdle(d)")
    val carried = s1.get
    // the timeout fires: the handler must evict and emit nothing
    val s2 = freshState(Optional.of(carried), timedOut = true)
    val out2 = StreamOps.indicatorGroupStep("x", Iterator.empty, s2, conf,
      Some(10.minutes)).toVector
    assert(out2.isEmpty && s2.isRemoved, "timed-out state was not evicted")
    // the series resumes after eviction: a fresh warm-up row (null EMA),
    // not a continuation of the 20-bar state (which would carry an EMA)
    val s3 = freshState(Optional.empty(), timedOut = false)
    val resumed = StreamOps.indicatorGroupStep("x", Iterator(bar(21L)), s3,
      conf, Some(10.minutes)).toVector
    assert(resumed.head.ema.isEmpty,
      "resumed series continued from pre-eviction state (EMA defined)")
    // same bar against the SURVIVING 20-bar state: EMA defined — the
    // eviction, not the bar, is what reset the warm-up
    val s4 = freshState(Optional.of(carried), timedOut = false)
    val continued = StreamOps.indicatorGroupStep("x", Iterator(bar(21L)), s4,
      conf, Some(10.minutes)).toVector
    assert(continued.head.ema.isDefined)
    // the bounded-key default (no idleTimeout) must not arm a timeout
    val s5 = TestGroupState.create[StreamOps.IndState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 1000L,
      Optional.empty[Long],
      false)
    StreamOps.indicatorGroupStep("x", Iterator(bar(1L)), s5, conf, None).toVector
    assert(s5.isUpdated && !s5.getTimeoutTimestampMs.isPresent)
  }

  test("streamingBacktest idle eviction: flat evicts EXACTLY like never-evict; open trades survive") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import scala.concurrent.duration._
    import graft.backtest.Backtest
    val p = Backtest.Params(threshold = 1.0, tp = 5.0, sl = 3.0,
      capWindow = 1000000L, maxTradesPerWindow = 2) // 1s cap window (µs)
    val idle = StreamOps.ProcessingTimeIdle(10.minutes) // ≥ capWindow
    def st(opt: Optional[Backtest.BtState], timedOut: Boolean) =
      TestGroupState.create[Backtest.BtState](
        opt, GroupStateTimeout.ProcessingTimeTimeout, 1000L,
        Optional.empty[Long], timedOut)
    // prices flat (no SL/TP), pred >> close = immediate long entry
    def quietBar(ts: Long) = Backtest.Bar("x", ts, 100.0, 100.5, 99.5, 100.0, 100.0)
    def entryBar(ts: Long) = Backtest.Bar("x", ts, 100.0, 100.5, 99.5, 100.0, 105.0)
    // flat state with only EXPIRED cap entries (strictly older than
    // capWindow relative to the symbol's max event time), timeout
    // fires → evicted (the GC keeps its value)
    val s1 = st(Optional.of(Backtest.BtState(entries = List(5L),
      maxSeenTs = 5L + p.capWindow + 1L)), timedOut = true)
    assert(StreamOps.backtestGroupStep("x", Iterator.empty, s1, p, idle).isEmpty
      && s1.isRemoved)
    // flat state with a LIVE cap entry (within capWindow of maxSeenTs):
    // wall-clock idle proves nothing about event time → retained and
    // re-armed (r15 cap-safety; exhaustive stalled-feed equivalence in
    // EvictionCapSafetySpec)
    val s1b = st(Optional.of(Backtest.BtState(entries = List(5L),
      maxSeenTs = 5L + p.capWindow)), timedOut = true)
    assert(StreamOps.backtestGroupStep("x", Iterator.empty, s1b, p, idle).isEmpty)
    assert(!s1b.isRemoved && s1b.exists && s1b.getTimeoutTimestampMs.isPresent,
      "a live cap entry must survive a wall-clock idle timeout")
    // OPEN position, timeout fires → state retained and re-armed, no emit
    val openSt = Backtest.BtState(open = true, dir = "long", entryTs = 1L,
      entryPrice = 100.0)
    val s2 = st(Optional.of(openSt), timedOut = true)
    assert(StreamOps.backtestGroupStep("x", Iterator.empty, s2, p, idle).isEmpty)
    assert(!s2.isRemoved && s2.exists && s2.getTimeoutTimestampMs.isPresent,
      "open trade must survive the idle timeout")
    // processing a batch arms the timeout
    val s3 = st(Optional.empty(), timedOut = false)
    StreamOps.backtestGroupStep("x", Iterator(quietBar(1L)), s3, p, idle).toVector
    assert(s3.getTimeoutTimestampMs.isPresent)
    // EXACT equivalence (the timeout ≥ capWindow argument): after an
    // entry at t0 and quiet past the cap window, never-evict and
    // evict-then-resume reach the SAME state on the resume bar —
    // the surviving entries list is exactly what the cap filter
    // would have dropped anyway
    val resumeTs = 10000000L // 10s ≫ 1s capWindow
    val sA = st(Optional.empty(), timedOut = false)
    StreamOps.backtestGroupStep("x", Iterator(entryBar(0L)), sA, p,
      StreamOps.NeverEvict).toVector // opens at t0; entries=[0]
    // close the position via duration? keep it simple: flat path —
    // no-entry bar so the state stays flat with a cap entry recorded
    val sFlatA = st(Optional.of(Backtest.BtState(entries = List(0L))), timedOut = false)
    val outA = StreamOps.backtestGroupStep("x", Iterator(entryBar(resumeTs)),
      sFlatA, p, StreamOps.NeverEvict).toVector
    val sFlatB = st(Optional.empty(), timedOut = false) // evicted + resumed
    val outB = StreamOps.backtestGroupStep("x", Iterator(entryBar(resumeTs)),
      sFlatB, p, idle).toVector
    assert(outA == outB && sFlatA.get == sFlatB.get,
      "evict-then-resume must equal never-evict for flat state past capWindow")
    // the guard: a timeout shorter than capWindow is refused
    val spark0 = spark
    import spark0.implicits._
    intercept[IllegalArgumentException] {
      StreamOps.streamingBacktest(spark0.emptyDataset[Backtest.Bar], p,
        StreamOps.ProcessingTimeIdle(500.millis))
    }
  }

  test("streamingIndicators EventTimeIdle: eviction pinned to the data's event time, replayable") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import scala.concurrent.duration._
    import graft.ts.TechIndicators
    val conf = TechIndicators.RecursiveConfig()
    // ts = epoch millis under the event-time contract
    def bar(ts: Long) = StreamOps.IndicatorBar("x", ts, 101.0, 99.0, 100.0)
    def st(opt: Optional[StreamOps.IndState], watermarkMs: Long, timedOut: Boolean) =
      TestGroupState.create[StreamOps.IndState](
        opt, GroupStateTimeout.EventTimeTimeout, 1000L,
        Optional.of(watermarkMs), timedOut)
    val idle = StreamOps.EventTimeIdle(5.minutes)
    // batch 1: bars up to t=20_000 → timeout armed at max event time +
    // idle budget, INDEPENDENT of the 1000L processing time
    val s1 = st(Optional.empty(), watermarkMs = 0L, timedOut = false)
    val out1 = StreamOps.indicatorGroupStep("x",
      (1L to 20L).map(i => bar(i * 1000L)).iterator, s1, conf, idle).toVector
    assert(out1.size == 20 && out1.last.ema.isDefined)
    assert(s1.getTimeoutTimestampMs.isPresent &&
      s1.getTimeoutTimestampMs.get == 20000L + 5.minutes.toMillis,
      "event-time eviction point must be maxEventTime + timeout")
    val carried = s1.get
    // the watermark passes the eviction point → evict, emit nothing
    val s2 = st(Optional.of(carried), watermarkMs = 20000L + 5.minutes.toMillis + 1,
      timedOut = true)
    assert(StreamOps.indicatorGroupStep("x", Iterator.empty, s2, conf, idle).isEmpty
      && s2.isRemoved)
    // a REPLAY of batch 1 arms the identical eviction point — the
    // deterministic property the processing-time variant lacks
    val r1 = st(Optional.empty(), watermarkMs = 0L, timedOut = false)
    StreamOps.indicatorGroupStep("x",
      (1L to 20L).map(i => bar(i * 1000L)).iterator, r1, conf, idle).toVector
    assert(r1.getTimeoutTimestampMs.get == s1.getTimeoutTimestampMs.get)
    // resumed after eviction: fresh warm-up (no EMA), like a new key
    val s3 = st(Optional.empty(), watermarkMs = 0L, timedOut = false)
    val resumed = StreamOps.indicatorGroupStep("x",
      Iterator(bar(30.minutes.toMillis)), s3, conf, idle).toVector
    assert(resumed.head.ema.isEmpty)
    // MONOTONE eviction point: an admitted in-lateness batch holding
    // only OLDER bars must not LOWER the armed point — the state
    // carries the key's max event time across batches, so the arm
    // re-asserts 20s + d, not 5s + d (which would evict the state
    // before the key's real event-time quiet reached the budget)
    val carried2 = s1.get // maxSeenTs = 20_000 from batch 1
    val sLate = st(Optional.of(carried2), watermarkMs = 6000L, timedOut = false)
    StreamOps.indicatorGroupStep("x", Iterator(bar(5000L)), sLate, conf, idle).toVector
    assert(sLate.getTimeoutTimestampMs.get == 20000L + 5.minutes.toMillis,
      s"late batch lowered the eviction point: ${sLate.getTimeoutTimestampMs}")
    // a LATE batch (all bars far below the watermark) must not arm a
    // timestamp at/below the watermark — GroupStateImpl rejects those at
    // runtime; the arm clamps to watermark + 1ms instead
    val wm = 1.hour.toMillis
    val s4 = st(Optional.empty(), watermarkMs = wm, timedOut = false)
    StreamOps.indicatorGroupStep("x", Iterator(bar(1000L)), s4, conf,
      StreamOps.EventTimeIdle(1.milli)).toVector
    assert(s4.getTimeoutTimestampMs.isPresent &&
      s4.getTimeoutTimestampMs.get == wm + 1L,
      "late-batch eviction point must clamp to watermark + 1ms")
  }

  test("idle eviction guards: zero timeouts are rejected at construction; backtest arm rounds up") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import scala.concurrent.duration._
    import graft.backtest.Backtest
    // a zero (or sub-ms) timeout would arm at/below the watermark →
    // IllegalArgumentException deep inside the streaming runtime; fail
    // fast at policy construction instead
    intercept[IllegalArgumentException] { StreamOps.EventTimeIdle(Duration.Zero) }
    intercept[IllegalArgumentException] { StreamOps.EventTimeIdle(500.micros) }
    intercept[IllegalArgumentException] { StreamOps.ProcessingTimeIdle(Duration.Zero) }
    // backtest event-time arm: bar ts is MICROS; µs→ms must round UP so a
    // timeout exactly equal to capWindow can never fire early and drop a
    // cap entry sitting at the window edge
    val p = Backtest.Params(threshold = 1.0, tp = 5.0, sl = 3.0,
      capWindow = 1000000L, maxTradesPerWindow = 2)
    val idle = StreamOps.EventTimeIdle(1.second) // == capWindow
    def st() = TestGroupState.create[Backtest.BtState](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout, 1000L,
      Optional.of(0L), false)
    def bar(tsUs: Long) = Backtest.Bar("x", tsUs, 100.0, 100.5, 99.5, 100.0, 100.0)
    val s1 = st()
    StreamOps.backtestGroupStep("x", Iterator(bar(1000500L)), s1, p, idle).toVector
    assert(s1.getTimeoutTimestampMs.isPresent &&
      s1.getTimeoutTimestampMs.get == 1001L + 1000L, // ceil(1000.5ms) + 1s
      s"expected ceil-rounded arm, got ${s1.getTimeoutTimestampMs}")
    // exact-ms bar: ceiling must not add a spurious ms
    val s2 = st()
    StreamOps.backtestGroupStep("x", Iterator(bar(2000000L)), s2, p, idle).toVector
    assert(s2.getTimeoutTimestampMs.get == 2000L + 1000L)
    // MONOTONE: a late batch of older bars re-asserts the max-seen
    // eviction point instead of lowering it (BtState.maxSeenTs)
    val carried = s2.get
    assert(carried.maxSeenTs == 2000000L)
    val s3 = TestGroupState.create[Backtest.BtState](
      Optional.of(carried), GroupStateTimeout.EventTimeTimeout, 1000L,
      Optional.of(500L), false)
    StreamOps.backtestGroupStep("x", Iterator(bar(1000000L)), s3, p, idle).toVector
    assert(s3.getTimeoutTimestampMs.get == 2000L + 1000L,
      s"late batch lowered the backtest eviction point: ${s3.getTimeoutTimestampMs}")
    assert(s3.get.maxSeenTs == 2000000L)
  }
}
