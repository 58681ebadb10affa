package graft.olap

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.metrics.{Hll, TDigest}

/** The sketch-column warehouse end-to-end (`OlapEtl.loadFactSketches`):
  * grains ingested in separate committed batches must answer later
  * quantile / distinct questions from the STORED table alone —
  * register rollup EXACTLY equal to a direct aggregate (lossless HLL),
  * digest rollup within the q115 rank bound, recompute-replace
  * idempotent under backfill re-loads, and range queries answerable by
  * grain pruning on the fact.
  */
class SketchFactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val GrainUs = 3600000000L // 1 hour
  private val P = 12
  private val Compression = 100.0
  private val Ps = Seq(0.5, 0.9, 0.99)

  // two keys × 20 hourly grains × 120 rows/grain, skewed values,
  // duplicate-heavy ids (the sketch families must count sets and rank
  // values, not rows)
  private lazy val events: DataFrame = {
    val rnd = new scala.util.Random(41)
    (0 until 4800).map { i =>
      val key = if (i % 2 == 0) "a" else "b"
      val grain = (i / 240).toLong // 0..19
      val tsUs = grain * GrainUs + (i % 240).toLong * 1000000L
      (key, tsUs, math.exp(rnd.nextGaussian() * 1.3), (rnd.nextInt(300) + 1).toLong)
    }.toDF("k", "ts_us", "v", "uid")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
  }

  // INTEGER grain — the loader's own definition (floor; bare
  // unix_micros/GrainUs is double division in Spark SQL, and a
  // double-valued between() slices grains mid-row — the loader's
  // recompute-replace contract then gets a PARTIAL grain, which is
  // exactly the misuse the scaladoc warns about)
  private def grainOf = OlapEtl.grainCol(col("ts"), GrainUs)

  private def load(slice: DataFrame, path: String): DataFrame =
    OlapEtl.loadFactSketches(spark, slice, "k", "ts", "v", "uid",
      GrainUs, path, Compression, P)

  /** Temp fact path, deleted after the body (the round-trip specs'
    * no-garbage convention). */
  private def withFact[A](tag: String)(body: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory(tag)
    try body(dir.toString + "/fact")
    finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  private def rollup(fact: DataFrame): Map[String, (Seq[Double], Long, Long)] = {
    val roll = udaf(new TDigest.MergeDigestsAgg(Ps, Compression),
      Encoders.product[TDigest.Digest])
    val hll = udaf(new Hll.MergeSketchesAgg(P), Encoders.product[Hll.Sketch])
    fact.groupBy(col("series_key"))
      .agg(roll(col("value_digest.means"), col("value_digest.weights")).as("qs"),
        hll(col("id_sketch.regs")).as("est"), sum(col("n_rows")).as("n"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getSeq[Double](1).toSeq, r.getLong(2), r.getLong(3))))
      .toMap
  }

  private def rankErrOk(values: Array[Double], p: Double, v: Double): Boolean = {
    val n = values.length
    val rle = values.count(_ <= v).toLong
    val rlt = values.count(_ < v).toLong
    val target = p * n
    val err =
      if (target < rlt + 1) (rlt + 1) - target
      else if (target > rle) target - rle else 0.0
    err <= 8.0 * n * p * (1.0 - p) / Compression + 2.0
  }

  test("batched grain loads answer from the stored table: HLL exact-equal, digest in-bound, counts exact") {
    withFact("sketchfact") { path =>
    // ingest in two committed batches on a grain boundary (grains are
    // recompute-replace, so each batch carries its grains' FULL rows)
    load(events.filter(grainOf < 10), path)
    val fact = load(events.filter(grainOf >= 10), path)
    assert(fact.count() == 40) // 2 keys × 20 grains
    val got = rollup(fact)
    val raw = events.select("k", "v", "uid").collect()
      .groupBy(_.getString(0))
    raw.foreach { case (k, rows) =>
      val (qs, est, n) = got(k)
      assert(n == rows.length, s"key=$k row count")
      // HLL: stored-register rollup == direct aggregate, BIT-EXACT
      val regs = Hll.emptyRegs(P)
      rows.foreach(r => Hll.add(regs, P, r.getLong(2)))
      assert(est == Hll.estimate(regs), s"key=$k HLL rollup != direct")
      // digest: stored-centroid rollup obeys the q115 rank bound
      val values = rows.map(_.getDouble(1)).sorted
      Ps.zip(qs).foreach { case (p, v) =>
        assert(rankErrOk(values, p, v), s"key=$k p=$p est=$v out of bound")
      }
    }
    // version-monotonic commits: two loads → at least two versions seen
    assert(SnapshotStore.currentVersion(path).isDefined)
    }
  }

  test("backfill re-load is idempotent where the algebra promises it; digest stays in-bound") {
    withFact("sketchfact2") { path =>
    load(events, path)
    val before = rollup(SnapshotStore.read(spark, path).get)
    // re-load a grain range from the SAME complete rows (a backfill):
    // the HLL estimate and the exact count must not move AT ALL
    // (registers are a pure function of the id set); the recomputed
    // DIGESTS are merge-tree-specific, so their quantile VALUES may
    // legitimately shift — the invariant is the rank bound, not the
    // bits (the same contract q115 pins across partitionings)
    val fact = load(events.filter(grainOf.between(5, 12)), path)
    assert(fact.count() == 40)
    val after = rollup(fact)
    val values = events.select("k", "v").collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    after.foreach { case (k, (qs, est, n)) =>
      assert((est, n) == ((before(k)._2, before(k)._3)),
        s"key=$k backfill moved the HLL estimate or count")
      Ps.zip(qs).foreach { case (p, v) =>
        assert(rankErrOk(values(k), p, v), s"key=$k p=$p after backfill")
      }
    }
    }
  }

  test("null value OR null id rows are excluded as one row set (no typed-aggregator crash)") {
    withFact("sketchfact4") { path =>
      val withNulls = Seq(
        ("a", 0L, Some(1.0), Some(10L)),
        ("a", 1000000L, None, Some(11L)),   // null value → dropped
        ("a", 2000000L, Some(3.0), None),   // null id → dropped (would NPE the Long encoder)
        ("a", 3000000L, Some(4.0), Some(12L)))
        .toDF("k", "ts_us", "v", "uid")
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      val fact = load(withNulls, path)
      val row = fact.collect()
      assert(row.length == 1 && row.head.getAs[Long]("n_rows") == 2,
        s"expected one grain row over the 2 fully-non-null rows: ${row.toList}")
    }
  }

  test("merge-on-collision: partial-batch incremental ingest ≡ one-shot full ingest") {
    withFact("sketchfact5") { onePath =>
    withFact("sketchfact6") { incPath =>
    val oneShot = load(events, onePath)
    // hourly-micro-batch simulation: each grain's rows arrive in THREE
    // partial batches (split by a row attribute, not a grain boundary —
    // exactly what ReplaceGrain forbids), folded with MergeGrain
    def inc(part: Int) = events.filter(pmod(col("uid"), lit(3)) === part)
    (0 until 3).foreach { part =>
      OlapEtl.loadFactSketches(spark, inc(part), "k", "ts", "v", "uid",
        GrainUs, incPath, Compression, P, OlapEtl.MergeGrain)
    }
    val incremental = SnapshotStore.read(spark, incPath).get
    assert(incremental.count() == oneShot.count())
    // per-grain row: n_rows exact-equal, HLL registers BIT-EXACT equal
    // (register max is lossless — incremental cannot degrade it)
    def perGrain(df: DataFrame) =
      df.select(col("series_key"), col("grain"),
        col("n_rows"), col("id_sketch.regs")).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getAs[Array[Byte]](3).toSeq))).toMap
    val a = perGrain(oneShot)
    val b = perGrain(incremental)
    assert(a.keySet == b.keySet)
    a.foreach { case (kg, (n, regs)) =>
      assert(b(kg)._1 == n, s"grain $kg n_rows diverged under merge ingest")
      assert(b(kg)._2 == regs, s"grain $kg HLL registers diverged (merge must be lossless)")
    }
    // digest: merged grains are one more merge tree — the q115 bound
    // holds for the table-level rollup over the incremental fact
    val got = rollup(incremental)
    val values = events.select("k", "v").collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    got.foreach { case (k, (qs, _, n)) =>
      assert(n == values(k).length)
      Ps.zip(qs).foreach { case (p, v) =>
        assert(rankErrOk(values(k), p, v), s"key=$k p=$p incremental digest out of bound")
      }
    }
    // untouched grains pass through BYTE-IDENTICAL: a merge batch
    // touching only grains >= 10 must not move one bit of grains 0-9
    // (digest recompression is not bit-stable, so a pass-through that
    // re-aggregated everything would silently drift idle digests)
    withFact("sketchfact8") { idlePath =>
      OlapEtl.loadFactSketches(spark, events.filter(grainOf < 10), "k", "ts",
        "v", "uid", GrainUs, idlePath, Compression, P, OlapEtl.MergeGrain)
      def lowGrains() = SnapshotStore.read(spark, idlePath).get
        .filter(col("grain") < 10)
        .select(col("series_key"), col("grain"), col("n_rows"),
          col("id_sketch.regs"), col("value_digest.means"),
          col("value_digest.weights")).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getAs[Array[Byte]](3).toSeq,
            r.getAs[Seq[Double]](4), r.getAs[Seq[Double]](5)))).toMap
      val before = lowGrains()
      OlapEtl.loadFactSketches(spark, events.filter(grainOf >= 10), "k", "ts",
        "v", "uid", GrainUs, idlePath, Compression, P, OlapEtl.MergeGrain)
      assert(lowGrains() == before,
        "a merge batch over other grains moved bits in untouched grain rows")
    }
    // counterexample guard: the same partial batches through the
    // DEFAULT ReplaceGrain mode must NOT reconstruct the full counts
    // (each load replaces the grain with the batch's slice) — pinning
    // that merge mode is genuinely needed for partial batches
    withFact("sketchfact7") { repPath =>
      (0 until 3).foreach(part => load(inc(part), repPath))
      val lastOnly = SnapshotStore.read(spark, repPath).get
        .agg(sum(col("n_rows"))).collect().head.getLong(0)
      assert(lastOnly < events.count(),
        "ReplaceGrain unexpectedly accumulated partial batches — merge mode is moot?")
    }
    }
    }
  }

  test("streaming merge ingest (foreachBatch + batchId fence) is exactly-once under redelivery") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withFact("sketchfact9") { oneShotPath =>
    withFact("sketchfact10") { path =>
      val oneShot = load(events, oneShotPath)
      val writer = OlapEtl.sketchFactBatchWriter("k", "ts", "v", "uid",
        GrainUs, path, Compression, P)
      // e2e: three PARTIAL micro-batches (split by uid, crossing every
      // grain — the shape ReplaceGrain forbids) through a real
      // foreachBatch sink
      val raw = events.select(col("k"), unix_micros(col("ts")).as("ts_us"),
        col("v"), col("uid")).as[(String, Long, Double, Long)].collect()
      val mem = MemoryStream[(String, Long, Double, Long)]
      val q = mem.toDS().toDF("k", "ts_us", "v", "uid")
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
        .writeStream.foreachBatch(writer).start()
      try {
        (0 until 3).foreach { part =>
          mem.addData(raw.filter(_._4 % 3 == part).toIndexedSeq: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      val fact = SnapshotStore.read(spark, path).get
      assert(fact.count() == oneShot.count())
      assert(SnapshotStore.currentFence(path).contains(2L),
        "three micro-batches must leave the fence at batchId 2")
      def totals(df: DataFrame) = df.agg(sum(col("n_rows"))).collect().head.getLong(0)
      assert(totals(fact) == events.count())
      // at-least-once REDELIVERY: re-invoking the sink with an
      // already-fenced batchId must be a complete no-op — same version,
      // same fence, not one row double-counted
      val vBefore = SnapshotStore.currentVersion(path)
      val replayDf = events.filter(pmod(col("uid"), lit(3)) === 2)
      writer(replayDf, 2L) // the batch that just committed
      writer(replayDf, 0L) // an older one
      assert(SnapshotStore.currentVersion(path) == vBefore &&
        SnapshotStore.currentFence(path).contains(2L),
        "replayed batchIds must not advance the table")
      assert(totals(SnapshotStore.read(spark, path).get) == events.count(),
        "a redelivered micro-batch was double-counted")
      // a genuinely NEW batch still lands
      writer(replayDf.limit(0), 3L)
      assert(SnapshotStore.currentFence(path).contains(3L))
    }
    }
  }

  test("fence plumbing: atomic with the version, monotone under the publish lock, absent without") {
    withFact("sketchfact11") { path =>
      val df = Seq((1L, "a")).toDF("id", "s")
      SnapshotStore.commit(df, path)
      assert(SnapshotStore.currentFence(path).isEmpty,
        "unfenced commits must read back with no fence (format back-compat)")
      SnapshotStore.commit(df, path, Some(5L))
      assert(SnapshotStore.currentFence(path).contains(5L) &&
        SnapshotStore.read(spark, path).get.count() == 1)
      // an UNFENCED commit (a backfill interleaved with the streaming
      // sink) must CARRY the fence forward, not erase the sink's
      // replay protection
      SnapshotStore.commit(df, path)
      assert(SnapshotStore.currentFence(path).contains(5L),
        "an unfenced commit erased the ingest fence")
      def versionDirCount() = new java.io.File(path).listFiles()
        .count(f => f.isDirectory && f.getName.matches("v\\d+"))
      val dirsBefore = versionDirCount()
      // non-advancing fence refused as the dedicated exception type
      intercept[SnapshotStore.StaleFenceException] {
        SnapshotStore.commit(df, path, Some(5L))
      }
      intercept[SnapshotStore.StaleFenceException] {
        SnapshotStore.commit(df, path, Some(4L))
      }
      // refused publishes must clean up their staged snapshot dirs —
      // orphans below the current version would consume gc's keep
      // slots and evict the true predecessor under in-flight readers
      assert(versionDirCount() == dirsBefore,
        "a refused publish leaked its staged version directory")
      // and must not have torn anything: table still readable at the
      // fenced version
      assert(SnapshotStore.currentFence(path).contains(5L) &&
        SnapshotStore.read(spark, path).get.count() == 1)
      SnapshotStore.commit(df, path, Some(6L))
      assert(SnapshotStore.currentFence(path).contains(6L))
    }
  }

  test("null-safe grain keys (r16): NULL series key replaces/merges, never duplicates; NULL ts is excluded") {
    withFact("sketchfact15") { path =>
      val ev = Seq(
        (Option("a"), Option(1000000L), 1.0, 1L),
        (Option.empty[String], Option(2000000L), 2.0, 2L), // null key: legit group
        (Option.empty[String], Option(3000000L), 3.0, 3L),
        (Option("a"), Option.empty[Long], 4.0, 4L))        // null ts: no grain → excluded
        .toDF("k", "ts_us", "v", "uid")
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      def load2(mode: OlapEtl.SketchIngestMode) =
        OlapEtl.loadFactSketches(spark, ev, "k", "ts", "v", "uid", GrainUs,
          path, Compression, P, mode)
      load2(OlapEtl.ReplaceGrain)
      def snap() = SnapshotStore.read(spark, path).get
        .select(col("series_key"), col("n_rows")).collect()
        .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
      assert(snap() == Map(Some("a") -> 1L, None -> 2L),
        "expected one 'a' grain row and one NULL-key grain row; null-ts excluded")
      // idempotent backfill: the NULL-key grain must REPLACE, not
      // duplicate (the r16 null-unsafe anti-join hazard)
      load2(OlapEtl.ReplaceGrain)
      assert(snap() == Map(Some("a") -> 1L, None -> 2L),
        "a NULL-key grain duplicated on an idempotent backfill")
      // merge mode folds INTO the null-key grain (counts sum)
      load2(OlapEtl.MergeGrain)
      assert(snap() == Map(Some("a") -> 2L, None -> 4L),
        "merge mode did not fold the NULL-key grain")
    }
  }

  test("an EMPTY first micro-batch advances the fence without crashing (zero-part manifest, r16)") {
    withFact("sketchfact14") { path =>
      val writer = OlapEtl.sketchFactBatchWriter("k", "ts", "v", "uid",
        GrainUs, path, Compression, P)
      // first batch of the stream is empty: the committed manifest has
      // ZERO parts — the loader must return an empty typed frame, not
      // crash on None.get (review r16), and the fence must still land
      writer(events.limit(0), 0L)
      assert(SnapshotStore.currentFence(path).contains(0L))
      assert(SnapshotStore.read(spark, path).isEmpty,
        "a zero-part manifest should read back as no data")
      // the next real batch lands normally on the same table
      writer(events.filter(grainOf < 2), 1L)
      assert(SnapshotStore.read(spark, path).get.count() == 4) // 2 keys × 2 grains
      assert(SnapshotStore.currentFence(path).contains(1L))
    }
  }

  test("composite series keys (r16): a two-column key lands as a struct through loader, sink, and rollup") {
    withFact("sketchfact12") { path =>
      // (event_type, region)-shaped key: k is the type, k2 the region
      val ev = events.withColumn("k2",
        concat(lit("r"), pmod(col("uid"), lit(3))))
      OlapEtl.loadFactSketches(spark, ev.filter(grainOf < 10),
        Seq("k", "k2"), "ts", "v", "uid", GrainUs, path, Compression, P,
        OlapEtl.MergeGrain, None, None,
        graft.olap.PartitionedSnapshotStore.Layout())
      // second batch through the FENCED COMPOSITE sink face
      val writer = OlapEtl.sketchFactBatchWriter(Seq("k", "k2"), "ts", "v",
        "uid", GrainUs, path, Compression, P, None)
      writer(ev.filter(grainOf >= 10), 0L)
      val fact = SnapshotStore.read(spark, path).get
      // struct key reads back by field name; grain count = 2 types ×
      // 3 regions × 20 grains
      assert(fact.count() == 2L * 3L * 20L)
      val roll = udaf(new Hll.MergeSketchesAgg(P), Encoders.product[Hll.Sketch])
      val got = fact.groupBy(col("series_key.k"), col("series_key.k2"))
        .agg(roll(col("id_sketch.regs")).as("est"), sum(col("n_rows")).as("n"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      val raw = ev.select(col("k"), col("k2"), col("uid")).collect()
        .groupBy(r => (r.getString(0), r.getString(1)))
      assert(got.keySet == raw.keySet)
      raw.foreach { case (kk, rows) =>
        var enc = Array.emptyByteArray
        rows.foreach(r => enc = Hll.encAdd(enc, P, r.getLong(2)))
        assert(got(kk) == ((Hll.encEstimate(enc, P), rows.length.toLong)),
          s"composite key $kk rollup diverged")
      }
      // single-key remains the degenerate bare column (q122's shape):
      // the schema of a 1-key table has a plain string series_key
      withFact("sketchfact13") { p1 =>
        val one = OlapEtl.loadFactSketches(spark, events.limit(500), "k",
          "ts", "v", "uid", GrainUs, p1, Compression, P)
        assert(one.schema("series_key").dataType ==
          org.apache.spark.sql.types.StringType)
      }
    }
  }

  test("range queries prune on the stored grain: rollup over grains 0-9 == direct over that slice") {
    withFact("sketchfact3") { path =>
    load(events, path)
    val fact = SnapshotStore.read(spark, path).get.filter(col("grain") < 10)
    val got = rollup(fact)
    val slice = events.filter(grainOf < 10)
      .select("k", "uid").collect().groupBy(_.getString(0))
    slice.foreach { case (k, rows) =>
      val regs = Hll.emptyRegs(P)
      rows.foreach(r => Hll.add(regs, P, r.getLong(1)))
      assert(got(k)._2 == Hll.estimate(regs), s"key=$k range rollup != direct")
      assert(got(k)._3 == rows.length)
    }
    }
  }
}
