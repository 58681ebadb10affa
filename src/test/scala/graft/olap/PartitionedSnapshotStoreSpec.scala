package graft.olap

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The manifest-of-files snapshot layout (r16 — kills the monolithic
  * store's O(|fact|) rewrite per merge commit): immutable partition
  * files + immutable manifests + one atomic pointer swap. The specs
  * pin the properties that MAKE it the scale path — a commit stages
  * only dirty buckets (clean buckets pass through at the FILE level,
  * verbatim relPath and untouched bytes), readers resolve an immutable
  * chain, gc never collects under a kept manifest — plus fence/CAS
  * parity with the monolithic store (shared admission logic).
  */
class PartitionedSnapshotStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ptn = PartitionedSnapshotStore
  private val lay = ptn.Layout(grainsPerBucket = 10L, seriesBuckets = 1)

  private def freshTable(): String =
    Files.createTempDirectory("ptnsnap").toString + "/fact"

  /** Rows shaped like the sketch fact's key half (series_key, grain,
    * payload) with the bucket column attached. */
  private def rows(kgs: (String, Long, Long)*): DataFrame = {
    val df = kgs.toDF("series_key", "grain", "payload")
    df.withColumn(ptn.BucketCol,
      ptn.bucketExpr(col("series_key"), col("grain"), lay))
  }

  private def buckets(df: DataFrame): Set[Long] =
    df.select(col(ptn.BucketCol)).distinct().collect().map(_.getLong(0)).toSet

  private def readPairs(path: String): Set[(String, Long, Long)] =
    SnapshotStore.read(spark, path).get
      .select("series_key", "grain", "payload").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("commit/read round-trip; the pointer token is layout-opaque through the facade") {
    val p = freshTable()
    val d1 = rows(("a", 1L, 10L), ("a", 15L, 20L), ("b", 3L, 30L))
    val v0 = ptn.commitBuckets(spark, p, d1, buckets(d1), lay,
      fence = None, lineage = None, expectedBase = None)
    assert(v0 == 0L)
    assert(readPairs(p) == Set(("a", 1L, 10L), ("a", 15L, 20L), ("b", 3L, 30L)))
    // the SnapshotStore facade resolves the partitioned layout
    assert(SnapshotStore.currentVersion(p).contains("m0"))
    assert(ptn.isPartitioned(p))
    // grains 1,3 → bucket 0; grain 15 → bucket 1 (grainsPerBucket=10)
    assert(ptn.current(p).get.parts.map(_.bucket).sorted == Seq(0L, 1L))
  }

  test("a commit restages ONLY dirty buckets: clean buckets keep their exact files") {
    val p = freshTable()
    // grains spread over three buckets: 0-9 → b0, 10-19 → b1, 20-29 → b2
    val d1 = rows(("a", 2L, 1L), ("a", 12L, 2L), ("a", 22L, 3L))
    ptn.commitBuckets(spark, p, d1, buckets(d1), lay, None, None, None)
    val m0 = ptn.current(p).get
    val fileBytes = m0.parts.map { e =>
      val dir = Paths.get(p, e.relPath)
      e.bucket -> SnapshotStore.children(dir)
        .filter(_.toString.endsWith(".parquet"))
        .map(f => Files.readAllBytes(f).toSeq)
    }.toMap
    // second commit touches ONLY bucket 2 (grain 25)
    val d2 = rows(("a", 25L, 4L), ("a", 22L, 33L))
    ptn.commitBuckets(spark, p, d2, buckets(d2), lay, None, None, Some(m0.version))
    val m1 = ptn.current(p).get
    assert(m1.version == 1L)
    // buckets 0 and 1: same relPath, SAME BYTES — file-level
    // pass-through is the whole point (the monolithic store would have
    // rewritten them)
    Seq(0L, 1L).foreach { b =>
      val before = m0.parts.find(_.bucket == b).get
      val after = m1.parts.find(_.bucket == b).get
      assert(after.relPath == before.relPath,
        s"clean bucket $b was restaged (relPath changed)")
      val bytesNow = SnapshotStore.children(Paths.get(p, after.relPath))
        .filter(_.toString.endsWith(".parquet"))
        .map(f => Files.readAllBytes(f).toSeq)
      assert(bytesNow == fileBytes(b), s"clean bucket $b bytes moved")
    }
    // bucket 2 restaged with the new contents (commit replaced it)
    assert(m1.parts.find(_.bucket == 2L).get.relPath !=
      m0.parts.find(_.bucket == 2L).get.relPath)
    assert(readPairs(p) == Set(("a", 2L, 1L), ("a", 12L, 2L),
      ("a", 25L, 4L), ("a", 22L, 33L)))
  }

  test("CAS: a commit computed from a stale manifest is refused with the retryable type") {
    val p = freshTable()
    val d1 = rows(("a", 1L, 1L))
    ptn.commitBuckets(spark, p, d1, buckets(d1), lay, None, None, None)
    // writer B computed from m0; writer A commits m1 first
    val dA = rows(("a", 2L, 2L))
    ptn.commitBuckets(spark, p, dA, buckets(dA), lay, None, None, Some(0L))
    val dB = rows(("a", 3L, 3L))
    val stageDirsBefore = SnapshotStore.children(Paths.get(p, "part"))
      .map(_.getFileName.toString).toSet
    intercept[SnapshotStore.StaleVersionException] {
      ptn.commitBuckets(spark, p, dB, buckets(dB), lay, None, None, Some(0L))
    }
    // the refused commit cleaned up its own stage dir (superseded dirs
    // from earlier commits legitimately remain until gc)
    val stageDirsAfter = SnapshotStore.children(Paths.get(p, "part"))
      .map(_.getFileName.toString).toSet
    assert(stageDirsAfter == stageDirsBefore,
      s"refused CAS leaked a stage dir: $stageDirsAfter vs $stageDirsBefore")
    // retry against the current manifest lands (commitBuckets REPLACES
    // dirty-bucket contents — read-merge-write accumulation is the
    // loader's job, so the bucket now holds only dB's row)
    ptn.commitBuckets(spark, p, dB, buckets(dB), lay, None, None, Some(1L))
    assert(readPairs(p).map(_._3) == Set(3L))
  }

  test("fence + lineage: shared admission semantics with the monolithic store") {
    val p = freshTable()
    val d = rows(("a", 1L, 1L))
    ptn.commitBuckets(spark, p, d, buckets(d), lay, Some(5L), Some("runA"), None)
    assert(SnapshotStore.currentFence(p).contains(5L) &&
      SnapshotStore.currentLineage(p).contains("runA"))
    // replayed batch, same lineage → the skip signal
    intercept[SnapshotStore.StaleFenceException] {
      ptn.commitBuckets(spark, p, rows(("a", 2L, 2L)), Set(0L), lay,
        Some(5L), Some("runA"), Some(0L))
    }
    // fresh-checkpoint lineage → the loud signal
    intercept[SnapshotStore.FenceLineageException] {
      ptn.commitBuckets(spark, p, rows(("a", 2L, 2L)), Set(0L), lay,
        Some(0L), Some("runB"), Some(0L))
    }
    // unfenced commit carries fence AND lineage
    ptn.commitBuckets(spark, p, rows(("a", 2L, 2L)), Set(0L), lay,
      None, None, Some(0L))
    assert(SnapshotStore.currentFence(p).contains(5L) &&
      SnapshotStore.currentLineage(p).contains("runA"))
    // clearFence (through the facade) resets both, version-bumped,
    // same table contents
    val before = readPairs(p)
    SnapshotStore.clearFence(p)
    assert(SnapshotStore.currentFence(p).isEmpty &&
      SnapshotStore.currentLineage(p).isEmpty && readPairs(p) == before)
    ptn.commitBuckets(spark, p, rows(("a", 3L, 3L)), Set(0L), lay,
      Some(0L), Some("runB"), ptn.current(p).map(_.version))
    assert(SnapshotStore.currentFence(p).contains(0L))
  }

  test("layout is a table property: a drifted bucket function is refused") {
    val p = freshTable()
    val d = rows(("a", 1L, 1L))
    ptn.commitBuckets(spark, p, d, buckets(d), lay, None, None, None)
    val stageDirsBefore = SnapshotStore.children(Paths.get(p, "part")).size
    intercept[IllegalArgumentException] {
      ptn.commitBuckets(spark, p, d, buckets(d),
        ptn.Layout(grainsPerBucket = 99L), None, None, Some(0L))
    }
    // the refused commit cleaned up its own stage dir (review r16: the
    // layout/stray requires must not bypass the refusal cleanup)
    assert(SnapshotStore.children(Paths.get(p, "part")).size == stageDirsBefore,
      "a layout refusal leaked its stage dir")
  }

  test("cross-layout tripwire: a monolithic publish against a partitioned table refuses loudly") {
    val p = freshTable()
    val d = rows(("a", 1L, 1L))
    ptn.commitBuckets(spark, p, d, buckets(d), lay, Some(3L), Some("runX"), None)
    // a legacy caller commits monolithically at the same path — without
    // the tripwire this would overwrite the pointer with "v0", orphan
    // every partition file, and erase the fence+lineage silently
    val ex = intercept[IllegalStateException] {
      SnapshotStore.commit(Seq(9).toDF("x"), p)
    }
    assert(ex.getMessage.contains("partitioned"), ex.getMessage)
    assert(SnapshotStore.currentVersion(p).contains("m0") &&
      SnapshotStore.currentFence(p).contains(3L) &&
      SnapshotStore.currentLineage(p).contains("runX") &&
      readPairs(p) == Set(("a", 1L, 1L)),
      "the refused monolithic publish damaged the partitioned table")
    // and its junk staged v-dir was cleaned up
    assert(!SnapshotStore.children(Paths.get(p))
      .exists(_.getFileName.toString.matches("v\\d+")),
      "the refused monolithic publish left a v-dir in the partitioned table")
  }

  test("gc: superseded-only files collect, shared files survive, young orphans are protected") {
    val p = freshTable()
    val d1 = rows(("a", 2L, 1L), ("a", 12L, 2L)) // buckets 0, 1
    ptn.commitBuckets(spark, p, d1, buckets(d1), lay, None, None, None)
    val m0 = ptn.current(p).get
    // three more commits touching only bucket 0 → m0's bucket-0 file is
    // superseded by three generations; its bucket-1 file stays shared
    (1 to 3).foreach { i =>
      ptn.commitBuckets(spark, p, rows(("a", 2L, 10L + i)), Set(0L), lay,
        None, None, Some(i - 1L))
    }
    // a young orphan stage dir (simulated crashed writer)
    val orphan = Paths.get(p, "part", "sorphan")
    Files.createDirectories(orphan.resolve(s"${ptn.BucketCol}=7"))
    val deleted = ptn.gc(p, keep = 2)
    // keep=2 → manifests m2, m3 survive; m0/m1 manifests + the bucket-0
    // files ONLY they referenced collect
    assert(!Files.exists(Paths.get(p, "manifest-m0")) &&
      !Files.exists(Paths.get(p, "manifest-m1")))
    assert(Files.exists(Paths.get(p, "manifest-m2")) &&
      Files.exists(Paths.get(p, "manifest-m3")))
    val m0Bucket0 = m0.parts.find(_.bucket == 0L).get.relPath
    val m0Bucket1 = m0.parts.find(_.bucket == 1L).get.relPath
    assert(!Files.exists(Paths.get(p, m0Bucket0)),
      s"superseded bucket-0 file survived gc: $deleted")
    assert(Files.exists(Paths.get(p, m0Bucket1)),
      "bucket-1 file shared with the kept manifests was deleted")
    assert(Files.exists(orphan), "young orphan stage dir must be protected")
    // readers on the kept manifests still resolve completely
    assert(readPairs(p) == Set(("a", 2L, 13L), ("a", 12L, 2L)))
    // age the orphan past the grace period → collects
    Files.setLastModifiedTime(orphan.resolve(s"${ptn.BucketCol}=7"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 48L * 3600L * 1000L))
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 48L * 3600L * 1000L))
    val deleted2 = ptn.gc(p, keep = 2)
    assert(!Files.exists(orphan), s"aged orphan survived: $deleted2")
  }

  test("reader isolation: a reader holding the previous manifest scans it after a new commit") {
    val p = freshTable()
    val d1 = rows(("a", 2L, 1L))
    ptn.commitBuckets(spark, p, d1, buckets(d1), lay, None, None, None)
    // reader resolves NOW (manifest m0's files)
    val reader = SnapshotStore.read(spark, p).get
    // writer replaces bucket 0 and gc's with keep=2 (m0 survives)
    ptn.commitBuckets(spark, p, rows(("a", 2L, 99L)), Set(0L), lay,
      None, None, Some(0L))
    ptn.gc(p, keep = 2)
    assert(reader.select("payload").as[Long].collect().toSeq == Seq(1L),
      "in-flight reader lost its snapshot under a newer commit + gc")
    assert(readPairs(p) == Set(("a", 2L, 99L)))
  }

  test("readAt time travel: kept versions read bit-identically; collected versions return None") {
    val p = freshTable()
    val d1 = rows(("a", 2L, 1L))
    ptn.commitBuckets(spark, p, d1, buckets(d1), lay, None, None, None)    // m0
    ptn.commitBuckets(spark, p, rows(("a", 2L, 2L)), Set(0L), lay,
      None, None, Some(0L))                                               // m1
    ptn.commitBuckets(spark, p, rows(("a", 2L, 3L)), Set(0L), lay,
      None, None, Some(1L))                                               // m2
    // within the keep window every version resolves to ITS contents
    // (training-data lineage: the snapshot run X read is reproducible)
    assert(ptn.readAt(spark, p, 1L).get.select("payload").as[Long]
      .collect().toSeq == Seq(2L))
    assert(ptn.readAt(spark, p, 2L).get.select("payload").as[Long]
      .collect().toSeq == Seq(3L))
    // gc(keep=2) collects m0; its readAt becomes None, not a torn view
    ptn.gc(p, keep = 2)
    assert(ptn.readAt(spark, p, 0L).isEmpty,
      "a collected version must read as None")
    assert(ptn.readAt(spark, p, 1L).isDefined, "kept predecessor still reads")
  }

  test("readRange prunes at the FILE level from manifest grain ranges") {
    val p = freshTable()
    val d = rows(("a", 2L, 1L), ("a", 12L, 2L), ("a", 22L, 3L),
      ("a", 35L, 4L)) // buckets 0..3
    ptn.commitBuckets(spark, p, d, buckets(d), lay, None, None, None)
    val pruned = ptn.readRange(spark, p, 10L, 25L).get
    // only the two intersecting buckets' files appear in the relation
    val files = pruned.inputFiles.toSeq
    val live = ptn.current(p).get.parts
      .filter(e => e.bucket == 1L || e.bucket == 2L)
      .map(e => s"$p/${e.relPath}")
    assert(files.nonEmpty && files.forall(f => live.exists(f.contains)),
      s"readRange scanned outside the grain range: $files")
    assert(pruned.filter(col("grain").between(10L, 25L))
      .select("payload").as[Long].collect().toSet == Set(2L, 3L))
    // empty intersection: schema preserved, zero rows, nothing scanned
    val none = ptn.readRange(spark, p, 1000L, 2000L).get
    assert(none.count() == 0L && none.columns.contains("payload"))
  }

  test("readRange miss is O(1): schema from the manifest, zero files opened; pre-r17 manifests fall back") {
    val p = freshTable()
    val d = rows(("a", 2L, 1L), ("a", 12L, 2L))
    ptn.commitBuckets(spark, p, d, buckets(d), lay, None, None, None)
    val populatedSchema = SnapshotStore.read(spark, p).get.schema
    assert(ptn.current(p).get.schema.contains(populatedSchema),
      s"manifest schema line missing or diverged from the read-back schema: " +
        s"${ptn.current(p).get.schema} vs $populatedSchema")
    // filesystem tripwire: hide every partition file — a miss that
    // opens ANY parquet footer now fails instead of silently costing
    // O(live files)
    val part = Paths.get(p, "part")
    val hidden = Paths.get(p, "part-hidden")
    Files.move(part, hidden)
    try {
      val none = ptn.readRange(spark, p, 1000L, 2000L).get
      assert(none.schema == populatedSchema,
        s"miss-path schema diverged: ${none.schema} vs $populatedSchema")
      assert(none.count() == 0L && none.inputFiles.isEmpty)
    } finally Files.move(hidden, part)
    // pre-r17 manifest (no schema line): the all-files fallback still
    // answers (files present, Catalyst folds the false-filtered scan)
    val mf = Paths.get(p, "manifest-m0")
    val stripped = {
      val ls = Files.readAllLines(mf)
      (0 until ls.size).map(ls.get).filterNot(_.startsWith("schema\t"))
    }
    Files.write(mf, String.join("\n", stripped: _*)
      .concat("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(ptn.current(p).get.schema.isEmpty)
    val none2 = ptn.readRange(spark, p, 1000L, 2000L).get
    assert(none2.count() == 0L && none2.schema == populatedSchema)
  }

  test("seriesBuckets > 1: a grain range splits by key hash; a merge dirties only its keys' sub-buckets") {
    import org.apache.commons.io.FileUtils
    val dir = java.nio.file.Files.createTempDirectory("ptnsub")
    try {
      val path = dir.toString + "/fact"
      val GrainUs = 3600000000L
      val layout = ptn.Layout(grainsPerBucket = 48L, seriesBuckets = 4)
      def ev(keys: Seq[String]) = keys.flatMap { k =>
        (0 until 240).map(i =>
          (k, (i / 10).toLong * GrainUs + (i % 10) * 1000000L,
            i.toDouble, (i * 31).toLong))
      }.toDF("k", "ts_us", "v", "uid")
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      val allKeys = (0 until 8).map("s" + _)
      OlapEtl.loadFactSketches(spark, ev(allKeys), "k", "ts", "v", "uid",
        GrainUs, path, 100.0, 12, OlapEtl.MergeGrain, None, None, layout)
      val m0 = ptn.current(path).get
      // all grains are in grain-bucket 0 (24 grains < 48); 8 keys hash
      // across the 4 sub-buckets — more than one sub-bucket exists
      assert(m0.layout == layout)
      assert(m0.parts.size > 1 && m0.parts.forall(e => e.bucket >= 0 && e.bucket < 4),
        s"expected hash sub-buckets of grain range 0, got ${m0.parts.map(_.bucket)}")
      // a merge batch touching ONE key restages only that key's
      // sub-bucket — the others keep their exact files
      val oneKey = allKeys.head
      OlapEtl.loadFactSketches(spark, ev(Seq(oneKey)), "k", "ts", "v", "uid",
        GrainUs, path, 100.0, 12, OlapEtl.MergeGrain, None, None, layout)
      val m1 = ptn.current(path).get
      val touched = m1.parts.filterNot(e =>
        m0.parts.exists(o => o.bucket == e.bucket && o.relPath == e.relPath))
      assert(touched.map(_.bucket).distinct.size == 1,
        s"a one-key merge restaged more than its sub-bucket: $touched")
      // correctness across sub-buckets: per-key counts doubled for the
      // merged key only
      val counts = SnapshotStore.read(spark, path).get
        .groupBy(col("series_key")).agg(sum(col("n_rows")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts(oneKey) == 480L &&
        allKeys.tail.forall(counts(_) == 240L), s"counts drifted: $counts")
    } finally FileUtils.deleteQuietly(dir.toFile)
  }

  test("concurrent CAS commits from one base: exactly one wins, the loser's retry converges") {
    // the real interleave (two threads, same base manifest), not a
    // sequential simulation: the publish lock serializes the
    // check+swap, CAS refuses the loser with the typed retryable
    // signal, and a read-recompute-retry converges — the
    // sketchFactBatchWriter discipline at the store level
    val p = freshTable()
    val d0 = rows(("a", 2L, 0L))
    ptn.commitBuckets(spark, p, d0, buckets(d0), lay, None, None, None) // m0
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def writer(payload: Long): java.util.concurrent.Future[Boolean] =
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = {
          start.await(10, TimeUnit.SECONDS)
          var done = false
          var won = true
          var attempts = 0
          while (!done) {
            attempts += 1
            // read-recompute against the CURRENT manifest each attempt
            val base = ptn.current(p).get
            val stored = spark.read.parquet(
              base.parts.map(e => s"$p/${e.relPath}"): _*)
              .select(col("series_key"), col("grain"), col("payload"))
            val merged = stored
              .withColumn("payload", col("payload") + lit(payload))
              .withColumn(ptn.BucketCol,
                ptn.bucketExpr(col("series_key"), col("grain"), lay))
            try {
              ptn.commitBuckets(spark, p, merged, Set(0L), lay, None, None,
                Some(base.version))
              done = true
            } catch {
              case _: SnapshotStore.StaleVersionException if attempts < 5 =>
                won = false // lost at least one race; retry converges
            }
          }
          won
        }
      })
    val f1 = writer(10L)
    val f2 = writer(100L)
    start.countDown()
    val (w1, w2) = (f1.get(120, TimeUnit.SECONDS), f2.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    // both effects present exactly once — no lost update, no double-fold
    assert(readPairs(p) == Set(("a", 2L, 110L)),
      s"concurrent CAS writers lost or duplicated an update: ${readPairs(p)}")
    // at least one writer experienced the race (scheduling may let one
    // finish before the other starts its read — then both 'win')
    assert(w1 || w2)
    // version advanced once per successful commit (2 commits + m0)
    assert(ptn.current(p).get.version >= 2L)
  }

  test("loadFactSketches on the partitioned layout: merge batches restage only colliding buckets") {
    import org.apache.commons.io.FileUtils
    val dir = Files.createTempDirectory("ptnfact")
    try {
      val path = dir.toString + "/fact"
      val GrainUs = 3600000000L
      def events(grainLo: Int, grainHi: Int) = {
        val rnd = new scala.util.Random(7)
        (0 until 1200).map { i =>
          // grain strides on i/2 so BOTH keys hit every grain
          val grain = (grainLo + (i / 2) % (grainHi - grainLo + 1)).toLong
          (if (i % 2 == 0) "a" else "b", grain * GrainUs + (i % 60) * 1000000L,
            rnd.nextDouble(), (rnd.nextInt(200) + 1).toLong)
        }.toDF("k", "ts_us", "v", "uid")
          .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      }
      val layout = ptn.Layout(grainsPerBucket = 24L, seriesBuckets = 1)
      // day-one history: grains 0..23 → bucket 0
      OlapEtl.loadFactSketches(spark, events(0, 23), "k", "ts", "v", "uid",
        GrainUs, path, mode = OlapEtl.MergeGrain, layout = layout)
      val m0 = ptn.current(path).get
      assert(m0.parts.map(_.bucket).toSet == Set(0L))
      // day-two micro-batch: grains 24..25 → bucket 1 ONLY
      OlapEtl.loadFactSketches(spark, events(24, 25), "k", "ts", "v", "uid",
        GrainUs, path, mode = OlapEtl.MergeGrain, layout = layout)
      val m1 = ptn.current(path).get
      assert(m1.parts.map(_.bucket).toSet == Set(0L, 1L))
      assert(m1.parts.find(_.bucket == 0L).get.relPath ==
        m0.parts.find(_.bucket == 0L).get.relPath,
        "a merge batch over new grains restaged the cold history bucket")
      // and the table still answers correctly
      assert(SnapshotStore.read(spark, path).get.count() ==
        2L * 26L) // 2 keys × 26 grains
    } finally FileUtils.deleteQuietly(dir.toFile)
  }
}
