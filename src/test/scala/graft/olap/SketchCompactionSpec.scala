package graft.olap

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.metrics.{Hll, TDigest}

/** `OlapEtl.compactFactSketches` (r16; range-scoped r17): fine rows
  * re-grain into coarse window-START rows by pure sketch algebra,
  * grain units preserved (the r17 mixed-grain representation).
  * Contracts pinned here — compacted ≡ direct coarse ingest (HLL
  * bit-equal by losslessness, n_rows exact, digest within the q115
  * rank bound at the rollup level), identity re-compaction is
  * bit-stable (greedy t-digest recompression of an already-compressed
  * digest is a no-op), the compacted fact still answers grain-range
  * questions with the pruning pushed to the scan, the commit carries
  * a live streaming fence forward instead of erasing it — and the
  * scoped lifecycle op (r17): only the aged range folds, untouched
  * buckets keep their EXACT files, the mixed-grain fact answers
  * aligned range questions across the boundary identically to the
  * uncompacted fact, scoped-then-rest ≡ one full compaction, a
  * boundary that ages nothing is a true no-op, and the legacy
  * monolithic layout folds the same rows.
  */
class SketchCompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val HourUs = 3600000000L
  private val DayUs = 24L * HourUs
  private val P = 12
  private val Compression = 100.0
  private val Ps = Seq(0.5, 0.99)

  // two keys × 10 days × hourly rows; id space small enough that some
  // per-hour sketches store SPARSE while day/table rollups go dense —
  // compaction must cross the encoding boundary losslessly
  private lazy val events: DataFrame = {
    val rnd = new scala.util.Random(19)
    (0 until 24000).map { i =>
      val hour = (i / 100).toLong // 0..239 → 10 days
      ( if (i % 2 == 0) "a" else "b",
        hour * HourUs + (i % 100).toLong * 1000000L,
        math.exp(rnd.nextGaussian() * 1.2),
        (rnd.nextInt(5000) + 1).toLong)
    }.toDF("k", "ts_us", "v", "uid")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
  }

  private def withFact[A](tag: String)(body: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory(tag)
    try body(dir.toString + "/fact")
    finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  private def rowsOf(df: DataFrame) =
    df.select(col("series_key"), col("grain"), col("n_rows"),
      col("id_sketch.regs"), col("value_digest.means"),
      col("value_digest.weights")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getAs[Array[Byte]](3).toSeq,
          r.getSeq[Double](4).toSeq, r.getSeq[Double](5).toSeq))).toMap

  private def rankErrOk(values: Array[Double], p: Double, v: Double): Boolean = {
    val n = values.length
    val rle = values.count(_ <= v)
    val rlt = values.count(_ < v)
    val target = p * n
    val err =
      if (target < rlt + 1) (rlt + 1) - target
      else if (target > rle) target - rle else 0.0
    err <= 8.0 * n * p * (1.0 - p) / Compression + 2.0
  }

  test("cloneTable: compacting a hardlink clone leaves the base table bit-identical (r18 q123 shape)") {
    withFact("clonebase") { basePath =>
      withFact("clonedst") { clonePath =>
        OlapEtl.loadFactSketches(spark, events, "k", "ts", "v", "uid",
          HourUs, basePath, Compression, P)
        val baseBefore = rowsOf(SnapshotStore.read(spark, basePath).get)
        val baseVersion = SnapshotStore.currentVersion(basePath)
        SnapshotStore.cloneTable(basePath, clonePath)
        // the clone reads the identical committed state, with NO
        // shared lock sidecar (a linked flock inode would falsely
        // serialize the two tables' publishes)
        assert(rowsOf(SnapshotStore.read(spark, clonePath).get) == baseBefore)
        assert(!java.nio.file.Files.exists(
          java.nio.file.Paths.get(clonePath, ".publish.lock")))
        // compact the CLONE (the q123/q124 lifecycle step) — including
        // its commit and gc — then assert the base never moved: same
        // manifest version, same rows, and every base part file intact
        OlapEtl.compactFactSketches(spark, clonePath, HourUs, DayUs,
          Compression, P)
        val cloneRows = rowsOf(SnapshotStore.read(spark, clonePath).get)
        assert(cloneRows.keySet.map(_._2).forall(_ % 24 == 0),
          "clone's grains must all be day-window starts after compaction")
        assert(SnapshotStore.currentVersion(basePath) == baseVersion)
        assert(rowsOf(SnapshotStore.read(spark, basePath).get) == baseBefore)
        PartitionedSnapshotStore.current(basePath).get.parts.foreach { e =>
          assert(java.nio.file.Files.isDirectory(
            java.nio.file.Paths.get(basePath, e.relPath)),
            s"base part ${e.relPath} lost by the clone's compaction/gc")
        }
      }
    }
  }

  test("compacted fact ≡ direct coarse ingest: HLL bit-equal, counts exact, digest in-bound") {
    withFact("cmp1") { finePath =>
      withFact("cmp2") { coarsePath =>
        OlapEtl.loadFactSketches(spark, events, "k", "ts", "v", "uid",
          HourUs, finePath, Compression, P)
        val compacted = OlapEtl.compactFactSketches(spark, finePath,
          HourUs, DayUs, Compression, P)
        val direct = OlapEtl.loadFactSketches(spark, events, "k", "ts", "v",
          "uid", DayUs, coarsePath, Compression, P)
        val a = rowsOf(compacted)
        val b = rowsOf(direct)
        // r17 grain representation: the compacted fact keeps HOUR units
        // (day rows at window starts 24·d); the direct day-grain ingest
        // is a different table whose unit IS days — same windows, so
        // the keys map by the ratio
        assert(a.keySet == b.keySet.map(kg => (kg._1, kg._2 * 24L)) && a.nonEmpty,
          s"grain sets diverged: ${a.keySet.size} vs ${b.keySet.size}")
        a.foreach { case (kg, (n, regs, _, w)) =>
          val direct = b((kg._1, kg._2 / 24L))
          assert(direct._1 == n, s"grain $kg n_rows diverged")
          // lossless register-max + canonical encoding: BIT-equal
          assert(direct._2 == regs, s"grain $kg HLL bytes diverged")
          // digest weights carry the full mass even though centroid
          // positions are merge-tree-specific
          assert(math.rint(w.sum).toLong == n, s"grain $kg digest weight")
        }
        // table-level rollup of the COMPACTED fact obeys the rank bound
        val roll = udaf(new TDigest.MergeDigestsAgg(Ps, Compression),
          Encoders.product[TDigest.Digest])
        val got = compacted.groupBy(col("series_key"))
          .agg(roll(col("value_digest.means"), col("value_digest.weights"))
            .as("qs"))
          .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
        val values = events.select("k", "v").collect().groupBy(_.getString(0))
          .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
        got.foreach { case (k, qs) =>
          Ps.zip(qs).foreach { case (p, v) =>
            assert(rankErrOk(values(k), p, v), s"key=$k p=$p after compaction")
          }
        }
      }
    }
  }

  test("identity re-compaction is bit-stable: a second pass moves nothing") {
    withFact("cmp3") { path =>
      OlapEtl.loadFactSketches(spark, events, "k", "ts", "v", "uid",
        HourUs, path, Compression, P)
      OlapEtl.compactFactSketches(spark, path, HourUs, DayUs, Compression, P)
      val once = rowsOf(SnapshotStore.read(spark, path).get)
      // ratio-1 "compaction" re-folds every singleton group: HLL is
      // canonical (pure function of content), the greedy digest
      // recompression of an already-compressed digest is a no-op —
      // so the WHOLE ROW must come back bit-identical
      OlapEtl.compactFactSketches(spark, path, DayUs, DayUs, Compression, P)
      val twice = rowsOf(SnapshotStore.read(spark, path).get)
      assert(twice == once, "identity re-compaction moved bits")
    }
  }

  test("compacted fact still answers a grain-range question; pruning reaches the scan") {
    withFact("cmp4") { path =>
      OlapEtl.loadFactSketches(spark, events, "k", "ts", "v", "uid",
        HourUs, path, Compression, P)
      OlapEtl.compactFactSketches(spark, path, HourUs, DayUs, Compression, P)
      // q122's read shape over the compacted table: days 2..5 inclusive
      // — spelled in the fact's HOUR units (day-aligned bounds, the
      // mixed-grain contract): [48, 143]
      val fact = SnapshotStore.read(spark, path).get
        .filter(col("grain").between(48L, 143L))
      val hll = udaf(new Hll.MergeSketchesAgg(P), Encoders.product[Hll.Sketch])
      val got = fact.groupBy(col("series_key"))
        .agg(hll(col("id_sketch.regs")).as("est"),
          sum(col("n_rows")).as("n"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val slice = events.filter(
        OlapEtl.grainCol(col("ts"), DayUs).between(2L, 5L))
        .select("k", "uid").collect().groupBy(_.getString(0))
      slice.foreach { case (k, rows) =>
        var enc = Array.emptyByteArray
        rows.foreach(r => enc = Hll.encAdd(enc, P, r.getLong(1)))
        assert(got(k)._1 == Hll.encEstimate(enc, P),
          s"key=$k range rollup over compacted fact != direct")
        assert(got(k)._2 == rows.length)
      }
      // the BETWEEN bounds are pushed into the (partitioned multi-file)
      // parquet scan — compaction must not cost the pruning pin
      val plan = fact.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        plan.contains("GreaterThanOrEqual(grain,48)") &&
        plan.contains("LessThanOrEqual(grain,143)"),
        s"grain BETWEEN not pushed into the compacted-fact scan:\n$plan")
    }
  }

  // ---- range-scoped compaction (r17): the recurring lifecycle op ----

  // grainsPerBucket = 24 aligns buckets with days for exact-file
  // assertions (one bucket per coarse window; the operator itself
  // handles any alignment — see the straddling-layout test below)
  private val Lay24 = PartitionedSnapshotStore.Layout(grainsPerBucket = 24L)

  private def directHll(rows: Array[org.apache.spark.sql.Row]): Long = {
    var enc = Array.emptyByteArray
    rows.foreach(r => enc = Hll.encAdd(enc, P, r.getLong(1)))
    Hll.encEstimate(enc, P)
  }

  test("scoped compaction folds ONLY the aged range; untouched buckets keep exact files; hot tail bit-identical") {
    withFact("cmp6") { path =>
      OlapEtl.loadFactSketches(spark, events, Seq("k"), "ts", "v", "uid",
        HourUs, path, Compression, P, OlapEtl.ReplaceGrain, None, None, Lay24)
      val ptn = PartitionedSnapshotStore
      val m0 = ptn.current(path).get
      val before = rowsOf(SnapshotStore.read(spark, path).get)
      // age days 0..4 (hour grains < 120); days 5..9 stay fine
      OlapEtl.compactFactSketches(spark, path, HourUs, DayUs, Compression, P,
        upToGrain = Some(120L))
      val m1 = ptn.current(path).get
      // file-level pass-through: every bucket at/above the boundary
      // (bucket = day under Lay24) re-lists the IDENTICAL relPath
      val hotBefore = m0.parts.filter(_.bucket >= 5L).map(e => e.bucket -> e.relPath)
      val hotAfter = m1.parts.filter(_.bucket >= 5L).map(e => e.bucket -> e.relPath)
      assert(hotAfter == hotBefore && hotBefore.size == 5,
        s"hot buckets were restaged: $hotBefore vs $hotAfter")
      val after = rowsOf(SnapshotStore.read(spark, path).get)
      // hot-tail rows BIT-identical (files untouched)
      before.filter(_._1._2 >= 120L).foreach { case (kg, row) =>
        assert(after(kg) == row, s"hot row $kg changed under scoped compaction")
      }
      // aged zone: exactly the day rows at window starts 0,24,...,96,
      // each ≡ a direct fold of its day's raw rows (HLL exact by
      // losslessness, counts exact)
      val agedAfter = after.filter(_._1._2 < 120L)
      assert(agedAfter.keySet ==
        (for (k <- Seq("a", "b"); d <- 0 until 5) yield (k, d * 24L)).toSet)
      agedAfter.foreach { case ((k, g), (n, regs, _, _)) =>
        val raw = events.filter(col("k") === k &&
            OlapEtl.grainCol(col("ts"), HourUs).between(g, g + 23L))
          .select(col("k"), col("uid")).collect()
        assert(n == raw.length, s"aged ($k,$g) n_rows")
        val enc = {
          var e = Array.emptyByteArray
          raw.foreach(r => e = Hll.encAdd(e, P, r.getLong(1)))
          e
        }
        assert(Hll.encEstimate(regs.toArray, P) == Hll.encEstimate(enc, P),
          s"aged ($k,$g) HLL estimate diverged from a direct day fold")
      }
    }
  }

  test("mixed-grain fact answers an aligned range question across the boundary identically to the uncompacted fact") {
    withFact("cmp7") { path =>
      OlapEtl.loadFactSketches(spark, events, Seq("k"), "ts", "v", "uid",
        HourUs, path, Compression, P, OlapEtl.ReplaceGrain, None, None, Lay24)
      def ask(lo: Long, hi: Long): Map[String, (Long, Long)] = {
        val hll = udaf(new Hll.MergeSketchesAgg(P), Encoders.product[Hll.Sketch])
        // manifest-level file pruning + row-level BETWEEN — exactly the
        // q122/q123 read shape
        PartitionedSnapshotStore.readRange(spark, path, lo, hi).get
          .filter(col("grain").between(lo, hi))
          .groupBy(col("series_key"))
          .agg(hll(col("id_sketch.regs")).as("est"), sum(col("n_rows")).as("n"))
          .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      }
      // day-ALIGNED lo in (what will become) compacted territory, fine
      // hi in the hot tail: days 3..4 coarse + hours 120..150 fine
      val preAnswer = ask(72L, 150L)
      OlapEtl.compactFactSketches(spark, path, HourUs, DayUs, Compression, P,
        upToGrain = Some(120L))
      val postAnswer = ask(72L, 150L)
      assert(postAnswer == preAnswer && preAnswer.keySet == Set("a", "b"),
        s"compaction changed an aligned range answer: $preAnswer vs $postAnswer")
      // and the answer is right: direct fold over the raw slice
      preAnswer.foreach { case (k, (est, n)) =>
        val raw = events.filter(col("k") === k &&
            OlapEtl.grainCol(col("ts"), HourUs).between(72L, 150L))
          .select(col("k"), col("uid")).collect()
        assert(n == raw.length && est == directHll(raw),
          s"key $k mixed-grain answer diverged from the raw slice")
      }
    }
  }

  test("scoped-then-rest ≡ one full compaction: HLL bit-equal, n_rows exact, digest mass intact") {
    withFact("cmp8") { scopedPath =>
      withFact("cmp9") { fullPath =>
        for (p <- Seq(scopedPath, fullPath))
          OlapEtl.loadFactSketches(spark, events, Seq("k"), "ts", "v", "uid",
            HourUs, p, Compression, P, OlapEtl.ReplaceGrain, None, None, Lay24)
        OlapEtl.compactFactSketches(spark, scopedPath, HourUs, DayUs,
          Compression, P, upToGrain = Some(120L))
        OlapEtl.compactFactSketches(spark, scopedPath, HourUs, DayUs,
          Compression, P) // the rest (re-grains the already-coarse rows to themselves)
        OlapEtl.compactFactSketches(spark, fullPath, HourUs, DayUs, Compression, P)
        val a = rowsOf(SnapshotStore.read(spark, scopedPath).get)
        val b = rowsOf(SnapshotStore.read(spark, fullPath).get)
        assert(a.keySet == b.keySet && a.nonEmpty,
          s"scoped-then-rest grain set diverged: ${a.keySet} vs ${b.keySet}")
        a.foreach { case (kg, (n, regs, _, w)) =>
          assert(b(kg)._1 == n, s"grain $kg n_rows diverged")
          assert(b(kg)._2 == regs, s"grain $kg HLL bytes diverged")
          // digests ride different merge trees (scoped folds day 0-4 in
          // pass 1, identity-folds them in pass 2) — mass is the contract
          assert(math.rint(w.sum).toLong == n &&
            math.rint(b(kg)._4.sum).toLong == n, s"grain $kg digest mass")
        }
      }
    }
  }

  test("recurring scoped passes skip already-coarse history at the FILE level (manifest high-water mark)") {
    withFact("cmp14") { path =>
      OlapEtl.loadFactSketches(spark, events, Seq("k"), "ts", "v", "uid",
        HourUs, path, Compression, P, OlapEtl.ReplaceGrain, None, None, Lay24)
      val ptn = PartitionedSnapshotStore
      OlapEtl.compactFactSketches(spark, path, HourUs, DayUs, Compression, P,
        upToGrain = Some(120L))
      val m1 = ptn.current(path).get
      assert(m1.compactedUpTo.contains(120L),
        "scoped pass did not record its boundary in the manifest")
      val before = rowsOf(SnapshotStore.read(spark, path).get)
      // the next aging window: only day 5's bucket restages — days 0-4
      // are PROVEN coarse by the high-water mark and their files
      // re-list verbatim (the first cut identity-folded them all:
      // O(aged history) recurring cost, SCALE-R17)
      OlapEtl.compactFactSketches(spark, path, HourUs, DayUs, Compression, P,
        upToGrain = Some(144L))
      val m2 = ptn.current(path).get
      assert(m2.compactedUpTo.contains(144L))
      (Seq(0L, 1L, 2L, 3L, 4L) ++ Seq(6L, 7L, 8L, 9L)).foreach { b =>
        assert(m2.parts.filter(_.bucket == b).map(_.relPath) ==
          m1.parts.filter(_.bucket == b).map(_.relPath),
          s"bucket $b restaged by a scoped pass that should skip it")
      }
      assert(m2.parts.find(_.bucket == 5L).get.relPath !=
        m1.parts.find(_.bucket == 5L).get.relPath,
        "newly aged bucket 5 not restaged")
      val after = rowsOf(SnapshotStore.read(spark, path).get)
      // coarse history bit-identical; day 5 now one coarse row per key
      before.filter(_._1._2 < 120L).foreach { case (kg, row) =>
        assert(after(kg) == row, s"already-coarse row $kg changed")
      }
      assert(after.keySet.filter(g => g._2 >= 120L && g._2 < 144L) ==
        Set(("a", 120L), ("b", 120L)))
      assert(after.values.map(_._1).sum == before.values.map(_._1).sum)
    }
  }

  test("late rows folding into a skipped coarse bucket MERGE with its row — never duplicate the key (r17 review)") {
    withFact("cmp15") { path =>
      // grainsPerBucket=16 misaligns with ratio 24: coarse window 48's
      // start buckets into b3 (grains 48..63) while its fine hours
      // 64..71 live in b4 — the landing-bucket hazard by construction
      val lay16 = PartitionedSnapshotStore.Layout(grainsPerBucket = 16L)
      val ev96 = events.filter(OlapEtl.grainCol(col("ts"), HourUs) < 96L)
      OlapEtl.loadFactSketches(spark, ev96, Seq("k"), "ts", "v", "uid",
        HourUs, path, Compression, P, OlapEtl.ReplaceGrain, None, None, lay16)
      OlapEtl.compactFactSketches(spark, path, HourUs, DayUs, Compression, P,
        upToGrain = Some(72L))
      // LATE data below the committed boundary: fine hours 64..67 merge
      // into bucket 4 after its day already aged
      val late = spark.range(400).select(
        (when(col("id") % 2 === 0, "a").otherwise("b")).as("k"),
        timestamp_micros((lit(64L) + col("id") % 4L) * lit(HourUs) +
          col("id") * 777L).as("ts"),
        col("id").cast("double").as("v"),
        (col("id") + 900000L).as("uid")) // ids disjoint from the base feed
      OlapEtl.loadFactSketches(spark, late, Seq("k"), "ts", "v", "uid",
        HourUs, path, Compression, P, OlapEtl.MergeGrain, None, None, lay16)
      // next scoped pass: bucket 3 (all-coarse, below the high-water
      // mark) is file-skipped UNTIL the late fold lands window 48 in it
      // — the fixpoint pulls it in and the collision MERGES
      OlapEtl.compactFactSketches(spark, path, HourUs, DayUs, Compression, P,
        upToGrain = Some(96L))
      val rows = SnapshotStore.read(spark, path).get
        .select(col("series_key"), col("grain"), col("n_rows"),
          col("id_sketch.regs")).collect()
      // key uniqueness is THE assertion: the pre-fix union emitted two
      // (k, 48) rows into the restaged bucket
      val keyed = rows.groupBy(r => (r.getString(0), r.getLong(1)))
      assert(keyed.values.forall(_.length == 1),
        s"duplicate (key, grain) rows: ${keyed.filter(_._2.length > 1).keys}")
      assert(keyed.keySet.map(_._2) == Set(0L, 24L, 48L, 72L))
      // and the merged (k, 48) row carries base + late data
      Seq("a", "b").foreach { k =>
        val raw = events.filter(col("k") === k &&
            OlapEtl.grainCol(col("ts"), HourUs).between(48L, 71L))
          .select(col("k"), col("uid"))
          .unionByName(late.filter(col("k") === k).select(col("k"), col("uid")))
          .collect()
        val r = keyed((k, 48L)).head
        assert(r.getLong(2) == raw.length, s"($k,48) n_rows after late merge")
        assert(Hll.encEstimate(r.getAs[Array[Byte]](3), P) == directHll(raw),
          s"($k,48) HLL after late merge diverged from a direct fold")
      }
    }
  }

  test("a boundary that ages no files is a true no-op; a misaligned boundary is refused") {
    withFact("cmp10") { path =>
      OlapEtl.loadFactSketches(spark, events, Seq("k"), "ts", "v", "uid",
        HourUs, path, Compression, P, OlapEtl.ReplaceGrain, None, None, Lay24)
      val v0 = PartitionedSnapshotStore.current(path).get.version
      val before = rowsOf(SnapshotStore.read(spark, path).get)
      OlapEtl.compactFactSketches(spark, path, HourUs, DayUs, Compression, P,
        upToGrain = Some(0L))
      assert(PartitionedSnapshotStore.current(path).get.version == v0,
        "no-op scoped compaction committed a new manifest")
      assert(rowsOf(SnapshotStore.read(spark, path).get) == before)
      intercept[IllegalArgumentException] {
        OlapEtl.compactFactSketches(spark, path, HourUs, DayUs, Compression, P,
          upToGrain = Some(121L)) // 121 % 24 != 0
      }
    }
  }

  test("scoped compaction under a straddling bucket layout: young rows in aged buckets pass through value-identical") {
    withFact("cmp11") { path =>
      // grainsPerBucket = 32 does NOT align with ratio 24: bucket 3
      // holds hours 96..127, straddling the boundary 120 — its young
      // rows (120..127) must pass through while its aged rows fold
      OlapEtl.loadFactSketches(spark, events, Seq("k"), "ts", "v", "uid",
        HourUs, path, Compression, P, OlapEtl.ReplaceGrain, None, None,
        PartitionedSnapshotStore.Layout(grainsPerBucket = 32L))
      val before = rowsOf(SnapshotStore.read(spark, path).get)
      OlapEtl.compactFactSketches(spark, path, HourUs, DayUs, Compression, P,
        upToGrain = Some(120L))
      val after = rowsOf(SnapshotStore.read(spark, path).get)
      // young rows — including those inside the straddling bucket —
      // BIT-identical (pass-through re-writes the same values; HLL
      // canonical, digest untouched, counts untouched)
      before.filter(_._1._2 >= 120L).foreach { case (kg, row) =>
        assert(after(kg) == row, s"young row $kg drifted through the restage")
      }
      assert(after.keySet.filter(_._2 < 120L) ==
        (for (k <- Seq("a", "b"); d <- 0 until 5) yield (k, d * 24L)).toSet)
      // total mass conserved
      assert(after.values.map(_._1).sum == before.values.map(_._1).sum)
    }
  }

  test("scoped compaction on the legacy monolithic layout folds the same rows") {
    withFact("cmp12") { ptnPath =>
      withFact("cmp13") { monoPath =>
        OlapEtl.loadFactSketches(spark, events, Seq("k"), "ts", "v", "uid",
          HourUs, ptnPath, Compression, P, OlapEtl.ReplaceGrain, None, None, Lay24)
        // seed the legacy layout from the same rows (the SCALE-R16 idiom)
        SnapshotStore.commit(SnapshotStore.read(spark, ptnPath).get
          .select("series_key", "grain", "value_digest", "id_sketch", "n_rows"),
          monoPath)
        OlapEtl.compactFactSketches(spark, ptnPath, HourUs, DayUs,
          Compression, P, upToGrain = Some(120L))
        OlapEtl.compactFactSketches(spark, monoPath, HourUs, DayUs,
          Compression, P, upToGrain = Some(120L))
        val a = rowsOf(SnapshotStore.read(spark, ptnPath).get)
        val b = rowsOf(SnapshotStore.read(spark, monoPath).get)
        assert(a.keySet == b.keySet && a.nonEmpty)
        a.foreach { case (kg, (n, regs, _, _)) =>
          assert(b(kg)._1 == n && b(kg)._2 == regs,
            s"layouts diverged on scoped compaction at $kg")
        }
      }
    }
  }

  test("compaction carries a live streaming fence and lineage forward") {
    withFact("cmp5") { path =>
      val writer = OlapEtl.sketchFactBatchWriter("k", "ts", "v", "uid",
        HourUs, path, Compression, P, lineage = Some("runC"))
      writer(events, 4L) // fenced merge ingest, batchId 4
      assert(SnapshotStore.currentFence(path).contains(4L))
      OlapEtl.compactFactSketches(spark, path, HourUs, DayUs, Compression, P)
      assert(SnapshotStore.currentFence(path).contains(4L) &&
        SnapshotStore.currentLineage(path).contains("runC"),
        "compaction erased the sink's replay protection")
      // non-nesting re-grain refused loudly
      intercept[IllegalArgumentException] {
        OlapEtl.compactFactSketches(spark, path, DayUs, DayUs * 2 / 3)
      }
    }
  }
}
