package graft.olap

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Monolithic → partitioned layout migration (r17,
  * `OlapEtl.migrateFactToPartitioned`): pre-r16 sketch facts keep the
  * legacy layout forever and pay its O(|fact|) rewrite per merge
  * commit — one migration moves them onto the flat per-batch line.
  * Pinned here: read-equality across the swap, fence/lineage carried
  * bit-for-bit (replay protection survives), CAS against a racing
  * monolithic writer, the cross-layout tripwire against a STALE
  * monolithic writer publishing after the swap, post-migration merge
  * commits restaging only dirty buckets, legacy v-dirs gc'd on the
  * migration-stamped grace clock, and idempotent re-migration.
  */
class MigrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val HourUs = 3600000000L
  private val P = 12
  private val Compression = 100.0
  private val Lay = PartitionedSnapshotStore.Layout(grainsPerBucket = 24L)

  private def events(hours: Range, part: Int = 0): DataFrame =
    hours.flatMap { h =>
      (0 until 50).map(i => ("k" + (i % 3), h.toLong * HourUs + i * 1000L,
        i.toDouble, (h * 1000 + i * 7 + part).toLong))
    }.toDF("k", "ts_us", "v", "uid")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")

  private def withDir[A](body: String => A): A = {
    val dir = Files.createTempDirectory("graft-mig")
    try body(dir.toString + "/fact")
    finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  /** A LEGACY-layout sketch fact with the given events (the SCALE-R16
    * seeding idiom: build rows via the loader, commit them monolithic). */
  private def seedMonolithic(path: String, ev: DataFrame,
      fence: Option[Long] = None, lineage: Option[String] = None): Unit =
    withDir { tmp =>
      OlapEtl.loadFactSketches(spark, ev, Seq("k"), "ts", "v", "uid",
        HourUs, tmp, Compression, P, OlapEtl.ReplaceGrain, None, None, Lay)
      SnapshotStore.commitCas(SnapshotStore.read(spark, tmp).get,
        path, fence, lineage, None)
    }

  private def factRows(path: String): Map[(String, Long), (Long, Seq[Byte])] =
    SnapshotStore.read(spark, path).get
      .select(col("series_key"), col("grain"), col("n_rows"),
        col("id_sketch.regs")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getAs[Array[Byte]](3).toSeq))).toMap

  test("migration: read-equality across the swap; later merges restage only dirty buckets") {
    withDir { path =>
      seedMonolithic(path, events(0 until 72)) // 3 days of hours
      assert(!PartitionedSnapshotStore.isPartitioned(path))
      val before = factRows(path)
      OlapEtl.migrateFactToPartitioned(spark, path, Lay)
      assert(PartitionedSnapshotStore.isPartitioned(path))
      assert(SnapshotStore.currentVersion(path).contains("m0"))
      assert(factRows(path) == before, "rows changed across the layout swap")
      // a merge batch into the last day now restages ONLY its bucket:
      // buckets 0 and 1 (hours 0..47 under Lay) keep their exact files
      val m0 = PartitionedSnapshotStore.current(path).get
      OlapEtl.loadFactSketches(spark, events(60 until 72, part = 1),
        Seq("k"), "ts", "v", "uid", HourUs, path, Compression, P,
        OlapEtl.MergeGrain, None, None, Lay)
      val m1 = PartitionedSnapshotStore.current(path).get
      Seq(0L, 1L).foreach { b =>
        assert(m1.parts.filter(_.bucket == b).map(_.relPath) ==
          m0.parts.filter(_.bucket == b).map(_.relPath),
          s"clean bucket $b restaged by a post-migration merge")
      }
      assert(m1.parts.find(_.bucket == 2L).get.relPath !=
        m0.parts.find(_.bucket == 2L).get.relPath,
        "dirty bucket 2 not restaged")
      // merged counts: hours 60..71 doubled
      val after = factRows(path)
      assert(after(("k0", 61L))._1 == before(("k0", 61L))._1 * 2)
      assert(after(("k0", 12L)) == before(("k0", 12L)))
    }
  }

  test("fence and lineage carry bit-for-bit: replay protection survives the layout change") {
    withDir { path =>
      seedMonolithic(path, events(0 until 24), fence = Some(4L),
        lineage = Some("runM"))
      OlapEtl.migrateFactToPartitioned(spark, path, Lay)
      assert(SnapshotStore.currentFence(path).contains(4L) &&
        SnapshotStore.currentLineage(path).contains("runM"),
        "migration dropped the fence/lineage tokens")
      // a replayed micro-batch (batchId ≤ fence) is still a no-op
      val writer = OlapEtl.sketchFactBatchWriter(Seq("k"), "ts", "v", "uid",
        HourUs, path, Compression, P, Some("runM"))
      val before = factRows(path)
      writer(events(0 until 24, part = 9), 3L)
      assert(factRows(path) == before, "replayed batch folded after migration")
      // a FRESH lineage is still refused loudly, not silently swallowed
      intercept[SnapshotStore.FenceLineageException] {
        OlapEtl.sketchFactBatchWriter(Seq("k"), "ts", "v", "uid",
          HourUs, path, Compression, P, Some("runN"))(events(0 until 2), 0L)
      }
    }
  }

  test("CAS: migration staged from a stale monolithic version is refused and cleans its stage") {
    withDir { path =>
      seedMonolithic(path, events(0 until 4))
      val v0 = SnapshotStore.currentVersion(path).get
      val data = spark.read.parquet(s"$path/$v0").withColumn(
        PartitionedSnapshotStore.BucketCol,
        PartitionedSnapshotStore.bucketExpr(col("series_key"), col("grain"), Lay))
      // a concurrent monolithic writer commits past the migration's base
      SnapshotStore.commit(SnapshotStore.read(spark, path).get, path)
      intercept[SnapshotStore.StaleVersionException] {
        PartitionedSnapshotStore.migrateFromMonolithic(spark, path, data,
          Lay, expectedBase = v0)
      }
      assert(!PartitionedSnapshotStore.isPartitioned(path))
      assert(!Files.isDirectory(Paths.get(path, "part")) ||
        SnapshotStore.children(Paths.get(path, "part")).isEmpty,
        "refused migration leaked its staged bucket files")
      // retry from the current version lands
      OlapEtl.migrateFactToPartitioned(spark, path, Lay)
      assert(PartitionedSnapshotStore.isPartitioned(path))
    }
  }

  test("cross-layout tripwire: a stale monolithic writer racing past the swap is refused") {
    withDir { path =>
      seedMonolithic(path, events(0 until 4))
      // the stale writer stages BEFORE the migration…
      val staged = SnapshotStore.stage(SnapshotStore.read(spark, path).get, path)
      OlapEtl.migrateFactToPartitioned(spark, path, Lay)
      // …and its publish after the swap must refuse, not clobber the
      // pointer (which would orphan every partition file)
      intercept[IllegalStateException] {
        SnapshotStore.publish(staged)
      }
      assert(SnapshotStore.currentVersion(path).contains("m0"))
    }
  }

  test("EMPTY-fact migration is idempotent: typed empty frame on the first call AND on re-invocation (r17 review)") {
    withDir { path =>
      withDir { donor =>
        // a committed-but-empty monolithic table (donor supplies the
        // fact schema; limit(0) keeps it while emptying the rows)
        seedMonolithic(donor, events(0 until 2))
        val emptyFact = SnapshotStore.read(spark, donor).get.limit(0)
        SnapshotStore.commitCas(emptyFact, path, None, None, None)
        val out1 = OlapEtl.migrateFactToPartitioned(spark, path, Lay)
        assert(PartitionedSnapshotStore.isPartitioned(path))
        assert(out1.isEmpty, "empty-fact migration returned rows")
        // the zero-part manifest still records a schema line (input-plan
        // fallback), so the table reads as TYPED empty forever…
        assert(PartitionedSnapshotStore.current(path).get.schema.nonEmpty,
          "empty-fact migration wrote a manifest with no schema line")
        // …and a re-invocation on the already-migrated empty table is
        // an idempotent typed-empty return, not a throw on a healthy
        // table (pre-fix: IllegalStateException 'no readable snapshot')
        val out2 = OlapEtl.migrateFactToPartitioned(spark, path, Lay)
        assert(out2.isEmpty &&
          out2.columns.sorted.sameElements(out1.columns.sorted),
          "re-invocation on a migrated empty table was not idempotent")
      }
    }
  }

  test("legacy v-dirs survive the default grace for in-flight readers, then gc on the swap-stamped clock; re-migration is a no-op") {
    withDir { path =>
      seedMonolithic(path, events(0 until 4))
      OlapEtl.migrateFactToPartitioned(spark, path, Lay)
      def vdirs = SnapshotStore.children(Paths.get(path))
        .filter(p => p.getFileName.toString.matches("^v\\d+$"))
      assert(vdirs.nonEmpty, "legacy dirs deleted at the swap (readers!)")
      SnapshotStore.gc(path) // default grace: keep
      assert(vdirs.nonEmpty, "default-grace gc collected a fresh legacy dir")
      // idempotent re-migration: same table back, no new manifest
      val v = PartitionedSnapshotStore.current(path).get.version
      val rows = factRows(path)
      OlapEtl.migrateFactToPartitioned(spark, path, Lay)
      assert(PartitionedSnapshotStore.current(path).get.version == v &&
        factRows(path) == rows, "re-migration was not a no-op")
      // grace elapsed (stamped at the swap): legacy dirs collect
      SnapshotStore.gc(path, keep = 2, staleStageGraceMs = 0L)
      assert(vdirs.isEmpty, "aged legacy dirs survived gc")
      assert(factRows(path) == rows, "gc of legacy dirs touched live data")
    }
  }
}
