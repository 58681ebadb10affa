package graft.olap

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Durable version pins (r17, `PartitionedSnapshotStore.pin/unpin`):
  * the training-data-lineage contract behind `readAt` — a pinned
  * corpus version is reproducible bit-for-bit until explicitly
  * released, regardless of commit and gc traffic. Pinned here: a pin
  * survives gc(keep=1) with its manifest AND files intact, unpin
  * collects it on the next cycle, pins are crash-durable (file-based,
  * re-read cold), a pinned read after 50 commits + per-commit gc
  * matches the byte snapshot taken at pin time, and the refusal
  * surface (unknown version, re-pointed live tag, malformed tag).
  */
class VersionPinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ptn = PartitionedSnapshotStore
  private val lay = ptn.Layout(grainsPerBucket = 10L)

  private def freshTable(): String =
    Files.createTempDirectory("ptnpin").toString + "/fact"

  private def rows(kgs: (String, Long, Long)*): DataFrame =
    kgs.toDF("series_key", "grain", "payload")
      .withColumn(ptn.BucketCol,
        ptn.bucketExpr(col("series_key"), col("grain"), lay))

  private def buckets(df: DataFrame): Set[Long] =
    df.select(col(ptn.BucketCol)).distinct().collect().map(_.getLong(0)).toSet

  private def pairsAt(path: String, v: Long): Option[Set[(String, Long, Long)]] =
    ptn.readAt(spark, path, v).map(
      _.select("series_key", "grain", "payload").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)

  /** Every parquet byte the manifest references — THE reproducibility
    * object a pin protects. */
  private def fileBytes(path: String, v: Long): Map[String, Seq[Byte]] = {
    val manifest = Paths.get(path, s"manifest-m$v")
    assert(Files.isRegularFile(manifest), s"manifest m$v missing")
    val rels = Files.readAllLines(manifest)
    (2 until rels.size).flatMap { i =>
      val rel = rels.get(i).split("\t")(1)
      SnapshotStore.children(Paths.get(path, rel))
        .filter(_.toString.endsWith(".parquet"))
        .map(f => f.toString -> Files.readAllBytes(f).toSeq)
    }.toMap
  }

  test("a pinned version survives gc(keep=1) bit-identically; unpin collects it next cycle") {
    val p = freshTable()
    val d0 = rows(("a", 1L, 10L), ("b", 15L, 20L))
    ptn.commitBuckets(spark, p, d0, buckets(d0), lay, None, None, None)
    val snap0 = pairsAt(p, 0L).get
    val bytes0 = fileBytes(p, 0L)
    ptn.pin(p, 0L, "run-x")
    // crash durability: the pin is ONE file, re-read cold
    assert(ptn.pins(p) == Map("run-x" -> 0L))
    // three more commits, each replacing bucket 0 — m0's files become
    // otherwise-unreferenced
    (1 to 3).foreach { i =>
      val d = rows(("a", 1L, 10L + i))
      ptn.commitBuckets(spark, p, d, buckets(d), lay, None, None, Some(i - 1L))
    }
    ptn.gc(p, keep = 1, graceMs = 0L)
    // m1/m2 collected, m0 held by the pin — manifest and bytes intact
    assert(pairsAt(p, 1L).isEmpty && pairsAt(p, 2L).isEmpty,
      "unpinned superseded versions survived gc(keep=1)")
    assert(pairsAt(p, 0L).contains(snap0), "pinned version unreadable or drifted")
    assert(fileBytes(p, 0L) == bytes0, "pinned version's bytes moved")
    assert(ptn.unpin(p, "run-x") && !ptn.unpin(p, "run-x"))
    ptn.gc(p, keep = 1, graceMs = 0L)
    assert(pairsAt(p, 0L).isEmpty, "released version survived the next gc")
    // the current version is untouched throughout
    assert(pairsAt(p, 3L).contains(Set(("a", 1L, 13L), ("b", 15L, 20L))))
  }

  test("pinned read after 50 commits with per-commit gc matches the pin-time byte snapshot") {
    val p = freshTable()
    val d0 = rows(("a", 1L, 0L), ("b", 25L, 0L))
    ptn.commitBuckets(spark, p, d0, buckets(d0), lay, None, None, None)
    val snap = pairsAt(p, 0L).get
    val bytes = fileBytes(p, 0L)
    ptn.pin(p, 0L, "run-42")
    (1 to 50).foreach { i =>
      val d = rows(("a", (i % 7).toLong, i.toLong))
      ptn.commitBuckets(spark, p, d, buckets(d), lay, None, None, Some(i - 1L))
      ptn.gc(p, keep = 2, graceMs = 0L) // the loader cadence
    }
    assert(ptn.current(p).get.version == 50L)
    assert(pairsAt(p, 0L).contains(snap),
      "pinned corpus version not reproducible after 50 commits + gc")
    assert(fileBytes(p, 0L) == bytes, "pinned version's bytes drifted")
  }

  test("refusals: unknown/collected version, re-pointed live tag, malformed tag; same-version re-pin is idempotent") {
    val p = freshTable()
    val d0 = rows(("a", 1L, 1L))
    ptn.commitBuckets(spark, p, d0, buckets(d0), lay, None, None, None)
    intercept[IllegalArgumentException] { ptn.pin(p, 9L, "ghost") }
    intercept[IllegalArgumentException] { ptn.pin(p, 0L, "two words") }
    ptn.pin(p, 0L, "t")
    ptn.pin(p, 0L, "t") // idempotent
    val d1 = rows(("a", 1L, 2L))
    ptn.commitBuckets(spark, p, d1, buckets(d1), lay, None, None, Some(0L))
    intercept[IllegalArgumentException] { ptn.pin(p, 1L, "t") } // live tag
    ptn.pin(p, 1L, "u") // distinct tag on another version is fine
    assert(ptn.pins(p) == Map("t" -> 0L, "u" -> 1L))
  }
}
