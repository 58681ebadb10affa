package graft.olap

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Crash-injection coverage for the transactional snapshot commits that
  * back the OLAP upserts (reference semantics: `etl_migrate_v2.py:292-397`
  * runs `INSERT … ON CONFLICT` inside a Postgres transaction — a crashed
  * ETL leaves the table at its previous committed state).
  */
class SnapshotStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("snap").toString + "/fact"

  private def df(vals: Int*) = vals.toDF("x")

  private def readVals(path: String): Seq[Int] =
    SnapshotStore.read(spark, path).get.as[Int].collect().toSeq.sorted

  test("commit then read round-trips; versions advance") {
    val p = freshTable()
    assert(SnapshotStore.read(spark, p).isEmpty)
    assert(SnapshotStore.commit(df(1, 2), p) == "v0")
    assert(readVals(p) == Seq(1, 2))
    assert(SnapshotStore.commit(df(3), p) == "v1")
    assert(readVals(p) == Seq(3))
  }

  test("crash between stage and publish: readers stay on the old version") {
    val p = freshTable()
    SnapshotStore.commit(df(1, 2), p)
    // stage the next version, then 'crash' (never publish)
    val staged = SnapshotStore.stage(df(9, 9, 9), p)
    assert(staged.version == "v1")
    assert(readVals(p) == Seq(1, 2)) // manifest still points at v0
    assert(SnapshotStore.currentVersion(p).contains("v0"))
    // a later writer must NOT reuse the dead staged version number…
    val staged2 = SnapshotStore.stage(df(5), p)
    assert(staged2.version == "v2")
    // …and publishing it lands readers on v2, never on the corpse v1
    SnapshotStore.publish(staged2)
    assert(readVals(p) == Seq(5))
  }

  test("crash mid-stage (torn parquet in an unpublished dir) is invisible") {
    val p = freshTable()
    SnapshotStore.commit(df(1, 2), p)
    // simulate a writer killed mid-write: a half-written snapshot dir
    val torn = Paths.get(p, "v1")
    Files.createDirectories(torn)
    Files.writeString(torn.resolve("part-00000.parquet"), "NOT PARQUET")
    assert(readVals(p) == Seq(1, 2)) // reader resolves the manifest, not the dirs
    // the next commit skips past the torn dir
    assert(SnapshotStore.commit(df(7), p) == "v2")
    assert(readVals(p) == Seq(7))
  }

  test("publish leaves no tmp files and is the only manifest mutation") {
    val p = freshTable()
    SnapshotStore.commit(df(1), p)
    val staged = SnapshotStore.stage(df(2), p)
    SnapshotStore.publish(staged)
    val leftovers = Files.list(Paths.get(p)).iterator()
    val names = Iterator.continually(leftovers).takeWhile(_.hasNext)
      .map(_.next().getFileName.toString).toSeq
    assert(!names.exists(_.endsWith(".tmp")), s"tmp residue in $names")
    assert(Files.readString(Paths.get(p, "_MANIFEST")).trim == "v1")
  }

  test("stage claims its version dir atomically — a pre-claimed number is skipped") {
    val p = freshTable()
    SnapshotStore.commit(df(1), p) // v0
    // another writer has already claimed v1 (mkdir won, parquet pending)
    Files.createDirectories(Paths.get(p, "v1"))
    val staged = SnapshotStore.stage(df(2), p)
    assert(staged.version == "v2", "stage must not write into a claimed dir")
    SnapshotStore.publish(staged)
    assert(readVals(p) == Seq(2))
  }

  test("publishing a missing staged version is refused") {
    val p = freshTable()
    SnapshotStore.commit(df(1), p)
    intercept[IllegalArgumentException] {
      SnapshotStore.publish(SnapshotStore.Staged(p, "v99"))
    }
  }

  test("stale publish is refused: a slower writer cannot roll the manifest back") {
    val p = freshTable()
    SnapshotStore.commit(df(1), p)              // v0 committed
    val slow = SnapshotStore.stage(df(2), p)    // writer A stages v1 ...
    val fast = SnapshotStore.stage(df(3), p)    // ... writer B stages v2
    SnapshotStore.publish(fast)                 // B commits first
    assert(readVals(p) == Seq(3))
    // A's late publish of the OLDER version must not silently lose B's batch
    intercept[IllegalStateException] { SnapshotStore.publish(slow) }
    assert(readVals(p) == Seq(3), "manifest moved backward past a newer commit")
    // A recovers by restaging on top of the new current version
    val retried = SnapshotStore.commit(df(2), p)
    assert(retried == "v3" && readVals(p) == Seq(2))
  }

  test("gc keeps current + previous, removes older, never staged-ahead") {
    val p = freshTable()
    (0 to 3).foreach(i => SnapshotStore.commit(df(i), p))   // v0..v3
    val stagedAhead = SnapshotStore.stage(df(42), p)        // v4, unpublished
    val deleted = SnapshotStore.gc(p, keep = 2)
    assert(deleted.sorted == Seq("v0", "v1"))
    assert(readVals(p) == Seq(3))                           // current intact
    assert(Files.isDirectory(Paths.get(p, "v2")))           // previous kept
    assert(Files.isDirectory(Paths.get(p, stagedAhead.version))) // ahead kept
    SnapshotStore.publish(stagedAhead)                      // still publishable
    assert(readVals(p) == Seq(42))
  }

  test("loadFactPerformance survives a simulated crash between its stage and publish") {
    val p = freshTable()
    val results = Seq(("Train MAE H1", 0.1, 0.01, 0.09, 0.11))
      .toDF("Metric", "Average", "Std Dev", "Min", "Max")
    OlapEtl.loadFactPerformance(spark, results, "exp1", p)
    val before = SnapshotStore.read(spark, p).get.count()
    // a crashed second load = staged dir with data, manifest untouched
    SnapshotStore.stage(
      SnapshotStore.read(spark, p).get.withColumn("experiment_key",
        org.apache.spark.sql.functions.lit("exp2")), p)
    assert(SnapshotStore.read(spark, p).get.count() == before)
    // the NEXT successful load proceeds normally on top of the old state
    val after = OlapEtl.loadFactPerformance(spark, results, "exp2", p)
    assert(after.count() == before * 2)
  }
}
