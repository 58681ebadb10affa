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

  test("publishing a missing staged version is refused with the RETRYABLE type") {
    val p = freshTable()
    SnapshotStore.commit(df(1), p)
    // r15: a vanished staged dir means a faster writer committed and
    // gc collected it — that is a lost race, so the refusal is the
    // same typed signal as a stale version (restage and retry), not an
    // opaque argument error a retry loop would rethrow
    intercept[SnapshotStore.StaleVersionException] {
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

  test("re-publishing an already-committed Staged refuses WITHOUT deleting the live snapshot") {
    val p = freshTable()
    val st = SnapshotStore.stage(df(1, 2), p)
    SnapshotStore.publish(st)
    // caller-side retry after a timed-out publish that actually
    // succeeded: must refuse (stagedN == curN) but leave the table —
    // which the manifest still points at — fully readable
    intercept[SnapshotStore.StaleVersionException] { SnapshotStore.publish(st) }
    assert(readVals(p) == Seq(1, 2),
      "a repeated publish destroyed the live committed snapshot")
  }

  test("CAS publish: the lost-update interleave is refused, not silently absorbed") {
    val p = freshTable()
    SnapshotStore.commit(df(1), p) // v0 — the shared base
    val base = SnapshotStore.currentVersion(p)
    // writer A and writer B both compute their snapshots FROM v0
    val a = SnapshotStore.read(spark, p).get.union(df(2))
    val b = SnapshotStore.read(spark, p).get.union(df(3))
    SnapshotStore.commitCas(a, p, None, base) // A wins
    assert(readVals(p) == Seq(1, 2))
    // B's snapshot lacks A's row; the plain monotonic check would let
    // it publish (its staged number is newer) and silently erase row 2
    // — CAS refuses with the retryable type instead
    intercept[SnapshotStore.StaleVersionException] {
      SnapshotStore.commitCas(b, p, None, base)
    }
    assert(readVals(p) == Seq(1, 2), "the lost update leaked through")
    // B re-reads and restages against the NEW current — now accepted
    val base2 = SnapshotStore.currentVersion(p)
    SnapshotStore.commitCas(
      SnapshotStore.read(spark, p).get.union(df(3)), p, None, base2)
    assert(readVals(p) == Seq(1, 2, 3))
  }

  test("clearFence: the deliberate between-lineages reset, atomic and version-preserving") {
    val p = freshTable()
    SnapshotStore.commit(df(1), p, Some(7L))
    assert(SnapshotStore.currentFence(p).contains(7L))
    val v = SnapshotStore.currentVersion(p)
    SnapshotStore.clearFence(p)
    assert(SnapshotStore.currentFence(p).isEmpty &&
      SnapshotStore.currentVersion(p) == v && readVals(p) == Seq(1),
      "clearFence must drop ONLY the fence")
    // a fresh lineage's batch 0 can land again
    SnapshotStore.commit(df(2), p, Some(0L))
    assert(SnapshotStore.currentFence(p).contains(0L))
  }

  test("gc never deletes an in-flight stage (no _SUCCESS marker yet)") {
    val p = freshTable()
    (0 to 3).foreach(i => SnapshotStore.commit(df(i), p)) // v0..v3, current v3
    // simulate a slow writer mid-write at/below current: a version dir
    // whose parquet job has not finished (no _SUCCESS marker) — its
    // number fell behind because faster writers committed past it
    Files.delete(Paths.get(p, "v0", "_SUCCESS"))
    Files.delete(Paths.get(p, "v1", "_SUCCESS"))
    val deleted = SnapshotStore.gc(p, keep = 2)
    assert(!deleted.contains("v0") && !deleted.contains("v1") &&
      Files.isDirectory(Paths.get(p, "v0")) && Files.isDirectory(Paths.get(p, "v1")),
      s"gc deleted a dir still being written (no _SUCCESS): $deleted")
    // once the write completes (_SUCCESS lands), the SAME dirs collect
    Files.createFile(Paths.get(p, "v0", "_SUCCESS"))
    Files.createFile(Paths.get(p, "v1", "_SUCCESS"))
    val deleted2 = SnapshotStore.gc(p, keep = 2)
    assert(deleted2.contains("v0") && deleted2.contains("v1"),
      s"completed old versions must still collect: $deleted2")
  }

  test("retrying a committed publish after a NEWER concurrent commit never deletes the predecessor") {
    val p = freshTable()
    // writer A commits v0 via stage+publish, but its publish call times
    // out CLIENT-side after succeeding — A still holds the Staged
    val st = SnapshotStore.stage(df(1), p)
    SnapshotStore.publish(st)
    // a concurrent writer commits v1; v0 is now the predecessor inside
    // gc's keep window, possibly under in-flight readers
    SnapshotStore.commit(df(2), p)
    // A's retry must refuse — and must NOT delete v0 (r16 advisory: the
    // old cleanup guarded only the CURRENT manifest target, so this
    // exact interleave deleted a committed predecessor)
    intercept[SnapshotStore.StaleVersionException] { SnapshotStore.publish(st) }
    assert(Files.isDirectory(Paths.get(p, "v0")),
      "retrying a committed publish deleted the predecessor version dir")
    assert(readVals(p) == Seq(2))
  }

  test("fence lineage: a different query lineage is refused LOUDLY, never silently skipped") {
    val p = freshTable()
    // lineage A lands batches 0..5 (fence 5)
    SnapshotStore.commitCas(df(1), p, Some(5L), Some("runA"),
      SnapshotStore.currentVersion(p))
    assert(SnapshotStore.currentLineage(p).contains("runA"))
    // lineage B restarts from a FRESH checkpoint: batch 0 again. The
    // bare fence check would swallow it as "already applied" — with
    // lineage scoping it raises the dedicated loud type instead
    intercept[SnapshotStore.FenceLineageException] {
      SnapshotStore.commitCas(df(2), p, Some(0L), Some("runB"),
        SnapshotStore.currentVersion(p))
    }
    assert(readVals(p) == Seq(1), "the refused lineage-B publish landed")
    // same lineage, replayed batch → the normal skip signal, unchanged
    intercept[SnapshotStore.StaleFenceException] {
      SnapshotStore.commitCas(df(3), p, Some(5L), Some("runA"),
        SnapshotStore.currentVersion(p))
    }
    // an UNFENCED commit carries fence AND lineage forward
    SnapshotStore.commit(df(4), p)
    assert(SnapshotStore.currentFence(p).contains(5L) &&
      SnapshotStore.currentLineage(p).contains("runA"),
      "an unfenced commit stripped the fence's lineage")
    // the deliberate reset clears both; lineage B's batch 0 then lands
    SnapshotStore.clearFence(p)
    assert(SnapshotStore.currentLineage(p).isEmpty)
    SnapshotStore.commitCas(df(5), p, Some(0L), Some("runB"),
      SnapshotStore.currentVersion(p))
    assert(SnapshotStore.currentFence(p).contains(0L) &&
      SnapshotStore.currentLineage(p).contains("runB"))
  }

  test("gc collects a crashed stage (_SUCCESS-less) once it is older than the grace period") {
    val p = freshTable()
    (0 to 3).foreach(i => SnapshotStore.commit(df(i), p)) // v0..v3
    Files.delete(Paths.get(p, "v0", "_SUCCESS"))          // crashed mid-stage
    // young: protected (could be a live slow writer)
    assert(!SnapshotStore.gc(p, keep = 2).contains("v0"))
    // age it past the grace period: collects (r16 advisory — without
    // the cutoff a crashed stage survives forever, and a pipeline with
    // _SUCCESS markers disabled would make gc a permanent no-op)
    Files.setLastModifiedTime(Paths.get(p, "v0"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 48L * 3600L * 1000L))
    val deleted = SnapshotStore.gc(p, keep = 2)
    assert(deleted.contains("v0") && !Files.isDirectory(Paths.get(p, "v0")),
      s"aged crashed stage must collect: $deleted")
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
