package graft.olap

import java.nio.file.{AtomicMoveNotSupportedException, Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Transactional snapshot commits for parquet-backed warehouse tables —
  * the ACID face of the star-schema upserts (SURVEY §2.1 S9/S10). The
  * reference runs `INSERT … ON CONFLICT DO UPDATE` inside a Postgres
  * transaction (`olap/etl_migrate_v2.py:292-397`): a crashed ETL leaves
  * the table at its previous committed state, and readers never observe
  * a half-applied batch. Plain `write.mode("overwrite").parquet(path)`
  * has neither property (overwrite deletes the old files first), so this
  * store emulates the transaction within container limits (no
  * Delta/Iceberg offline):
  *
  * Layout under `tablePath/`:
  *   - `v<N>/`       immutable parquet snapshot directories;
  *   - `_MANIFEST`   one-line text file naming the current snapshot.
  *
  * Write protocol: [[stage]] writes the FULL next version to a fresh
  * `v<N>` directory (old files untouched — the merge plan can read the
  * previous snapshot while writing the next, no
  * materialize-before-overwrite needed); [[publish]] then swaps the
  * manifest via same-directory tmp file + `ATOMIC_MOVE` rename.
  * `rename(2)` on one filesystem is atomic, so a reader resolving the
  * manifest sees the old version or the new one, never a torn file —
  * and a crash anywhere between stage and publish leaves the manifest
  * (hence every reader) on the previous version. The tmp file is
  * created INSIDE `tablePath` so the move can never silently degrade to
  * copy+delete across filesystems; if the platform truly cannot do an
  * atomic move we fail the publish rather than tear the manifest.
  *
  * Readers ([[read]]) resolve the manifest once per call. [[gc]]
  * removes unreferenced snapshot directories, keeping the current and
  * (by default) one predecessor for in-flight readers.
  */
object SnapshotStore {

  private val ManifestName = "_MANIFEST"
  // single source of truth for the legacy snapshot-dir grammar — the
  // partitioned store's migration/gc reuse it rather than re-inlining
  private[olap] val VersionRe = "^v(\\d+)$".r

  /** A staged-but-unpublished snapshot: the data is durable, the table
    * still points at the previous version until [[publish]].
    */
  final case class Staged(tablePath: String, version: String)

  /** The manifest line's tokens: version name, plus the optional ingest
    * fence (r15). One line, one atomic rename — the fence can never be
    * torn from the version it was committed with. */
  private def manifestTokens(tablePath: String): Array[String] = {
    val m = Paths.get(tablePath, ManifestName)
    if (Files.isRegularFile(m)) Files.readString(m).trim.split("\\s+")
    else Array.empty
  }

  /** The snapshot directory name the manifest currently points at, if
    * the table exists and has a committed version. On a
    * partitioned-layout table ([[PartitionedSnapshotStore]]) this is
    * the manifest token `m<N>` — same opaque-token contract (compare
    * for equality, never dereference as a directory).
    */
  def currentVersion(tablePath: String): Option[String] = {
    val toks = manifestTokens(tablePath)
    toks.headOption.flatMap {
      case v if VersionRe.matches(v) =>
        Some(v).filter(_ => Files.isDirectory(Paths.get(tablePath, v)))
      case m if m.startsWith("m") =>
        PartitionedSnapshotStore.current(tablePath).map(mf => s"m${mf.version}")
      case _ => None
    }
  }

  /** The ingest fence committed WITH the current version (the second
    * manifest token), if any — the exactly-once token for streaming
    * micro-batch sinks: a Structured Streaming `foreachBatch` replay
    * re-delivers the same batchId, and a fence at-or-above it means the
    * batch's effect is already in the committed snapshot (the public
    * idempotent-sink pattern Delta's txnAppId/txnVersion popularized).
    * Absent on tables committed without a fence (format-compatible:
    * the manifest's first token is still the bare version name). */
  def currentFence(tablePath: String): Option[Long] = {
    if (PartitionedSnapshotStore.isPartitioned(tablePath))
      return PartitionedSnapshotStore.current(tablePath).flatMap(_.fence)
    val toks = manifestTokens(tablePath)
    if (toks.length >= 2 && currentVersion(tablePath).isDefined)
      toks(1).toLongOption
    else None
  }

  /** The fence's owning query lineage (the third manifest token, r16) —
    * the `txnAppId` half of Delta's (txnAppId, txnVersion) idempotence
    * key. Without it the fence is table-global: a streaming query
    * restarted from a FRESH checkpoint re-numbers its batchIds from 0,
    * and a bare fence comparison silently swallows the new lineage's
    * batches as "already applied" — data loss with no error. A fenced
    * publish that declares a lineage DIFFERENT from the committed one
    * is refused loudly ([[FenceLineageException]]) instead, forcing the
    * operator through the deliberate [[clearFence]] reset. Absent on
    * tables fenced without a lineage (format-compatible). */
  def currentLineage(tablePath: String): Option[String] = {
    if (PartitionedSnapshotStore.isPartitioned(tablePath))
      return PartitionedSnapshotStore.current(tablePath).flatMap(_.lineage)
    val toks = manifestTokens(tablePath)
    if (toks.length >= 3 && currentVersion(tablePath).isDefined) Some(toks(2))
    else None
  }

  /** Read the current committed snapshot; None if never committed.
    * Layout-transparent: partitioned-layout tables resolve through
    * their manifest-of-files (every read face and spec works on either
    * layout unchanged). */
  def read(spark: SparkSession, tablePath: String): Option[DataFrame] =
    if (PartitionedSnapshotStore.isPartitioned(tablePath))
      PartitionedSnapshotStore.read(spark, tablePath)
    else
      currentVersion(tablePath).map(v => spark.read.parquet(s"$tablePath/$v"))

  /** Children of `dir` (closed stream — `Files.list` leaks an fd if the
    * stream is abandoned mid-iteration).
    */
  private[olap] def children(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator.asScala.toSeq finally s.close()
    }

  private def versionDirs(dir: Path): Seq[(Long, Path)] =
    children(dir)
      .flatMap(p => VersionRe.findFirstMatchIn(p.getFileName.toString)
        .map(m => (m.group(1).toLong, p)))
      .sortBy(_._1)

  private def nextVersionName(dir: Path): String = {
    // max over ALL v-dirs (not the manifest): a staged-but-unpublished
    // version must never be overwritten by the next stage
    val existing = versionDirs(dir).map(_._1)
    s"v${if (existing.isEmpty) 0L else existing.max + 1L}"
  }

  /** Write `df` as the table's next snapshot WITHOUT publishing it.
    * Crash-safe by construction: nothing references the new directory
    * yet, and the previous snapshot's files are never touched. The
    * version directory is CLAIMED with an atomic `createDirectory`
    * before the write — two concurrent stagers (the reference
    * serializes writers inside Postgres; this store does not assume a
    * single ETL process) race on the mkdir, and the loser simply claims
    * the next number instead of overwriting the winner's files.
    */
  def stage(df: DataFrame, tablePath: String): Staged = {
    val dir = Paths.get(tablePath)
    Files.createDirectories(dir)
    var v = nextVersionName(dir)
    var claimed = false
    while (!claimed) {
      try { Files.createDirectory(dir.resolve(v)); claimed = true }
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        v = nextVersionName(dir) // lost the race — take the next number
      }
    }
    df.write.mode("overwrite").parquet(s"$tablePath/$v")
    Staged(tablePath, v)
  }

  /** Atomically point the table at a staged snapshot. The only mutation
    * visible to readers is the single manifest rename.
    *
    * Version-monotonic: publishing a snapshot OLDER than the current
    * manifest is refused. Staging is already multi-writer-safe (atomic
    * mkdir claim), and without this check the commit leg would not be —
    * writer A stages v1, writer B stages AND publishes v2, then A's
    * late publish of v1 would silently roll the table back and lose
    * B's committed batch. The loser must restage on top of the new
    * current version (re-running [[commit]] does exactly that).
    */
  def publish(staged: Staged): Unit = publish(staged, None)

  /** Fence-carrying publish (r15): commits the manifest line
    * "version fence" in the same atomic rename. Fence-monotonic under
    * the publish lock: a publish whose fence is at or below the
    * committed one is refused — the exactly-once check for replayed
    * micro-batches is check-and-swap inside ONE critical section, not
    * caller-side check-then-act. Callers treat the refusal as "already
    * applied, skip" ([[graft.olap.OlapEtl.sketchFactBatchWriter]]'s
    * normal replay path probes [[currentFence]] first and only races
    * here). An UNFENCED publish CARRIES the committed fence forward
    * (the Delta-txnVersion discipline): a one-off backfill interleaved
    * with a streaming sink must not erase the sink's replay protection
    * — dropping the fence would let the next redelivered batchId fold
    * twice. Refused publishes (stale fence OR stale version) delete
    * their staged directory before throwing: an orphan below the
    * current version would otherwise consume one of [[gc]]'s keep
    * slots and evict the true predecessor from under in-flight
    * readers. */
  def publish(staged: Staged, fence: Option[Long]): Unit =
    publishImpl(staged, fence, None, cas = false, expectedBase = None,
      freshStage = false)

  /** Compare-and-swap publish (r15 review): refuses unless the table's
    * CURRENT version equals `expectedBase` — the version the caller's
    * snapshot was COMPUTED from. The plain monotonic check alone cannot
    * see a lost update: two writers staging from the same base both
    * stage "newer" version numbers, and whichever publishes second
    * silently erases the first's rows (and, fence-carried, marks the
    * erased batch as applied). CAS turns that interleave into a typed
    * [[StaleVersionException]] the loser handles by re-reading and
    * restaging ([[graft.olap.OlapEtl.sketchFactBatchWriter]]'s retry
    * loop). Single-writer ETLs (the reference serializes its loaders
    * in one process) may keep the plain [[publish]].
    */
  def publishCas(staged: Staged, fence: Option[Long],
      expectedBase: Option[String]): Unit =
    publishImpl(staged, fence, None, cas = true, expectedBase = expectedBase,
      freshStage = false)

  /** Lineage-scoped CAS publish (r16): `lineage` identifies the fence's
    * owning streaming-query checkpoint (see [[currentLineage]]). */
  def publishCas(staged: Staged, fence: Option[Long], lineage: Option[String],
      expectedBase: Option[String]): Unit =
    publishImpl(staged, fence, lineage, cas = true, expectedBase = expectedBase,
      freshStage = false)

  private def publishImpl(staged: Staged, fence: Option[Long],
      lineage: Option[String], cas: Boolean, expectedBase: Option[String],
      freshStage: Boolean): Unit = withPublishLock(staged.tablePath) {
    val dir = Paths.get(staged.tablePath)
    require(lineage.forall(l => l.nonEmpty && !l.exists(_.isWhitespace)),
      s"lineage token must be non-empty and whitespace-free, got $lineage " +
        "(it rides as one manifest token)")
    val stagedN = VersionRe.findFirstMatchIn(staged.version).map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(
        s"malformed staged version name: ${staged.version}"))
    def refuse(e: Exception): Nothing = {
      // clean up our OWN staged dir so a refusal cannot leak an orphan
      // into gc's keep window — but ONLY when the dir is provably
      // never-committed: either this publish call staged it itself
      // (commit/commitCas — the Staged cannot have been published
      // before its own publish leg), or its number is ABOVE the
      // committed current version (versions are monotone, so a dir
      // above current was never current). Deleting on any other
      // refusal is the r16 advisory hazard: re-publishing an
      // already-committed Staged (caller retry after a timed-out
      // publish that succeeded) AFTER a concurrent writer committed a
      // newer version would delete a PREDECESSOR version still inside
      // gc's keep window, under in-flight readers.
      val curN = currentVersion(staged.tablePath)
        .flatMap(v => VersionRe.findFirstMatchIn(v).map(_.group(1).toLong))
      val neverCommitted = freshStage || curN.forall(stagedN > _)
      if (neverCommitted &&
          !currentVersion(staged.tablePath).contains(staged.version))
        deleteRecursively(dir.resolve(staged.version))
      throw e
    }
    // cross-layout tripwire (review r16): a monolithic publish against
    // a PARTITIONED-layout table would silently overwrite the shared
    // pointer with "v<N>" — orphaning every partition file AND erasing
    // the fence/lineage (the monotone check cannot see it: "m3" parses
    // to no version number). Refuse loudly; the staged v-dir is junk in
    // a partitioned table either way, so refuse's cleanup applies.
    if (PartitionedSnapshotStore.isPartitioned(staged.tablePath))
      refuse(new IllegalStateException(
        s"table at ${staged.tablePath} uses the partitioned " +
          "manifest-of-files layout — commit through " +
          "PartitionedSnapshotStore.commitBuckets, not the monolithic " +
          "publish (which would orphan the partitioned data)"))
    if (!Files.isDirectory(dir.resolve(staged.version)))
      // a completed-but-unpublished dir at/below current can be gc'd by
      // a faster writer's commit — that IS a lost race, so surface it
      // as the retryable type, not an opaque require failure
      throw new StaleVersionException(
        s"staged snapshot ${staged.version} missing under ${staged.tablePath} " +
          "— a concurrent writer committed and gc collected the staged dir; " +
          "restage against the current snapshot and retry")
    val cur = currentVersion(staged.tablePath)
    if (cas && cur != expectedBase) refuse(new StaleVersionException(
      s"CAS publish refused: table at ${staged.tablePath} is at " +
        s"${cur.getOrElse("<none>")} but the snapshot was computed from " +
        s"${expectedBase.getOrElse("<none>")} — a concurrent writer committed; " +
        "re-read, restage, retry"))
    cur.flatMap(v => VersionRe.findFirstMatchIn(v).map(_.group(1).toLong))
      .foreach { curN =>
        if (stagedN <= curN) refuse(new StaleVersionException(
          s"stale publish refused: staged ${staged.version} is not newer than " +
            s"committed v$curN at ${staged.tablePath} — another writer committed " +
            "first; restage against the current snapshot and retry"))
      }
    val (carried, carriedLineage) = admitFence(staged.tablePath,
      currentFence(staged.tablePath), currentLineage(staged.tablePath),
      fence, lineage, refuse)
    writeManifestAtomic(dir, staged.version,
      staged.version + fenceSuffix(carried, carriedLineage))
  }

  /** The manifest's fence tokens: " <fence>[ <lineage>]" (lineage only
    * rides with a fence). */
  private[olap] def fenceSuffix(fence: Option[Long],
      lineage: Option[String]): String =
    fence.fold("")(f => s" $f" + lineage.fold("")(l => s" $l"))

  /** Shared fence/lineage admission for BOTH snapshot layouts (the
    * monolithic [[publishImpl]] and
    * [[PartitionedSnapshotStore.commitBuckets]]): decides whether the
    * publish may proceed and what fence/lineage the new manifest
    * carries, refusing through `refuse` (which owns staged-dir
    * cleanup) so the two stores cannot drift on the exactly-once
    * semantics.
    *
    * Rules: a fenced publish whose declared lineage differs from the
    * committed fence's owner is a DIFFERENT streaming-query checkpoint
    * (fresh checkpoints renumber batchIds from 0) — whatever its fence
    * number, folding it through the bare monotone check either
    * silently swallows its batches (f <= curF, "already applied") or
    * silently adopts the fence (f > curF); both hide a real operator
    * decision, so refuse LOUDLY ([[FenceLineageException]]) and point
    * at [[clearFence]]. A non-advancing fence within one lineage is
    * the replayed-micro-batch skip signal ([[StaleFenceException]]).
    * An unfenced publish carries fence AND lineage forward; a fenced
    * one writes its own lineage (keeping the committed owner when it
    * declares none — legacy unscoped callers must not strip scoping).
    */
  private[olap] def admitFence(where: String,
      committedFence: Option[Long], committedLineage: Option[String],
      fence: Option[Long], lineage: Option[String],
      refuse: Exception => Nothing): (Option[Long], Option[String]) = {
    for (l <- lineage; curL <- committedLineage)
      if (fence.isDefined && l != curL) refuse(new FenceLineageException(
        s"fenced publish refused: lineage '$l' does not match the committed " +
          s"fence's lineage '$curL' at $where — a different streaming-query " +
          "checkpoint is writing this table (fresh checkpoints renumber " +
          "batchIds from 0, so fence comparison across lineages is " +
          "meaningless); call SnapshotStore.clearFence between query " +
          "lineages, or point the new query at a new table"))
    for (f <- fence; curF <- committedFence)
      if (f <= curF) refuse(new StaleFenceException(
        s"fenced publish refused: batch fence $f is not above the committed " +
          s"fence $curF at $where — the batch's effect is already " +
          "in the snapshot (replayed micro-batch); skip it"))
    (fence.orElse(committedFence),
      if (fence.isDefined) lineage.orElse(committedLineage) else committedLineage)
  }

  /** Write-tmp-then-ATOMIC_MOVE manifest replacement, shared by
    * [[publishImpl]] and [[clearFence]] (r16 — clearFence previously
    * lacked publish's clear refusal on AtomicMoveNotSupported). The tmp
    * lives in the SAME directory as the manifest: same filesystem, so
    * ATOMIC_MOVE is a true rename (the ParityRun r12 lesson — a
    * default-tmpdir stage can silently fall back to copy+delete). A
    * platform that cannot do the atomic move fails the publish rather
    * than tear the manifest. */
  private[olap] def writeManifestAtomic(dir: Path, tag: String,
      content: String): Unit = {
    val tmp = Files.createTempFile(dir, s".manifest-$tag-", ".tmp")
    try {
      Files.writeString(tmp, content)
      try Files.move(tmp, dir.resolve(ManifestName),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      catch { case e: AtomicMoveNotSupportedException =>
        // refuse a non-atomic fallback: a torn manifest is exactly the
        // failure mode this store exists to prevent
        throw new IllegalStateException(
          s"filesystem at $dir cannot atomically replace the manifest", e)
      }
    } finally Files.deleteIfExists(tmp)
  }

  /** Serializes the version check + manifest rename in [[publish]]: the
    * monotonicity check alone is check-then-act — two publishers can
    * both read the old current version, pass the check, and still land
    * their renames in either order. An exclusive lock on a sidecar file
    * makes check+rename one critical section across PROCESSES
    * (`FileChannel.lock` is an OS advisory lock); the JVM-level monitor
    * covers in-process concurrency, where a second `lock()` on the same
    * file would throw `OverlappingFileLockException` instead of
    * queueing. Monitors are PER TABLE (canonical path): a global one
    * would hold the JVM lock while blocked on another process's file
    * lock, stalling publishes of unrelated tables.
    */
  private val publishMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[olap] def withPublishLock[A](tablePath: String)(body: => A): A = {
    val key = Paths.get(tablePath).toAbsolutePath.normalize.toString
    val monitor = publishMonitors.computeIfAbsent(key, _ => new Object)
    monitor.synchronized {
      val lockPath = Paths.get(tablePath, ".publish.lock")
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try body finally lock.release()
      } finally ch.close()
    }
  }

  /** A fenced publish refused because the fence is not above the
    * committed one — the "this micro-batch was already applied" signal
    * (distinct from [[StaleVersionException]], which means a concurrent
    * writer and calls for a restage-and-retry). */
  final class StaleFenceException(msg: String) extends IllegalStateException(msg)

  /** A publish refused because another writer committed a newer version
    * first — restage against the current snapshot and retry (typed so
    * an idempotent sink can tell "lost a race, re-check the fence" from
    * a genuine invariant failure). */
  final class StaleVersionException(msg: String) extends IllegalStateException(msg)

  /** A fenced publish refused because its lineage token differs from
    * the committed fence's owner (r16): a DIFFERENT streaming-query
    * checkpoint is writing the table, so fence comparison is
    * meaningless and silently skipping would LOSE the new lineage's
    * batches. Deliberately not a subtype of [[StaleFenceException]] /
    * [[StaleVersionException]] — idempotent-sink retry loops must NOT
    * swallow it; the fix is operator action ([[clearFence]] between
    * lineages), not a retry. */
  final class FenceLineageException(msg: String) extends IllegalStateException(msg)

  /** stage + publish; returns the committed version name. */
  def commit(df: DataFrame, tablePath: String): String =
    commit(df, tablePath, None)

  /** stage + fenced publish (see [[publish(staged:Staged,fence:Option[Long])*]]). */
  def commit(df: DataFrame, tablePath: String, fence: Option[Long]): String = {
    val staged = stage(df, tablePath)
    // freshStage: the Staged was created inside THIS call, so a refusal
    // may always delete its dir — it cannot be a committed predecessor
    publishImpl(staged, fence, None, cas = false, expectedBase = None,
      freshStage = true)
    staged.version
  }

  /** stage + CAS publish (see [[publishCas]]): `expectedBase` is the
    * committed version the caller READ when computing `df` (None = the
    * table did not exist yet). */
  def commitCas(df: DataFrame, tablePath: String, fence: Option[Long],
      expectedBase: Option[String]): String =
    commitCas(df, tablePath, fence, None, expectedBase)

  /** Lineage-scoped CAS commit (see [[currentLineage]]). */
  def commitCas(df: DataFrame, tablePath: String, fence: Option[Long],
      lineage: Option[String], expectedBase: Option[String]): String = {
    val staged = stage(df, tablePath)
    publishImpl(staged, fence, lineage, cas = true,
      expectedBase = expectedBase, freshStage = true)
    staged.version
  }

  /** Operator escape hatch: atomically rewrite the manifest WITHOUT its
    * ingest fence, keeping the current version. Needed when a streaming
    * query restarts from a FRESH checkpoint against an existing fenced
    * table (batchIds restart at 0, so a carried fence would silently
    * skip the new lineage's first batches) — fence carry-forward
    * otherwise leaves no API path to lower or clear it. Deliberate,
    * destructive-to-replay-protection: call it only between query
    * lineages.
    */
  def clearFence(tablePath: String): Unit = {
    if (PartitionedSnapshotStore.isPartitioned(tablePath))
      return PartitionedSnapshotStore.clearFence(tablePath)
    withPublishLock(tablePath) {
      currentVersion(tablePath).foreach { v =>
        // drops the fence AND its lineage token — the next fenced
        // lineage starts clean (shared atomic writer: same rename
        // discipline and same loud AtomicMoveNotSupported refusal as
        // publish, r16)
        writeManifestAtomic(Paths.get(tablePath), v, v)
      }
    }
  }

  /** Remove snapshot directories no reader can legitimately resolve,
    * keeping the newest `keep` versions up to and INCLUDING the current
    * one (staged-ahead versions newer than the manifest are kept too —
    * they may be mid-publish). Returns the deleted directory names.
    */
  def gc(tablePath: String, keep: Int = 2,
      staleStageGraceMs: Long = 24L * 3600L * 1000L): Seq[String] = {
    if (PartitionedSnapshotStore.isPartitioned(tablePath))
      return PartitionedSnapshotStore.gc(tablePath, keep, staleStageGraceMs)
    require(keep >= 1, s"gc must keep at least the current version, got $keep")
    val dir = Paths.get(tablePath)
    val cur = currentVersion(tablePath).map(v => VersionRe.findFirstMatchIn(v).get.group(1).toLong)
    if (!Files.isDirectory(dir) || cur.isEmpty) return Seq.empty
    val versions = versionDirs(dir)
    val retained = versions.filter(_._1 <= cur.get).takeRight(keep).map(_._1).toSet
    val now = System.currentTimeMillis()
    val doomed = versions.filter { case (n, p) =>
      // skip dirs still being WRITTEN (no parquet _SUCCESS marker yet):
      // a slow writer's in-flight stage can sit at/below current once a
      // faster writer commits, and dooming it would crash that writer
      // mid-write with an untyped IO error instead of the typed
      // lost-race refusal it gets at publish time (r15 review). But a
      // writer that CRASHED mid-stage leaves a _SUCCESS-less dir
      // forever (and _SUCCESS emission is configurable off), so dirs
      // past `staleStageGraceMs` of mtime-age collect anyway — no
      // in-flight stage legitimately runs that long (r16 advisory).
      n <= cur.get && !retained.contains(n) &&
        (Files.exists(p.resolve("_SUCCESS")) ||
          now - Files.getLastModifiedTime(p).toMillis > staleStageGraceMs)
    }
    doomed.foreach { case (_, p) => deleteRecursively(p) }
    doomed.map(_._2.getFileName.toString)
  }

  private[olap] def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) children(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  /** Zero-copy table clone (r18, VERDICT r17 #1): seed `dstTablePath`
    * with the SAME committed state as `srcTablePath` without moving any
    * data bytes. Both snapshot layouts keep every committed object
    * (parquet snapshot/partition files, immutable `manifest-m<N>`
    * files) IMMUTABLE — mutation is only ever a pointer swap that
    * REPLACES the `_MANIFEST` directory entry via atomic rename, never
    * a write into an existing file — so the clone can share file
    * bodies by hardlink: later commits/compactions/gc on either table
    * create or unlink their OWN directory entries and cannot disturb
    * the other's. (The r17 lifecycle used `FileUtils.copyDirectory`,
    * i.e. driver-side serial I/O over the whole table per clone — the
    * driver measured it as q123's 7.7× regression, and at 100 TB a
    * physical copy is a non-starter; manifest-sharing via links is the
    * Delta/Iceberg SHALLOW CLONE shape within container limits.)
    *
    * Excluded from the clone:
    *  - `.publish.lock`: linking it would SHARE the flock inode, so a
    *    publish on the clone would contend with (and falsely
    *    serialize against) the source table's publishes;
    *  - `.manifest-*.tmp` strays (mid-rename temp files, not state).
    * The `_MANIFEST` pointer itself is COPIED (it is the one file
    * whose directory entry is replaced in place; a fresh copy keeps
    * the clone's pointer history fully independent).
    * Falls back to a plain copy per file if the filesystem refuses
    * links (cross-device dst). The walk holds the SOURCE's publish
    * lock: a concurrent commit+gc could otherwise collect a superseded
    * snapshot between the directory listing and its link — the lock
    * freezes pointer swaps and gc (both take it) for the clone's
    * duration, so the cloned manifest's files are guaranteed present.
    * Source commits merely queue behind the lock; they are not lost. */
  def cloneTable(srcTablePath: String, dstTablePath: String): Unit = {
    val src = Paths.get(srcTablePath)
    val dst = Paths.get(dstTablePath)
    require(Files.isDirectory(src), s"no table directory at $srcTablePath")
    Files.createDirectories(dst)
    def walk(s: Path, d: Path): Unit = children(s).foreach { c =>
      val name = c.getFileName.toString
      if (name != ".publish.lock" &&
          !(name.startsWith(".manifest-") && name.endsWith(".tmp"))) {
        val t = d.resolve(name)
        if (Files.isDirectory(c)) { Files.createDirectories(t); walk(c, t) }
        else if (name == ManifestName)
          Files.copy(c, t, StandardCopyOption.REPLACE_EXISTING)
        else
          try Files.createLink(t, c)
          catch { case _: UnsupportedOperationException |
                       _: java.nio.file.FileSystemException =>
            Files.copy(c, t, StandardCopyOption.REPLACE_EXISTING)
          }
      }
    }
    withPublishLock(srcTablePath) { walk(src, dst) }
  }
}
