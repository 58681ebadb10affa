package graft.olap

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-of-files snapshot commits for the sketch-column fact —
  * the partitioned layout that kills [[SnapshotStore]]'s disclosed
  * O(|fact|) full-snapshot rewrite per merge commit (PLANS
  * SCALE-R15D; the in-container analog of Delta/Iceberg file-level
  * commits, which the reference — Postgres row-level transactions,
  * `olap/etl_migrate_v2.py:292-397` — gets from its storage engine).
  *
  * The monolithic store re-stages the FULL table per commit, so a
  * micro-batch merge ingest acquires an O(|fact|) term once the fact
  * dwarfs a batch — at 100 TB the term IS the cost. Here the table is
  * a set of immutable partition files keyed by (series-hash ×
  * grain-range) bucket, named by an immutable manifest; a
  * [[OlapEtl.MergeGrain]] commit stages ONLY the buckets its batch
  * collides with, re-lists the untouched buckets' files VERBATIM in
  * the next manifest, and the commit point stays one atomic pointer
  * rename. Per-batch ingest cost is then O(batch + dirty buckets),
  * independent of table size (ScaleProbe SCALE-R16).
  *
  * Layout under `tablePath/`:
  *   - `part/s<uuid>/__bucket=<b>/`  immutable parquet partition dirs
  *     (one per dirty bucket per commit — `partitionBy` output);
  *   - `manifest-m<N>`   immutable manifest files: line 1
  *     `m<N>[ <fence>[ <lineage>]]` (exactly the monolithic token
  *     grammar), line 2 `layout <grainsPerBucket> <seriesBuckets>`
  *     (the bucketing function is a TABLE property — a drifting
  *     bucket function would scatter one grain over two buckets and
  *     break collision detection), an optional line 3
  *     `schema \t <StructType json>` (r17 — makes an
  *     empty-intersection [[readRange]] O(1) instead of O(live files)
  *     footer reads), then one
  *     `bucket \t relPath \t grainMin \t grainMax \t rows` line per
  *     live partition file;
  *   - `_MANIFEST`   the pointer: one line `m<N>`, swapped by the
  *     same tmp-file + ATOMIC_MOVE rename as the monolithic store.
  *
  * Readers resolve pointer → manifest → files; every object on that
  * path is immutable, so a reader mid-scan is isolated from any
  * number of later commits. Crash anywhere before the pointer swap
  * leaves the table on the previous manifest; orphaned stage dirs
  * and superseded manifests are [[gc]]'d (never-referenced dirs only
  * past an mtime grace, exactly the monolithic store's crashed-stage
  * discipline). Fence / lineage / CAS semantics are SHARED with the
  * monolithic store ([[SnapshotStore.admitFence]]) — the exactly-once
  * contract cannot drift between layouts.
  */
object PartitionedSnapshotStore {

  private val PointerName = "_MANIFEST"
  private val PinsName = "_PINS"
  private val ManifestRe = "^m(\\d+)$".r
  val BucketCol = "__bucket"

  /** One immutable partition file: its bucket, path relative to the
    * table root, the grain range it covers (manifest-level pruning for
    * [[readRange]]), and its row count (observability + gc audit). */
  final case class PartEntry(bucket: Long, relPath: String,
      grainMin: Long, grainMax: Long, rows: Long)

  /** The bucketing function's parameters — fixed at table creation
    * (line 2 of every manifest). `grainsPerBucket` sets how many
    * consecutive grains share a file (time-ordered ingest then dirties
    * only the newest bucket(s) per batch); `seriesBuckets` sub-splits
    * each grain range by a series-key hash so single files stay
    * bounded at high key cardinality.
    *
    * Sizing (SCALE-R17B, zipf-keyed 2M-row ingest): a commit writes
    * ONE task and one file per dirty bucket, so at `seriesBuckets=1` a
    * grain range's whole restage is single-task and its file carries
    * every series (probe: max bucket file 3.1 MiB at sb=1 → 0.25 MiB
    * at sb=16, commit latency flat-to-better, range reads unaffected —
    * a grain range's sub-buckets are all pruned or all kept together).
    * Raise `seriesBuckets` when one grain-range bucket's data
    * approaches a single write task's comfortable size (≳ a few
    * hundred MB) or a hot key set concentrates a bucket; it divides
    * max file size ~linearly at no read cost. */
  final case class Layout(grainsPerBucket: Long = 32L, seriesBuckets: Int = 1) {
    require(grainsPerBucket >= 1L && seriesBuckets >= 1,
      s"layout must be positive, got $this")
  }

  /** `schema` (r17): the fact's read schema recorded in the manifest
    * (optional property line `schema \t <StructType json>`), so an
    * empty-intersection [[readRange]] builds its empty-but-typed
    * result from the manifest alone — the pre-r17 fallback constructed
    * a parquet relation over ALL live files just to infer the schema,
    * O(live files) footer reads on a miss. None on pre-r17 manifests
    * (fallback kept).
    *
    * `compactedUpTo` (r17): the high-water COMPACTION boundary
    * (optional property line `compacted \t <grain>`, original grain
    * units) — grains below it have already been aged into coarse
    * window-start rows, so the next scoped
    * [[OlapEtl.compactFactSketches]] processes only parts intersecting
    * [compactedUpTo, newBoundary) and the RECURRING lifecycle cost is
    * O(newly aged window), independent of how much history is already
    * coarse (SCALE-R17's first cut re-folded the whole aged history
    * every run — identity folds, correct but O(aged history)).
    * Monotone; carried forward by non-compaction commits. Late fine
    * rows merge-ingested BELOW the boundary stay correct for aligned
    * reads (they simply coexist with the coarse rows) but are skipped
    * by later scoped passes — a full compaction re-ages them. */
  final case class Manifest(version: Long, fence: Option[Long],
      lineage: Option[String], layout: Layout,
      schema: Option[org.apache.spark.sql.types.StructType],
      compactedUpTo: Option[Long],
      parts: Seq[PartEntry])

  /** The bucket id expression for a row: series-hash sub-bucket within
    * a grain-range bucket. `xxhash64` is deterministic across
    * partitions, sessions, and Spark versions — the bucket function
    * must be a pure function of the key, forever. floor-div (not
    * truncate) so pre-1970 grains bucket consistently with
    * [[OlapEtl.grainCol]]'s floor semantics.
    *
    * Precision contract: Spark's `/` on longs promotes to double, so
    * the floor-div is exact only for |grain| < 2^53 (and likewise for
    * the bucket-id product against 2^63). Grains are epoch-scaled
    * integers — epoch-µs/day ≈ 2×10^4, epoch-seconds ≈ 2×10^9, even
    * raw epoch-µs ≈ 2×10^15 ≪ 2^53 — so every realistic grain is far
    * inside the exact range; the bound is documented rather than
    * branched on because the function's output on all reachable inputs
    * must never change (committed tables bucket with it forever). */
  def bucketExpr(seriesKey: Column, grain: Column, layout: Layout): Column =
    floor(grain / lit(layout.grainsPerBucket)).cast("long") *
      lit(layout.seriesBuckets.toLong) +
      pmod(xxhash64(seriesKey), lit(layout.seriesBuckets.toLong))

  /** True when `tablePath` holds a partitioned-layout table (pointer
    * token `m<N>`; the monolithic store's is `v<N>`). */
  def isPartitioned(tablePath: String): Boolean = {
    val p = Paths.get(tablePath, PointerName)
    Files.isRegularFile(p) &&
      ManifestRe.matches(Files.readString(p).trim.split("\\s+").head)
  }

  /** The current committed manifest, if any. */
  def current(tablePath: String): Option[Manifest] = {
    val p = Paths.get(tablePath, PointerName)
    if (!Files.isRegularFile(p)) return None
    val tok = Files.readString(p).trim.split("\\s+").head
    ManifestRe.findFirstMatchIn(tok).flatMap { m =>
      readManifestFile(Paths.get(tablePath, s"manifest-$tok"), m.group(1).toLong)
    }
  }

  /** Next manifest version: claims past any leftover manifest file
    * from a publisher that crashed between manifest write and pointer
    * swap (CREATE_NEW on a reused number would throw). */
  private def nextManifestVersion(dir: Path, cur: Option[Manifest]): Long = {
    val existing = SnapshotStore.children(dir)
      .flatMap(p => ManifestRe.findFirstMatchIn(p.getFileName.toString
        .stripPrefix("manifest-")).map(_.group(1).toLong))
    (existing ++ cur.map(_.version)).foldLeft(-1L)(math.max) + 1L
  }

  /** Lenient manifest read for [[gc]]'s listing (r16 advisory): gc now
    * holds the publish lock, so an in-flight publisher's half-written
    * manifest can no longer be observed mid-write — this guard remains
    * as defense-in-depth for what the lock cannot rule out: a
    * publisher that CRASHED between its (plain, non-atomic)
    * `Files.write` of the manifest and the pointer swap leaves a torn
    * file on disk forever. Treat any unreadable manifest as IN-FLIGHT
    * (None → its version is neither kept-by-name nor doomed; its files
    * stay under the orphan grace) until the grace dooms it, never
    * throw from an otherwise-committed ingest's post-commit gc leg.
    * The strict [[readManifestFile]] stays for [[current]]/[[readAt]],
    * where the manifest is durably committed before the pointer names
    * it and a parse failure IS corruption worth raising. */
  private def readManifestLenient(f: Path, version: Long): Option[Manifest] =
    try readManifestFile(f, version)
    catch { case scala.util.control.NonFatal(_) => None }

  private def readManifestFile(f: Path, version: Long): Option[Manifest] = {
    if (!Files.isRegularFile(f)) return None
    val lines = Files.readAllLines(f)
    if (lines.size < 2) return None
    val head = lines.get(0).trim.split("\\s+")
    val fence = if (head.length >= 2) head(1).toLongOption else None
    val lineage = if (head.length >= 3) Some(head(2)) else None
    val lay = lines.get(1).trim.split("\\s+")
    require(lay.length == 3 && lay(0) == "layout",
      s"malformed manifest layout line in $f: ${lines.get(1)}")
    val layout = Layout(lay(1).toLong, lay(2).toInt)
    // optional r17 PROPERTY lines between the layout line and the part
    // rows (part rows start with a numeric bucket id): `schema \t json`
    // (JSON never contains a raw tab or newline — escapes ride as
    // backslash sequences) and `compacted \t grain`. Absent on pre-r17
    // manifests.
    var i = 2
    var schema: Option[org.apache.spark.sql.types.StructType] = None
    var compactedUpTo: Option[Long] = None
    var props = true
    while (props && i < lines.size) {
      val ln = lines.get(i)
      if (ln.startsWith("schema\t")) {
        schema = Some(org.apache.spark.sql.types.DataType
          .fromJson(ln.substring("schema\t".length))
          .asInstanceOf[org.apache.spark.sql.types.StructType])
        i += 1
      } else if (ln.startsWith("compacted\t")) {
        compactedUpTo = Some(ln.substring("compacted\t".length).toLong)
        i += 1
      } else props = false
    }
    val parts = (i until lines.size).iterator
      .map(j => lines.get(j)).filter(_.nonEmpty).map { ln =>
        val c = ln.split("\t")
        PartEntry(c(0).toLong, c(1), c(2).toLong, c(3).toLong, c(4).toLong)
      }.toSeq
    Some(Manifest(version, fence, lineage, layout, schema, compactedUpTo, parts))
  }

  /** Read the whole committed table (None if never committed or the
    * committed manifest lists no live partitions). One multi-path
    * parquet relation — still a single `FileSourceScan`, so pushed
    * filters and column pruning behave exactly as on the monolithic
    * layout. */
  def read(spark: SparkSession, tablePath: String): Option[DataFrame] =
    current(tablePath).filter(_.parts.nonEmpty).map { m =>
      spark.read.parquet(m.parts.map(e => s"$tablePath/${e.relPath}"): _*)
    }

  /** TIME-TRAVEL read (r16): resolve a SPECIFIC manifest version —
    * the training-data-lineage face ("read the exact corpus snapshot
    * run X trained on"). Valid while the manifest survives [[gc]] —
    * inside the keep window, or held indefinitely by a durable [[pin]]
    * (manifests and their files are immutable, so a kept version reads
    * bit-identically forever); a collected version returns None rather
    * than a torn view. */
  def readAt(spark: SparkSession, tablePath: String, version: Long)
      : Option[DataFrame] =
    readManifestFile(Paths.get(tablePath, s"manifest-m$version"), version)
      .filter(_.parts.nonEmpty)
      .map(m => spark.read.parquet(
        m.parts.map(e => s"$tablePath/${e.relPath}"): _*))

  /** Read only the partition files whose grain range intersects
    * [lo, hi] — manifest-level FILE pruning on top of parquet
    * row-group pruning (the caller still applies its own
    * `grain BETWEEN` filter for row-level exactness). At 100 TB this
    * is the difference between listing/opening every file of the fact
    * and touching O(range) of them. */
  def readRange(spark: SparkSession, tablePath: String, grainLo: Long,
      grainHi: Long): Option[DataFrame] =
    current(tablePath).filter(_.parts.nonEmpty).map { m =>
      val live = m.parts.filter(e => e.grainMax >= grainLo && e.grainMin <= grainHi)
      if (live.isEmpty) m.schema match {
        // r17: the manifest's schema line makes a miss O(1) — an empty
        // LocalRelation, zero parquet footers opened (at 100 TB-class
        // file counts the pre-r17 relation construction below did
        // O(live files) schema work just to return nothing)
        case Some(sc) =>
          spark.createDataFrame(java.util.Collections.emptyList[
            org.apache.spark.sql.Row](), sc)
        // pre-r17 manifest without a schema line: preserve schema via
        // an empty slice over THIS manifest's files (never-scanned —
        // Catalyst folds the scan away under `false`). Built from the
        // manifest in hand, not a second pointer resolve — a
        // concurrent commit+gc between the two reads could make the
        // re-resolve return None and crash a pure reader (r16 review).
        case None =>
          spark.read.parquet(m.parts.map(e => s"$tablePath/${e.relPath}"): _*)
            .filter(lit(false))
      }
      else spark.read.parquet(live.map(e => s"$tablePath/${e.relPath}"): _*)
    }

  /** Commit `newBucketData` as the FULL replacement contents of the
    * buckets in `dirtyBuckets`, leaving every other bucket's files
    * untouched (re-listed verbatim in the new manifest).
    *
    * `newBucketData` must carry [[BucketCol]] (the [[bucketExpr]]
    * value) plus a `grain` column; rows outside `dirtyBuckets` are the
    * caller's bug (they would land in files the manifest then
    * double-lists with the bucket's surviving old file — a `require`
    * guards it cheaply from the stats pass). A dirty bucket with no
    * rows in `newBucketData` simply disappears from the manifest.
    *
    * CAS discipline identical to the monolithic store: `expectedBase`
    * is the manifest VERSION the caller read when computing the new
    * bucket contents; a concurrent commit refuses with
    * [[SnapshotStore.StaleVersionException]] (re-read, recompute,
    * retry). Fence/lineage admission is [[SnapshotStore.admitFence]],
    * shared. Returns the committed manifest version.
    */
  /** Stage `data` (carrying [[BucketCol]] + `grain`) as one immutable
    * partition dir per bucket under `part/`, OUTSIDE any lock (the
    * parquet write is the long leg, and staged files are invisible
    * until a pointer swap names them). Returns the stage dir's relPath
    * and per-bucket (grainMin, grainMax, rows) stats read back from
    * the STAGED files — the manifest entries must describe the files,
    * not what was asked. Shared by [[commitBuckets]] and
    * [[migrateFromMonolithic]]. */
  private def stageBucketFiles(spark: SparkSession, tablePath: String,
      data: DataFrame): (String, Map[Long, (Long, Long, Long)],
        Option[org.apache.spark.sql.types.StructType]) = {
    val dir = Paths.get(tablePath)
    Files.createDirectories(dir.resolve("part"))
    val stageRel = s"part/s${java.util.UUID.randomUUID().toString.take(12)}"
    // one shuffle of staged-sized data → one file per bucket (without
    // it every input task writes a sliver of every bucket)
    data.repartition(col(BucketCol))
      .write.partitionBy(BucketCol).parquet(s"$tablePath/$stageRel")
    // an EMPTY staged write (a fence-advancing empty micro-batch, or a
    // replace that emptied its buckets) leaves no bucket subdirs — and
    // a parquet read over zero files cannot infer a schema
    val stagedEmpty = !SnapshotStore
      .children(Paths.get(tablePath, stageRel))
      .exists(p => p.getFileName.toString.startsWith(s"$BucketCol="))
    // partition-value inference may type small bucket ids as INT —
    // normalize to long before the collect
    val (stats, schema) =
      if (stagedEmpty)
        (Map.empty[Long, (Long, Long, Long)],
          None: Option[org.apache.spark.sql.types.StructType])
      else {
        val back = spark.read.parquet(s"$tablePath/$stageRel")
        val st = back
          .groupBy(col(BucketCol).cast("long").as(BucketCol))
          .agg(min(col("grain")).as("gmin"), max(col("grain")).as("gmax"),
            count(lit(1)).as("rows"))
          .collect()
          .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
          .toMap
        // the manifest's schema line records the READ-BACK schema (what
        // a manifest-listed file scan yields — nullability included),
        // minus the discovery-typed bucket partition column
        (st, Some(org.apache.spark.sql.types.StructType(
          back.schema.fields.filterNot(_.name == BucketCol))))
      }
    (stageRel, stats, schema)
  }

  /** Last-resort schema for a manifest whose stage was EMPTY and whose
    * base carries none (zero-part first commit, empty-fact migration):
    * the INPUT plan's schema minus the bucket column. Weaker than the
    * staged read-back (no parquet round-trip to pin nullability) but it
    * keeps even an always-empty table TYPED for the miss-path /
    * empty-read LocalRelation builders (r17 review: such tables
    * previously had no schema anywhere and read as None forever). */
  private def inputSchemaOf(data: DataFrame)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      data.schema.fields.filterNot(_.name == BucketCol))

  /** The manifest body for `layout` + `parts` (sorted), under version
    * tag `m<v>` with the given fence suffix — ONE serializer for every
    * manifest writer so the grammar cannot drift. */
  private def manifestBody(newV: Long, fenceSuffix: String, layout: Layout,
      schema: Option[org.apache.spark.sql.types.StructType],
      compactedUpTo: Option[Long],
      parts: Seq[PartEntry]): String = {
    val sb = new StringBuilder
    sb.append(s"m$newV").append(fenceSuffix).append('\n')
    sb.append(s"layout ${layout.grainsPerBucket} ${layout.seriesBuckets}\n")
    schema.foreach(sc => sb.append("schema\t").append(sc.json).append('\n'))
    compactedUpTo.foreach(b => sb.append("compacted\t").append(b).append('\n'))
    parts.sortBy(e => (e.bucket, e.relPath)).foreach { e =>
      sb.append(s"${e.bucket}\t${e.relPath}\t${e.grainMin}\t${e.grainMax}\t${e.rows}\n")
    }
    sb.toString
  }

  def commitBuckets(spark: SparkSession, tablePath: String,
      newBucketData: DataFrame, dirtyBuckets: Set[Long], layout: Layout,
      fence: Option[Long], lineage: Option[String],
      expectedBase: Option[Long],
      compactedUpTo: Option[Long] = None): Long =
    commitCore(spark, tablePath, newBucketData, Some(dirtyBuckets), layout,
      fence, lineage, expectedBase, compactedUpTo)

  /** Full-table commit (r18): EVERY bucket is dirty by declaration —
    * the new manifest lists only this commit's staged files and keeps
    * none of the base's. Exists for whole-table rewrites (the full
    * compaction pass, `upToGrain = None`), whose caller previously had
    * to pre-compute the staged data's bucket set just to satisfy
    * [[commitBuckets]]'s dirty declaration — one persist of the entire
    * fact plus one distinct+collect job that the staged read-back then
    * recomputed anyway. CAS/fence/lineage semantics identical. */
  def commitBucketsReplaceAll(spark: SparkSession, tablePath: String,
      newBucketData: DataFrame, layout: Layout,
      fence: Option[Long], lineage: Option[String],
      expectedBase: Option[Long],
      compactedUpTo: Option[Long] = None): Long =
    commitCore(spark, tablePath, newBucketData, None, layout,
      fence, lineage, expectedBase, compactedUpTo)

  /** Shared stage+CAS+manifest core: `dirtyBuckets = None` means a
    * full-table replace (no stray check — every staged bucket is
    * in-contract; no kept parts). */
  private def commitCore(spark: SparkSession, tablePath: String,
      newBucketData: DataFrame, dirtyBuckets: Option[Set[Long]],
      layout: Layout, fence: Option[Long], lineage: Option[String],
      expectedBase: Option[Long],
      compactedUpTo: Option[Long]): Long = {
    require(lineage.forall(l => l.nonEmpty && !l.exists(_.isWhitespace)),
      s"lineage token must be non-empty and whitespace-free, got $lineage")
    val dir = Paths.get(tablePath)
    val (stageRel, stats, stagedSchema) =
      stageBucketFiles(spark, tablePath, newBucketData)
    // EVERY refusal below must clean up the freshly staged dir — it
    // was created by THIS call, never committed, and leaving it costs
    // a 24h orphan-grace of disk (review r16: the requires previously
    // bypassed the CAS/fence refusals' cleanup)
    def refuse(e: Exception): Nothing = {
      SnapshotStore.deleteRecursively(dir.resolve(stageRel))
      throw e
    }
    val stray = dirtyBuckets.fold(Set.empty[Long])(stats.keySet.diff)
    if (stray.nonEmpty) refuse(new IllegalArgumentException(
      s"commitBuckets: data landed in buckets $stray not declared dirty — " +
        "the manifest would double-list those buckets"))
    val newEntries = stats.toSeq.sortBy(_._1).map { case (b, (gmin, gmax, n)) =>
      PartEntry(b, s"$stageRel/$BucketCol=$b", gmin, gmax, n)
    }
    SnapshotStore.withPublishLock(tablePath) {
      val cur = current(tablePath)
      if (cur.map(_.version) != expectedBase)
        refuse(new SnapshotStore.StaleVersionException(
          s"CAS publish refused: table at $tablePath is at manifest " +
            s"${cur.map(_.version).getOrElse("<none>")} but the bucket data " +
            s"was computed from ${expectedBase.getOrElse("<none>")} — a " +
            "concurrent writer committed; re-read, recompute, retry"))
      for (c <- cur)
        if (c.layout != layout) refuse(new IllegalArgumentException(
          s"bucket layout is a table property: committed ${c.layout}, " +
            s"caller passed $layout — a drifting bucket function would " +
            "scatter grains across buckets and break collision detection"))
      val (carriedFence, carriedLineage) = SnapshotStore.admitFence(tablePath,
        cur.flatMap(_.fence), cur.flatMap(_.lineage), fence, lineage, refuse)
      val newV = nextManifestVersion(dir, cur)
      val keptParts = dirtyBuckets.fold(Seq.empty[PartEntry])(dirty =>
        cur.toSeq.flatMap(_.parts).filterNot(e => dirty.contains(e.bucket)))
      // manifest file durable FIRST (immutable once named), then the
      // pointer swap is the single atomic commit point. Schema: this
      // commit's staged read-back, else carried from the base (an
      // empty fence-advancing batch must not strip OR override it),
      // else the input plan's (a zero-part FIRST commit still records
      // one). Compaction boundary: monotone max of caller's and the
      // base's — carried forward by non-compaction commits (None).
      val carriedUpTo = (compactedUpTo.toSeq ++
        cur.flatMap(_.compactedUpTo).toSeq).maxOption
      Files.write(dir.resolve(s"manifest-m$newV"),
        manifestBody(newV,
          SnapshotStore.fenceSuffix(carriedFence, carriedLineage),
          layout, stagedSchema.orElse(cur.flatMap(_.schema))
            .orElse(Some(inputSchemaOf(newBucketData))),
          carriedUpTo, keptParts ++ newEntries)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8),
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      SnapshotStore.writeManifestAtomic(dir, s"m$newV", s"m$newV")
      newV
    }
  }

  /** One-time MONOLITHIC → partitioned layout migration commit (r17):
    * publishes `bucketData` (the committed monolithic snapshot with
    * [[BucketCol]] attached) as manifest m0 of a partitioned table,
    * carrying the monolithic manifest's fence and lineage tokens
    * BIT-FOR-BIT — a streaming sink's replay protection survives the
    * layout change. Pre-r16 tables routed to the legacy layout forever
    * and kept paying its measured O(|fact|) rewrite per merge commit
    * (SCALE-R16); after this one O(|fact|) migration every later merge
    * rides the flat per-batch line.
    *
    * CAS discipline: `expectedBase` is the monolithic version name
    * (`v<N>`) the caller READ when computing `bucketData`; a
    * concurrent monolithic commit refuses with the retryable
    * [[SnapshotStore.StaleVersionException]], and a concurrent
    * migration (the table already partitioned under the lock) refuses
    * as already-migrated. The pointer swap is the single atomic
    * switch: readers resolve `v<N>` or `m0`, never a mix. The legacy
    * `v<N>` directories stay on disk for in-flight readers; their
    * mtimes are stamped at the swap so [[gc]]'s grace clock starts at
    * MIGRATION time, after which gc collects them like any superseded
    * snapshot. Returns the committed manifest version (0 unless a
    * crashed earlier migration left manifest files to claim past).
    */
  def migrateFromMonolithic(spark: SparkSession, tablePath: String,
      bucketData: DataFrame, layout: Layout, expectedBase: String): Long = {
    val dir = Paths.get(tablePath)
    val (stageRel, stats, stagedSchema) =
      stageBucketFiles(spark, tablePath, bucketData)
    def refuse(e: Exception): Nothing = {
      SnapshotStore.deleteRecursively(dir.resolve(stageRel))
      throw e
    }
    val entries = stats.toSeq.sortBy(_._1).map { case (b, (gmin, gmax, n)) =>
      PartEntry(b, s"$stageRel/$BucketCol=$b", gmin, gmax, n)
    }
    SnapshotStore.withPublishLock(tablePath) {
      if (isPartitioned(tablePath)) refuse(new IllegalStateException(
        s"table at $tablePath is already on the partitioned layout — " +
          "a concurrent migration won; re-read through the facade"))
      val curV = SnapshotStore.currentVersion(tablePath)
      if (!curV.contains(expectedBase)) refuse(
        new SnapshotStore.StaleVersionException(
          s"migration refused: table at $tablePath is at " +
            s"${curV.getOrElse("<none>")} but the bucket data was staged " +
            s"from $expectedBase — a concurrent monolithic writer " +
            "committed; re-read, restage, retry"))
      // same-version fence/lineage read is race-free under the lock
      val fence = SnapshotStore.currentFence(tablePath)
      val lineage = SnapshotStore.currentLineage(tablePath)
      val newV = nextManifestVersion(dir, None)
      Files.write(dir.resolve(s"manifest-m$newV"),
        manifestBody(newV, SnapshotStore.fenceSuffix(fence, lineage),
          // an EMPTY-fact migration still records a schema line (from
          // the input plan) so the migrated table reads as typed-empty
          layout, stagedSchema.orElse(Some(inputSchemaOf(bucketData))),
          compactedUpTo = None, entries)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8),
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      SnapshotStore.writeManifestAtomic(dir, s"m$newV", s"m$newV")
      // start the legacy dirs' grace clock at the swap (their natural
      // mtimes predate the migration by the table's whole history)
      val now = java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis())
      SnapshotStore.children(dir)
        .filter(p => Files.isDirectory(p) &&
          SnapshotStore.VersionRe.matches(p.getFileName.toString))
        .foreach(p =>
          try Files.setLastModifiedTime(p, now)
          catch { case _: java.io.IOException => () })
      newV
    }
  }

  /** Durable version PINS (r17): the training-data-lineage contract
    * [[readAt]] needs to be real — "corpus version V is reproducible
    * until explicitly released", regardless of how many commits and
    * [[gc]] cycles pass. A pin is one `tag \t version` line in the
    * table's `_PINS` file (tmp-file + ATOMIC_MOVE replace, so pins are
    * crash-durable and readers never see a torn file); gc keeps a
    * pinned version's manifest AND every partition file it references
    * outside the `keep` window, forever, until [[unpin]] releases the
    * tag (the version then collects on the next cycle like any
    * superseded manifest). Tags are the operator-facing name ("run-42
    * trained here"); pinning an unknown or already-collected version
    * refuses loudly, as does re-pointing a live tag (unpin first —
    * silently moving a lineage pin is exactly the mistake this file
    * exists to prevent). */
  def pins(tablePath: String): Map[String, Long] = {
    val p = Paths.get(tablePath, PinsName)
    if (!Files.isRegularFile(p)) return Map.empty
    val lines = Files.readAllLines(p)
    (0 until lines.size).iterator.map(lines.get).filter(_.nonEmpty).map { ln =>
      val c = ln.split("\t")
      c(0) -> c(1).toLong
    }.toMap
  }

  /** Pin manifest `version` under `tag` (see [[pins]]). Idempotent for
    * the same (tag, version); a live tag naming a DIFFERENT version
    * refuses. */
  def pin(tablePath: String, version: Long, tag: String): Unit = {
    require(tag.nonEmpty && !tag.exists(_.isWhitespace),
      s"pin tag must be non-empty and whitespace-free, got '$tag'")
    SnapshotStore.withPublishLock(tablePath) {
      if (!Files.isRegularFile(Paths.get(tablePath, s"manifest-m$version")))
        throw new IllegalArgumentException(
          s"cannot pin m$version at $tablePath: no such manifest " +
            "(never committed, or already collected — pin before gc runs)")
      val cur = pins(tablePath)
      cur.get(tag) match {
        case Some(v) if v == version => ()
        case Some(v) => throw new IllegalArgumentException(
          s"pin tag '$tag' already names m$v at $tablePath — unpin it " +
            "first (a silently moved lineage pin is unreproducible)")
        case None => writePins(tablePath, cur + (tag -> version))
      }
    }
  }

  /** Release `tag`'s pin; the version collects on the next [[gc]]
    * unless still inside the keep window or pinned under another tag.
    * Returns whether the tag existed. */
  def unpin(tablePath: String, tag: String): Boolean =
    SnapshotStore.withPublishLock(tablePath) {
      val cur = pins(tablePath)
      if (cur.contains(tag)) { writePins(tablePath, cur - tag); true }
      else false
    }

  private def writePins(tablePath: String, m: Map[String, Long]): Unit = {
    val dir = Paths.get(tablePath)
    val body = m.toSeq.sortBy(_._1)
      .map { case (t, v) => s"$t\t$v" }.mkString("", "\n", "\n")
    val tmp = Files.createTempFile(dir, ".pins-", ".tmp")
    try {
      Files.writeString(tmp, body)
      Files.move(tmp, dir.resolve(PinsName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
  }

  /** The deliberate between-lineages fence reset
    * ([[SnapshotStore.clearFence]] semantics): commits a NEW manifest
    * with the same layout and the same partition files, minus the
    * fence and lineage tokens. A version bump (not an in-place edit)
    * — manifest files are immutable, and in-flight readers of the old
    * manifest stay isolated. */
  def clearFence(tablePath: String): Unit =
    SnapshotStore.withPublishLock(tablePath) {
      current(tablePath).filter(_.fence.isDefined).foreach { cur =>
        val dir = Paths.get(tablePath)
        val newV = nextManifestVersion(dir, Some(cur))
        Files.write(dir.resolve(s"manifest-m$newV"),
          manifestBody(newV, "", cur.layout, cur.schema, cur.compactedUpTo,
            cur.parts)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8),
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        SnapshotStore.writeManifestAtomic(dir, s"m$newV", s"m$newV")
      }
    }

  /** Remove superseded manifests and the partition files ONLY they
    * referenced, keeping the newest `keep` committed manifests for
    * in-flight readers. Files referenced by NO manifest at all (a
    * crashed stage, or a commit racing this gc) collect only past
    * `graceMs` of mtime-age — same discipline as the monolithic
    * store's _SUCCESS-less rule. Returns deleted paths (relative). */
  def gc(tablePath: String, keep: Int = 2,
      graceMs: Long = 24L * 3600L * 1000L): Seq[String] = {
    require(keep >= 1, s"gc must keep at least the current manifest, got $keep")
    if (!Files.isDirectory(Paths.get(tablePath))) return Seq.empty
    // under the publish lock (r17): serializes with [[pin]] — a pin
    // admitted between a lock-free gc's pin read and its deletes would
    // name a version this pass collects — and with publishers, so the
    // lenient manifest parse below is defense-in-depth, not the only
    // guard (r16 advisory). Deletes are bounded by O(buckets × keep).
    SnapshotStore.withPublishLock(tablePath) { gcLocked(tablePath, keep, graceMs) }
  }

  private def gcLocked(tablePath: String, keep: Int,
      graceMs: Long): Seq[String] = {
    val dir = Paths.get(tablePath)
    val cur = current(tablePath).getOrElse(return Seq.empty)
    val manifests = SnapshotStore.children(dir)
      .flatMap { p =>
        ManifestRe.findFirstMatchIn(
          p.getFileName.toString.stripPrefix("manifest-"))
          .map(m => (m.group(1).toLong, p))
      }.sortBy(_._1)
    // durable pins (r17) hold their versions outside the keep window;
    // [[pin]]/[[unpin]] write under the same publish lock this gc
    // holds, so the set read here is exactly the set this pass honors
    val pinned = pins(tablePath).values.toSet
    val keptVersions = manifests.map(_._1)
      .filter(_ <= cur.version).takeRight(keep).toSet ++
      pinned.intersect(manifests.map(_._1).toSet)
    val now = System.currentTimeMillis()
    // a listed path can still vanish before its mtime probe (the lock
    // serializes writers and gcs, not external cleanup like a temp-dir
    // reaper) — treat a missing path as freshly young (skip this pass;
    // whoever deleted it already handled it)
    def mtimeOf(p: Path): Long =
      try Files.getLastModifiedTime(p).toMillis
      catch { case _: java.io.IOException => now }
    // a manifest ABOVE the pointer is a publish between manifest write
    // and pointer swap — in-flight (keep) unless well past the grace
    val (keptM, doomedM) = manifests.partition { case (v, p) =>
      keptVersions.contains(v) ||
        (v > cur.version && now - mtimeOf(p) <= graceMs)
    }
    // lenient reads throughout gc: an in-flight publisher's manifest
    // can be half-written (see readManifestLenient) — unreadable kept
    // manifests contribute no references (their files ride the orphan
    // grace), unreadable doomed ones delete with their refs aging out
    val referenced = keptM.flatMap { case (v, p) =>
      readManifestLenient(p, v).toSeq.flatMap(_.parts.map(_.relPath))
    }.toSet
    val doomedRefs = doomedM.flatMap { case (v, p) =>
      readManifestLenient(p, v).toSeq.flatMap(_.parts.map(_.relPath))
    }.toSet
    val deleted = Seq.newBuilder[String]
    // partition dirs: part/s<uuid>/__bucket=<b>
    val touchedStageDirs = Set.newBuilder[Path]
    for (stageDir <- SnapshotStore.children(dir.resolve("part"));
         sub <- SnapshotStore.children(stageDir)) {
      val rel = s"part/${stageDir.getFileName}/${sub.getFileName}"
      val refKept = referenced.contains(rel)
      val refDoomedOnly = !refKept && doomedRefs.contains(rel)
      val orphanAged = !refKept && !refDoomedOnly &&
        now - mtimeOf(sub) > graceMs
      if (refDoomedOnly || orphanAged) {
        SnapshotStore.deleteRecursively(sub)
        touchedStageDirs += stageDir
        deleted += rel
      }
    }
    // empty stage dirs (+ their _SUCCESS/metadata stragglers) collect
    // once every bucket subdir is gone — immediately when THIS pass
    // emptied them (deleting entries refreshes the parent's mtime, so
    // an age test there would never fire), by age otherwise (a fully
    // empty but YOUNG dir may be a stager's racing mkdir)
    val touched = touchedStageDirs.result()
    for (stageDir <- SnapshotStore.children(dir.resolve("part"))) {
      val emptiedNow = touched.contains(stageDir)
      val noSubdirs = !SnapshotStore.children(stageDir)
        .exists(p => Files.isDirectory(p))
      if (noSubdirs && (emptiedNow ||
          now - mtimeOf(stageDir) > graceMs)) {
        SnapshotStore.deleteRecursively(stageDir)
        deleted += s"part/${stageDir.getFileName}"
      }
    }
    doomedM.foreach { case (_, p) =>
      Files.deleteIfExists(p)
      deleted += p.getFileName.toString
    }
    // legacy monolithic snapshot dirs on a MIGRATED table (r17): no
    // manifest references them (manifests name only part/ files), but
    // in-flight pre-migration readers may still be scanning — keep for
    // the grace window, whose clock [[migrateFromMonolithic]] started
    // at the pointer swap by stamping their mtimes
    for (p <- SnapshotStore.children(dir)
         if Files.isDirectory(p) && SnapshotStore.VersionRe.matches(p.getFileName.toString)
         if now - mtimeOf(p) > graceMs) {
      SnapshotStore.deleteRecursively(p)
      deleted += p.getFileName.toString
    }
    deleted.result()
  }
}
