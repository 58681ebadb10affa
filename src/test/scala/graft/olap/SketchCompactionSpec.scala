package graft.olap

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.metrics.{Hll, TDigest}

/** `OlapEtl.compactFactSketches` (r16): day rows re-grain into
  * week/month rows by pure sketch algebra. Contracts pinned here —
  * compacted ≡ direct coarse ingest (HLL bit-equal by losslessness,
  * n_rows exact, digest within the q115 rank bound at the rollup
  * level), identity re-compaction is bit-stable (greedy t-digest
  * recompression of an already-compressed digest is a no-op), the
  * compacted fact still answers grain-range questions with the
  * pruning pushed to the scan, and the commit carries a live
  * streaming fence forward instead of erasing it.
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
        assert(a.keySet == b.keySet && a.nonEmpty,
          s"grain sets diverged: ${a.keySet.size} vs ${b.keySet.size}")
        a.foreach { case (kg, (n, regs, _, w)) =>
          assert(b(kg)._1 == n, s"grain $kg n_rows diverged")
          // lossless register-max + canonical encoding: BIT-equal
          assert(b(kg)._2 == regs, s"grain $kg HLL bytes diverged")
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
      val fact = SnapshotStore.read(spark, path).get
        .filter(col("grain").between(2L, 5L))
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
        plan.contains("GreaterThanOrEqual(grain,2)") &&
        plan.contains("LessThanOrEqual(grain,5)"),
        s"grain BETWEEN not pushed into the compacted-fact scan:\n$plan")
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
