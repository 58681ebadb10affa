package graft.metrics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** q115's driver contract, pinned: the mergeable t-digest's VERDICT
  * columns (group, p, n, err_bound_ranks, within_bound) must be
  * invariant to the merge tree. Shuffle partitioning / input
  * partitioning change which partials exist and the order
  * `QuantilesAgg.merge` combines them — the digest's VALUES legitimately
  * move — but the rank-contract verdict may never flip, or the driver
  * row would be partition-count-dependent (the r12 q61 lesson: the
  * driver runs Spark-default 200 shuffle partitions, the tuned session
  * runs 32, and both must hash to the oracle's all-TRUE rows).
  */
class MergeInvarianceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def withShufflePartitions[A](n: String)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("q115 verdict rows are identical from 1 to 200 shuffle partitions") {
    val runs = Seq("1", "7", "200").map { sp =>
      sp -> withShufflePartitions(sp) {
        SparkEntry.queries("q115_tdigest_mergeable")(spark, sfDir)
          .collect()
          .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
            r.getDouble(3), r.getBoolean(4)))
          .sortBy(t => (t._1, t._2))
          .toSeq
      }
    }
    runs.foreach { case (sp, rows) =>
      assert(rows.nonEmpty, s"sp=$sp produced no verdict rows")
      assert(rows.forall(_._5), s"sp=$sp bound violation: ${rows.filterNot(_._5)}")
    }
    val (_, ref) = runs.head
    runs.tail.foreach { case (sp, rows) =>
      assert(rows == ref, s"verdict rows differ at sp=$sp vs sp=${runs.head._1}")
    }
  }

  test("q117 rollup verdict holds and is identical across grain widths (hour/day/week)") {
    // a two-level rollup is just another merge tree: the verdict
    // columns may not depend on the grain the digests were stored at
    val runs = Seq(3600000000L, 86400000000L, 7L * 86400000000L).map { grain =>
      grain -> SparkEntry.q117Verdict(spark, sfDir, grain).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
          r.getDouble(3), r.getBoolean(4)))
        .sortBy(t => (t._1, t._2)).toSeq
    }
    runs.foreach { case (g, rows) =>
      assert(rows.nonEmpty, s"grain=$g empty")
      assert(rows.forall(_._5), s"grain=$g bound violation: ${rows.filterNot(_._5)}")
    }
    val ref = runs.head._2
    runs.tail.foreach { case (g, rows) =>
      assert(rows == ref, s"verdict rows differ at grain=$g")
    }
    assert(SparkEntry.q117Rollup(spark, sfDir, 3600000000L).columns.toSeq ==
      Seq("event_type", "p50", "p90", "p99"))
  }

  test("q118 HLL: the ESTIMATE (not just the verdict) is identical from 1 to 200 shuffle partitions") {
    // HLL merging is lossless (register-wise max) — unlike the
    // t-digest, partitioning may not move even the estimate
    val runs = Seq("1", "7", "200").map { sp =>
      sp -> withShufflePartitions(sp) {
        SparkEntry.q118Verdict(spark, sfDir)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getBoolean(4)))
          .sortBy(_._1).toSeq
      }
    }
    runs.foreach { case (sp, rows) =>
      assert(rows.nonEmpty, s"sp=$sp produced no rows")
      assert(rows.forall(_._5), s"sp=$sp bound violation: ${rows.filterNot(_._5)}")
    }
    val ref = runs.head._2
    runs.tail.foreach { case (sp, rows) =>
      assert(rows == ref, s"HLL rows differ at sp=$sp (merge must be lossless)")
    }
  }

  test("q119 hand-rolled HLL: rollup estimate identical across partitionings AND grain widths") {
    // two invariances at once, both consequences of lossless register
    // max: (a) shuffle partitioning moves the merge tree — estimates
    // may not move; (b) the stored-grain width changes WHICH sketches
    // exist — the rolled-up registers are the same set's registers
    // regardless, so est_rollup, est_direct, and every verdict column
    // must be bit-identical across hour/day/30-day grains too
    val day = 86400000000L
    val runs =
      Seq(("sp1", "1", day), ("sp200", "200", day),
          ("hour", "4", 3600000000L), ("month", "4", 30L * day)).map {
        case (label, sp, grain) =>
          label -> withShufflePartitions(sp) {
            SparkEntry.q119Verdict(spark, sfDir, grain)
              .drop("n_grains") // the one legitimately grain-dependent column
              .collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                r.getLong(3), r.getDouble(4), r.getBoolean(5), r.getBoolean(6)))
              .sortBy(_._1).toSeq
          }
      }
    runs.foreach { case (label, rows) =>
      assert(rows.nonEmpty, s"$label produced no rows")
      assert(rows.forall(_._6), s"$label bound violation: ${rows.filterNot(_._6)}")
      assert(rows.forall(_._7), s"$label rollup != direct: ${rows.filterNot(_._7)}")
    }
    val ref = runs.head._2
    runs.tail.foreach { case (label, rows) =>
      assert(rows == ref, s"q119 rows differ at $label (merge must be lossless)")
    }
  }

  test("sparse×dense×mixed stored sketches (r16): rollup invariant across encodings + parquet round-trip") {
    // the r16 sparse encoding must be INVISIBLE to every merge
    // invariance: build per-grain sketches at a grain fine enough that
    // most store SPARSE and coarse enough that some go DENSE, persist
    // through parquet (both encodings in one binary column), and roll
    // up MIXED — the estimate must equal the all-dense direct
    // aggregate exactly, under 1 and 200 shuffle partitions
    import org.apache.spark.sql.Encoders
    import graft.metrics.Hll
    val P = 12
    val events = graft.io.Sources.table(spark, sfDir, "events")
      .filter(col("user_id").isNotNull)
    val mk = udaf(new Hll.SketchAgg(P), Encoders.scalaLong)
    val hourUs = 3600000000L
    val perGrain = events.select(col("event_type"),
        (unix_micros(col("ts")) / hourUs).cast("long").as("grain"),
        col("user_id"))
      .groupBy(col("event_type"), col("grain"))
      .agg(mk(col("user_id")).as("sk"))
    val dir = java.nio.file.Files.createTempDirectory("mi-sparse")
    try {
      perGrain.write.mode("overwrite").parquet(dir.toString)
      val stored = spark.read.parquet(dir.toString)
      val lens = stored.select(length(col("sk.regs"))).distinct()
        .collect().map(_.getInt(0)).toSet
      assert(lens.exists(_ < (1 << P)),
        s"expected some SPARSE stored sketches at hour grains, lengths=$lens")
      val roll = udaf(new Hll.MergeSketchesAgg(P), Encoders.product[Hll.Sketch])
      val direct = udaf(new Hll.DistinctAgg(P), Encoders.scalaLong)
      val want = events.groupBy(col("event_type"))
        .agg(direct(col("user_id")).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      Seq("1", "200").foreach { sp =>
        val got = withShufflePartitions(sp) {
          stored.groupBy(col("event_type"))
            .agg(roll(col("sk.regs")).as("est"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        }
        assert(got == want,
          s"sp=$sp: mixed-encoding rollup != all-dense direct aggregate")
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("q120 set algebra: estimates and verdicts identical from 1 to 200 shuffle partitions") {
    val runs = Seq("1", "200").map { sp =>
      sp -> withShufflePartitions(sp) {
        SparkEntry.queries("q120_hll_setops")(spark, sfDir)
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getDouble(5), r.getDouble(6),
            r.getBoolean(7), r.getBoolean(8)))
          .sortBy(_._1).toSeq
      }
    }
    runs.foreach { case (sp, rows) =>
      assert(rows.nonEmpty, s"sp=$sp produced no rows")
      assert(rows.forall(r => r._8 && r._9),
        s"sp=$sp verdict violation: ${rows.filterNot(r => r._8 && r._9)}")
    }
    assert(runs.head._2 == runs.last._2, "q120 rows differ across partitionings")
  }

  test("kernel: digests merged from stored per-chunk sketches stay within the bound") {
    val rnd = new scala.util.Random(29)
    val values = Array.fill(30000)(math.exp(rnd.nextGaussian() * 1.2))
    val ps = Seq(0.5, 0.9, 0.99, 0.999)
    val compression = 100.0
    val mk = new TDigest.DigestAgg(compression)
    val roll = new TDigest.MergeDigestsAgg(ps, compression)
    for (chunkSize <- Seq(100, 1000, 30000)) {
      // level 1: one stored digest per chunk; level 2: merge them all
      val digests = values.grouped(chunkSize).map { c =>
        mk.finish(c.foldLeft(mk.zero)(mk.reduce))
      }.toSeq
      val qs = roll.finish(digests.foldLeft(roll.zero)(roll.reduce))
      val sorted = values.sorted
      val n = values.length
      ps.zip(qs).foreach { case (p, v) =>
        val rle = sorted.count(_ <= v).toLong
        val rlt = sorted.count(_ < v).toLong
        val target = p * n
        val err =
          if (target < rlt + 1) (rlt + 1) - target
          else if (target > rle) target - rle
          else 0.0
        val bound = 8.0 * n * p * (1.0 - p) / compression + 2.0
        assert(err <= bound,
          s"chunkSize=$chunkSize p=$p err=$err > bound=$bound (est=$v)")
      }
    }
  }

  test("kernel: rank error stays within 8·n·p(1−p)/δ + 2 across input partitionings") {
    // TDigestSpec's skewed shape (log-normal two-group), tail p = 0.999
    // included: tail capacity 4·n·q(1−q)/δ < 1 means near-singleton
    // centroids there, so the tight absolute bound is genuinely testable
    val rnd = new scala.util.Random(13)
    val a = (0 until 20000).map(_ => ("a", math.exp(rnd.nextGaussian() * 1.5)))
    val b = (0 until 20000).map(_ => ("b", 100.0 * math.exp(rnd.nextGaussian() * 0.8)))
    val skewed = (a ++ b).toDF("g", "v")
    val ps = Seq(0.5, 0.9, 0.99, 0.999)
    val compression = 100.0
    val exact = Map(
      "a" -> a.map(_._2).sorted.toArray,
      "b" -> b.map(_._2).sorted.toArray)
    for (reps <- Seq(1, 4, 32)) {
      val est = TDigest.grouped(skewed.repartition(reps), Seq("g"), "v", ps, compression)
        .collect().map(r => r.getString(0) ->
          ps.indices.map(i => r.getDouble(i + 1))).toMap
      for (g <- Seq("a", "b"); (p, i) <- ps.zipWithIndex) {
        val values = exact(g)
        val n = values.length
        val v = est(g)(i)
        val rle = values.count(_ <= v).toLong
        val rlt = values.count(_ < v).toLong
        val target = p * n
        val err =
          if (target < rlt + 1) (rlt + 1) - target
          else if (target > rle) target - rle
          else 0.0
        val bound = 8.0 * n * p * (1.0 - p) / compression + 2.0
        assert(err <= bound,
          s"reps=$reps g=$g p=$p err=$err > bound=$bound (est=$v)")
      }
    }
  }
}
