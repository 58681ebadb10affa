package graft.scale

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin result set equals the plain join on a skewed key") {
    // 90% of rows share key 1 (skew), dim has 3 keys
    val large = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (2L + i % 2, i)))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "v", "name")
    val salted = Scale.saltedJoin(large, small, "k", 8).select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("suggestShufflePartitions scales with bytes, clamps to cores") {
    assert(Scale.suggestShufflePartitions(0L, 32) == 32)              // floor at cores
    assert(Scale.suggestShufflePartitions(64L << 30, 32) == 512)      // 64 GiB / 128 MiB
    assert(Scale.suggestShufflePartitions(1L << 50, 32) == 32 * 128)  // ceiling
  }

  test("writePartitionedByDate: time-range scans prune partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graftpart").toString + "/events"
    val ev = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "events")
    Scale.writePartitionedByDate(ev, "ts", dir)
    val back = spark.read.parquet(dir)
      .filter($"p_date" === "2024-01-05")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p_date"))
    // pruned count matches a direct date filter on the source
    val expected = ev.filter(org.apache.spark.sql.functions.to_date($"ts") === "2024-01-05").count()
    assert(back.count() == expected && expected > 0)
  }

  test("writeBucketed produces a joinable bucketed table") {
    spark.sql("DROP TABLE IF EXISTS bt_test")
    val df = (1 to 100).map(i => (i.toLong % 10, i)).toDF("k", "v")
    Scale.writeBucketed(df, "bt_test", "k", 4)
    val back = spark.table("bt_test")
    assert(back.count() == 100)
    assert(spark.sql("DESCRIBE EXTENDED bt_test").collect()
      .exists(r => r.getString(0).contains("Num Buckets")))
  }

  test("planShards/writeShards: file count tracks the byte target") {
    val df = (1 to 10000).map(i => (i.toLong, s"payload_$i" * 8)).toDF("id", "s")
    // explicit knownBytes: deterministic plan independent of stats config
    assert(Scale.planShards(df, targetBytes = 1L << 20, knownBytes = 5L << 20) == 5)
    assert(Scale.planShards(df, targetBytes = 1L << 20, knownBytes = (5L << 20) + 1) == 6)
    assert(Scale.planShards(df, targetBytes = 1L << 20, knownBytes = 10) == 1)
    // Catalyst's unknown-size estimates approach Long.MaxValue; the
    // quotient must clamp (to maxShards), never wrap through Int
    val clamped = Scale.planShards(df, targetBytes = 512L << 20,
      knownBytes = Long.MaxValue)
    assert(clamped == Scale.maxShards.toInt, s"expected clamp, got $clamped")
    assert(clamped > 0)
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val n = Scale.writeShards(df, dir, targetBytes = 64L << 10, knownBytes = 256L << 10)
    assert(n == 4)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, s"expected 4 shard files, got ${files.length}")
    // round-robin repartition: shard sizes within 2x of each other
    val sizes = files.map(_.length()).sorted
    assert(sizes.last < sizes.head * 2, s"uneven shards: ${sizes.toSeq}")
    assert(spark.read.parquet(dir).count() == 10000)
  }
}
