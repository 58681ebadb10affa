package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe (not part of the driver contract): replicate the sf0.1
  * events table 10× and 100× with disjoint user/event ids (1M and 10M
  * rows, 1.5k and 15k series) and time representative kernel queries at
  * each scale. Linear-ish growth = the partition strategy holds as the
  * series dimension grows, which is the 100 TB scaling axis.
  *
  *   sbt "Test/runMain graft.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.io.Sources.table(spark, "/root/testdata/sf0.1", "events")

    def replicate(factor: Int, outDir: String): Unit = {
      val reps = spark.range(factor).withColumnRenamed("id", "rep")
      base.crossJoin(reps)
        .select(
          (col("event_id") + col("rep") * 100000000L).as("event_id"),
          col("ts"),
          (col("user_id") + col("rep") * 10000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }
    replicate(10, "/tmp/scale10")
    replicate(100, "/tmp/scale100")

    // BASELINE anchor: the reference preprocesses 25,200-row series at
    // ws=144 (`sliding_windows.py` hot loop; BASELINE.md data scales).
    // The driver testdata never has series that long (scale adds USERS,
    // max 99 rows/user even at sf0.1), so build 4 reference-shaped
    // series from the same rows: q48's adaptive ws then picks 144 and
    // the timing is apples-to-apples with the reference's per-split
    // preprocessing scale.
    base.select(
        col("event_id"),
        timestamp_micros(lit(1577836800000000L) +
          (col("event_id") / 4).cast("long") * 3600000000L).as("ts"),
        (col("event_id") % 4).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet("/tmp/scalelong/events.parquet")

    val queries = Seq("q10_log_return", "q12_multi_horizon", "q14_rolling_stats",
      "q18_naive_mae", "q22_rolling_count_5d", "q48_preprocess_slice", "q44_stl_decompose",
      "q58_sessionize", "q62_deep_flatten")
    // warm code paths
    queries.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      .write.mode("overwrite").format("noop").save())
    // Text/dedup kernels on replicated documents (5k → 50k → 500k docs;
    // replica docs get disjoint ids but IDENTICAL text, so dup groups
    // grow with the factor — the adversarial case for candidate
    // generation: a naive all-pairs LSH would blow up quadratically).
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def replicateDocs(factor: Int, outDir: String): Unit = {
      val reps = spark.range(factor).withColumnRenamed("id", "rep")
      docs.crossJoin(reps)
        .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    }
    replicateDocs(10, "/tmp/docs10")
    replicateDocs(100, "/tmp/docs100")
    val docQueries = Seq("q32_exact_dup", "q33_minhash_sig", "q34_minhash_pairs",
      "q50_near_dedup", "q67_corpus_curation")
    docQueries.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      .write.mode("overwrite").format("noop").save())
    graft.dedup.Dedup.clearCaches() // drain warm-up handles before timing
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/docs10", "/tmp/docs100")) {
      val times = docQueries.map { q =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
        val elapsed = (System.nanoTime() - t0) / 1e9
        // cache teardown is NOT part of the kernel time being reported
        graft.dedup.Dedup.clearCaches()
        f"$q=$elapsed%.2f"
      }
      println(s"SCALE-DOCS $dir: ${times.mkString(" ")}")
    }

    // q48 at ws=144 on 4 × 25,000-row series (the reference's shape)
    val tLong0 = System.nanoTime()
    SparkEntry.queries("q48_preprocess_slice")(spark, "/tmp/scalelong")
      .write.mode("overwrite").format("noop").save()
    println(f"SCALE-LONG q48 ws=144 on 4x25k-row series: ${(System.nanoTime() - tLong0) / 1e9}%.2f s")

    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/scale10", "/tmp/scale100")) {
      val times = queries.map { q =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
        f"$q=${(System.nanoTime() - t0) / 1e9}%.2f"
      }
      println(s"SCALE $dir: ${times.mkString(" ")}")
    }
    spark.stop()
  }
}
