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

    val queries = Seq("q10_log_return", "q12_multi_horizon", "q14_rolling_stats",
      "q18_naive_mae", "q22_rolling_count_5d", "q48_preprocess_slice", "q44_stl_decompose",
      "q58_sessionize", "q62_deep_flatten")
    // warm code paths
    queries.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      .write.mode("overwrite").format("noop").save())
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
