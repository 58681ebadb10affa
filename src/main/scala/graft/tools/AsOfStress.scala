package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (r18, VERDICT r17 #2): reproduce the driver's q57
  * failure mode — a late-session, cache-heavy block manager — and time
  * q57 inside it. The r17 operator localCheckpoint'ed BOTH join inputs
  * into storage on every invocation; under storage pressure those
  * writes pay eviction churn. The r18 barrier persists nothing, so q57
  * should be storage-pressure-immune. Usage:
  *   runMain graft.tools.AsOfStress [sfDir] [pressureMB]
  */
object AsOfStress {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val pressureMb = if (args.length > 1) args(1).toInt else 3000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def runQ57(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q57_asof_native")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[stress] q57 clean session: ${runQ57()}%.3f s, ${runQ57()}%.3f s")
    // fill storage memory with persisted junk the ContextCleaner cannot
    // reclaim (we hold the references) — the "cache-heavy session"
    // incompressible pad (the columnar cache run-length-compresses
    // constant strings to nothing): ~4 KB of hex per row
    val nRows = pressureMb.toLong * 1024L * 1024L / 4096L
    val junk = (0 until 4).map { i =>
      val df = spark.range(nRows / 4)
        .select(col("id"), expr(
          "concat(" + (0 until 64).map(j =>
            s"sha2(cast(id + $j * 1000003 + ${i * 77} as string), 256)")
            .mkString(",") + ")").as("pad"))
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }
    val st = spark.sparkContext.getExecutorMemoryStatus.values
      .map { case (mx, rem) => mx - rem }.sum / (1024.0 * 1024.0)
    println(f"[stress] storage occupied: $st%.0f MB")
    println(f"[stress] q57 under pressure: ${runQ57()}%.3f s, ${runQ57()}%.3f s, ${runQ57()}%.3f s")
    junk.foreach(_.unpersist(blocking = true))
    spark.stop()
  }
}
