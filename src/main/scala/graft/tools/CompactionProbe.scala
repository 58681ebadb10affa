package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness (r18): decompose q123's cold-path cost — hour-grain
  * ingest, fine rollup, table clone, full compaction, verdict query —
  * so the optimization targets the step that actually costs, not the
  * one the round brief suspected. Usage: runMain graft.tools.CompactionProbe [sfDir]
  */
object CompactionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // job-level breakdown: print every job's wall-clock + description
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStarts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("?")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobStarts.getOrDefault(je.jobId, (0L, "?"))
        println(f"[job] ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
      }
    })
    import org.apache.spark.sql.functions._
    def timed[A](label: String)(body: => A): A = {
      spark.sparkContext.setJobDescription(s"probe: $label")
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val DayUs = 86400000000L
    val HourUs = DayUs / 24L
    // JIT/codegen warm pass on the tiny SF (same discipline as Bench)
    timed("warmup sf0.001 lifecycle") {
      val base = java.nio.file.Files.createTempDirectory("probe-w").toString + "/fact"
      graft.olap.OlapEtl.loadFactSketches(spark,
        graft.io.Sources.table(spark, "/root/testdata/sf0.001", "events"),
        "event_type", "ts", "value", "user_id", HourUs, base, 100.0, 12)
      graft.olap.OlapEtl.compactFactSketches(spark, base, HourUs, DayUs, 100.0, 12)
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(base).getParentFile)
    }
    val events = timed("read events df")(graft.io.Sources.table(spark, sfDir, "events"))
    val basePath = java.nio.file.Files
      .createTempDirectory("probe-hour-base").toString + "/fact"
    timed("hour-grain ingest") {
      graft.olap.OlapEtl.loadFactSketches(spark, events,
        "event_type", "ts", "value", "user_id", HourUs, basePath, 100.0, 12)
    }
    timed("fine rollup collect") {
      import org.apache.spark.sql.Encoders
      val hll = udaf(new graft.metrics.Hll.MergeSketchesAgg(12),
        Encoders.product[graft.metrics.Hll.Sketch])
      graft.olap.SnapshotStore.read(spark, basePath).get
        .filter(col("grain").between(19733L * 24L, 19742L * 24L + 23L))
        .groupBy(col("series_key")).agg(hll(col("id_sketch.regs")).as("est"))
        .collect()
    }
    val clonePath = java.nio.file.Files
      .createTempDirectory("probe-clone").toString + "/fact"
    timed("hardlink cloneTable") {
      graft.olap.SnapshotStore.cloneTable(basePath, clonePath)
    }
    val copyPath = java.nio.file.Files
      .createTempDirectory("probe-copy").toString + "/fact"
    timed("FileUtils.copyDirectory") {
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(basePath), new java.io.File(copyPath))
    }
    timed("full compaction (clone)") {
      graft.olap.OlapEtl.compactFactSketches(spark, clonePath,
        HourUs, DayUs, 100.0, 12)
    }
    timed("scoped compaction (copy)") {
      graft.olap.OlapEtl.compactFactSketches(spark, copyPath,
        HourUs, DayUs, 100.0, 12, Some(19738L * 24L))
    }
    timed("verdict query (q123 face)") {
      graft.SparkEntry.queries("q123_sketch_compaction")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    timed("verdict query re-run") {
      graft.SparkEntry.queries("q123_sketch_compaction")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    Seq(basePath, clonePath, copyPath).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(p).getParentFile))
    graft.SparkEntry.clearTradesCache()
    spark.stop()
  }
}
