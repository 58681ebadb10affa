package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: dump `explain("formatted")` for every SparkEntry query
  * (or a comma-separated subset) into one file per query — the
  * plan-audit artifact the optimization rounds commit under plans/.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> [sfDir] [q1,q2,...]
  * writes <outDir>/<name>_<tag>.txt. Same session config as Bench so the
  * captured plans are the benched plans (AQE initial plan; the noop-run
  * final plan may differ only by AQE coalescing).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").toSet) else None
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // r18: A/B alternates (SparkEntry.abAlternates) dump too when named
    // explicitly — the before/after plan evidence for shape decisions
    (graft.SparkEntry.queries.toSeq ++
        graft.SparkEntry.abAlternates.toSeq.filter(a =>
          only.exists(_.contains(a._1))))
      .sortBy(_._1)
      .filter(q => only.forall(_.exists(sel =>
        q._1 == sel || q._1.startsWith(sel + "_"))))
      .foreach { case (name, fn) =>
        // tag suffix "-final": EXECUTE the query and dump the AQE final
        // plan (stage reuse, AQEShuffleRead, runtime join rewrites are
        // only visible there), plus a scan-count summary line.
        val plan =
          try {
            val df = fn(spark, sfDir)
            if (tag.endsWith("-final")) {
              df.collect()
              val fin = df.queryExecution.executedPlan.toString
                .split("== Initial Plan ==")(0)
              val scans = "FileScan".r.findAllIn(fin).size
              s"// final-plan FileScan count: $scans\n$fin"
            } else df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          } catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
        java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), plan)
        println(s"[plandump] $name -> ${name}_$tag.txt (${plan.linesIterator.next()})")
      }
    graft.dedup.Dedup.clearCaches()
    graft.text.TextAnalysis.clearCaches()
    graft.similarity.Similarity.clearCaches()
    graft.SparkEntry.clearTradesCache()
    spark.stop()
  }
}
