package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR: the bench re-registers functions and re-caches relations per
    // query by design — the resulting WARNs are noise in the one-line
    // JSON protocol's stderr tail.
    spark.sparkContext.setLogLevel("ERROR")
    // Warm JVM/codegen/parquet-footer paths on the tiny SF so the timed
    // numbers reflect steady-state execution, not first-query startup.
    // noop sink: count() would let Catalyst prune the computed columns,
    // timing only the scan — the noop write materializes every output row.
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Unit =
      fn(spark, dir).write.mode("overwrite").format("noop").save()
    // warm every query shape (codegen + JIT) on the tiny SF
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn, "/root/testdata/sf0.001") catch { case _: Throwable => () }
    }
    // a set: a query failing in BOTH passes must not be double-counted
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def timedPass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try run(fn, sfDir) catch {
          case e: Throwable =>
            // a crashing query must not masquerade as a fast one
            failed += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    // Pass 1 = first-touch at the target SF (same protocol as round 1's
    // headline `value`); pass 2 = steady-state after the target-SF data
    // and every full-scale codegen path are hot.
    val cold = timedPass()
    val warmed = timedPass()
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} queries failed: ${failed.mkString(",")}")
    // Compact, strictly-valid JSON: round to millis (the driver's log tail
    // truncated r2's long full-precision line → parsed:null) and put the
    // cold/warm totals FIRST so they survive any tail truncation.
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def js(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val total = cold.map(_._2).sum
    val totalWarm = warmed.map(_._2).sum
    println(s"""{"metric":"total","value":${r3(total)},"value_warmed":${r3(totalWarm)},""" +
      s""""unit":"sec","sf":"$sfDir","n_queries":${cold.size},""" +
      s""""queries":${js(cold)},"queries_warmed":${js(warmed)}}""")
    spark.stop()
  }
}
