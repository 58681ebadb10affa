package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time a single SparkEntry query. Usage:
  *   runMain graft.TimeQuery <queryName> [sfDir] [passes]
  * Same session config as Bench; noop sink so every output row is
  * materialized (count() would let Catalyst prune computed columns).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    // SPARK_GRAFT_EXPLAIN=1: dump the formatted physical plan (the
    // plan-audit loop: broadcasts broadcast, filters pushed, aggs
    // partial, no single-partition windows) and exit without timing
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
      fn(spark, sfDir).explain("formatted")
      spark.stop()
      return
    }
    // same protocol as Bench: warm codegen/JIT on the tiny SF so pass 1
    // at the target SF measures first-touch of the data, not the JVM
    fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
    (1 to passes).foreach { i =>
      val cal = Bench.calibrate()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[timequery] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s (cal=$cal%.3f)")
    }
    graft.dedup.Dedup.clearCaches()
    graft.text.TextAnalysis.clearCaches()
    graft.similarity.Similarity.clearCaches()
    SparkEntry.clearTradesCache()
    spark.stop()
  }
}
