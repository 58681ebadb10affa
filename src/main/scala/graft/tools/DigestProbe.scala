package graft.tools

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** One-off decomposition probe for q115's cost (dev tool, not driver
  * surface): times the raw t-digest UDAF aggregation alone, then
  * TDigest.grouped, then the full q115, at a given sfDir — isolates
  * whether the UDAF update path or the surrounding relational shape
  * dominates.
  *
  *   tools/runmain.sh graft.tools.DigestProbe /tmp/scale10
  */
object DigestProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.io.Sources.table(spark, dir, "events")
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[digestprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val ps = Seq(0.5, 0.9, 0.99)
    // driver-side tight fold: isolates the reduce/compress kernel from
    // Spark's udaf() wrapper
    val rnd = new scala.util.Random(7)
    val values = Array.fill(1000000)(rnd.nextGaussian())
    val aggLocal = new graft.metrics.TDigest.QuantilesAgg(ps, 100.0)
    for (pass <- 1 to 2)
      time(s"driver-side fold of 1M values pass $pass") {
        var buf = aggLocal.zero
        var i = 0
        while (i < values.length) { buf = aggLocal.reduce(buf, values(i)); i += 1 }
        aggLocal.finish(buf)
      }
    // raw UDAF agg only (one pass, no distinct/join/verdict)
    val digest = udaf(new graft.metrics.TDigest.QuantilesAgg(ps, 100.0),
      Encoders.scalaDouble)
    for (pass <- 1 to 2)
      time(s"raw UDAF agg pass $pass")(
        ev.filter(col("value").isNotNull).groupBy(col("event_type"))
          .agg(digest(col("value")).as("qs"))
          .write.mode("overwrite").format("noop").save())
    // same row set as the UDAF timing (null-filtered) — the comparison
    // isolates aggregate cost, not scan cardinality
    time("built-in approx_percentile")(
      ev.filter(col("value").isNotNull).groupBy(col("event_type"))
        .agg(approx_percentile(col("value"), lit(0.5), lit(10000)))
        .write.mode("overwrite").format("noop").save())
    time("percentile_approx SQL (sketch only)")(
      ev.filter(col("value").isNotNull).groupBy(col("event_type"))
        .agg(expr("approx_percentile(value, array(0.5,0.9,0.99), 10000)"))
        .write.mode("overwrite").format("noop").save())
    time("TDigest.grouped")(
      graft.metrics.TDigest.grouped(ev, Seq("event_type"), "value", ps, 100.0)
        .write.mode("overwrite").format("noop").save())
    time("full q115")(
      graft.SparkEntry.queries("q115_tdigest_mergeable")(spark, dir)
        .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
