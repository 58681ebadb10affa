package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan inspector: `Test/runMain graft.PlanProbe <query> <sfDir>
  * [aqe]` prints the executed physical plan (post-execution when `aqe`
  * is passed, so AQE's final adaptive plan is shown). Keeps plan-shape
  * iteration out of the REPL — the PlanShapeSpec/AqeRobustnessSpec
  * pins are authored from this output.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val aqe = args.contains("aqe")
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(s, dir)
    if (aqe) df.count() // materialize so the adaptive plan finalizes
    println(df.queryExecution.executedPlan.toString)
    s.stop()
    sys.exit(0)
  }
}
