package graft

import org.apache.spark.sql.SparkSession

/** One-off optimizer-fidelity probe (not part of the driver contract):
  * the MLP head at the reference's per-split scale (25,200 rows, 6
  * horizons — the SCALE-BASELINE shape) trained full-batch GD vs the
  * round-8 mini-batch AdamW face, same wall-clock-ish budgets. Prints
  * val MAE + seconds per config; the numbers land in PLANS.md.
  *
  *   sbt "Test/runMain graft.OptProbe"
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def writeSplit(n: Int, x0: Double): String = {
      val f = java.nio.file.Files.createTempFile("optprobe", ".csv")
      val xs = new Array[Double](n)
      xs(0) = x0
      (1 until n).foreach(i => xs(i) = 3.7 * xs(i - 1) * (1.0 - xs(i - 1)))
      val sb = new StringBuilder("DATE_TIME,CLOSE\n")
      var i = 0
      while (i < n) {
        val ts = java.time.LocalDateTime.of(2020, 1, 1, 0, 0).plusMinutes(i.toLong)
        sb.append(ts.toString.replace('T', ' ')).append(',').append(xs(i)).append('\n')
        i += 1
      }
      java.nio.file.Files.writeString(f, sb.toString)
      f.toString
    }
    val cfg = graft.pipeline.ForecastPipeline.Config(
      splits = Map("train" -> writeSplit(25200, 0.5123), "val" -> writeSplit(25200, 0.317)),
      targetColumn = "CLOSE", horizons = 1 to 6)
    def v(rows: Array[org.apache.spark.sql.Row], m: String) =
      rows.find(r => r.getString(0) == "val" &&
        r.getString(1) == m && r.getInt(2) == 1).get.getDouble(3)
    val configs = Seq(
      ("gd-150ep", graft.pipeline.ForecastPipeline.MlpConf(hidden = 8, epochs = 150, lr = 0.1)),
      ("gd-50ep", graft.pipeline.ForecastPipeline.MlpConf(hidden = 8, epochs = 50, lr = 0.1)),
      ("adamw-b4-50ep", graft.pipeline.ForecastPipeline.MlpConf(hidden = 8, epochs = 50, lr = 0.01,
        opt = graft.ml.Optimizer.OptConfig(method = "adamw", batches = 4, weightDecay = 1e-4))),
      ("adam-b4-25ep", graft.pipeline.ForecastPipeline.MlpConf(hidden = 8, epochs = 25, lr = 0.01,
        opt = graft.ml.Optimizer.OptConfig(method = "adam", batches = 4))),
      ("adamw-b4-50ep-lr03", graft.pipeline.ForecastPipeline.MlpConf(hidden = 8, epochs = 50, lr = 0.03,
        opt = graft.ml.Optimizer.OptConfig(method = "adamw", batches = 4, weightDecay = 1e-4))),
      ("adamw-b8-30ep-lr03", graft.pipeline.ForecastPipeline.MlpConf(hidden = 8, epochs = 30, lr = 0.03,
        opt = graft.ml.Optimizer.OptConfig(method = "adamw", batches = 8, weightDecay = 1e-4))))
    configs.foreach { case (name, mc) =>
      val t0 = System.nanoTime()
      val rows = graft.pipeline.ForecastPipeline.modelMetrics(spark, cfg,
        nLags = 3, head = "mlp", mlpConf = mc).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"OPTPROBE $name%-14s ${sec}%6.1f s  val MAE H1=${v(rows, "MAE")}%.6f  " +
        f"fitness=${v(rows, "MAE") - v(rows, "Naive MAE")}%+.6f  R2=${v(rows, "R2")}%.4f")
    }
    spark.stop()
  }
}
