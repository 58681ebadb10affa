package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness (r18, VERDICT r17 #5): interleaved A/B timing of a
  * production query vs its pre-r17 alternate spelling
  * (`SparkEntry.abAlternates`) in ONE JVM — A,B,A,B,… within a session,
  * so a co-tenant wave hits both sides equally instead of whichever
  * separate run it landed on (the failure mode that produced r17's
  * contradictory sketch-family numbers). Also row-compares the two
  * shapes once (sorted collect) as a cheap equivalence re-check.
  *
  * Usage: runMain graft.tools.AbCompare <prod:alt>[,<prod:alt>…] [sfDir] [rounds]
  * e.g.   runMain graft.tools.AbCompare q61_percentiles_approx:q61_union sf0.1dir 5
  */
object AbCompare {
  def main(args: Array[String]): Unit = {
    val pairs = args(0).split(",").map { p =>
      val Array(a, b) = p.split(":"); (a, b)
    }
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      noop(fn(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    pairs.foreach { case (prod, alt) =>
      val pf = graft.SparkEntry.queries(prod)
      val af = graft.SparkEntry.abAlternates(alt)
      // equivalence re-check: identical rows (sorted string render)
      val pr = pf(spark, sfDir).collect().map(_.toString).sorted
      val ar = af(spark, sfDir).collect().map(_.toString).sorted
      println(s"[ab] $prod vs $alt rows=${pr.length} " +
        s"equal=${pr.sameElements(ar)}")
      // warm both shapes once (JIT/codegen), untimed
      noop(pf(spark, "/root/testdata/sf0.001"))
      noop(af(spark, "/root/testdata/sf0.001"))
      val as = Array.newBuilder[Double]
      val bs = Array.newBuilder[Double]
      (1 to rounds).foreach { r =>
        spark.sparkContext.setJobDescription(s"ab: $prod r$r")
        as += time(pf)
        spark.sparkContext.setJobDescription(s"ab: $alt r$r")
        bs += time(af)
        val cal = graft.Bench.calibrate()
        System.gc() // reclaim dropped blocks so neither side pays the other's garbage
        println(f"[ab] round $r cal=$cal%.3f")
      }
      def stats(xs: Array[Double]) = {
        val s = xs.sorted
        (s.head, s(s.length / 2), s.sum / s.length)
      }
      val (amin, amed, aavg) = stats(as.result())
      val (bmin, bmed, bavg) = stats(bs.result())
      println(f"[ab] RESULT $prod%-28s min=$amin%.3f med=$amed%.3f avg=$aavg%.3f")
      println(f"[ab] RESULT $alt%-28s min=$bmin%.3f med=$bmed%.3f avg=$bavg%.3f")
      println(f"[ab] VERDICT $prod: new/old med ratio ${amed / bmed}%.3f " +
        s"(<1 means the r17 shape is faster)")
    }
    graft.dedup.Dedup.clearCaches()
    graft.text.TextAnalysis.clearCaches()
    graft.similarity.Similarity.clearCaches()
    graft.SparkEntry.clearTradesCache()
    spark.stop()
  }
}
