package graft
import org.apache.spark.sql.SparkSession
object Bench {
  @volatile private var blackhole: Long = 0L

  /** Host-speed calibration: a fixed single-core integer workload, timed.
    * Bench totals on this shared host swing up to ~2× with neighbor load
    * (observed r4/r5: 54 s → 99 s across back-to-back idle runs), so the
    * per-round JSON carries `cal` to let a reader separate plan
    * regressions from host weather: query-time deltas that track `cal`
    * are environment, deltas that don't are real.
    */
  private[graft] def calibrate(): Double = {
    val t0 = System.nanoTime()
    var s = 0L
    var i = 0
    while (i < 400000000) { s += i * i; i += 1 }
    blackhole = s
    (System.nanoTime() - t0) / 1e9
  }

  /** Multi-core calibration: the same integer workload on `n` threads at
    * once, wall-clock. The round-7 post-mortem: the driver's cold pass
    * ran 90.2 s where the identical commit re-benched at 55.5 s on a
    * quiet host — with cal_pre/cal_mid NORMAL both times, because the
    * single-threaded cal cannot see a neighbor occupying half the
    * cores; a 32-way-parallel Spark stage can. calmc under contention
    * rises roughly with oversubscription while cal stays flat, so the
    * pair separates the three regimes: both flat = trust the numbers;
    * cal up = whole host slow; calmc up alone = multi-core contention
    * (the r7 cold-pass signature).
    */
  private[graft] def calibrateParallel(n: Int): Double = {
    val t0 = System.nanoTime()
    val threads = (0 until n).map { t =>
      new Thread(() => {
        var s = 0L
        var i = 0
        while (i < 400000000) { s += i * i; i += 1 }
        blackhole ^= s + t
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Contention-suspect rule for the settle pass: a query whose cold
    * time is both 3× and 0.75 s above its own warmed time is recording
    * first-touch-or-neighbor noise, not a plan property (a real plan
    * regression moves warm time too). Failed queries are excluded (their
    * timings are crash latencies); the worst 12 by cold time bound the
    * extra wall-clock.
    */
  private[graft] def settleSuspects(cold: Seq[(String, Double)],
      warmedMap: Map[String, Double], failed: Set[String]): Set[String] =
    cold.filter { case (n, t) =>
      val w = warmedMap.getOrElse(n, t)
      !failed.contains(n) && t > math.max(3.0 * w, w + 0.75)
    }.sortBy(-_._2).take(12).map(_._1).toSet

  private def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
  private def r2(v: Double): String = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
  private def js(rs: Seq[(String, Double)], short: Boolean) =
    rs.map { case (k, v) =>
      "\"" + (if (short) k.takeWhile(_ != '_') else k) + "\":" + (if (short) r2(v) else r3(v))
    }.mkString("{", ",", "}")

  /** The ONE driver-protocol line. The driver keeps only the LAST 2000
    * chars of the log (measured from BENCH_r03.json) and sbt appends a
    * ~75-char "[success]" line, so the budget is 1850 chars — which for
    * 97 queries can never fit cold + warmed + settled maps at once
    * (~2.6k). The r9 artifact therefore carried cold-only per-query
    * numbers: exactly the contention-polluted view (q62 "7.73 s" where
    * the settle pass measured 0.70 s) the settle machinery was built to
    * correct. So the line's per-query map is the REPRODUCIBLE FLOOR —
    * `settled ?? min(cold, warm)` — the number a plan-vs-plan reader
    * should trust, with `value` (cold total) and `value_warmed` keeping
    * the honest pass totals, `value_settled` the floor-map sum, and
    * `settled` naming the re-run queries so a contended round
    * self-annotates in the driver artifact itself. The honest
    * cold/warm/settled triple per query stays in bench_full.json.
    * Degradation if ever over budget: the settled-names list collapses
    * to `n_settled` (so the log still records that a settle pass ran —
    * never silently), then the floor map itself is dropped.
    */
  private[graft] def driverLine(cold: Seq[(String, Double)],
      warmed: Seq[(String, Double)], settled: Seq[(String, Double)],
      cals: String, sfDir: String): String = {
    val warmMap = warmed.toMap
    val settledMap = settled.toMap
    // r18 (VERDICT r17 #3): the floor is min over EVERY honest
    // measurement of the query — `settled ?? min(cold, warm)` let one
    // slow settle re-run OVERRIDE a faster warm number (q123 published
    // its 6.83 s settle while its warm pass ran ~1.0 s), so a settle
    // pass taken under late-session pressure could only lower the
    // floor's quality, never raise it. min(cold, warm, settled) is the
    // reproducible floor the name promises.
    val floor = cold.map { case (n, c) =>
      val cw = math.min(c, warmMap.getOrElse(n, c))
      n -> math.min(cw, settledMap.getOrElse(n, cw))
    }
    val head = s"""{"metric":"total","value":${r3(cold.map(_._2).sum)},""" +
      s""""value_warmed":${r3(warmed.map(_._2).sum)},""" +
      s""""value_settled":${r3(floor.map(_._2).sum)},""" +
      s""""unit":"sec","sf":"$sfDir","n_queries":${cold.size},$cals"""
    val names = settled.map(s => "\"" + s._1.takeWhile(_ != '_') + "\"")
      .mkString("[", ",", "]")
    val full = s"""$head,"queries":${js(floor, short = true)},"settled":$names}"""
    val marked = s"""$head,"queries":${js(floor, short = true)},"n_settled":${settled.size}}"""
    if (full.length <= 1850) full
    else if (marked.length <= 1850) marked
    else s"""$head,"n_settled":${settled.size}}"""
  }

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
    // r18 session instrumentation (VERDICT r17 #4): the r17 round left
    // two attribution questions open — a ~25% uniform slowdown the
    // pass-boundary calmc probes could not see (they are 2 s snapshots,
    // the host's co-tenant waves are minutes long), and a warm pass
    // that degraded catastrophically late in the run (q54 0.65→33.7 s
    // at 8 cores). Two additions, both OUTSIDE every per-query timer:
    //  - a mid-pass calibration + storage-occupancy trace every 20
    //    queries (reported in bench_full.json only — the driver line is
    //    unchanged), so a wave or a cache pileup lands on a trace point
    //    instead of being argued about after the fact;
    //  - a System.gc() at each trace point: Spark's ContextCleaner only
    //    reclaims dropped RDD blocks / broadcasts / shuffle files after
    //    a driver GC, and a 119-query pass on a big heap may never GC —
    //    unreachable blocks then stack up in the block manager and
    //    later queries pay their eviction (the JMH-style forced-GC-
    //    between-iterations discipline; no results are retained, every
    //    query still computes from parquet).
    val calTrace = scala.collection.mutable.ListBuffer.empty[(String, Double)]
    val storageTrace = scala.collection.mutable.ListBuffer.empty[(String, Double)]
    def storageUsedMb(): Double =
      spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, rem) => max - rem }.sum / (1024.0 * 1024.0)
    def maintenanceTick(label: String): Unit = {
      System.gc()
      calTrace += label -> calibrate()
      storageTrace += label -> storageUsedMb()
    }
    def timedPass(pass: String): Seq[(String, Double)] = {
      var i = 0
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        if (i % 20 == 0) maintenanceTick(s"$pass@$i")
        i += 1
        // guide §1.5: label the jobs so an attached history/UI reader
        // can map stages back to queries (protocol-neutral)
        spark.sparkContext.setJobDescription(s"bench: $name")
        val t0 = System.nanoTime()
        try run(fn, sfDir) catch {
          case e: Throwable =>
            // a crashing query must not masquerade as a fast one
            failed += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    // Pass 1 = first-touch at the target SF (same protocol as round 1's
    // headline `value`); pass 2 = steady-state after the target-SF data
    // and every full-scale codegen path are hot. Calibration brackets
    // EACH pass (pre / mid / post): one post-hoc cal cannot say which
    // pass a host-weather swing landed on — with all three, a slow cold
    // total at normal cal_pre/cal_mid is a real plan regression, while
    // one that tracks an inflated cal_pre is environment.
    val nCal = math.min(cpus.toInt, Runtime.getRuntime.availableProcessors)
    val calPre = calibrate()
    val calmcPre = calibrateParallel(nCal)
    val cold = timedPass("cold")
    maintenanceTick("cold@end")
    val calMid = calibrate()
    val calmcMid = calibrateParallel(nCal)
    val warmed = timedPass("warm")
    maintenanceTick("warm@end")
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} queries failed: ${failed.mkString(",")}")
    // SETTLE pass (r8 verdict: the committed BENCH_r08 artifact recorded
    // contention-polluted numbers — q52 5.80 s cold vs 0.78 s on a quiet
    // host — which the calmc instrumentation DETECTED but the artifact
    // didn't correct). Any query whose cold time is far above its warmed
    // time (> max(3×warm, warm+0.75 s)) is a contention/first-touch
    // suspect, not a plan property: re-time it once more, steady-state,
    // and emit the third number as `queries_settled`. A contended run
    // thus self-annotates — cold stays the honest first-touch record,
    // settled is the reproducible floor a reader should trust for
    // plan-vs-plan comparison. Capped at 12 re-runs to bound wall-clock;
    // calmc_post brackets the settle pass like pre/mid bracket the
    // first two.
    val suspects = settleSuspects(cold, warmed.toMap, failed.toSet)
    if (suspects.nonEmpty) maintenanceTick("settle@0")
    val calmcPost = if (suspects.nonEmpty) calibrateParallel(nCal) else calmcMid
    val settled = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => suspects.contains(q._1))
      .flatMap { case (name, fn) =>
        spark.sparkContext.setJobDescription(s"bench-settle: $name")
        val t0 = System.nanoTime()
        // a query that crashes on the settle re-run must not publish its
        // time-to-crash as "the reproducible floor" — drop it (the
        // cold/warm maps still carry its honest timings)
        try {
          run(fn, sfDir)
          Some(name -> (System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] settle re-run of $name FAILED: ${e.getMessage}")
            None
        }
      }
    val cal = calibrate()
    val cals = s""""cal_pre":${r3(calPre)},"cal_mid":${r3(calMid)},"cal_sec":${r3(cal)},""" +
      s""""calmc_pre":${r3(calmcPre)},"calmc_mid":${r3(calmcMid)},"calmc_post":${r3(calmcPost)}"""
    val line = driverLine(cold, warmed, settled, cals, sfDir)
    val total = cold.map(_._2).sum
    val totalWarm = warmed.map(_._2).sum
    val settledFull =
      if (settled.isEmpty) "" else s""","queries_settled":${js(settled, short = false)}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_full.json"),
      s"""{"value":${r3(total)},"value_warmed":${r3(totalWarm)},"sf":"$sfDir",$cals,""" +
        s""""cal_trace":${js(calTrace.toSeq, short = false)},""" +
        s""""storage_mb":${js(storageTrace.toSeq, short = false)},""" +
        s""""queries":${js(cold, short = false)},"queries_warmed":${js(warmed, short = false)}$settledFull}""")
    println(line)
    // drop persisted memo handles before shutdown — a long-lived harness
    // JVM (sbt session, multi-round driver) must not retain them
    graft.dedup.Dedup.clearCaches()
    graft.text.TextAnalysis.clearCaches()
    graft.similarity.Similarity.clearCaches()
    SparkEntry.clearTradesCache()
    spark.stop()
  }
}
