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
}
