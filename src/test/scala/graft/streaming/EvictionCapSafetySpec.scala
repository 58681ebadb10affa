package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import scala.concurrent.duration._

import graft.backtest.Backtest
import graft.metrics.{Hll, TDigest}
import graft.ml.Splits

/** The r13/r15 cap-safety directive, pinned exhaustively: **a
  * stalled-feed replay cannot lose cap entries under ANY public
  * eviction policy**, across every streaming face that accepts an
  * [[StreamOps.IdleEviction]].
  *
  * The trap being closed (`StreamOps.backtestGroupStep`'s timeout
  * branch): [[StreamOps.ProcessingTimeIdle]] measures WALL-CLOCK idle
  * while the A11 trade cap's `capWindow` is EVENT time. On a stalled
  * or backfilled feed, wall-clock idle exceeds the timeout while event
  * time has advanced less than capWindow — pre-r15, the timeout branch
  * then `state.remove()`d flat state whose `entries` the next bar
  * would still count, silently over-admitting against the cap. The fix
  * re-checks entry liveness against the symbol's own max event time
  * (`BtState.maxSeenTs`) and retains-and-re-arms, exactly like the
  * open-trade branch.
  *
  * Face-by-face meaning of "cannot lose" (all five policy-accepting
  * faces):
  *   - `streamingBacktest` — the cap contract: stalled-replay ≡
  *     never-evict, trade-for-trade (the only face where eviction
  *     could silently change emitted RESULTS);
  *   - `streamingQuantiles` / `streamingDistinct` / `streamingSample` —
  *     eviction is a semantic COMPLETION: the timeout emits a terminal
  *     `closed=true` row carrying the key's complete fold (n + the
  *     full sketch/sample), so no data is silently dropped;
  *   - `streamingIndicators` — eviction is the documented warm-up-reset
  *     GC (no quantitative cap/sketch contract to lose); pinned here so
  *     a future change to that semantic fails a test, not a user.
  */
class EvictionCapSafetySpec extends AnyFunSuite {

  private val CapUs = 1000000L // 1s cap window in µs
  private val params = Backtest.Params(threshold = 1.0, tp = 1e9, sl = 1e9,
    maxDurationBars = 1, capWindow = CapUs, maxTradesPerWindow = 1)
  private val wallIdle = StreamOps.ProcessingTimeIdle(10.minutes)

  // prices flat (giant tp/sl: only duration closes), pred >> close asks
  // for a long entry on every bar; the CAP is what must refuse it
  private def entryBar(ts: Long) =
    Backtest.Bar("x", ts, 100.0, 100.5, 99.5, 100.0, 105.0)

  private def procState(opt: Optional[Backtest.BtState], timedOut: Boolean) =
    TestGroupState.create[Backtest.BtState](
      opt, GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      Optional.empty[Long], timedOut)

  /** Drive one feed through `backtestGroupStep` bar-by-bar, firing a
    * wall-clock timeout (empty batch, hasTimedOut=true) wherever
    * `stallBefore` says the feed stalled — the stalled-replay harness.
    * Returns (emitted trades, final state if retained).
    */
  private def replay(bars: Seq[Backtest.Bar],
      eviction: StreamOps.IdleEviction,
      stallBefore: Map[Int, Int]): (Vector[Backtest.Trade], Option[Backtest.BtState]) = {
    var st: Optional[Backtest.BtState] = Optional.empty()
    val out = Vector.newBuilder[Backtest.Trade]
    bars.zipWithIndex.foreach { case (b, i) =>
      (1 to stallBefore.getOrElse(i, 0)).foreach { _ =>
        val tgs = procState(st, timedOut = true)
        out ++= StreamOps.backtestGroupStep("x", Iterator.empty, tgs, params, eviction)
        st = if (tgs.isRemoved || !tgs.exists) Optional.empty()
        else Optional.of(tgs.get)
      }
      val tgs = procState(st, timedOut = false)
      out ++= StreamOps.backtestGroupStep("x", Iterator(b), tgs, params, eviction)
      st = if (tgs.isRemoved || !tgs.exists) Optional.empty() else Optional.of(tgs.get)
    }
    (out.result(), if (st.isPresent) Some(st.get) else None)
  }

  test("backtest/ProcessingTimeIdle: stalled-feed replay ≡ never-evict, trade-for-trade (the r13 directive sentence)") {
    // b0 opens (entry recorded at t=0), b1 duration-closes → flat with
    // a LIVE cap entry; the feed then STALLS (wall-clock timeout fires
    // with event time only 0.1s into the 1s capWindow); b2 resumes
    // INSIDE the cap window and must be refused; b3 resumes past it and
    // must be admitted. Pre-r15 the stall evicted the entry and b2
    // opened a cap-violating trade.
    val bars = Seq(entryBar(0L), entryBar(100000L), entryBar(500000L),
      entryBar(2000000L), entryBar(2100000L))
    val (refTrades, refState) = replay(bars, StreamOps.NeverEvict, Map.empty)
    // stall everywhere it can fire — including REPEATED stalls before
    // the same resume bar (timeout re-fires after each re-arm)
    for (stalls <- Seq(Map(2 -> 1), Map(3 -> 1), Map(2 -> 1, 3 -> 1),
        Map(2 -> 3, 3 -> 2))) {
      val (trades, state) = replay(bars, wallIdle, stalls)
      assert(trades == refTrades,
        s"stall pattern $stalls lost a cap entry: $trades vs $refTrades")
      assert(state.map(_.copy(maxSeenTs = 0L)) ==
          refState.map(_.copy(maxSeenTs = 0L)),
        s"stall pattern $stalls diverged the state")
    }
    // sanity of the scenario itself: exactly two trades total (t=0 and
    // t=2s), i.e. the cap DID refuse b2 — otherwise the test is vacuous
    assert(refTrades.size == 2 && refTrades.map(_.entryTs) == Vector(0L, 2000000L))
  }

  test("backtest/ProcessingTimeIdle: repeated timeouts retain a live cap entry; expired/empty entries still GC") {
    // live entry (within capWindow of maxSeenTs): retained across
    // consecutive timeout firings, re-armed each time
    var st = Backtest.BtState(entries = List(100000L), maxSeenTs = 600000L)
    (1 to 3).foreach { i =>
      val tgs = procState(Optional.of(st), timedOut = true)
      assert(StreamOps.backtestGroupStep("x", Iterator.empty, tgs, params, wallIdle).isEmpty)
      assert(!tgs.isRemoved && tgs.exists && tgs.getTimeoutTimestampMs.isPresent,
        s"timeout firing #$i must retain-and-re-arm a live cap entry")
      st = tgs.get
    }
    // boundary: entry exactly capWindow old still counts for a
    // redelivered bar at ts == maxSeenTs (stepBar's filter is >=) →
    // retained
    val sEdge = procState(Optional.of(Backtest.BtState(
      entries = List(0L), maxSeenTs = CapUs)), timedOut = true)
    StreamOps.backtestGroupStep("x", Iterator.empty, sEdge, params, wallIdle)
    assert(!sEdge.isRemoved && sEdge.exists)
    // strictly older than capWindow relative to maxSeenTs: provably
    // dead under the non-decreasing feed contract → evicted
    val sDead = procState(Optional.of(Backtest.BtState(
      entries = List(0L), maxSeenTs = CapUs + 1L)), timedOut = true)
    StreamOps.backtestGroupStep("x", Iterator.empty, sDead, params, wallIdle)
    assert(sDead.isRemoved, "expired entries must still GC")
    // empty entries, flat → evicted
    val sEmpty = procState(Optional.of(Backtest.BtState(
      maxSeenTs = 123L)), timedOut = true)
    StreamOps.backtestGroupStep("x", Iterator.empty, sEmpty, params, wallIdle)
    assert(sEmpty.isRemoved, "flat state with no entries must still GC")
  }

  test("backtest/EventTimeIdle: eviction needs no liveness re-check — the watermark proves entry expiry") {
    // EventTimeIdle fires only once the watermark passes
    // maxSeenTs + timeout (timeout >= capWindow), so any admissible
    // future bar is past every entry's window: evicting flat state
    // with entries is EXACT — and must keep happening (retaining
    // forever would regress the r12 deterministic-GC contract).
    val evIdle = StreamOps.EventTimeIdle(1.second) // == capWindow
    // entry at 0, maxSeenTs 0.1s; watermark has passed
    // ceil(0.1s→ms) + 1000ms ⇒ any future bar ts >= 1.1s > 0 + 1s
    val tgs = TestGroupState.create[Backtest.BtState](
      Optional.of(Backtest.BtState(entries = List(0L), maxSeenTs = 100000L)),
      GroupStateTimeout.EventTimeTimeout, 1000L,
      Optional.of(1100L), hasTimedOut = true)
    assert(StreamOps.backtestGroupStep("x", Iterator.empty, tgs, params, evIdle).isEmpty)
    assert(tgs.isRemoved,
      "EventTimeIdle flat eviction is exact and must not be blocked by the liveness check")
    // open trade still survives under event time
    val tgsOpen = TestGroupState.create[Backtest.BtState](
      Optional.of(Backtest.BtState(open = true, dir = "long", maxSeenTs = 100000L)),
      GroupStateTimeout.EventTimeTimeout, 1000L,
      Optional.of(1100L), hasTimedOut = true)
    StreamOps.backtestGroupStep("x", Iterator.empty, tgsOpen, params, evIdle)
    assert(!tgsOpen.isRemoved && tgsOpen.exists)
  }

  test("quantiles/ProcessingTimeIdle: eviction emits the COMPLETE fold as the terminal row") {
    val agg = new TDigest.QuantilesAgg(Seq(0.5, 0.9), 100.0, 256)
    val ticks = (0 until 500).map(i => StreamOps.QuantileTick("k", i.toLong, i.toDouble))
    val s1 = TestGroupState.create[StreamOps.QuantState](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      Optional.empty[Long], hasTimedOut = false)
    StreamOps.quantilesGroupStep("k", ticks.iterator, s1, agg, wallIdle).toVector
    val persisted = s1.get
    val s2 = TestGroupState.create[StreamOps.QuantState](
      Optional.of(persisted), GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      Optional.empty[Long], hasTimedOut = true)
    val term = StreamOps.quantilesGroupStep("k", Iterator.empty, s2, agg, wallIdle).toVector
    assert(s2.isRemoved)
    assert(term.size == 1 && term.head.closed && term.head.n == 500L,
      "terminal row must carry the full row count")
    // the terminal estimates ARE the persisted fold finished — the
    // eviction lost nothing a reader of the closed row cannot see
    assert(term.head.quantiles ==
      agg.finish(TDigest.Buf(persisted.means, persisted.weights)))
  }

  test("distinct/ProcessingTimeIdle: terminal estimate equals the batch fold over everything seen") {
    val p = 12
    val ids = (0 until 3000).map(i => (i % 700).toLong)
    val ticks = ids.zipWithIndex.map { case (id, i) =>
      StreamOps.DistinctTick("k", i.toLong, id)
    }
    val s1 = TestGroupState.create[StreamOps.HllState](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      Optional.empty[Long], hasTimedOut = false)
    StreamOps.distinctGroupStep("k", ticks.iterator, s1, p, wallIdle).toVector
    val s2 = TestGroupState.create[StreamOps.HllState](
      Optional.of(s1.get), GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      Optional.empty[Long], hasTimedOut = true)
    val term = StreamOps.distinctGroupStep("k", Iterator.empty, s2, p, wallIdle).toVector
    assert(s2.isRemoved)
    val batch = Hll.emptyRegs(p)
    ids.foreach(Hll.add(batch, p, _))
    assert(term.size == 1 && term.head.closed && term.head.n == 3000L
      && term.head.estimate == Hll.estimate(batch),
      "terminal estimate must equal the batch register fold exactly")
  }

  test("sample/ProcessingTimeIdle: terminal sample equals the batch top-k over everything seen") {
    val k = 16
    val agg = new Splits.HashTopKAgg(k)
    val ids = (0L until 400L)
    val ticks = ids.map(id => StreamOps.SampleTick("k", id, id))
    val s1 = TestGroupState.create[StreamOps.SampleState](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      Optional.empty[Long], hasTimedOut = false)
    StreamOps.sampleGroupStep("k", ticks.iterator, s1, agg, wallIdle).toVector
    val s2 = TestGroupState.create[StreamOps.SampleState](
      Optional.of(s1.get), GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      Optional.empty[Long], hasTimedOut = true)
    val term = StreamOps.sampleGroupStep("k", Iterator.empty, s2, agg, wallIdle).toVector
    assert(s2.isRemoved)
    var buf = Splits.TopKBuf(Array.empty, Array.empty)
    ids.foreach(id => buf = agg.reduce(buf, (StreamOps.samplePriority(id), id)))
    assert(term.size == 1 && term.head.closed && term.head.n == 400L
      && term.head.sample == buf.ids.toSeq,
      "terminal sample must equal the batch top-k fold exactly")
  }

  test("indicators/ProcessingTimeIdle: eviction is the documented warm-up-reset GC (no contract to lose)") {
    import graft.ts.TechIndicators
    val conf = TechIndicators.RecursiveConfig()
    val s1 = TestGroupState.create[StreamOps.IndState](
      Optional.of(StreamOps.IndState(maxSeenTs = 42L)),
      GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      Optional.empty[Long], hasTimedOut = true)
    val out = StreamOps.indicatorGroupStep("k", Iterator.empty, s1, conf, wallIdle)
    assert(out.isEmpty && s1.isRemoved,
      "indicator eviction semantics (warm-up reset) changed — update the scaladoc AND this pin together")
  }
}
