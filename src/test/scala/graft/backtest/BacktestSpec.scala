package graft.backtest

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import Backtest._

class BacktestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bar(sym: String, t: Long, px: Double, pred: Double,
      hi: Double = Double.NaN, lo: Double = Double.NaN) =
    Bar(sym, t, px, if (hi.isNaN) px else hi, if (lo.isNaN) px else lo, px, pred)

  test("long entry then TP exit at entry+tp") {
    val bars = Seq(
      bar("s", 1, 100.0, 103.0),            // signal +3 > 1 → open long @100
      bar("s", 2, 101.0, 101.0, hi = 106.0) // high 106 ≥ 100+5 → TP
    ).toDS()
    val trades = Backtest.run(bars, Params()).collect()
    assert(trades.length == 1)
    val t = trades(0)
    assert(t.direction == "long" && t.entryPrice == 100.0 &&
      t.exitPrice == 105.0 && t.profit == 5.0 && t.exitReason == "tp")
  }

  test("SL is checked before TP within the same bar (pessimistic)") {
    val bars = Seq(
      bar("s", 1, 100.0, 103.0),
      bar("s", 2, 100.0, 100.0, hi = 106.0, lo = 96.0) // both hit → SL wins
    ).toDS()
    val t = Backtest.run(bars, Params()).collect()(0)
    assert(t.exitReason == "sl" && t.profit == -3.0)
  }

  test("short trade profits when price falls") {
    val bars = Seq(
      bar("s", 1, 100.0, 97.0),             // signal -3 → short @100
      bar("s", 2, 99.0, 99.0, lo = 94.0)    // low ≤ 100-5 → TP for short
    ).toDS()
    val t = Backtest.run(bars, Params()).collect()(0)
    assert(t.direction == "short" && t.profit == 5.0 && t.exitReason == "tp")
  }

  test("duration cap closes at close price; no signal → no trade") {
    val quiet = (1L to 10L).map(i => bar("s", i, 100.0, 100.2)).toDS()
    assert(Backtest.run(quiet, Params()).isEmpty)
    val sticky = (bar("s", 1, 100.0, 103.0) +:
      (2L to 10L).map(i => bar("s", i, 101.0, 101.0))).toDS()
    val t = Backtest.run(sticky, Params(maxDurationBars = 4)).collect()(0)
    assert(t.exitReason == "duration" && t.durationBars == 4 && t.exitPrice == 101.0)
  }

  test("trade cap limits entries within the trailing window") {
    // alternating: signal bar then instant-TP bar, far apart in price moves
    val bars = (0 until 10).flatMap { i =>
      val t0 = i.toLong * 2 + 1
      Seq(bar("s", t0, 100.0, 103.0),
        bar("s", t0 + 1, 100.0, 100.0, hi = 106.0))
    }.toDS()
    val unlimited = Backtest.run(bars, Params()).collect()
    assert(unlimited.length == 10)
    val capped = Backtest.run(bars,
      Params(capWindow = 1000L, maxTradesPerWindow = 2)).collect()
    assert(capped.length == 2)
  }

  test("symbols are independent; maxDrawdown tracks adverse excursion") {
    val bars = Seq(
      bar("a", 1, 100.0, 103.0),
      bar("a", 2, 100.0, 100.0, lo = 98.5),  // adverse 1.5, no SL (sl=3)
      bar("a", 3, 100.0, 100.0, hi = 106.0), // TP
      bar("b", 1, 50.0, 47.0),               // short on b
      bar("b", 2, 50.0, 50.0, lo = 44.0)     // TP for short
    ).toDS()
    val trades = Backtest.run(bars, Params()).collect().sortBy(_.symbol)
    assert(trades.length == 2)
    assert(trades(0).symbol == "a" && trades(0).maxDrawdown == 1.5)
    assert(trades(1).symbol == "b" && trades(1).direction == "short")
  }

  test("summary aggregates per symbol with running-balance minimum") {
    val trades = Seq(
      Trade("s", 1, 2, "long", 100, 97, -3.0, 1, 3.0, "sl"),
      Trade("s", 3, 4, "long", 100, 105, 5.0, 1, 0.0, "tp")
    ).toDS()
    val s = Backtest.summary(trades).collect()(0)
    assert(s.getAs[Long]("n_trades") == 2)
    assert(s.getAs[Double]("avg_profit") == 1.0)
    assert(s.getAs[Double]("min_balance") == -3.0)
    assert(s.getAs[Double]("total_profit") == 2.0)
  }
}
