package graft.backtest

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import Backtest._

/** OPT-r17: `runGrid` evaluates G parameter sets in ONE sorted pass.
  * The contract it must keep is trade-for-trade equality with G
  * standalone `run` pipelines — q114/q116's oracle rows depend on it.
  */
class GridBacktestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic multi-symbol feed with entries, SL/TP/duration exits
  // and cap-window pressure under at least one of the grid's params
  private def feed: org.apache.spark.sql.Dataset[Bar] = {
    val bars = for {
      s <- Seq("a", "b", "c")
      i <- 1 to 200
    } yield {
      val px = 100.0 + 10.0 * math.sin(i / 7.0) + (s.hashCode % 5)
      val pred = px + 6.0 * math.cos(i / 11.0)
      Bar(s, i.toLong * 1000000L, px, px + 2.5, px - 2.5, px, pred)
    }
    bars.toDS()
  }

  private val grid = Seq(
    1 -> Params(),
    2 -> Params(threshold = 5.0, tp = 10.0, sl = 6.0),
    3 -> Params(threshold = 4.0, tp = 3.0, sl = 2.0, maxDurationBars = 5),
    4 -> Params(threshold = 1e9)) // never fires: the zero-trade arm

  test("runGrid == run per param, trade for trade (incl. a zero-trade param)") {
    val gridTrades = Backtest.runGrid(feed, grid).collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    grid.foreach { case (id, p) =>
      val solo = Backtest.run(feed, p).collect().toSet
      val viaGrid = gridTrades.getOrElse(id, Array.empty[Trade].toSet)
      assert(viaGrid == solo,
        s"param $id: grid walk diverged from standalone run " +
          s"(${viaGrid.size} vs ${solo.size} trades)")
    }
    assert(gridTrades.get(4).forall(_.isEmpty), "param 4 must close no trades")
    // the same count twice in a set would hide duplicates — check sizes
    val soloTotal = grid.map { case (_, p) => Backtest.run(feed, p).count() }.sum
    assert(Backtest.runGrid(feed, grid).count() == soloTotal,
      "grid must emit exactly the union of per-param trades (no dups/drops)")
  }

  test("runGrid resets every machine at a symbol boundary") {
    // one symbol ends mid-position; the next symbol must start flat for
    // EVERY machine (a carried-over open position would shift entries)
    val bars = (Seq(
      Bar("a", 1L, 100.0, 100.5, 99.5, 100.0, 103.0), // open long under p1
      Bar("a", 2L, 100.0, 100.5, 99.5, 100.0, 100.0)  // still open at end
    ) ++ Seq(
      Bar("b", 1L, 100.0, 100.5, 99.5, 100.0, 103.0),
      Bar("b", 2L, 101.0, 106.0, 100.5, 101.0, 101.0) // TP under p1
    )).toDS()
    val g = Seq(1 -> Params(), 2 -> Params(threshold = 50.0))
    val trades = Backtest.runGrid(bars, g).collect()
    assert(trades.length == 1 && trades(0)._1 == 1 &&
      trades(0)._2.symbol == "b" && trades(0)._2.exitReason == "tp")
  }

  test("runGrid refuses duplicate param ids") {
    intercept[IllegalArgumentException] {
      Backtest.runGrid(feed, Seq(1 -> Params(), 1 -> Params(threshold = 2)))
    }
  }
}
