package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.backtest.Backtest
import graft.backtest.Backtest.{Bar, Params, Trade}

/** The q46/q47 differential oracle: the backtest state machine has no
  * single-query SQL form, so its correctness gate is batch ≡ streaming —
  * the `flatMapGroupsWithState` face folding `Backtest.stepBar` over the
  * same bars must reproduce `Backtest.run`'s trades FIELD-FOR-FIELD
  * (exact doubles: both faces run the identical arithmetic in the
  * identical order). Exercises all three exit reasons, multiple symbols,
  * and state surviving micro-batch boundaries mid-trade.
  */
class StreamingBacktestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic 2-symbol bar feed with sl / tp / duration exits: a
  // volatile sine regime in the first half (hits tp/sl), a near-flat
  // regime in the second (neither barrier reachable → duration exits),
  // and a prediction that fires a signal every 7th bar (alternating
  // direction)
  private def mkBars(symbols: Seq[String], n: Int): Seq[Bar] =
    symbols.flatMap { sym =>
      val base = math.abs(sym.hashCode % 50).toDouble + 100.0
      (0 until n).map { i =>
        val volatile = i < n / 2
        val close = base +
          (if (volatile) 3.0 * math.sin(i / 9.0) + 0.31 * (i % 5)
           else 0.1 * math.sin(i / 9.0) + 0.05 * (i % 5))
        val range = if (volatile) 0.8 else 0.15
        val pred =
          if (i % 7 == 0) close + (if (i % 14 == 0) 1.6 else -1.6)
          else close + 0.2
        Bar(sym, i.toLong * 3600L * 1000000L, close, close + range,
          close - range, close, pred)
      }
    }

  private val params = Params(threshold = 1.0, tp = 2.0, sl = 1.5,
    maxDurationBars = 9, capWindow = 48L * 3600L * 1000000L,
    maxTradesPerWindow = 3)

  private def key(t: Trade) = (t.symbol, t.entryTs, t.exitTs)

  test("streaming backtest reproduces the batch trades trade-for-trade") {
    implicit val sqlCtx = spark.sqlContext
    val bars = mkBars(Seq("EURUSD", "GBPUSD"), 120)
    val batchTrades = Backtest.run(bars.toDS(), params)
      .collect().toSeq.sortBy(key)
    assert(batchTrades.nonEmpty)
    assert(batchTrades.map(_.exitReason).toSet == Set("sl", "tp", "duration"),
      s"fixture should exercise every exit reason, got ${batchTrades.map(_.exitReason).toSet}")

    val mem = MemoryStream[Bar]
    val q = StreamOps.streamingBacktest(mem.toDS(), params)
      .writeStream.outputMode("append")
      .format("memory").queryName("sbt").start()
    try {
      // three micro-batches split mid-series: open positions and the
      // trailing entry cap must survive the batch boundary in state
      val (c1, rest) = bars.partition(_.ts < 40L * 3600L * 1000000L)
      val (c2, c3) = rest.partition(_.ts < 80L * 3600L * 1000000L)
      mem.addData(c1: _*); q.processAllAvailable()
      mem.addData(c2: _*); q.processAllAvailable()
      mem.addData(c3: _*); q.processAllAvailable()
      val streamTrades = spark.table("sbt").as[Trade]
        .collect().toSeq.sortBy(key)
      assert(streamTrades == batchTrades)
    } finally q.stop()
  }

  test("single-batch delivery also matches (micro-batch split is invisible)") {
    implicit val sqlCtx = spark.sqlContext
    val bars = mkBars(Seq("USDJPY"), 90)
    val batchTrades = Backtest.run(bars.toDS(), params)
      .collect().toSeq.sortBy(key)
    val mem = MemoryStream[Bar]
    val q = StreamOps.streamingBacktest(mem.toDS(), params)
      .writeStream.outputMode("append")
      .format("memory").queryName("sbt1").start()
    try {
      mem.addData(bars: _*)
      q.processAllAvailable()
      val streamTrades = spark.table("sbt1").as[Trade]
        .collect().toSeq.sortBy(key)
      assert(streamTrades == batchTrades)
    } finally q.stop()
  }
}
