package graft.backtest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bar-by-bar trading backtest (SURVEY §2.10; reference
  * `app/heuristic_strategy.py:109-227`).
  *
  * Semantics: per symbol, iterate bars in time order with position state —
  * open a long/short when the prediction-vs-price signal clears a
  * threshold (and the trailing trade-frequency cap allows, A11
  * `heuristic_strategy.py:154-157`); exit on SL (pessimistically checked
  * before TP, like the reference's intrabar ordering), TP, or a max
  * duration; track intra-trade adverse excursion (`:120-146`).
  *
  * Scale design: sequential *within* a symbol is inherent to the
  * semantics, so the physical plan is `repartition(symbol)` +
  * `sortWithinPartitions(symbol, ts)` + one `mapPartitions` pass —
  * streaming through each partition with O(1) state, never collecting a
  * series into memory. Parallelism comes from the symbol dimension.
  */
object Backtest {

  case class Bar(symbol: String, ts: Long, open: Double, high: Double,
      low: Double, close: Double, pred: Double)

  case class Trade(symbol: String, entryTs: Long, exitTs: Long,
      direction: String, entryPrice: Double, exitPrice: Double,
      profit: Double, durationBars: Int, maxDrawdown: Double,
      exitReason: String)

  case class Params(
      threshold: Double = 1.0,
      tp: Double = 5.0,
      sl: Double = 3.0,
      maxDurationBars: Int = 48,
      capWindow: Long = 5L * 24 * 3600 * 1000000L, // 5 days in µs
      maxTradesPerWindow: Int = 1000)

  /** Run the state machine. `bars` must be a Dataset[Bar]; output one row
    * per closed trade.
    */
  def run(bars: Dataset[Bar], params: Params): Dataset[Trade] = {
    import bars.sparkSession.implicits._
    bars
      .repartition(col("symbol"))
      .sortWithinPartitions(col("symbol"), col("ts"))
      .mapPartitions { iter => new TradeIterator(iter, params) }
  }

  /** Streaming one-pass state machine over a (symbol, ts)-sorted
    * partition; emits trades as they close.
    */
  private final class TradeIterator(bars: Iterator[Bar], p: Params)
      extends Iterator[Trade] {
    private var pending: List[Trade] = Nil
    private var curSymbol: String = null
    // open-position state
    private var open = false
    private var dir = ""
    private var entryTs = 0L
    private var entryPrice = 0.0
    private var duration = 0
    private var maxDD = 0.0
    // A11 trailing trade-entry timestamps within capWindow
    private var entries: List[Long] = Nil

    private def resetSymbol(sym: String): Unit = {
      curSymbol = sym; open = false; entries = Nil
    }

    private def close(bar: Bar, price: Double, reason: String): Trade = {
      open = false
      val profit = if (dir == "long") price - entryPrice else entryPrice - price
      Trade(curSymbol, entryTs, bar.ts, dir, entryPrice, price, profit,
        duration, maxDD, reason)
    }

    private def step(bar: Bar): Unit = {
      if (bar.symbol != curSymbol) resetSymbol(bar.symbol)
      if (open) {
        duration += 1
        val adverse =
          if (dir == "long") entryPrice - bar.low else bar.high - entryPrice
        if (adverse > maxDD) maxDD = adverse
        val hitSl =
          if (dir == "long") bar.low <= entryPrice - p.sl
          else bar.high >= entryPrice + p.sl
        val hitTp =
          if (dir == "long") bar.high >= entryPrice + p.tp
          else bar.low <= entryPrice - p.tp
        if (hitSl) { // pessimistic: SL before TP within the same bar
          pending ::= close(bar,
            if (dir == "long") entryPrice - p.sl else entryPrice + p.sl, "sl")
        } else if (hitTp) {
          pending ::= close(bar,
            if (dir == "long") entryPrice + p.tp else entryPrice - p.tp, "tp")
        } else if (duration >= p.maxDurationBars) {
          pending ::= close(bar, bar.close, "duration")
        }
      } else {
        val signal = bar.pred - bar.close
        entries = entries.filter(_ >= bar.ts - p.capWindow)
        if (math.abs(signal) > p.threshold && entries.size < p.maxTradesPerWindow) {
          open = true
          dir = if (signal > 0) "long" else "short"
          entryTs = bar.ts
          entryPrice = bar.close
          duration = 0
          maxDD = 0.0
          entries ::= bar.ts
        }
      }
    }

    override def hasNext: Boolean = {
      while (pending.isEmpty && bars.hasNext) step(bars.next())
      pending.nonEmpty
    }
    override def next(): Trade = {
      if (!hasNext) throw new NoSuchElementException
      val t = pending.head; pending = pending.tail; t
    }
  }

  /** A10 trade summary (`heuristic_strategy.py:301-332`): n_trades,
    * averages, and the running-balance minimum (needs one ordered
    * cumulative window per symbol).
    */
  def summary(trades: Dataset[Trade]): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("exitTs"), col("entryTs"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    trades.toDF()
      .withColumn("balance", sum(col("profit")).over(w))
      .groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n_trades"),
        avg(col("profit")).as("avg_profit"),
        avg(abs(col("profit"))).as("avg_abs_profit"),
        avg(col("durationBars")).as("avg_duration"),
        avg(col("maxDrawdown")).as("avg_max_dd"),
        min(col("balance")).as("min_balance"),
        sum(col("profit")).as("total_profit"))
  }
}
