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

  /** Per-symbol position state — the COMPLETE state machine state, so
    * a streaming face can persist it across micro-batches: open-position
    * fields plus the A11 trailing entry timestamps inside `capWindow`.
    * `maxSeenTs` is maintained ONLY by the streaming face (the group
    * step, after each fold): the symbol's max event time across ALL
    * batches, so the event-time idle-eviction point is monotone — an
    * admitted out-of-order batch of older bars must never LOWER a
    * previously armed eviction point (that would evict flat state
    * before capWindow of the symbol's real event-time quiet and
    * over-admit against the trade cap). [[stepBar]] ignores it.
    */
  case class BtState(open: Boolean = false, dir: String = "",
      entryTs: Long = 0L, entryPrice: Double = 0.0, duration: Int = 0,
      maxDD: Double = 0.0, entries: List[Long] = Nil,
      maxSeenTs: Long = Long.MinValue)

  /** One bar through the state machine — the SINGLE implementation the
    * batch `mapPartitions` pass and the streaming
    * `StreamOps.streamingBacktest` face both fold, so trade-for-trade
    * batch ≡ streaming equality (the differential oracle for the
    * un-SQL-able state machine) is pinned by construction and spec, not
    * coincidence. At most one trade closes per bar (a just-opened
    * position cannot exit until the next bar, like the reference's
    * bar loop).
    */
  private[graft] def stepBar(sym: String, st: BtState, bar: Bar,
      p: Params): (BtState, Option[Trade]) = {
    if (st.open) {
      val duration = st.duration + 1
      val adverse =
        if (st.dir == "long") st.entryPrice - bar.low else bar.high - st.entryPrice
      val maxDD = if (adverse > st.maxDD) adverse else st.maxDD
      val hitSl =
        if (st.dir == "long") bar.low <= st.entryPrice - p.sl
        else bar.high >= st.entryPrice + p.sl
      val hitTp =
        if (st.dir == "long") bar.high >= st.entryPrice + p.tp
        else bar.low <= st.entryPrice - p.tp
      def close(price: Double, reason: String): (BtState, Option[Trade]) = {
        val profit =
          if (st.dir == "long") price - st.entryPrice else st.entryPrice - price
        (st.copy(open = false, duration = duration, maxDD = maxDD),
          Some(Trade(sym, st.entryTs, bar.ts, st.dir, st.entryPrice, price,
            profit, duration, maxDD, reason)))
      }
      if (hitSl) // pessimistic: SL before TP within the same bar
        close(if (st.dir == "long") st.entryPrice - p.sl else st.entryPrice + p.sl, "sl")
      else if (hitTp)
        close(if (st.dir == "long") st.entryPrice + p.tp else st.entryPrice - p.tp, "tp")
      else if (duration >= p.maxDurationBars)
        close(bar.close, "duration")
      else (st.copy(duration = duration, maxDD = maxDD), None)
    } else {
      val signal = bar.pred - bar.close
      val entries = st.entries.filter(_ >= bar.ts - p.capWindow)
      // st.copy, not a fresh BtState: the entry transition must not
      // reset fields the state machine doesn't own (maxSeenTs)
      if (math.abs(signal) > p.threshold && entries.size < p.maxTradesPerWindow)
        (st.copy(open = true, dir = if (signal > 0) "long" else "short",
          entryTs = bar.ts, entryPrice = bar.close, duration = 0,
          maxDD = 0.0, entries = bar.ts :: entries), None)
      else (st.copy(entries = entries), None)
    }
  }

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

  /** Evaluate MANY parameter sets in ONE pass over the sorted bar feed
    * (OPT-r17, guide §2.4): a G-point grid previously ran G independent
    * `run` pipelines — G scans, G symbol shuffles, G sorts of the SAME
    * bars. The walk is a per-(symbol, params) state machine, so one
    * sorted pass can step G machines per bar: same shuffle/sort cost as
    * ONE backtest, same total stepBar work, and each machine sees the
    * identical bar stream it saw standalone — trades are equal
    * trade-for-trade to `run(bars, p)` per grid point (spec-pinned).
    * Output is (paramId, trade).
    */
  def runGrid(bars: Dataset[Bar], grid: Seq[(Int, Params)]): Dataset[(Int, Trade)] = {
    import bars.sparkSession.implicits._
    require(grid.map(_._1).distinct.size == grid.size, "duplicate grid param ids")
    val g = grid.toIndexedSeq
    bars
      .repartition(col("symbol"))
      .sortWithinPartitions(col("symbol"), col("ts"))
      .mapPartitions { iter => new GridTradeIterator(iter, g) }
  }

  /** G state machines folded over one (symbol, ts)-sorted partition —
    * each machine's view is exactly [[TradeIterator]]'s. All machines
    * reset at a symbol boundary.
    */
  private final class GridTradeIterator(bars: Iterator[Bar],
      grid: IndexedSeq[(Int, Params)]) extends Iterator[(Int, Trade)] {
    private var pending: List[(Int, Trade)] = Nil
    private var curSymbol: String = null
    private val st = Array.fill(grid.length)(BtState())
    private def step(bar: Bar): Unit = {
      if (bar.symbol != curSymbol) {
        curSymbol = bar.symbol
        var i = 0
        while (i < st.length) { st(i) = BtState(); i += 1 }
      }
      var i = 0
      while (i < grid.length) {
        val (next, closed) = stepBar(curSymbol, st(i), bar, grid(i)._2)
        st(i) = next
        closed.foreach(t => pending ::= (grid(i)._1 -> t))
        i += 1
      }
    }
    override def hasNext: Boolean = {
      while (pending.isEmpty && bars.hasNext) step(bars.next())
      pending.nonEmpty
    }
    override def next(): (Int, Trade) = {
      if (!hasNext) throw new NoSuchElementException
      val t = pending.head; pending = pending.tail; t
    }
  }

  /** Streaming one-pass fold of [[stepBar]] over a (symbol, ts)-sorted
    * partition; emits trades as they close. State resets at each symbol
    * boundary.
    */
  private final class TradeIterator(bars: Iterator[Bar], p: Params)
      extends Iterator[Trade] {
    private var pending: List[Trade] = Nil
    private var curSymbol: String = null
    private var st = BtState()

    private def step(bar: Bar): Unit = {
      if (bar.symbol != curSymbol) { curSymbol = bar.symbol; st = BtState() }
      val (next, closed) = stepBar(curSymbol, st, bar, p)
      st = next
      closed.foreach(pending ::= _)
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
