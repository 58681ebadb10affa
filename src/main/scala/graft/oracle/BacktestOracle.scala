package graft.oracle

import graft.backtest.Backtest

/** DuckDB oracle for the backtest state machine (q46/q47): replays
  * [[graft.backtest.Backtest.stepBar]] — the reference's bar-by-bar
  * TP/SL strategy loop (`app/heuristic_strategy.py:109-227`: entry on
  * signal threshold `:109-118`, intra-trade adverse excursion
  * `:120-146`, trailing trade-frequency cap `:154-157`) — as a
  * generated recursive CTE, one recursion step per bar per symbol.
  *
  * Cross-engine exactness contract (the StlOracle/ArimaOracle family
  * argument, adapted to a sequential kernel):
  *   - the state machine is *sequential per symbol*, so every double
  *     op has a fixed order — there is no aggregation-order freedom to
  *     reconcile. Each transition is straight-line IEEE-754 double
  *     arithmetic (`+ - * /`, comparisons), which both JVM and DuckDB
  *     evaluate identically; literals (`1.01`, `50.0`, tp/sl/threshold)
  *     are correctly-rounded decimal strings in both engines, hence the
  *     same bits;
  *   - the A11 trade-cap list (`entries`) is carried as a `BIGINT[]`
  *     through the recursion, filtered/prepended exactly like the
  *     Scala `List[Long]`;
  *   - q47's aggregates are folded INSIDE the walk in trade-emission
  *     order (= exitTs order per symbol), matching Spark's physical
  *     accumulation order: the summary's window sort (symbol, exitTs,
  *     entryTs) feeds the hash aggregate's per-row buffer updates
  *     left-to-right, and each symbol lives in exactly one partition
  *     (single partial, no merge reorder). `avg = sum/count` replays
  *     Spark's `Average.evaluateExpression` division;
  *   - recursion is well-founded because `(user_id, ts)` is unique in
  *     the events feed (checked r12 at sf0.001/0.01/0.1) and bars are
  *     numbered by `ROW_NUMBER() OVER (ORDER BY ts)`, mirroring
  *     `Backtest.run`'s `sortWithinPartitions(symbol, ts)`.
  *
  * Depth = max bars per symbol (~100 at the test SFs); total work is
  * linear in the bar count — each bar joins the walk exactly once.
  */
object BacktestOracle {

  private def d(x: Double): String = s"CAST($x AS DOUBLE)"

  /** The shared recursive walk: `bars` re-derives the q46 bar feed from
    * `events` (close = value, high/low = ±1%, pred from the JSON `k`
    * payload), `walk` advances every symbol one bar per recursion step
    * carrying (position state, A11 entries list, q47 running sums) and
    * emitting the closed trade's columns on the bar that closes it.
    */
  def walkCte(p: Backtest.Params): String = {
    val sl = d(p.sl); val tp = d(p.tp); val th = d(p.threshold)
    s"""WITH RECURSIVE bars AS MATERIALIZED (
       |  SELECT CAST(user_id AS VARCHAR) AS symbol,
       |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS rn,
       |         COUNT(*) OVER (PARTITION BY user_id) AS n,
       |         epoch_us(ts) AS ts,
       |         value * ${d(1.01)} AS high,
       |         value * ${d(0.99)} AS low,
       |         value AS close,
       |         value + (CAST(json_extract_string(props, '$$.k') AS DOUBLE)
       |                  - ${d(50.0)}) / ${d(2.0)} AS pred
       |  FROM events),
       |walk AS (
       |  SELECT symbol, CAST(-1 AS BIGINT) AS rn, n,
       |         false AS is_open, '' AS dir, CAST(0 AS BIGINT) AS entry_ts,
       |         ${d(0.0)} AS entry_price, 0 AS duration,
       |         ${d(0.0)} AS max_dd, CAST([] AS BIGINT[]) AS entries,
       |         CAST(NULL AS BIGINT) AS t_entry_ts, CAST(NULL AS BIGINT) AS t_exit_ts,
       |         CAST(NULL AS VARCHAR) AS t_dir, CAST(NULL AS DOUBLE) AS t_entry_price,
       |         CAST(NULL AS DOUBLE) AS t_exit_price, CAST(NULL AS DOUBLE) AS t_profit,
       |         CAST(NULL AS INTEGER) AS t_duration, CAST(NULL AS DOUBLE) AS t_max_dd,
       |         CAST(NULL AS VARCHAR) AS t_reason,
       |         CAST(0 AS BIGINT) AS n_trades, ${d(0.0)} AS sum_profit,
       |         ${d(0.0)} AS sum_abs, ${d(0.0)} AS sum_dur,
       |         ${d(0.0)} AS sum_dd, ${d(0.0)} AS min_bal
       |  FROM (SELECT DISTINCT symbol, n FROM bars)
       |  UNION ALL
       |  SELECT symbol, rn, n,
       |    CASE WHEN is_open THEN NOT closing ELSE can_enter END AS is_open,
       |    CASE WHEN NOT is_open AND can_enter
       |         THEN (CASE WHEN signal > ${d(0.0)} THEN 'long' ELSE 'short' END)
       |         ELSE dir END AS dir,
       |    CASE WHEN NOT is_open AND can_enter THEN ts ELSE entry_ts END AS entry_ts,
       |    CASE WHEN NOT is_open AND can_enter THEN close ELSE entry_price END AS entry_price,
       |    CASE WHEN is_open THEN dur2
       |         WHEN can_enter THEN 0 ELSE duration END AS duration,
       |    CASE WHEN is_open THEN mdd2
       |         WHEN can_enter THEN ${d(0.0)} ELSE max_dd END AS max_dd,
       |    CASE WHEN is_open THEN entries
       |         WHEN can_enter THEN list_prepend(ts, entries_f)
       |         ELSE entries_f END AS entries,
       |    CASE WHEN closing THEN entry_ts END AS t_entry_ts,
       |    CASE WHEN closing THEN ts END AS t_exit_ts,
       |    CASE WHEN closing THEN dir END AS t_dir,
       |    CASE WHEN closing THEN entry_price END AS t_entry_price,
       |    CASE WHEN closing THEN exit_price END AS t_exit_price,
       |    CASE WHEN closing THEN profit END AS t_profit,
       |    CASE WHEN closing THEN CAST(dur2 AS INTEGER) END AS t_duration,
       |    CASE WHEN closing THEN mdd2 END AS t_max_dd,
       |    CASE WHEN closing THEN reason END AS t_reason,
       |    CASE WHEN closing THEN n_trades + 1 ELSE n_trades END AS n_trades,
       |    CASE WHEN closing THEN sum_profit + profit ELSE sum_profit END AS sum_profit,
       |    CASE WHEN closing THEN sum_abs + ABS(profit) ELSE sum_abs END AS sum_abs,
       |    CASE WHEN closing THEN sum_dur + CAST(dur2 AS DOUBLE) ELSE sum_dur END AS sum_dur,
       |    CASE WHEN closing THEN sum_dd + mdd2 ELSE sum_dd END AS sum_dd,
       |    CASE WHEN NOT closing THEN min_bal
       |         WHEN n_trades = 0 THEN sum_profit + profit
       |         ELSE LEAST(min_bal, sum_profit + profit) END AS min_bal
       |  FROM (
       |    SELECT *,
       |      CASE WHEN dir = 'long' THEN exit_price - entry_price
       |           ELSE entry_price - exit_price END AS profit
       |    FROM (
       |      SELECT *,
       |        is_open AND (hit_sl OR hit_tp OR dur2 >= ${p.maxDurationBars}) AS closing,
       |        CASE WHEN hit_sl THEN (CASE WHEN dir = 'long'
       |                 THEN entry_price - $sl ELSE entry_price + $sl END)
       |             WHEN hit_tp THEN (CASE WHEN dir = 'long'
       |                 THEN entry_price + $tp ELSE entry_price - $tp END)
       |             ELSE close END AS exit_price,
       |        CASE WHEN hit_sl THEN 'sl' WHEN hit_tp THEN 'tp'
       |             ELSE 'duration' END AS reason
       |      FROM (
       |        SELECT *,
       |          duration + 1 AS dur2,
       |          CASE WHEN adverse > max_dd THEN adverse ELSE max_dd END AS mdd2,
       |          CASE WHEN dir = 'long' THEN low <= entry_price - $sl
       |               ELSE high >= entry_price + $sl END AS hit_sl,
       |          CASE WHEN dir = 'long' THEN high >= entry_price + $tp
       |               ELSE low <= entry_price - $tp END AS hit_tp,
       |          ABS(signal) > $th
       |            AND len(entries_f) < ${p.maxTradesPerWindow} AS can_enter
       |        FROM (
       |          SELECT w.symbol, b.rn, w.n, w.is_open, w.dir, w.entry_ts,
       |                 w.entry_price, w.duration, w.max_dd, w.entries,
       |                 w.n_trades, w.sum_profit, w.sum_abs, w.sum_dur,
       |                 w.sum_dd, w.min_bal,
       |                 b.ts, b.high, b.low, b.close,
       |                 CASE WHEN w.dir = 'long' THEN w.entry_price - b.low
       |                      ELSE b.high - w.entry_price END AS adverse,
       |                 b.pred - b.close AS signal,
       |                 list_filter(w.entries,
       |                   e -> e >= b.ts - ${p.capWindow}) AS entries_f
       |          FROM walk w JOIN bars b ON b.symbol = w.symbol AND b.rn = w.rn + 1
       |        )
       |      )
       |    )
       |  )
       |)""".stripMargin
  }

  /** q46: one row per closed trade, column-for-column the Scala
    * `Backtest.Trade` shape (durationBars INTEGER = Spark IntegerType).
    */
  def q46Sql(p: Backtest.Params): String =
    walkCte(p) + """
      |SELECT symbol, t_entry_ts AS entryTs, t_exit_ts AS exitTs,
      |       t_dir AS direction, t_entry_price AS entryPrice,
      |       t_exit_price AS exitPrice, t_profit AS profit,
      |       t_duration AS durationBars, t_max_dd AS maxDrawdown,
      |       t_reason AS exitReason
      |FROM walk WHERE t_reason IS NOT NULL""".stripMargin

  /** q47: per-symbol trade summary from the walk's running sums (the
    * final bar's state), replaying `Backtest.summary`'s aggregates in
    * Spark's own accumulation order.
    */
  def q47Sql(p: Backtest.Params): String =
    walkCte(p) + """
      |SELECT symbol, n_trades,
      |       sum_profit / CAST(n_trades AS DOUBLE) AS avg_profit,
      |       sum_abs / CAST(n_trades AS DOUBLE) AS avg_abs_profit,
      |       sum_dur / CAST(n_trades AS DOUBLE) AS avg_duration,
      |       sum_dd / CAST(n_trades AS DOUBLE) AS avg_max_dd,
      |       min_bal AS min_balance, sum_profit AS total_profit
      |FROM walk WHERE rn = n - 1 AND n_trades > 0""".stripMargin
}
