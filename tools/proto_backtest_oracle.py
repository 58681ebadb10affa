#!/usr/bin/env python3
"""Prototype for BacktestOracle: replay Backtest.stepBar as a DuckDB
recursive CTE and bit-compare against a Python reference simulation of
the exact Scala arithmetic (same op order, IEEE doubles)."""
import sys
import duckdb
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "sf0.001"
D = f"/root/testdata/{SF}"

THRESHOLD, TP, SL = 10.0, 20.0, 10.0
MAXDUR, CAPWIN, MAXTRADES = 48, 5 * 24 * 3600 * 1000000, 1000

con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{D}/events.parquet'")

# ---------- Python reference simulation (mirrors Backtest.stepBar) ----------
rows = con.execute(
    "SELECT CAST(user_id AS VARCHAR), epoch_us(ts), value, "
    "CAST(json_extract_string(props,'$.k') AS DOUBLE) "
    "FROM events ORDER BY user_id, ts").fetchall()

trades = []
state = {}
for sym, ts, v, k in rows:
    v = float(v)
    h, l, c = v * 1.01, v * 0.99, v
    pred = v + (k - 50.0) / 2.0
    st = state.get(sym)
    if st is None:
        st = dict(open=False, dir="", entryTs=0, entryPrice=0.0, duration=0,
                  maxDD=0.0, entries=[])
        state[sym] = st
    if st["open"]:
        dur = st["duration"] + 1
        adverse = st["entryPrice"] - l if st["dir"] == "long" else h - st["entryPrice"]
        mdd = adverse if adverse > st["maxDD"] else st["maxDD"]
        hit_sl = (l <= st["entryPrice"] - SL) if st["dir"] == "long" else (h >= st["entryPrice"] + SL)
        hit_tp = (h >= st["entryPrice"] + TP) if st["dir"] == "long" else (l <= st["entryPrice"] - TP)
        def close(price, reason):
            profit = price - st["entryPrice"] if st["dir"] == "long" else st["entryPrice"] - price
            trades.append((sym, st["entryTs"], ts, st["dir"], st["entryPrice"],
                           price, profit, dur, mdd, reason))
            st.update(open=False, duration=dur, maxDD=mdd)
        if hit_sl:
            close(st["entryPrice"] - SL if st["dir"] == "long" else st["entryPrice"] + SL, "sl")
        elif hit_tp:
            close(st["entryPrice"] + TP if st["dir"] == "long" else st["entryPrice"] - TP, "tp")
        elif dur >= MAXDUR:
            close(c, "duration")
        else:
            st.update(duration=dur, maxDD=mdd)
    else:
        signal = pred - c
        entries = [e for e in st["entries"] if e >= ts - CAPWIN]
        if abs(signal) > THRESHOLD and len(entries) < MAXTRADES:
            st.update(open=True, dir="long" if signal > 0 else "short",
                      entryTs=ts, entryPrice=c, duration=0, maxDD=0.0,
                      entries=[ts] + entries)
        else:
            st["entries"] = entries

summ = {}
for t in trades:
    sym, _, _, _, _, _, profit, dur, mdd, _ = t
    s = summ.setdefault(sym, dict(n=0, sp=0.0, sa=0.0, sd=0.0, sm=0.0,
                                  minb=None))
    s["n"] += 1
    s["sp"] += profit
    s["sa"] += abs(profit)
    s["sd"] += float(dur)
    s["sm"] += mdd
    bal = s["sp"]
    s["minb"] = bal if s["minb"] is None else min(s["minb"], bal)

# ---------- DuckDB recursive CTE ----------
WALK = f"""
WITH RECURSIVE bars AS MATERIALIZED (
  SELECT CAST(user_id AS VARCHAR) AS symbol,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         epoch_us(ts) AS ts,
         value * CAST(1.01 AS DOUBLE) AS high,
         value * CAST(0.99 AS DOUBLE) AS low,
         value AS close,
         value + (CAST(json_extract_string(props, '$.k') AS DOUBLE)
                  - CAST(50.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE) AS pred
  FROM events),
walk AS (
  SELECT symbol, CAST(-1 AS BIGINT) AS rn, n,
         false AS is_open, '' AS dir, CAST(0 AS BIGINT) AS entry_ts,
         CAST(0.0 AS DOUBLE) AS entry_price, 0 AS duration,
         CAST(0.0 AS DOUBLE) AS max_dd, CAST([] AS BIGINT[]) AS entries,
         CAST(NULL AS BIGINT) AS t_entry_ts, CAST(NULL AS BIGINT) AS t_exit_ts,
         CAST(NULL AS VARCHAR) AS t_dir, CAST(NULL AS DOUBLE) AS t_entry_price,
         CAST(NULL AS DOUBLE) AS t_exit_price, CAST(NULL AS DOUBLE) AS t_profit,
         CAST(NULL AS INTEGER) AS t_duration, CAST(NULL AS DOUBLE) AS t_max_dd,
         CAST(NULL AS VARCHAR) AS t_reason,
         CAST(0 AS BIGINT) AS n_trades, CAST(0.0 AS DOUBLE) AS sum_profit,
         CAST(0.0 AS DOUBLE) AS sum_abs, CAST(0.0 AS DOUBLE) AS sum_dur,
         CAST(0.0 AS DOUBLE) AS sum_dd, CAST(0.0 AS DOUBLE) AS min_bal
  FROM (SELECT DISTINCT symbol, n FROM bars)
  UNION ALL
  SELECT symbol, rn, n,
    CASE WHEN is_open THEN NOT closing ELSE can_enter END AS is_open,
    CASE WHEN NOT is_open AND can_enter
         THEN (CASE WHEN signal > CAST(0.0 AS DOUBLE) THEN 'long' ELSE 'short' END)
         ELSE dir END AS dir,
    CASE WHEN NOT is_open AND can_enter THEN ts ELSE entry_ts END AS entry_ts,
    CASE WHEN NOT is_open AND can_enter THEN close ELSE entry_price END AS entry_price,
    CASE WHEN is_open THEN dur2
         WHEN can_enter THEN 0 ELSE duration END AS duration,
    CASE WHEN is_open THEN mdd2
         WHEN can_enter THEN CAST(0.0 AS DOUBLE) ELSE max_dd END AS max_dd,
    CASE WHEN is_open THEN entries
         WHEN can_enter THEN list_prepend(ts, entries_f)
         ELSE entries_f END AS entries,
    CASE WHEN closing THEN entry_ts END AS t_entry_ts,
    CASE WHEN closing THEN ts END AS t_exit_ts,
    CASE WHEN closing THEN dir END AS t_dir,
    CASE WHEN closing THEN entry_price END AS t_entry_price,
    CASE WHEN closing THEN exit_price END AS t_exit_price,
    CASE WHEN closing THEN profit END AS t_profit,
    CASE WHEN closing THEN CAST(dur2 AS INTEGER) END AS t_duration,
    CASE WHEN closing THEN mdd2 END AS t_max_dd,
    CASE WHEN closing THEN reason END AS t_reason,
    CASE WHEN closing THEN n_trades + 1 ELSE n_trades END AS n_trades,
    CASE WHEN closing THEN sum_profit + profit ELSE sum_profit END AS sum_profit,
    CASE WHEN closing THEN sum_abs + ABS(profit) ELSE sum_abs END AS sum_abs,
    CASE WHEN closing THEN sum_dur + CAST(dur2 AS DOUBLE) ELSE sum_dur END AS sum_dur,
    CASE WHEN closing THEN sum_dd + mdd2 ELSE sum_dd END AS sum_dd,
    CASE WHEN NOT closing THEN min_bal
         WHEN n_trades = 0 THEN sum_profit + profit
         ELSE LEAST(min_bal, sum_profit + profit) END AS min_bal
  FROM (
    SELECT *,
      CASE WHEN dir = 'long' THEN exit_price - entry_price
           ELSE entry_price - exit_price END AS profit
    FROM (
      SELECT *,
        is_open AND (hit_sl OR hit_tp OR dur2 >= {MAXDUR}) AS closing,
        CASE WHEN hit_sl THEN (CASE WHEN dir = 'long'
                 THEN entry_price - CAST({SL} AS DOUBLE)
                 ELSE entry_price + CAST({SL} AS DOUBLE) END)
             WHEN hit_tp THEN (CASE WHEN dir = 'long'
                 THEN entry_price + CAST({TP} AS DOUBLE)
                 ELSE entry_price - CAST({TP} AS DOUBLE) END)
             ELSE close END AS exit_price,
        CASE WHEN hit_sl THEN 'sl' WHEN hit_tp THEN 'tp' ELSE 'duration' END AS reason
      FROM (
        SELECT *,
          duration + 1 AS dur2,
          CASE WHEN adverse > max_dd THEN adverse ELSE max_dd END AS mdd2,
          CASE WHEN dir = 'long' THEN low <= entry_price - CAST({SL} AS DOUBLE)
               ELSE high >= entry_price + CAST({SL} AS DOUBLE) END AS hit_sl,
          CASE WHEN dir = 'long' THEN high >= entry_price + CAST({TP} AS DOUBLE)
               ELSE low <= entry_price - CAST({TP} AS DOUBLE) END AS hit_tp,
          ABS(signal) > CAST({THRESHOLD} AS DOUBLE)
            AND len(entries_f) < {MAXTRADES} AS can_enter
        FROM (
          SELECT w.symbol, b.rn, w.n, w.is_open, w.dir, w.entry_ts,
                 w.entry_price, w.duration, w.max_dd, w.entries,
                 w.n_trades, w.sum_profit, w.sum_abs, w.sum_dur, w.sum_dd,
                 w.min_bal,
                 b.ts, b.high, b.low, b.close,
                 CASE WHEN w.dir = 'long' THEN w.entry_price - b.low
                      ELSE b.high - w.entry_price END AS adverse,
                 b.pred - b.close AS signal,
                 list_filter(w.entries, e -> e >= b.ts - {CAPWIN}) AS entries_f
          FROM walk w JOIN bars b ON b.symbol = w.symbol AND b.rn = w.rn + 1
        )
      )
    )
  )
)
"""

Q46 = WALK + """
SELECT symbol, t_entry_ts AS entryTs, t_exit_ts AS exitTs, t_dir AS direction,
       t_entry_price AS entryPrice, t_exit_price AS exitPrice,
       t_profit AS profit, t_duration AS durationBars,
       t_max_dd AS maxDrawdown, t_reason AS exitReason
FROM walk WHERE t_reason IS NOT NULL
ORDER BY symbol, entryTs"""

Q47 = WALK + """
SELECT symbol, n_trades,
       sum_profit / CAST(n_trades AS DOUBLE) AS avg_profit,
       sum_abs / CAST(n_trades AS DOUBLE) AS avg_abs_profit,
       sum_dur / CAST(n_trades AS DOUBLE) AS avg_duration,
       sum_dd / CAST(n_trades AS DOUBLE) AS avg_max_dd,
       min_bal AS min_balance, sum_profit AS total_profit
FROM walk WHERE rn = n - 1 AND n_trades > 0
ORDER BY symbol"""

got46 = con.execute(Q46).fetchall()
exp46 = sorted(trades, key=lambda t: (t[0], t[1]))
print("q46 rows:", len(got46), "expected:", len(exp46))
bad = 0
for g, e in zip(got46, exp46):
    for i, (a, b) in enumerate(zip(g, e)):
        if isinstance(b, float):
            if np.float64(a).tobytes() != np.float64(b).tobytes():
                bad += 1
                if bad < 5: print("q46 MISMATCH col", i, repr(a), repr(b), g)
        elif a != b:
            bad += 1
            if bad < 5: print("q46 MISMATCH col", i, a, b, g)
print("q46 bitwise mismatches:", bad)

got47 = con.execute(Q47).fetchall()
print("q47 rows:", len(got47), "expected:", len(summ))
bad = 0
for g in got47:
    sym = g[0]
    s = summ[sym]
    exp = (s["n"], s["sp"] / float(s["n"]), s["sa"] / float(s["n"]),
           s["sd"] / float(s["n"]), s["sm"] / float(s["n"]), s["minb"], s["sp"])
    for i, (a, b) in enumerate(zip(g[1:], exp)):
        if isinstance(b, float):
            if np.float64(a).tobytes() != np.float64(b).tobytes():
                bad += 1
                if bad < 5: print("q47 MISMATCH", sym, i, repr(a), repr(b))
        elif a != b:
            bad += 1
            if bad < 5: print("q47 MISMATCH", sym, i, a, b)
print("q47 bitwise mismatches:", bad)
