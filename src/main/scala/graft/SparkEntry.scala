package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.backtest.Backtest
import graft.decomp.{Multitaper, StlMirrorable, Wavelet}
import graft.dedup.Dedup
import graft.feature.Windows
import graft.functions.GraftFunctions
import graft.io.Sources
import graft.olap.OlapEtl
import graft.similarity.Similarity
import graft.target.Targets
import graft.text.TextAnalysis
import graft.ts.{AsOfJoin, TS}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the large-scale data-pipeline extensions), each with a
  * DuckDB-equivalent `oracleSql` on the same parquet tables.
  *
  * Determinism engineering (so a DuckDB hash-compare is exact):
  *  - big-sum aggregates go through a per-row DECIMAL(18,s) cast, summed
  *    exactly, cast back to double (associative ⇒ order-independent);
  *  - per-row transcendental results are rounded to 6 dp (libm vs JVM can
  *    differ in the last ulp);
  *  - every window order has a total tie-break key.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Sources.table(s, dir, name)

  /** Bounded deterministic ANN fit-sample size (q53/q87/q88/q92): the
    * mirrorable kmeans fits train on the `AnnFitLimit` smallest vec_ids
    * (`ORDER BY vec_id LIMIT n` — the same CTE appears in the oracle
    * SQL, so the sample is hash-exact at any SF). At 100 TB the index
    * build pays one tiny fit + one encode scan instead of `iters`+1
    * full-corpus explosions; at SFs where the corpus is smaller than
    * the limit the sample IS the corpus and results are unchanged.
    */
  private val AnnFitLimit = 1024

  /** Order-independent exact sum: per-row decimal cast → exact decimal sum
    * → double. Matches `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`.
    */
  private def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Session-tz-independent date-boundary literal: midnight of `day`
    * as a UTC instant. A bare `lit("1999-12-31")` compared to a
    * timestamp column is cast in the SESSION timezone, silently moving
    * the cutoff by the tz offset (the q19 bug class — surfaced by the
    * driver-like gate once the regenerated testdata had rows within
    * ±5:30 of a boundary). The stored naive micros read as UTC
    * instants, so the pinned boundary matches DuckDB's naive compare
    * under any session tz. */
  private def utcDay(day: String): Column =
    timestamp_millis(lit(java.time.Instant.parse(day + "T00:00:00Z").toEpochMilli))

  /** Per-user-series ordered window over `events` with total ordering. */
  private def evWindow =
    Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  // ───────────────────────── relational core ─────────────────────────

  /** A7-style grouped aggregate + P4 filter pushdown (TPC-H Q1 shape). */
  private def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= utcDay("1999-12-31"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
      | COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** P1-P4: projection + predicate pushdown into the parquet scan. */
  private def q02(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate").between(utcDay("1998-01-01"), utcDay("1998-03-31")) &&
        col("l_discount") > 0.05)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1998-01-01' AND TIMESTAMP '1998-03-31'
      |  AND l_discount > 0.05""".stripMargin

  /** J5 star-schema joins, dims broadcast (revenue per region/nation). */
  private def q03(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))

  private val q03Sql =
    """SELECT r_name, n_name,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      | COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  /** W15/top-k: global ordered limit with total tie-break. */
  private def q04(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  private val q04Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** A12/distinct: exact dedup cardinality on a compound key. */
  private def q05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
      .distinct()
      .agg(count(lit(1)).as("n"))

  private val q05Sql =
    """SELECT COUNT(*) AS n FROM
      |(SELECT DISTINCT l_orderkey, l_partkey, l_suppkey FROM lineitem)""".stripMargin

  /** Set-op union (unionByName) then re-aggregate. */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.filter(col("o_orderdate") < lit("1998-01-01"))
      .unionByName(o.filter(col("o_orderdate") >= lit("1998-01-01")))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
  }

  private val q06Sql =
    """SELECT o_orderstatus, COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
      |FROM (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |      UNION ALL
      |      SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
      |GROUP BY o_orderstatus""".stripMargin

  /** Semi/anti joins (J1 intersection semantics). */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n_with_orders"))
    val withoutO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_without_orders"))
    withO.crossJoin(withoutO)
  }

  private val q07Sql =
    """SELECT
      | (SELECT COUNT(*) FROM customer c WHERE EXISTS
      |   (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with_orders,
      | (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
      |   (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without_orders""".stripMargin

  /** Ranked window (row_number) — biggest order per customer. */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
  }

  private val q08Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM
      |(SELECT o_custkey, o_orderkey, o_totalprice,
      |  ROW_NUMBER() OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders) WHERE rn = 1""".stripMargin

  // ──────────────────── time-series kernel (events) ────────────────────

  /** F9 log returns per user series. */
  private def q10(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"), col("user_id"),
      round(TS.logReturn(col("value"), evWindow), 6).as("log_ret"))

  private val q10Sql =
    """SELECT event_id, user_id,
      | ROUND(CASE WHEN prev IS NULL OR prev <= 0 OR value <= 0 THEN 0
      |            ELSE LN(value / prev) END, 6) + 0.0 AS log_ret
      |FROM (SELECT event_id, user_id, value,
      |        LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |      FROM events)""".stripMargin

  /** F10 first difference per user series (exact doubles, no rounding). */
  private def q11(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"), col("user_id"),
      TS.firstDiff(col("value"), evWindow).as("diff"))

  private val q11Sql =
    """SELECT event_id, user_id,
      | COALESCE(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) AS diff
      |FROM events""".stripMargin

  /** W6 multi-horizon direct targets with common max-horizon trim. */
  private def q12(s: SparkSession, dir: String): DataFrame =
    Targets.multiHorizon(
        t(s, dir, "events").select("event_id", "user_id", "ts", "value"),
        "value", Seq(1, 3, 6), evWindow)
      .select("event_id", "user_id", "value", "target_h1", "target_h3", "target_h6")

  private val q12Sql =
    """SELECT event_id, user_id, value, target_h1, target_h3, target_h6 FROM
      |(SELECT event_id, user_id, value,
      |  LEAD(value, 1) OVER w AS target_h1,
      |  LEAD(value, 3) OVER w AS target_h3,
      |  LEAD(value, 6) OVER w AS target_h6
      | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |WHERE target_h6 IS NOT NULL""".stripMargin

  /** W7 return targets value(t+h) − value(t) with trim. */
  private def q13(s: SparkSession, dir: String): DataFrame =
    Targets.multiHorizonReturns(
        t(s, dir, "events").select("event_id", "user_id", "ts", "value"),
        "value", Seq(1, 3), evWindow)
      .select("event_id", "user_id", "ret_h1", "ret_h3")

  private val q13Sql =
    """SELECT event_id, user_id, ret_h1, ret_h3 FROM
      |(SELECT event_id, user_id,
      |  LEAD(value, 1) OVER w - value AS ret_h1,
      |  LEAD(value, 3) OVER w - value AS ret_h3,
      |  LEAD(value, 3) OVER w AS trim3
      | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |WHERE trim3 IS NOT NULL""".stripMargin

  /** W13 rolling stats (trailing 12 rows) + multi-scale period return. */
  private def q14(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"), col("user_id"),
      round(TS.rollingAvg(col("value"), evWindow, 12), 6).as("roll_avg_12"),
      round(coalesce(TS.rollingStd(col("value"), evWindow, 12), lit(0.0)), 6).as("roll_std_12"),
      coalesce(TS.periodReturn(col("value"), evWindow, 6), lit(0.0)).as("ret_6"))

  private val q14Sql =
    """SELECT event_id, user_id,
      | ROUND(AVG(value) OVER w12, 6) + 0.0 AS roll_avg_12,
      | ROUND(COALESCE(STDDEV_POP(value) OVER w12, 0), 6) + 0.0 AS roll_std_12,
      | COALESCE(value - LAG(value, 6) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) AS ret_6
      |FROM events
      |WINDOW w12 AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)""".stripMargin

  /** F11 cyclic time encodings. hour/day-of-week come from epoch-µs
    * arithmetic, NOT `hour()`/`dayofweek()`: those are session-timezone
    * dependent and produce different encodings on a harness that doesn't
    * pin `spark.sql.session.timeZone` (same class of bug as the q19
    * tz-aware-vs-naive timestamp fix). Epoch day 0 = Thursday, so
    * `(days + 4) % 7` reproduces the Sunday=0 numbering of EXTRACT(dow).
    */
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val aus = unix_micros(col("ts"))
    val hod = floor(aus / lit(3600000000L)) % 24
    val dow = (floor(aus / lit(86400000000L)) + 4) % 7
    t(s, dir, "events").select(
      col("event_id"),
      round(TS.cyclicSin(hod, 24), 6).as("hod_sin"),
      round(TS.cyclicCos(hod, 24), 6).as("hod_cos"),
      round(TS.cyclicSin(dow, 7), 6).as("dow_sin"))
  }

  private val q15Sql =
    """SELECT event_id,
      | ROUND(SIN(((epoch_us(ts) // 3600000000) % 24) * (2 * PI() / 24)), 6) + 0.0 AS hod_sin,
      | ROUND(COS(((epoch_us(ts) // 3600000000) % 24) * (2 * PI() / 24)), 6) + 0.0 AS hod_cos,
      | ROUND(SIN((((epoch_us(ts) // 86400000000) + 4) % 7) * (2 * PI() / 7)), 6) + 0.0 AS dow_sin
      |FROM events""".stripMargin

  /** F7/F8 log1p variants. */
  private def q16(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      round(TS.symLog1p(col("value") - 100), 6).as("symlog"),
      round(TS.log1pClamp(col("value") - 100), 6).as("logclamp"))

  private val q16Sql =
    """SELECT event_id,
      | ROUND(SIGN(value - 100) * LN(1 + ABS(value - 100)), 6) + 0.0 AS symlog,
      | ROUND(LN(1 + GREATEST(0, value - 100)), 6) + 0.0 AS logclamp
      |FROM events""".stripMargin

  /** A1/F3/J3: z-score with stats fit on the "train" date range only,
    * applied to all rows via broadcast join (no leakage).
    */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    // epoch-µs comparison: `ts < '2024-01-20'` would parse the string in
    // the SESSION timezone and shift the train/apply split off the oracle's
    // naive-UTC boundary. 1705708800000000 = 2024-01-20T00:00:00Z.
    val stats = ev.filter(unix_micros(col("ts")) < lit(1705708800000000L))
      .groupBy(col("event_type"))
      .agg(avg(col("value")).as("mu"), stddev_pop(col("value")).as("sigma"))
    ev.join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"),
        round((col("value") - col("mu")) /
          when(col("sigma") < 1e-8, 1.0).otherwise(col("sigma")), 6).as("z"))
  }

  private val q17Sql =
    """SELECT event_id, e.event_type,
      | ROUND((value - mu) / (CASE WHEN sigma < 1e-8 THEN 1 ELSE sigma END), 6) + 0.0 AS z
      |FROM events e JOIN
      | (SELECT event_type, AVG(value) AS mu, STDDEV_POP(value) AS sigma
      |  FROM events WHERE ts < TIMESTAMP '2024-01-20' GROUP BY event_type) s
      |ON e.event_type = s.event_type""".stripMargin

  /** F4 min-max (de)normalization as a driver query (previously
    * spec+parity only): per-type min/max fit on the pre-2024-01-20
    * train slice (the A1 fit-on-train pattern), broadcast-applied like
    * q17, with the zero-range→divide-by-1 guard; the denormalized
    * round-trip column must reproduce the raw value through the same
    * float ops on both engines.
    */
  private def q106(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val stats = ev.filter(unix_micros(col("ts")) < lit(1705708800000000L))
      .groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val range = when(abs(col("hi") - col("lo")) < 1e-12, lit(1.0))
      .otherwise(col("hi") - col("lo"))
    ev.join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"),
        round((col("value") - col("lo")) / range, 6).as("mm"),
        round(((col("value") - col("lo")) / range) * range + col("lo"), 6).as("roundtrip"))
  }

  private val q106Sql =
    """SELECT event_id, e.event_type,
      | ROUND((value - lo) / r, 6) + 0.0 AS mm,
      | ROUND(((value - lo) / r) * r + lo, 6) + 0.0 AS roundtrip
      |FROM events e JOIN
      | (SELECT event_type, MIN(value) AS lo,
      |    CASE WHEN ABS(MAX(value) - MIN(value)) < 1e-12 THEN 1
      |         ELSE MAX(value) - MIN(value) END AS r
      |  FROM events WHERE ts < TIMESTAMP '2024-01-20' GROUP BY event_type) s
      |ON e.event_type = s.event_type""".stripMargin

  /** W9 daily multi-step targets as a driver query (previously
    * spec-only): from an hourly-style series, step d lands at
    * `t + d·24` (`Targets.dailySteps`, reference
    * `data_processor copy.py:87-123`), trimmed at the last day. Values
    * are copied, not computed — hash-exact. One window pass (Catalyst
    * collapses both leads onto the same sort), partitioned on the
    * series key: the 100 TB axis is the series count.
    */
  private def q107(s: SparkSession, dir: String): DataFrame =
    graft.target.Targets.dailySteps(
        t(s, dir, "events").select("event_id", "user_id", "ts", "value"),
        "value", days = 2, evWindow, stepsPerDay = 24)
      .select("user_id", "event_id", "target_d1", "target_d2")

  private val q107Sql =
    """SELECT user_id, event_id, target_d1, target_d2 FROM (
      |  SELECT user_id, event_id,
      |    LEAD(value, 24) OVER w AS target_d1,
      |    LEAD(value, 48) OVER w AS target_d2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |WHERE target_d2 IS NOT NULL""".stripMargin

  /** A8 Monte-Carlo predictive mean/uncertainty as a driver query
    * (previously spec-only): the MC sample axis exploded into rows —
    * `passes` deterministic pseudo-predictions per event (a seeded
    * integer hash stands in for the dropout mask; the container has no
    * TF, and the oracle needs the same bits) — then one grouped
    * avg/stddev_pop back to the row grain (reference
    * `common/bayesian.py:70-134`; the sequential Welford kernel the ML
    * boundary uses is spec'd ≡ to this aggregate in `McDropoutSpec`).
    * Map-side partial aggregation folds the pass axis before any
    * shuffle, so the wire carries one row per event, not per pass.
    */
  private def q108(s: SparkSession, dir: String): DataFrame = {
    val passes = 10
    t(s, dir, "events")
      .select(col("event_id"), col("value"),
        explode(sequence(lit(0L), lit(passes - 1L))).as("p"))
      .withColumn("mc_pred",
        col("value") +
          pmod(col("event_id") * (col("p") + lit(7L)), lit(13L)).cast("double") / lit(10.0))
      .groupBy(col("event_id"))
      .agg(
        round(avg(col("mc_pred")), 6).as("mc_mean"),
        round(stddev_pop(col("mc_pred")), 6).as("mc_unc"))
  }

  private val q108Sql =
    """SELECT event_id,
      | ROUND(AVG(mc_pred), 6) + 0.0 AS mc_mean,
      | ROUND(STDDEV_POP(mc_pred), 6) + 0.0 AS mc_unc
      |FROM (SELECT event_id,
      |        value + CAST((event_id * (p + 7)) % 13 AS DOUBLE) / 10.0 AS mc_pred
      |      FROM events CROSS JOIN (SELECT UNNEST(range(10)) AS p))
      |GROUP BY event_id""".stripMargin

  /** F5 delta/uncertainty rescale + F13 prediction scaling in one
    * normalization query (previously spec-only): per-type stats fit on
    * the pre-2024-01-20 train slice (the A1/q17 pattern), broadcast
    * back, then three scale-only columns over the one-step delta —
    * `delta · σ` (F5 mean/std form, `stl_norm.py:119-170`
    * `denormalize_returns` incl. its σ=0 → unchanged guard),
    * `|delta| · (max−min)` (F5 min/max uncertainty form, same guard),
    * and `delta / target_scaling_factor` (F13,
    * `app/data_processor.py:336-341`, default factor 100). No offset
    * anywhere — deltas rescale linearly.
    */
  private def q109(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val stats = ev.filter(unix_micros(col("ts")) < lit(1705708800000000L))
      .groupBy(col("event_type"))
      .agg(stddev_pop(col("value")).as("sigma"),
        (max(col("value")) - min(col("value"))).as("range"))
    val invScale = 1.0 / 100.0
    ev.withColumn("delta", lead(col("value"), 1).over(evWindow) - col("value"))
      .filter(col("delta").isNotNull)
      .join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"),
        round(col("delta") *
          when(col("sigma") === 0.0, 1.0).otherwise(col("sigma")), 6).as("delta_px_std"),
        round(abs(col("delta")) *
          when(col("range") === 0.0, 1.0).otherwise(col("range")), 6).as("unc_px_range"),
        round(col("delta") * lit(invScale), 6).as("pred_scaled"))
  }

  private val q109Sql =
    """SELECT event_id, e.event_type,
      | ROUND(delta * (CASE WHEN sigma = 0 THEN 1 ELSE sigma END), 6) + 0.0 AS delta_px_std,
      | ROUND(ABS(delta) * (CASE WHEN r = 0 THEN 1 ELSE r END), 6) + 0.0 AS unc_px_range,
      | ROUND(delta * CAST(0.01 AS DOUBLE), 6) + 0.0 AS pred_scaled
      |FROM (SELECT event_id, event_type,
      |        LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) - value AS delta
      |      FROM events) e
      |JOIN (SELECT event_type, STDDEV_POP(value) AS sigma,
      |        MAX(value) - MIN(value) AS r
      |      FROM events WHERE ts < TIMESTAMP '2024-01-20' GROUP BY event_type) s
      |ON e.event_type = s.event_type
      |WHERE delta IS NOT NULL""".stripMargin

  /** Legacy OLAP fact_predictions end-to-end as a driver query: the S7
    * wide prediction shape (`DATE_TIME, test_CLOSE, Target_H{h},
    * Prediction_H{h}, Uncertainty_H{h}` — `stl_io.py:16-117`) is
    * synthesized per user from events (targets are leads; predictions/
    * uncertainties derive from the JSON signal with exact-decimal
    * arithmetic), melted to the `fact_predictions` grain
    * (`olap_schema_postgres.sql:54-64`) by `OlapEtl.meltPredictions`,
    * FK-resolved against the seeded `dim_horizon` (broadcast), and
    * rolled up to one MAE/uncertainty row per (experiment, horizon) —
    * exact via the dsum decimal discipline. Scale: the melt is a
    * Generate (no shuffle), the dim join broadcasts 6 rows, and the
    * rollup is a partial-agg'd groupBy on the (series × horizon) grain.
    */
  private def q110(s: SparkSession, dir: String): DataFrame = {
    val horizons = Seq(1, 3, 6)
    val base = t(s, dir, "events").select(
      col("user_id"), col("event_id"), col("ts"), col("value"),
      (get_json_object(col("props"), "$.k").cast("double") - lit(50.0)).as("sig"))
    val wide0 = horizons.foldLeft(base) { (d, h) =>
      d.withColumn(s"Target_H$h", lead(col("value"), h).over(evWindow))
        .withColumn(s"Prediction_H$h", col("value") + col("sig") * lit(h.toDouble))
        .withColumn(s"Uncertainty_H$h", abs(col("sig")) * lit(h.toDouble) / lit(4.0))
    }
    val wide = wide0.filter(col(s"Target_H${horizons.max}").isNotNull)
      .withColumnRenamed("ts", "DATE_TIME")
      .withColumn("test_CLOSE", col("value"))
    val fact = graft.olap.OlapEtl.meltPredictions(wide, None, col("user_id"))
    fact.join(broadcast(graft.olap.OlapEtl.dimHorizon(s)), "horizon_key")
      .groupBy(col("experiment_key"), col("horizon_key"))
      .agg(
        (dsum(abs(col("prediction_value") - col("target_value"))) / count(lit(1))).as("mae"),
        dsum(col("uncertainty")).as("total_unc"),
        count(lit(1)).as("n"))
  }

  private val q110Sql =
    """WITH wide AS (
      |  SELECT user_id, value,
      |    CAST(json_extract_string(props, '$.k') AS DOUBLE) - 50.0 AS sig,
      |    LEAD(value, 1) OVER w AS t1,
      |    LEAD(value, 3) OVER w AS t3,
      |    LEAD(value, 6) OVER w AS t6
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |fact AS (
      |  SELECT CAST(user_id AS VARCHAR) AS experiment_key, h.horizon_key,
      |    CASE h.horizon_key WHEN 1 THEN t1 WHEN 3 THEN t3 ELSE t6 END AS target_value,
      |    value + sig * CAST(h.horizon_key AS DOUBLE) AS prediction_value,
      |    ABS(sig) * CAST(h.horizon_key AS DOUBLE) / 4.0 AS uncertainty
      |  FROM wide CROSS JOIN (VALUES (1), (3), (6)) h(horizon_key)
      |  WHERE t6 IS NOT NULL)
      |SELECT experiment_key, horizon_key,
      |  CAST(SUM(CAST(ABS(prediction_value - target_value) AS DECIMAL(18,6))) AS DOUBLE)
      |    / COUNT(*) AS mae,
      |  CAST(SUM(CAST(uncertainty AS DECIMAL(18,6))) AS DOUBLE) AS total_unc,
      |  COUNT(*) AS n
      |FROM fact
      |WHERE horizon_key IN (SELECT UNNEST(range(1, 7)))
      |GROUP BY experiment_key, horizon_key""".stripMargin

  /** W16/A2 naive-forecast MAE per series (exact via decimal sums). */
  private def q18(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .withColumn("nxt", lead(col("value"), 1).over(evWindow))
      .filter(col("nxt").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        (dsum(abs(col("nxt") - col("value"))) / count(lit(1))).as("naive_mae"),
        count(lit(1)).as("n"))
  }

  private val q18Sql =
    """SELECT user_id,
      | CAST(SUM(CAST(ABS(nxt - value) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS naive_mae,
      | COUNT(*) AS n
      |FROM (SELECT user_id, value,
      |        LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      |      FROM events)
      |WHERE nxt IS NOT NULL GROUP BY user_id""".stripMargin

  /** F2 hourly resample. The bucket is computed and emitted as epoch-µs
    * (long) truncated by integer arithmetic, NOT `date_trunc("hour")`:
    * date_trunc works in the session timezone, so a half-hour-offset
    * harness (e.g. +05:30) shifts every bucket boundary; epoch division
    * is engine- and environment-independent.
    */
  private def q19(s: SparkSession, dir: String): DataFrame = {
    val hourUs = (floor(unix_micros(col("ts")) / lit(3600000000L)) * 3600000000L)
      .cast("long")
    t(s, dir, "events")
      .groupBy(col("user_id"), hourUs.as("hour_us"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
  }

  private val q19Sql =
    """SELECT user_id, (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** J6 backward as-of join: latest prior 'error' value at each purchase.
    * The right side is deduped to one row per (user_id, ts) — max value —
    * BEFORE the join on all three paths (composable, native, oracle):
    * DuckDB's ASOF leaves the choice among duplicate right timestamps
    * unspecified, so without the dedup the oracle compare would be
    * data-dependent flaky rather than a semantics check.
    */
  private def q21(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val errors = ev.filter(col("event_type") === "error")
      .groupBy("user_id", "ts").agg(max(col("value")).as("value"))
    AsOfJoin.backward(purchases, errors, Seq("user_id"), "ts", "value", "last_error_value")
      .select("event_id", "user_id", "value", "last_error_value")
  }

  private val q21Sql =
    """SELECT p.event_id, p.user_id, p.value, e.value AS last_error_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, ts, MAX(value) AS value FROM events
      |                WHERE event_type = 'error' GROUP BY user_id, ts) e
      |  ON p.user_id = e.user_id AND p.ts >= e.ts""".stripMargin

  /** J6 again, through the CUSTOM PHYSICAL OPERATOR (AsOfJoinExec:
    * LogicalPlan + Strategy + one-pass sort-merge SparkPlan) — same
    * semantics and oracle as q21, different execution path.
    */
  private def q57(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ats"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("ats"))
      .agg(max(col("value")).as("err_v"))
    graft.plans.AsOfJoinNative
      .backward(purchases, errors, "user_id", "ats", "err_v", "last_error_value")
      .select("event_id", "user_id", "value", "last_error_value")
  }

  /** A11 rolling event-time count: purchases per user in trailing 5 days. */
  private def q22(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-432000000000L, 0)
    t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), count(lit(1)).over(w).as("n_5d"))
  }

  private val q22Sql =
    """SELECT event_id, user_id,
      | COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |   RANGE BETWEEN 432000000000 PRECEDING AND CURRENT ROW) AS n_5d
      |FROM events WHERE event_type = 'purchase'""".stripMargin

  /** W12 overlap-add un-windowing: embeddings as overlapping windows
    * (windowId = vec_id), reconstruct sum/coverage per position.
    */
  private def q20(s: SparkSession, dir: String): DataFrame = {
    val win = t(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("win"))
    Windows.overlapAdd(win, "vec_id", "win")
      .select(col("pos"), round(col("value"), 6).as("value"))
  }

  private val q20Sql =
    """SELECT vec_id + i - 1 AS pos,
      | ROUND(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
      |   / COUNT(*), 6) + 0.0 AS value
      |FROM (SELECT vec_id, unnest(embedding) AS x,
      |        generate_subscripts(embedding, 1) AS i
      |      FROM embeddings)
      |GROUP BY vec_id + i - 1""".stripMargin

  /** A3 R² of the naive zero-return forecast, per series (exact via
    * decimal sums: R² = 1 − Σr² / (Σr² − (Σr)²/n)).
    */
  private def q25(s: SparkSession, dir: String): DataFrame = {
    val withRet = t(s, dir, "events")
      .withColumn("r", lead(col("value"), 1).over(evWindow) - col("value"))
      .filter(col("r").isNotNull)
    withRet.groupBy(col("user_id"))
      .agg(
        (lit(1.0) - dsum(col("r") * col("r")) /
          (dsum(col("r") * col("r")) - dsum(col("r")) * dsum(col("r")) / count(lit(1))))
          .as("r2_naive"),
        count(lit(1)).as("n"))
  }

  private val q25Sql =
    """SELECT user_id,
      | 1.0 - CAST(SUM(CAST(r * r AS DECIMAL(18,6))) AS DOUBLE)
      |   / (CAST(SUM(CAST(r * r AS DECIMAL(18,6))) AS DOUBLE)
      |      - CAST(SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE)
      |        * CAST(SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) AS r2_naive,
      | COUNT(*) AS n
      |FROM (SELECT user_id,
      |        LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) - value AS r
      |      FROM events)
      |WHERE r IS NOT NULL GROUP BY user_id""".stripMargin

  /** Exact linear-interpolation percentiles per group (sort-based
    * aggregate; Spark `percentile` ≡ DuckDB `quantile_cont`). The ORACLE
    * path: it buffers every group value on one reducer, which a hot
    * group kills at 100× — q61 is the sketch-based default for scale.
    */
  private def q60(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))

  private val q60Sql =
    """SELECT event_type,
      | ROUND(quantile_cont(value, 0.5), 6) + 0.0 AS p50,
      | ROUND(quantile_cont(value, 0.9), 6) + 0.0 AS p90,
      | ROUND(quantile_cont(value, 0.99), 6) + 0.0 AS p99
      |FROM events GROUP BY event_type""".stripMargin

  private val Q61Ps = Seq(0.5, 0.9, 0.99)
  private val Q61Accuracy = 10000

  /** The raw sketch relation behind q61 (and the percentile
    * differential): one `approx_percentile` per (event_type, p).
    */
  private def q61Approx(s: SparkSession, dir: String): DataFrame =
    graft.metrics.Quantiles.groupedApprox(
      t(s, dir, "events"), Seq("event_type"), "value", Q61Ps, Q61Accuracy)

  /** Scale-path percentiles: approx_percentile quantile sketch — bounded
    * memory per group, partial-merge across partitions. The sketch's
    * VALUES are engine-specific by construction (no DuckDB-matchable
    * bits), so the driver-checkable output is the sketch's Greenwald-
    * Khanna CONTRACT instead: per (group, p), the exact rank interval
    * of the returned value must sit within n/accuracy (+1 interpolation
    * rank) of the target rank p·n. Computed distributedly — the
    * #groups × #ps approx rows broadcast back onto events, one grouped
    * count pass — and emitted as `within_bound`; the oracle asserts the
    * same rows with TRUE, so a sketch contract violation is a driver
    * hash FAIL, not a silent `err` row. The quantitative verdict (max
    * rank-error fraction) additionally lands in differential.json via
    * [[percentileDifferential]].
    */
  private def q61(s: SparkSession, dir: String): DataFrame =
    sketchRankVerdict(t(s, dir, "events"),
      stackSketch(q61Approx(s, dir), Q61Ps),
      col("n") / lit(Q61Accuracy.toDouble) + lit(1.0))

  /** (group, p₁..pₖ wide) sketch relation → stacked (event_type, p, av)
    * rows, one per (group, p) — the shape [[sketchRankVerdict]] joins
    * back onto the events.
    *
    * OPT-r17 (guide §2.4): spelled as ONE explode over the wide row, not
    * a k-way `unionByName` of selects — Spark does not dedupe common
    * subtrees, so the union form re-computed the ENTIRE sketch
    * aggregation (and its scan of the raw feed) once per quantile:
    * q115's plan carried 7 parquet scans, q61/q117 4 each. Same rows,
    * same values (each branch read the same wide columns); the sketch
    * now aggregates once.
    */
  private def stackSketch(wide: DataFrame, ps: Seq[Double]): DataFrame =
    wide.select(col("event_type"),
        explode(array(ps.map(p => struct(lit(p).as("p"),
          col(graft.metrics.Quantiles.label(p)).as("av"))): _*)).as("__pav"))
      .select(col("event_type"), col("__pav.p").as("p"),
        col("__pav.av").as("av"))

  /** Shared contract-as-data verdict for sketch-valued percentile
    * queries (q61/q115): sketch VALUES are merge-order-specific, so the
    * driver-checkable output is the exact rank interval of each
    * returned value vs the sketch's rank-error `bound` (a Column over
    * `n`/`p`). Distributed: the #groups × #ps sketch rows broadcast
    * back onto the events, one grouped count pass — no per-group value
    * buffering anywhere, so the check itself holds at 100 TB. NULL
    * values are excluded from `n` exactly as the sketches exclude them
    * (approx_percentile ignores nulls; `TDigest.grouped` filters them)
    * — counting them would inflate the rank target p·n against
    * rle/rlt sums that can never see a null.
    */
  private def sketchRankVerdict(ev: DataFrame, stacked: DataFrame,
      bound: Column): DataFrame = {
    val target = col("p") * col("n")
    val err = when(target < col("rlt") + lit(1L), col("rlt") + lit(1L) - target)
      .when(target > col("rle"), target - col("rle"))
      .otherwise(lit(0.0))
    ev.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .join(broadcast(stacked), "event_type")
      .groupBy(col("event_type"), col("p"))
      .agg(
        sum(when(col("value") <= col("av"), 1L).otherwise(0L)).as("rle"),
        sum(when(col("value") < col("av"), 1L).otherwise(0L)).as("rlt"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("p"), col("n"),
        bound.as("err_bound_ranks"),
        (err <= bound).as("within_bound"))
  }

  private def q61Sql =
    s"""SELECT event_type, CAST(p AS DOUBLE) AS p,
       | CAST(COUNT(*) AS BIGINT) AS n,
       | CAST(COUNT(*) AS DOUBLE) / CAST(${Q61Accuracy}.0 AS DOUBLE)
       |   + CAST(1.0 AS DOUBLE) AS err_bound_ranks,
       | TRUE AS within_bound
       |FROM events
       |CROSS JOIN (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
       |            (CAST(0.99 AS DOUBLE))) t(p)
       |WHERE value IS NOT NULL
       |GROUP BY event_type, p""".stripMargin

  private val Q113Compression = 20.0

  /** VALUE-exact t-digest percentiles — the q61 companion row: q61
    * proves the sketch CONTRACT (rank bound) because approx_percentile's
    * values are engine-specific, while this query's values are not. The
    * construction is `TDigest.sortedStep`'s deterministic ascending
    * fold: per user, values stream in sorted order through a
    * merge-into-last-centroid rule whose k₁ bound is computed against
    * the group's TOTAL weight (a broadcast count join supplies it — the
    * fit-statistic pattern, like the scaler paths) — a per-group
    * sequential state machine with a fixed IEEE op order, so DuckDB
    * replays it bit-exactly ([[graft.oracle.TDigestOracle]], prototyped
    * in `tools/proto_tdigest_oracle.py`). Physical plan is the
    * `Backtest.run` pattern: repartition(user_id) +
    * sortWithinPartitions + one `mapPartitions` pass with O(centroids)
    * state per group — groups are never buffered, parallelism is the
    * user dimension, and the same fold would stream a 100 TB feed.
    * `n_centroids` is emitted so the merge/append DECISION sequence is
    * hash-checked, not just the final interpolation.
    */
  private def q113(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Q113Compression
    val ev = t(s, dir, "events").select(col("user_id"), col("value"))
    val counts = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    ev.join(broadcast(counts), "user_id")
      .select(col("user_id"), col("value"), col("n"))
      .as[(Long, Double, Long)]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("value"))
      .mapPartitions { it =>
        new Iterator[(Long, Int, Double, Double, Double)] {
          private var cur = 0L
          private var open = false
          private val m = scala.collection.mutable.ArrayBuffer.empty[Double]
          private val w = scala.collection.mutable.ArrayBuffer.empty[Double]
          private var wsum = 0.0
          private var out: Option[(Long, Int, Double, Double, Double)] = None
          private def emit(): (Long, Int, Double, Double, Double) = {
            val ma = m.toArray; val wa = w.toArray
            val r = (cur, ma.length,
              graft.metrics.TDigest.quantile(ma, wa, 0.5),
              graft.metrics.TDigest.quantile(ma, wa, 0.9),
              graft.metrics.TDigest.quantile(ma, wa, 0.99))
            m.clear(); w.clear(); wsum = 0.0
            r
          }
          override def hasNext: Boolean = {
            while (out.isEmpty && it.hasNext) {
              val (uid, x, n) = it.next()
              if (!open) { cur = uid; open = true }
              else if (uid != cur) { out = Some(emit()); cur = uid }
              wsum = graft.metrics.TDigest.sortedStep(m, w, wsum, x, n.toDouble, c)
            }
            if (out.isEmpty && open && m.nonEmpty) { out = Some(emit()); open = false }
            out.nonEmpty
          }
          override def next(): (Long, Int, Double, Double, Double) = {
            if (!hasNext) throw new NoSuchElementException
            val r = out.get; out = None; r
          }
        }
      }
      .toDF("user_id", "n_centroids", "p50", "p90", "p99")
  }

  private[graft] val Q115Ps = Seq(0.5, 0.9, 0.99)
  private[graft] val Q115Compression = 100.0

  /** The raw mergeable-digest relation behind q115 (and the t-digest
    * differential / merge-invariance spec): one [[graft.metrics.TDigest.QuantilesAgg]]
    * UDAF sketch per event_type.
    */
  private[graft] def q115Digest(s: SparkSession, dir: String): DataFrame =
    graft.metrics.TDigest.grouped(
      t(s, dir, "events"), Seq("event_type"), "value", Q115Ps, Q115Compression)

  /** MERGEABLE t-digest percentiles — the distributed shape for
    * quantiles over one giant key, completing the percentile triptych:
    * q60 exact (oracle-only at scale), q61 approx_percentile (GK
    * contract), q113 value-exact sequential fold (per-key state
    * machine). This one is the shape you'd actually run when a single
    * group holds 10¹⁰ values: `TDigest.QuantilesAgg` reduces map-side
    * partials and merges them across the exchange like any built-in
    * aggregate — bounded memory per group, no value buffering, no
    * sort. The digest's VALUES depend on the merge tree (partition
    * boundaries), so the driver-checkable output is the t-digest
    * CONTRACT via [[sketchRankVerdict]]: the returned value's exact
    * rank interval must sit within 8·n·p(1−p)/δ + 2 ranks of the
    * target rank p·n — the quantile interpolates between two adjacent
    * centroids, each k₁-capped at 4·n·q(1−q)/δ (`TDigest.compress`),
    * so their half-weight sum is ≤ one cap; the factor-2 slack absorbs
    * merge-tree degradation (a centroid's final quantile position can
    * drift from where its cap was computed) and the +2 covers midpoint
    * interpolation between two SINGLETON tail centroids, where the
    * estimate legitimately sits ~1.5 ranks off target while the
    * capacity term contributes < 1 (the small-n regime: measured 0.94
    * of a +1 bound at sf0.001, 0.70 of this one). `MergeInvarianceSpec` pins that the verdict columns are
    * identical from 1 through 200 shuffle partitions; violation = hash
    * FAIL, and the quantitative margin lands in differential.json via
    * [[tdigestDifferential]].
    */
  private def q115(s: SparkSession, dir: String): DataFrame =
    sketchRankVerdict(t(s, dir, "events"),
      stackSketch(q115Digest(s, dir), Q115Ps),
      lit(4.0) * lit(2.0) * col("n") * col("p") * (lit(1.0) - col("p"))
        / lit(Q115Compression) + lit(2.0))

  private def q115Sql =
    s"""SELECT event_type, CAST(p AS DOUBLE) AS p,
       | CAST(COUNT(*) AS BIGINT) AS n,
       | CAST(4.0 AS DOUBLE) * CAST(2.0 AS DOUBLE) * COUNT(*) * p
       |   * (CAST(1.0 AS DOUBLE) - p) / CAST($Q115Compression AS DOUBLE)
       |   + CAST(2.0 AS DOUBLE) AS err_bound_ranks,
       | TRUE AS within_bound
       |FROM events
       |CROSS JOIN (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
       |            (CAST(0.99 AS DOUBLE))) t(p)
       |WHERE value IS NOT NULL
       |GROUP BY event_type, p""".stripMargin

  /** t-digest ROLLUP — the sketch-column warehouse pattern as a driver
    * query, completing q115: percentiles answered from PRE-AGGREGATED
    * per-day digests, never from raw values. Level 1
    * (`TDigest.DigestAgg`) builds one storable digest struct per
    * (event_type, day) — at 100 TB this is the ingest-time
    * materialization, one sketch row per key×grain; level 2
    * (`TDigest.MergeDigestsAgg`) merge-compresses the stored digests
    * per event_type, touching O(grains · δ·log W) doubles instead of
    * the 10¹⁰ raw values a rescan would. A two-level rollup is just
    * another merge tree over the same k₁-capped centroids, so q115's
    * rank bound applies unchanged and the driver row is the same
    * contract-as-data verdict ([[sketchRankVerdict]]);
    * `MergeInvarianceSpec` pins the verdict across grain widths
    * (hour/day/week) and shuffle partitionings.
    */
  private def q117(s: SparkSession, dir: String): DataFrame =
    q117Verdict(s, dir, 86400000000L) // stored grain: one digest per day

  /** q117's verdict at an arbitrary stored-grain width (the
    * grain-invariance spec sweeps hour/day/week through this). */
  private[graft] def q117Verdict(s: SparkSession, dir: String,
      grainUs: Long): DataFrame =
    sketchRankVerdict(t(s, dir, "events"),
      stackSketch(q117Rollup(s, dir, grainUs), Q115Ps),
      lit(4.0) * lit(2.0) * col("n") * col("p") * (lit(1.0) - col("p"))
        / lit(Q115Compression) + lit(2.0))

  /** The two-level digest rollup behind q117: values → per-(key, grain)
    * digest structs → merged per-key quantiles (labels match
    * `Quantiles.label`, the stackSketch shape). `grainUs` is the bucket
    * width in epoch-µs.
    */
  private[graft] def q117Rollup(s: SparkSession, dir: String,
      grainUs: Long): DataFrame = {
    val ev = t(s, dir, "events").filter(col("value").isNotNull)
      .select(col("event_type"),
        (unix_micros(col("ts")) / grainUs).cast("long").as("grain"),
        col("value"))
    val mk = udaf(new graft.metrics.TDigest.DigestAgg(Q115Compression),
      Encoders.scalaDouble)
    val grains = ev.groupBy(col("event_type"), col("grain"))
      .agg(mk(col("value")).as("digest"))
    // a product input encoder makes the udaf take the case-class FIELDS
    // as separate argument columns — pass the struct's members
    val roll = udaf(
      new graft.metrics.TDigest.MergeDigestsAgg(Q115Ps, Q115Compression),
      Encoders.product[graft.metrics.TDigest.Digest])
    val rolled = grains.groupBy(col("event_type"))
      .agg(roll(col("digest.means"), col("digest.weights")).as("__qs"))
    Q115Ps.zipWithIndex.foldLeft(rolled) { case (d, (p, i)) =>
      d.withColumn(graft.metrics.Quantiles.label(p), element_at(col("__qs"), i + 1))
    }.drop("__qs")
  }

  /** Nested experiment config synthesized per event row — shared input
    * shape for q62/q63 (the testdata has no nested-JSON column, so both
    * engines build the identical JSON text from the same row values).
    */
  private def syntheticConfig(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      concat(
        lit("""{"model":{"layers":"""), (col("event_id") % 5 + 1).cast("string"),
        lit(""","activation":""""),
        when(col("event_id") % 2 === 0, "relu").otherwise("tanh"),
        lit("""","opt":{"lr_micro":"""), (col("event_id") % 100 + 1).cast("string"),
        lit(""","sched":"cosine"}},"data":{"window":"""),
        ((col("event_id") % 7) * 24).cast("string"),
        lit(""","horizons":[1,2,3]},"plugin":""""), col("event_type"),
        lit(""""}""")).as("config_json"))

  private val syntheticConfigSql =
    """SELECT event_id,
      | '{"model":{"layers":' || CAST(event_id % 5 + 1 AS VARCHAR) ||
      | ',"activation":"' || (CASE WHEN event_id % 2 = 0 THEN 'relu' ELSE 'tanh' END) ||
      | '","opt":{"lr_micro":' || CAST(event_id % 100 + 1 AS VARCHAR) ||
      | ',"sched":"cosine"}},"data":{"window":' || CAST((event_id % 7) * 24 AS VARCHAR) ||
      | ',"horizons":[1,2,3]},"plugin":"' || event_type || '"}' AS config_json
      |FROM events"""

  /** J5 recursive config flatten (`jsonb_deep_each` analog): every leaf
    * of the nested config as (dot.path, text), arrays as compact-JSON
    * leaves — the native `json_deep_flatten` expression via
    * `OlapEtl.deepConfigKv`. The oracle reproduces the recursion with a
    * DuckDB recursive CTE over `json_keys`.
    */
  private def q62(s: SparkSession, dir: String): DataFrame =
    graft.olap.OlapEtl.deepConfigKv(syntheticConfig(s, dir), "event_id", "config_json")

  private val q62Sql =
    s"""WITH RECURSIVE cfg AS ($syntheticConfigSql),
      |rec AS (
      |  SELECT event_id, '' AS path, json(config_json) AS val FROM cfg
      |  UNION ALL
      |  SELECT r.event_id,
      |         CASE WHEN r.path = '' THEN u.k ELSE r.path || '.' || u.k END,
      |         json_extract(r.val, '$$."' || u.k || '"')
      |  FROM rec r, UNNEST(json_keys(r.val)) AS u(k)
      |  WHERE json_type(r.val) = 'OBJECT')
      |SELECT event_id, path AS conf_path,
      |  CASE WHEN json_type(val) = 'VARCHAR' THEN json_extract_string(val, '$$')
      |       ELSE CAST(val AS VARCHAR) END AS conf_value
      |FROM rec WHERE json_type(val) <> 'OBJECT'""".stripMargin

  /** C4/Gopher-style corpus curation in ONE plan: quality score +
    * language-ID + exact-dedup (keep lowest doc_id per content digest)
    * composed into a single filter — the end-to-end shape of a
    * training-corpus cleaning pass. One scan, one shuffle (the digest
    * window); every heuristic is a codegen'd/native expression. Oracle
    * reproduces all three stages and the composition exactly.
    */
  private def q67(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents").select(
      col("doc_id"),
      round(TextAnalysis.qualityScore(col("text")), 6).as("quality"),
      TextAnalysis.langId(col("text")).as("lang_pred"),
      md5(col("text")).as("digest"))
    val w = Window.partitionBy(col("digest")).orderBy(col("doc_id"))
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("lang_pred") === "en" && col("quality") >= 0.6)
      .select(col("doc_id"), col("quality"))
  }

  private val q67Sql = {
    val sw = TextAnalysis.EnglishStopwords.map(w => s"'$w'").mkString(", ")
    val cands = TextAnalysis.StopwordProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"{'score': len(list_filter(toks, x -> list_contains($arr, x))), 'lang': '$lang'}"
    }.mkString(", ")
    s"""WITH f AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
       |q AS (SELECT doc_id, ROUND(GREATEST(0.0, LEAST(1.0,
       |    0.5 * LEAST(CAST(len(list_filter(toks, x -> list_contains([$sw], x))) AS DOUBLE)
       |          / len(toks) * 4.0, 1.0)
       |    + 0.3 * (CASE WHEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
       |                       / len(toks) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
       |    + 0.2 * (1.0 - LEAST(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
       |          / length(text) * 10.0, 1.0)))), 6) + 0.0 AS quality
       |  FROM f),
       |l AS (SELECT doc_id, list_aggregate([$cands], 'max') AS best FROM f),
       |d AS (SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |  FROM documents)
       |SELECT q.doc_id, q.quality
       |FROM q JOIN l ON q.doc_id = l.doc_id JOIN d ON q.doc_id = d.doc_id
       |WHERE d.rn = 1
       |  AND (CASE WHEN l.best.score > 0 THEN l.best.lang ELSE 'und' END) = 'en'
       |  AND q.quality >= 0.6""".stripMargin
  }

  /** W1-long driver check: long-format sliding windows — one row per
    * (prediction row, step), ws=6 inclusive — `Windows.slidingLong`, the
    * layout SURVEY §1.1 prefers at scale (no array column in the output:
    * shuffles move fixed-width rows, pruning can drop features). Oracle:
    * windows re-derived relationally (row_number self-join on step
    * offsets), which is exactly what the long format IS.
    */
  private def q65(s: SparkSession, dir: String): DataFrame =
    graft.feature.Windows.slidingLong(
        t(s, dir, "events").select("event_id", "user_id", "ts", "value"),
        Seq("value"), 6, evWindow)
      .select(col("user_id"), col("event_id"), col("step").cast("int").as("step"),
        col("value_w"))

  private val q65Sql =
    """WITH g AS (SELECT user_id, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events)
      |SELECT a.user_id, a.event_id, CAST(s.step AS INT) AS step,
      |       b.value AS value_w
      |FROM g a
      |JOIN (SELECT UNNEST(range(6)) AS step) s ON true
      |JOIN g b ON b.user_id = a.user_id AND b.rn = a.rn - 5 + s.step
      |WHERE a.rn >= 6""".stripMargin

  /** Embedding-cosine near-dup (the 5th dedup modality): label-blocked
    * exact pairs over the embeddings table — equi-join on the block key,
    * cosine rounded to 6 d.p. before the τ=0.35 threshold so the pair
    * set is engine-exact. At 100 TB the block key becomes an IVF/LSH
    * cell id (see `Dedup.embeddingNearDupPairs` scaladoc).
    */
  private def q64(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.embeddingNearDupPairs(
      t(s, dir, "embeddings").select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v")),
      "vec_id", "v", "label", 0.35)

  private val q64Sql =
    """WITH e AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, label, v,
      |    SQRT(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)
      |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |  ROUND(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
      |    / (a.nrm * b.nrm), 6) + 0.0 AS cos_sim
      |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE ROUND(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
      |    / (a.nrm * b.nrm), 6) >= 0.35""".stripMargin

  /** S9 `dim_experiment`: typed config-field extraction (int/double/bool/
    * string + JSON-text passthrough) with try_cast null fallback —
    * `OlapEtl.dimExperiment` over a config that nests the interesting
    * fields under model/data (extraction is by top-level path, so the
    * query ALSO exercises absent-field → NULL on every row: the
    * reference stores flat configs; nested ones surface through q62).
    */
  private def q63(s: SparkSession, dir: String): DataFrame = {
    // flat config variant: the dim builder extracts top-level fields
    val flat = t(s, dir, "events").select(
      concat(lit("exp_"), col("event_id").cast("string")).as("experiment_key"),
      lit("p1").as("project_key"),
      lit("phase1").as("phase_key"),
      concat(
        lit("""{"window_size":"""),
        when(col("event_id") % 7 === 0, lit("null"))
          .otherwise(((col("event_id") % 5 + 1) * 24).cast("string")),
        lit(""","learning_rate":0.00"""), (col("event_id") % 9 + 1).cast("string"),
        lit(""","use_stl":"""),
        when(col("event_id") % 2 === 0, "true").otherwise("false"),
        lit(""","activation":""""),
        when(col("event_id") % 3 === 0, "relu")
          .when(col("event_id") % 3 === 1, "gelu").otherwise("tanh"),
        lit("""","predictor_plugin":""""), col("event_type"),
        lit("""","epochs":"""),
        when(col("event_id") % 11 === 0, lit(""""bad""""))
          .otherwise((col("event_id") % 50 + 10).cast("string")),
        lit(""","predicted_horizons":[1,2,3]}""")).as("config_json"))
    graft.olap.OlapEtl.dimExperiment(
        flat, "experiment_key", "project_key", "phase_key", "config_json")
      .select("experiment_key", "window_size", "learning_rate", "use_stl",
        "activation", "predictor_plugin", "epochs", "predicted_horizons")
  }

  private val q63Sql =
    """WITH cfg AS (SELECT
      |  'exp_' || CAST(event_id AS VARCHAR) AS experiment_key,
      |  '{"window_size":' ||
      |  (CASE WHEN event_id % 7 = 0 THEN 'null'
      |        ELSE CAST((event_id % 5 + 1) * 24 AS VARCHAR) END) ||
      |  ',"learning_rate":0.00' || CAST(event_id % 9 + 1 AS VARCHAR) ||
      |  ',"use_stl":' || (CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END) ||
      |  ',"activation":"' || (CASE WHEN event_id % 3 = 0 THEN 'relu'
      |                             WHEN event_id % 3 = 1 THEN 'gelu' ELSE 'tanh' END) ||
      |  '","predictor_plugin":"' || event_type ||
      |  '","epochs":' || (CASE WHEN event_id % 11 = 0 THEN '"bad"'
      |                         ELSE CAST(event_id % 50 + 10 AS VARCHAR) END) ||
      |  ',"predicted_horizons":[1,2,3]}' AS j
      | FROM events)
      |SELECT experiment_key,
      | TRY_CAST(json_extract_string(j, '$.window_size') AS INTEGER) AS window_size,
      | TRY_CAST(json_extract_string(j, '$.learning_rate') AS DOUBLE) AS learning_rate,
      | TRY_CAST(json_extract_string(j, '$.use_stl') AS BOOLEAN) AS use_stl,
      | json_extract_string(j, '$.activation') AS activation,
      | json_extract_string(j, '$.predictor_plugin') AS predictor_plugin,
      | TRY_CAST(json_extract_string(j, '$.epochs') AS INTEGER) AS epochs,
      | CAST(json_extract(j, '$.predicted_horizons') AS VARCHAR) AS predicted_horizons
      |FROM cfg""".stripMargin

  /** Sessionization: 2-hour-gap sessions per user; per-session stats.
    * The output is INTEGER-ONLY (BIGINT session_id, counts, epoch-µs
    * duration, and the value sum in exact micro-units): a DOUBLE column
    * or DuckDB's HUGEINT window-SUM leaves room for engine-version
    * rounding / hash-canonicalization skew on the driver harness, while
    * int64s compare bit-exactly everywhere.
    */
  private def q58(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 2L * 3600 * 1000000
    t(s, dir, "events")
      .withColumn("aus", unix_micros(col("ts")))
      .withColumn("session_id",
        TS.sessionId(col("aus"), Window.partitionBy(col("user_id"))
          .orderBy(col("aus"), col("event_id")), gapUs))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("aus")) - min(col("aus"))).as("duration_us"),
        (sum(col("value").cast(DecimalType(18, 6))) * 1000000)
          .cast("long").as("sum_value_micros"))
  }

  private val q58Sql =
    """WITH g AS (SELECT user_id, event_id, value, epoch_us(ts) AS aus,
      |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 7200000000
      |         THEN 1 ELSE 0 END AS is_start
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |sess AS (SELECT user_id, value, aus,
      |    CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY aus, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      | MAX(aus) - MIN(aus) AS duration_us,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS sum_value_micros
      |FROM sess GROUP BY user_id, session_id""".stripMargin

  /** Deterministic hash-based train/val/test split (80/10/10) with
    * per-split aggregate — stable across engines/runs by construction.
    */
  private def q59(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("split", graft.ml.Splits.assignSplit(col("event_id"), 80, 10))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"), (dsum(col("value")) / count(lit(1))).as("avg_value"))

  private val q59Sql =
    """SELECT CASE WHEN b < 80 THEN 'train'
      |            WHEN b < 90 THEN 'validation' ELSE 'test' END AS split,
      | COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value
      |FROM (SELECT value,
      |        ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::UBIGINT % 100 AS b
      |      FROM events)
      |GROUP BY 1""".stripMargin

  /** Deterministic per-group k-sample (`Splits.hashSample`): exactly 5
    * reproducible exemplar docs per language, ranked by md5 priority —
    * the fixed-COUNT sibling of q59's fixed-RATE hash splits and the
    * curation samplers (q79 rate, q100 cap). The sample is a pure
    * function of the id set, so the row set is EXACT (no contract
    * columns; the oracle recomputes it as a window QUALIFY). The scale
    * shape is the point: the mergeable `HashTopKAgg` partial-aggregates
    * map-side — each task ships ≤ k (priority, id) pairs per group —
    * where the oracle's own row_number formulation would shuffle the
    * full corpus on the group key first (plan pinned: no Window, one
    * group exchange, one Generate).
    */
  private def q121(s: SparkSession, dir: String): DataFrame =
    graft.ml.Splits.hashSample(
      t(s, dir, "documents").select(col("lang"), col("doc_id")),
      Seq("lang"), "doc_id", 5)

  private val q121Sql =
    """SELECT lang, rn AS sample_rank, doc_id
      |FROM (SELECT lang, doc_id,
      |        ROW_NUMBER() OVER (PARTITION BY lang
      |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |      FROM (SELECT DISTINCT lang, doc_id FROM documents
      |            WHERE doc_id IS NOT NULL))
      |WHERE rn <= 5""".stripMargin

  /** J5 JSON config extraction + aggregate. */
  private def q23(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        count(lit(1)).as("n"))

  private val q23Sql =
    """SELECT event_type,
      | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      | COUNT(*) AS n
      |FROM events GROUP BY event_type""".stripMargin

  /** F14/S10/A7: metric-string regex parse → (split, metric, horizon) cube. */
  private def q24(s: SparkSession, dir: String): DataFrame = {
    val re = "^(Train|Validation|Test) (.+?) H(\\d+)$"
    val m = t(s, dir, "events").select(
      concat(
        when(col("event_id") % 3 === 0, "Train")
          .when(col("event_id") % 3 === 1, "Validation")
          .otherwise("Test"),
        lit(" "),
        when(col("event_id") % 2 === 0, "MAE").otherwise("R2"),
        lit(" H"), (col("event_id") % 6 + 1).cast("string")).as("metric"),
      col("value"))
    m.select(
        regexp_extract(col("metric"), re, 1).as("split"),
        regexp_extract(col("metric"), re, 2).as("metric_name"),
        regexp_extract(col("metric"), re, 3).cast("int").as("horizon"),
        col("value"))
      .groupBy(col("split"), col("metric_name"), col("horizon"))
      .agg(
        count(lit(1)).as("n"),
        (dsum(col("value")) / count(lit(1))).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
  }

  private val q24Sql =
    """WITH m AS (SELECT
      |  (CASE WHEN event_id % 3 = 0 THEN 'Train'
      |        WHEN event_id % 3 = 1 THEN 'Validation' ELSE 'Test' END
      |   || ' ' || CASE WHEN event_id % 2 = 0 THEN 'MAE' ELSE 'R2' END
      |   || ' H' || CAST(event_id % 6 + 1 AS VARCHAR)) AS metric, value
      | FROM events)
      |SELECT regexp_extract(metric, '^(Train|Validation|Test) (.+?) H(\d+)$', 1) AS split,
      |  regexp_extract(metric, '^(Train|Validation|Test) (.+?) H(\d+)$', 2) AS metric_name,
      |  CAST(regexp_extract(metric, '^(Train|Validation|Test) (.+?) H(\d+)$', 3) AS INT) AS horizon,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value,
      |  MIN(value) AS min_value,
      |  MAX(value) AS max_value
      |FROM m GROUP BY 1, 2, 3""".stripMargin

  /** J5 config flatten: JSON map → (key, value) rows (Metabase
    * `jsonb_deep_each` analog via OlapEtl.configKv).
    */
  private def q26(s: SparkSession, dir: String): DataFrame =
    OlapEtl.configKv(t(s, dir, "events"), "event_id", "props")

  private val q26Sql =
    """SELECT event_id, k AS conf_key,
      | json_extract_string(props, '$.' || k) AS conf_value
      |FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)""".stripMargin

  /** F14/S10: results-row parse through OlapEtl.parseResults — regex
    * split/metric/horizon + metric-key canonicalization.
    */
  private def q36(s: SparkSession, dir: String): DataFrame = {
    val results = t(s, dir, "events").select(
      concat(
        when(col("event_id") % 3 === 0, "Train")
          .when(col("event_id") % 3 === 1, "Validation")
          .otherwise("Test"),
        lit(" "),
        when(col("event_id") % 2 === 0, "MAE").otherwise("Naive MAE"),
        lit(" H"), (col("event_id") % 6 + 1).cast("string")).as("Metric"),
      col("value").as("Average"),
      lit(0.0).as("Std Dev"),
      col("value").as("Min"),
      col("value").as("Max"))
    OlapEtl.parseResults(results)
      .groupBy(col("split_key"), col("metric_key"), col("horizon_key"))
      .agg(count(lit(1)).as("n"),
        (dsum(col("avg_value")) / count(lit(1))).as("mean_avg"))
  }

  private val q36Sql =
    """WITH m AS (SELECT
      |  (CASE WHEN event_id % 3 = 0 THEN 'Train'
      |        WHEN event_id % 3 = 1 THEN 'Validation' ELSE 'Test' END
      |   || ' ' || CASE WHEN event_id % 2 = 0 THEN 'MAE' ELSE 'Naive MAE' END
      |   || ' H' || CAST(event_id % 6 + 1 AS VARCHAR)) AS metric, value
      | FROM events)
      |SELECT lower(regexp_extract(metric, '^(Train|Validation|Test) (.+?) H(\d+)$', 1)) AS split_key,
      |  CASE regexp_extract(metric, '^(Train|Validation|Test) (.+?) H(\d+)$', 2)
      |    WHEN 'MAE' THEN 'mae' WHEN 'Naive MAE' THEN 'naive_mae' END AS metric_key,
      |  CAST(regexp_extract(metric, '^(Train|Validation|Test) (.+?) H(\d+)$', 3) AS INT) AS horizon_key,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_avg
      |FROM m GROUP BY 1, 2, 3""".stripMargin

  /** A9 MMD (Gaussian kernel) between two deterministic 256-row samples
    * (purchase vs error values) — the reference's subsample-then-kernel
    * shape with a by-id sample instead of a random one so the oracle is
    * exact. σ = 50.
    */
  private def q37(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    def sample(tpe: String, alias: String) =
      ev.filter(col("event_type") === tpe).orderBy(col("event_id")).limit(256)
        .select(col("value").as(alias))
    def meanK(a: DataFrame, ca: String, b: DataFrame, cb: String) = {
      val d = col(ca) - col(cb)
      a.crossJoin(b).agg(
        (sum(exp(d * d / lit(-2.0 * 50.0 * 50.0)).cast(DecimalType(18, 12)))
          .cast("double") / count(lit(1))).as("k"))
    }
    val kxx = meanK(sample("purchase", "xa"), "xa", sample("purchase", "xb"), "xb")
      .withColumnRenamed("k", "kxx")
    val kyy = meanK(sample("error", "ya"), "ya", sample("error", "yb"), "yb")
      .withColumnRenamed("k", "kyy")
    val kxy = meanK(sample("purchase", "xa"), "xa", sample("error", "yb"), "yb")
      .withColumnRenamed("k", "kxy")
    kxx.crossJoin(kyy).crossJoin(kxy)
      .select(round(col("kxx") + col("kyy") - lit(2.0) * col("kxy"), 9).as("mmd"))
  }

  private val q37Sql =
    """WITH x AS (SELECT value FROM events WHERE event_type = 'purchase'
      |           ORDER BY event_id LIMIT 256),
      |y AS (SELECT value FROM events WHERE event_type = 'error'
      |      ORDER BY event_id LIMIT 256),
      |kxx AS (SELECT CAST(SUM(CAST(EXP(-(a.value - b.value) * (a.value - b.value)
      |          / (2.0 * 50.0 * 50.0)) AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS k
      |        FROM x a, x b),
      |kyy AS (SELECT CAST(SUM(CAST(EXP(-(a.value - b.value) * (a.value - b.value)
      |          / (2.0 * 50.0 * 50.0)) AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS k
      |        FROM y a, y b),
      |kxy AS (SELECT CAST(SUM(CAST(EXP(-(a.value - b.value) * (a.value - b.value)
      |          / (2.0 * 50.0 * 50.0)) AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS k
      |        FROM x a, y b)
      |SELECT ROUND(kxx.k + kyy.k - 2.0 * kxy.k, 9) + 0.0 AS mmd FROM kxx, kyy, kxy""".stripMargin

  /** M1 Huber loss of the naive forecast per event_type (δ=10), exact
    * via decimal sums.
    */
  private def q51(s: SparkSession, dir: String): DataFrame = {
    val withE = t(s, dir, "events")
      .withColumn("e", abs(lead(col("value"), 1).over(evWindow) - col("value")))
      .filter(col("e").isNotNull)
    val h = when(col("e") <= 10.0, lit(0.5) * col("e") * col("e"))
      .otherwise(lit(10.0) * (col("e") - lit(5.0)))
    withE.groupBy(col("event_type"))
      .agg((dsum(h, 6) / count(lit(1))).as("huber"), count(lit(1)).as("n"))
  }

  private val q51Sql =
    """SELECT event_type,
      | CAST(SUM(CAST(CASE WHEN e <= 10.0 THEN 0.5 * e * e
      |                    ELSE 10.0 * (e - 5.0) END AS DECIMAL(18,6))) AS DOUBLE)
      |   / COUNT(*) AS huber,
      | COUNT(*) AS n
      |FROM (SELECT event_type,
      |        ABS(LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) - value) AS e
      |      FROM events)
      |WHERE e IS NOT NULL GROUP BY event_type""".stripMargin

  /** A5/A6 uncertainty mean + SNR per event_type (pseudo-uncertainty =
    * |k−50| from the JSON payload), exact via decimal sums.
    */
  private def q52(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("unc",
        abs(get_json_object(col("props"), "$.k").cast("double") - 50.0))
    ev.groupBy(col("event_type"))
      .agg(
        (dsum(col("unc")) / count(lit(1))).as("unc_mean"),
        ((dsum(col("value")) / count(lit(1))) /
          (dsum(col("unc")) / count(lit(1)) + lit(1e-9))).as("snr"))
  }

  private val q52Sql =
    """SELECT event_type,
      | CAST(SUM(CAST(unc AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS unc_mean,
      | (CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
      |   / (CAST(SUM(CAST(unc AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) + 1e-9) AS snr
      |FROM (SELECT event_type, value,
      |        ABS(CAST(json_extract_string(props, '$.k') AS DOUBLE) - 50.0) AS unc
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  /** A13 group correlation: corr(value, k) per event_type (both engines
    * compute Pearson; round 6 absorbs the 1-ulp formula differences).
    */
  private def q54(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("double"))
      .groupBy(col("event_type"))
      .agg(round(corr(col("value"), col("k")), 6).as("corr_vk"),
        count(lit(1)).as("n"))

  private val q54Sql =
    """SELECT event_type,
      | ROUND(CORR(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) + 0.0 AS corr_vk,
      | COUNT(*) AS n
      |FROM events GROUP BY event_type""".stripMargin

  /** Exact distinct-count aggregate per group (expands to the two-phase
    * distinct aggregation plan).
    */
  private def q55(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"))

  private val q55Sql =
    """SELECT l_suppkey,
      | COUNT(DISTINCT l_partkey) AS n_parts,
      | COUNT(DISTINCT l_orderkey) AS n_orders,
      | COUNT(*) AS n_lines
      |FROM lineitem GROUP BY l_suppkey""".stripMargin

  private val Q118Rsd = 0.05

  /** HLL++ count-distinct contract — the SCALE path q55 deliberately is
    * not, completing the sketch-contract family (q61 GK / q115 t-digest
    * / q117 rollup): `countDistinct` shuffles every distinct (group,
    * value) pair (exact — the oracle reference), while
    * `approx_count_distinct` keeps ONE mergeable HLL++ sketch per group
    * (O(1/rsd²) registers, map-side partials, register-wise-max merge —
    * THE count-distinct at 100 TB, where a hot group's distinct set
    * would not fit a reducer). Sketch estimates are engine-specific, so
    * the driver row emits the CONTRACT as data: per group,
    * |estimate − exact| ≤ 6·rsd·exact + 1 (+1 integer slack). Six
    * standard deviations of the documented relative error because the
    * contract is ALL-groups: across k groups the worst deviation grows
    * like √(2·ln k)·σ (≈3.7σ at the sf0.1 grain of 1000 suppliers —
    * measured 2.6σ worst), so a per-group 4σ bound would thin out
    * exactly as the data grows; 6σ keeps uniform headroom through
    * k ~ 10⁶ groups while remaining a real constraint (HLL++'s
    * small-cardinality linear-counting regime sits far inside it);
    * the oracle asserts TRUE, so a bound violation is a hash FAIL.
    * Unlike the t-digest, HLL merging is LOSSLESS, so the estimate
    * itself is partition-independent — `MergeInvarianceSpec` pins the
    * estimate (not just the verdict) identical from 1 to 200 shuffle
    * partitions. [[hllDifferential]] records the quantitative margin in
    * differential.json.
    */
  private def q118(s: SparkSession, dir: String): DataFrame =
    q118Verdict(s, dir).select(
      col("l_suppkey"), col("n_exact"), col("err_bound"), col("within_bound"))

  /** q118 plus the raw estimate column (spec/differential face — the
    * estimate is partition-independent but not oracle-matchable). */
  private[graft] def q118Verdict(s: SparkSession, dir: String): DataFrame = {
    val bound = lit(6.0) * lit(Q118Rsd) * col("n_exact") + lit(1.0)
    // OPT-r17 (guide §2.3; mechanism corrected r18 — see
    // plans/r18/q118_evidence.txt): the exact and sketch branches share
    // ONE dedup. Co-planned, approx_count_distinct's 52-word HLL++
    // partial buffer rode the (supp, part)-keyed exchange PER DISTINCT
    // PAIR (54-column exchange); the explicit distinct dedups on a
    // 2-column exchange and builds HLL state only after, per supplier
    // (measured 27% faster, interleaved A/B). HLL++ register folds are
    // duplicate-insensitive, so n_approx is bit-identical;
    // count-over-distinct IS countDistinct (the isNotNull filter
    // mirrors countDistinct's null exclusion). EDGE (ADVICE r17): a
    // supplier whose partkeys are ALL NULL now drops from the output
    // entirely, where the countDistinct spelling emitted it with
    // n_exact = 0 — impossible on TPC-H data (l_partkey is NOT NULL)
    // and matched by the oracle SQL, but a real change on data that
    // deviates; q119 shares the spelling and the edge.
    t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_partkey"))
      .filter(col("l_partkey").isNotNull)
      .distinct()
      .groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("n_exact"),
        approx_count_distinct(col("l_partkey"), Q118Rsd).as("n_approx"))
      .select(col("l_suppkey"), col("n_exact"), col("n_approx"),
        bound.as("err_bound"),
        (abs(col("n_approx") - col("n_exact")).cast("double") <= bound)
          .as("within_bound"))
  }

  private def q118Sql =
    s"""SELECT l_suppkey,
       | COUNT(DISTINCT l_partkey) AS n_exact,
       | CAST(6.0 AS DOUBLE) * CAST($Q118Rsd AS DOUBLE)
       |   * COUNT(DISTINCT l_partkey)
       |   + CAST(1.0 AS DOUBLE) AS err_bound,
       | TRUE AS within_bound
       |FROM lineitem GROUP BY l_suppkey""".stripMargin

  /** Quantitative HLL verdict for differential.json: margin of the
    * worst group vs the 6·rsd·exact + 1 bound. */
  def hllDifferential(s: SparkSession, dir: String): (Long, Long, Double) = {
    val rows = q118Verdict(s, dir)
      .select(col("n_exact"), col("n_approx"), col("err_bound")).collect()
    var checks = 0L; var viols = 0L; var maxOver = 0.0
    rows.foreach { r =>
      val err = math.abs(r.getLong(1) - r.getLong(0)).toDouble
      val bound = r.getDouble(2)
      checks += 1
      if (err > bound) viols += 1
      maxOver = math.max(maxOver, err / bound)
    }
    (checks, viols, maxOver)
  }

  private val Q119P = 12 // 4096 one-byte registers, rsd ≈ 1.625%

  /** The hand-rolled HLL's rsd at [[Q119P]], interpolated verbatim into
    * the oracle SQL so both engines evaluate the identical double. */
  private val Q119Rsd = graft.metrics.Hll.rsd(Q119P)

  /** HLL sketch-column rollup — the cardinality half of q117's
    * warehouse pattern, on the hand-rolled register sketch
    * (`metrics.Hll`) rather than the engine built-in: level 1
    * aggregates one storable 4096-byte sketch per (l_suppkey, 30-day
    * ship grain) — the ingest-time artifact a 100 TB warehouse would
    * persist — and level 2 answers the per-supplier distinct-part
    * question by register-max rollup of the STORED sketches, never
    * rescanning raw values. Two verdicts ride as data (oracle asserts
    * both TRUE, so either failing is a hash FAIL):
    *
    *  - `within_bound`: |rollup estimate − exact| ≤ 6·rsd·exact + 1 —
    *    the q118 contract form (6σ for the same all-groups reason).
    *  - `rollup_lossless`: the rolled-up estimate EQUALS a one-level
    *    `DistinctAgg` straight over the raw values — register max is
    *    lossless/idempotent, so rollup cannot degrade the sketch (the
    *    t-digest rollup q117 can only promise a bound here; the HLL
    *    promises identity). `MergeInvarianceSpec` additionally pins the
    *    estimate across shuffle partitionings and grain widths.
    *
    * [[hllRollupDifferential]] records the quantitative margin in
    * differential.json.
    */
  private def q119(s: SparkSession, dir: String): DataFrame =
    q119Verdict(s, dir).select(
      col("l_suppkey"), col("n_grains"), col("n_exact"),
      col("err_bound"), col("within_bound"), col("rollup_lossless"))

  /** The q119 stored-grain width: one sketch per (supplier, 30 days) —
    * epoch-µs integer buckets, the q19/q117 tz-safe idiom (calendar
    * truncation works in the session timezone on both engines). */
  private val Q119GrainUs = 30L * 86400L * 1000000L

  /** q119 plus the raw estimate columns, at an arbitrary stored-grain
    * width (spec/differential face; the grain-invariance spec sweeps
    * widths through this — losslessness must hold at every grain). */
  private[graft] def q119Verdict(s: SparkSession, dir: String,
      grainUs: Long = Q119GrainUs): DataFrame = {
    import graft.metrics.Hll
    val li = t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_partkey"),
        (unix_micros(col("l_shipdate")) / grainUs).cast("long").as("grain"))
    val mk = udaf(new Hll.SketchAgg(Q119P), Encoders.scalaLong)
    // DELIBERATELY two scans for grains + direct (r15 measured): a
    // one-scan GROUPING SETS formulation (both levels out of one
    // Expand, routed by an in-aggregator level filter) was built,
    // plan-verified (1 scan) — and REJECTED by the scale grid: 93.8 s
    // at ×100 / 230.6 s at ×1000 vs 15.8/81.7 for this shape. Expand
    // doubles the rows entering the register-fold partial aggregate,
    // whose ~86k × 4 KB map per task already rides the
    // ObjectHashAggregate fallback — the fold, not the 3-column
    // parquet scan, is the bottleneck, so "sharing the scan" buys
    // nothing and pays 2× fold volume (SCALE-R15C, PLANS.md).
    val grains = li.groupBy(col("l_suppkey"), col("grain"))
      .agg(mk(col("l_partkey")).as("sk"))
    val roll = udaf(new Hll.MergeSketchesAgg(Q119P),
      Encoders.product[Hll.Sketch])
    val rolled = grains.groupBy(col("l_suppkey"))
      .agg(roll(col("sk.regs")).as("est_rollup"),
        count(lit(1)).as("n_grains"))
    val directAgg = udaf(new Hll.DistinctAgg(Q119P), Encoders.scalaLong)
    // OPT-r17 (guide §2.3/§2.4, refines the r15 split): the one-level
    // sketch and the exact count share ONE explicit distinct relation.
    // The r15 hazard was Catalyst's distinct REWRITE — co-planning the
    // UDAF with countDistinct keyed the register partials by (group,
    // distinct-value), one 4 KB buffer per pair (measured 18.6 s). An
    // explicit .distinct() keeps both as PLAIN aggregates (no rewrite,
    // one register buffer per group) while collapsing two full scans +
    // two aggregation trees + one join into one of each. est_direct is
    // bit-identical: the HLL register fold is duplicate-insensitive,
    // so deduped input sets the same registers; count-over-distinct IS
    // countDistinct (isNotNull mirrors its null exclusion).
    val directExact = li.select(col("l_suppkey"), col("l_partkey"))
      .filter(col("l_partkey").isNotNull)
      .distinct()
      .groupBy(col("l_suppkey"))
      .agg(directAgg(col("l_partkey")).as("est_direct"),
        count(lit(1)).as("n_exact"))
    val bound = lit(6.0) * lit(Q119Rsd) * col("n_exact") + lit(1.0)
    rolled.join(directExact, "l_suppkey")
      .select(col("l_suppkey"), col("n_grains"), col("n_exact"),
        col("est_rollup"), col("est_direct"),
        bound.as("err_bound"),
        (abs(col("est_rollup") - col("n_exact")).cast("double") <= bound)
          .as("within_bound"),
        (col("est_rollup") === col("est_direct")).as("rollup_lossless"))
  }

  private def q119Sql =
    s"""SELECT l_suppkey,
       | COUNT(DISTINCT epoch_us(l_shipdate) // $Q119GrainUs) AS n_grains,
       | COUNT(DISTINCT l_partkey) AS n_exact,
       | CAST(6.0 AS DOUBLE) * CAST($Q119Rsd AS DOUBLE)
       |   * COUNT(DISTINCT l_partkey)
       |   + CAST(1.0 AS DOUBLE) AS err_bound,
       | TRUE AS within_bound,
       | TRUE AS rollup_lossless
       |FROM lineitem GROUP BY l_suppkey""".stripMargin

  /** Quantitative q119 verdict for differential.json: worst-group
    * margin vs the bound, plus the lossless-identity count. */
  def hllRollupDifferential(s: SparkSession, dir: String)
      : (Long, Long, Double, Boolean) = {
    val rows = q119Verdict(s, dir)
      .select(col("n_exact"), col("est_rollup"), col("err_bound"),
        col("rollup_lossless")).collect()
    var checks = 0L; var viols = 0L; var maxOver = 0.0; var lossless = true
    rows.foreach { r =>
      val err = math.abs(r.getLong(1) - r.getLong(0)).toDouble
      val bound = r.getDouble(2)
      checks += 1
      if (err > bound) viols += 1
      if (!r.getBoolean(3)) lossless = false
      maxOver = math.max(maxOver, err / bound)
    }
    (checks, viols, maxOver, lossless)
  }

  /** The q120 A/B split point: orders strictly before vs from this date
    * (mid-range of the 1992–1998 o_orderdate span, so both snapshots
    * and their overlap are substantial at every SF). */
  private val Q120Pivot = "1995-06-01"

  /** HLL set algebra over STORED sketches — the corpus-overlap /
    * decontamination-coverage estimate at 100 TB scale: per order
    * priority, the customer sets of two order-date snapshots (A =
    * before [[Q120Pivot]], B = from it) are sketched independently;
    * union cardinality comes from register-max of the two stored
    * sketches (no raw-data access — the merge IS the union set, the
    * property q119 pins as lossless), and intersection follows by
    * inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B). The
    * exact side needs only conditional COUNT(DISTINCT)s (I–E is exact
    * on exact counts), so the oracle is plain SQL. Verdicts as data:
    *
    *  - `union_within`: the merged-sketch estimate obeys the q118/q119
    *    6·rsd·exact + 1 bound against the exact union count.
    *  - `inter_within`: the I–E estimate errs by at most the sum of
    *    three sketch deviations; with independent ~rsd·nᵢ terms the
    *    combined σ is rsd·√(a²+b²+u²), bounded at 6σ (+3 integer slack
    *    for the three roundings). Shared-hash sketches are positively
    *    correlated — deviations partially CANCEL in a+b−u — so this
    *    independence-based bound is conservative in practice.
    *
    * At warehouse scale both inputs are sketch columns fetched from the
    * q119-style rollup table: estimating train∩benchmark contamination
    * overlap costs O(2^p) per pair, not a distinct-pair join.
    *
    * Shape note: the sketch relations LEFT-join onto the exact side
    * and the coverage assumption — every priority has orders on BOTH
    * sides of the pivot (true by construction of the TPC-H o_orderdate
    * span at every SF: the pivot sits mid-range and each priority
    * draws uniformly from the full span) — is ASSERTED as the
    * `sides_covered` column rather than silently shrinking the output:
    * a data-shape change fails as a named FALSE (and FALSE verdicts),
    * not as an opaque row-count/hash diff.
    */
  private def q120(s: SparkSession, dir: String): DataFrame =
    q120Verdict(s, dir)
      .select(col("o_orderpriority"), col("a_exact"), col("b_exact"),
        col("union_exact"), col("inter_exact"),
        col("err_bound_union"), col("err_bound_inter"),
        col("sides_covered"), col("union_within"), col("inter_within"))

  /** q120 plus the raw estimate columns (the q119Verdict pattern:
    * [[hllSetopsDifferential]] reads margins from THIS one distributed
    * execution; the estimates themselves are partition-invariant but
    * not oracle-matchable, so the driver row keeps booleans only). */
  private[graft] def q120Verdict(s: SparkSession, dir: String): DataFrame = {
    import graft.metrics.Hll
    val ord = t(s, dir, "orders")
    val isA = col("o_orderdate") < utcDay(Q120Pivot) // tz-pinned instant
    val mk = udaf(new Hll.SketchAgg(Q119P), Encoders.scalaLong)
    // OPT-r17 (guide §2.3/§2.4): ONE scan builds both side sketches —
    // group by (priority, side-of-pivot) and pivot the ≤2 rows per
    // priority back to columns with first(when). Register folds are
    // order-independent and canonical bytes are content-pure, so each
    // side's sketch is bit-identical to the filtered-scan spelling; a
    // side with no rows still surfaces as NULL (rows whose date is NULL
    // land in a side=NULL group no pivot arm selects — exactly the rows
    // the two filters excluded). Was: two scans + two joins.
    val skAB = ord.groupBy(col("o_orderpriority"), isA.as("__side"))
      .agg(mk(col("o_custkey")).as("sk"))
    val skP = skAB.groupBy(col("o_orderpriority"))
      .agg(
        first(when(col("__side") === true, col("sk")), ignoreNulls = true).as("sk_a"),
        first(when(col("__side") === false, col("sk")), ignoreNulls = true).as("sk_b"))
    val exact = ord.groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(when(isA, col("o_custkey"))).as("a_exact"),
        countDistinct(when(!isA, col("o_custkey"))).as("b_exact"),
        countDistinct(col("o_custkey")).as("union_exact"))
    // stored sketches may be sparse-encoded (r16) — the encoding-aware
    // faces decode to the identical dense registers, so estimates are
    // bit-unchanged
    val est = udf((regs: Array[Byte]) => Hll.encEstimate(regs, Q119P))
    val estUnion = udf((a: Array[Byte], b: Array[Byte]) =>
      Hll.encEstimate(Hll.encMerge(
        java.util.Arrays.copyOf(a, a.length),
        java.util.Arrays.copyOf(b, b.length), Q119P), Q119P))
    val boundU = lit(6.0) * lit(Q119Rsd) * col("union_exact") + lit(1.0)
    val boundI = lit(6.0) * lit(Q119Rsd) *
      sqrt((col("a_exact") * col("a_exact") + col("b_exact") * col("b_exact")
        + col("union_exact") * col("union_exact")).cast("double")) + lit(3.0)
    // LEFT joins + an asserted coverage column: a priority missing on
    // either side of the pivot must surface as a named FALSE, never as
    // a silently dropped row (ADVICE r14). The estimates guard on
    // coverage so the estimate UDFs never see a null register array.
    val covered = col("sk_a").isNotNull && col("sk_b").isNotNull
    exact.join(skP, Seq("o_orderpriority"), "left")
      .select(col("o_orderpriority"), col("a_exact"), col("b_exact"),
        col("union_exact"),
        (col("a_exact") + col("b_exact") - col("union_exact")).as("inter_exact"),
        covered.as("sides_covered"),
        when(covered, est(col("sk_a.regs"))).as("est_a"),
        when(covered, est(col("sk_b.regs"))).as("est_b"),
        when(covered, estUnion(col("sk_a.regs"), col("sk_b.regs")))
          .as("est_union"),
        boundU.as("err_bound_union"), boundI.as("err_bound_inter"))
      .select(col("o_orderpriority"), col("a_exact"), col("b_exact"),
        col("union_exact"), col("inter_exact"), col("sides_covered"),
        col("est_a"), col("est_b"), col("est_union"),
        col("err_bound_union"), col("err_bound_inter"),
        coalesce(abs(col("est_union") - col("union_exact")).cast("double")
          <= col("err_bound_union"), lit(false)).as("union_within"),
        coalesce(abs((col("est_a") + col("est_b") - col("est_union"))
          - col("inter_exact")).cast("double")
          <= col("err_bound_inter"), lit(false)).as("inter_within"))
  }

  private def q120Sql =
    s"""SELECT o_orderpriority, a_exact, b_exact, union_exact,
       | a_exact + b_exact - union_exact AS inter_exact,
       | CAST(6.0 AS DOUBLE) * CAST($Q119Rsd AS DOUBLE) * union_exact
       |   + CAST(1.0 AS DOUBLE) AS err_bound_union,
       | CAST(6.0 AS DOUBLE) * CAST($Q119Rsd AS DOUBLE)
       |   * SQRT(CAST(a_exact * a_exact + b_exact * b_exact
       |               + union_exact * union_exact AS DOUBLE))
       |   + CAST(3.0 AS DOUBLE) AS err_bound_inter,
       | TRUE AS sides_covered,
       | TRUE AS union_within,
       | TRUE AS inter_within
       |FROM (SELECT o_orderpriority,
       |  COUNT(DISTINCT CASE WHEN o_orderdate < TIMESTAMP '$Q120Pivot'
       |    THEN o_custkey END) AS a_exact,
       |  COUNT(DISTINCT CASE WHEN NOT (o_orderdate < TIMESTAMP '$Q120Pivot')
       |    THEN o_custkey END) AS b_exact,
       |  COUNT(DISTINCT o_custkey) AS union_exact
       |FROM orders GROUP BY o_orderpriority)""".stripMargin

  /** W4 strided windows: keep every 3rd row per series. */
  private def q38(s: SparkSession, dir: String): DataFrame =
    Windows.strided(
        t(s, dir, "events").select("event_id", "user_id", "ts", "value"),
        evWindow, 3)
      .select("event_id", "user_id", "value")

  private val q38Sql =
    """SELECT event_id, user_id, value FROM
      |(SELECT event_id, user_id, value,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      | FROM events) WHERE (rn - 1) % 3 = 0""".stripMargin

  // ─────────────────── text analysis (documents) ───────────────────

  /** Composite quality score (C4/Gopher-style heuristic, one codegen'd
    * expression).
    */
  private def q31(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))

  private val q31Sql = {
    val sw = TextAnalysis.EnglishStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH f AS (SELECT doc_id,
       |  CAST(len(list_filter(string_split(text, ' '),
       |         x -> list_contains([$sw], x))) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS sw_ratio,
       |  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
       |    / length(text) AS punct_ratio,
       |  CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS tok_len
       | FROM documents)
       |SELECT doc_id, ROUND(GREATEST(0.0, LEAST(1.0,
       |  0.5 * LEAST(sw_ratio * 4.0, 1.0)
       |  + 0.3 * (CASE WHEN tok_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
       |  + 0.2 * (1.0 - LEAST(punct_ratio * 10.0, 1.0)))), 6) + 0.0 AS quality
       |FROM f""".stripMargin
  }

  /** MinHash+LSH candidate pairs: docs sharing any of the 4 signature
    * bands (the equi-join that replaces O(n²) similarity at scale).
    */
  /** b=2 bands × r=2 rows: docs collide iff BOTH signature elements of a
    * band match — the oracle spells that as the pairwise AND (concat-key
    * equality over fixed-width hex digests ⇔ elementwise equality).
    */
  private val bandCondSql =
    "((a.sig0 = b.sig0 AND a.sig1 = b.sig1) OR (a.sig2 = b.sig2 AND a.sig3 = b.sig3))"

  private def q34(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidatePairs(t(s, dir, "documents"), "text", "doc_id", 3, 2, 2)
      .select("doc_a", "doc_b").distinct()

  private val q34Sql = {
    def sig(i: Int) =
      s"list_aggregate(list_transform(sh, x -> md5('seed$i:' || x)), 'min') AS sig$i"
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |shl AS (SELECT doc_id,
      |  CASE WHEN len(t) >= 3
      |       THEN list_transform(range(0, len(t) - 2),
      |              i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |       ELSE [array_to_string(t, ' ')] END AS sh
      | FROM tok),
      |sig AS (SELECT doc_id, """.stripMargin +
      (0 until 4).map(sig).mkString(", ") +
      s""" FROM shl)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND $bandCondSql""".stripMargin
  }


  /** Quality-scoring primitives: token count, avg token length,
    * punctuation ratio, stopword ratio.
    */
  private def q30(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextAnalysis.avgTokenLen(col("text")).as("avg_token_len"),
      TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
      TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"))

  private val q30Sql = {
    val sw = TextAnalysis.EnglishStopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       | len(string_split(text, ' ')) AS n_tokens,
       | CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS DOUBLE)
       |   / len(string_split(text, ' ')) AS avg_token_len,
       | CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
       |   / length(text) AS punct_ratio,
       | CAST(len(list_filter(string_split(text, ' '),
       |        x -> list_contains([$sw], x))) AS DOUBLE)
       |   / len(string_split(text, ' ')) AS stopword_ratio
       |FROM documents""".stripMargin
  }

  /** Exact dedup via content digest + per-digest group size. */
  private def q32(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("digest"))
    t(s, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("digest"))
      .withColumn("n_dups", count(lit(1)).over(w))
  }

  private val q32Sql =
    """SELECT doc_id, digest, n_dups FROM
      |(SELECT doc_id, md5(text) AS digest,
      |  COUNT(*) OVER (PARTITION BY md5(text)) AS n_dups
      | FROM documents)""".stripMargin

  /** MinHash signatures (engine-agnostic md5 permutations, k=4, 3-shingles). */
  private def q33(s: SparkSession, dir: String): DataFrame =
    Dedup.withMinhashSignature(t(s, dir, "documents"), "text", "doc_id", 3, 4)

  private val q33Sql = {
    def sig(i: Int) =
      s"list_aggregate(list_transform(sh, x -> md5('seed$i:' || x)), 'min') AS sig$i"
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id,
      |  CASE WHEN len(t) >= 3
      |       THEN list_transform(range(0, len(t) - 2),
      |              i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |       ELSE [array_to_string(t, ' ')] END AS sh
      | FROM tok)
      |SELECT doc_id, """.stripMargin +
      (0 until 4).map(sig).mkString(", ") + " FROM sh"
  }

  /** n-gram Jaccard similarity over all pairs of a doc subset. */
  private def q35(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").filter(col("doc_id") < 15).select("doc_id", "text")
    val a = d.toDF("doc_a", "text_a")
    val b = d.toDF("doc_b", "text_b")
    a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(Dedup.ngramJaccard(col("text_a"), col("text_b"), 3), 6).as("jaccard"))
  }

  private val q35Sql =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 15),
      |sh AS (SELECT doc_id, list_distinct(
      |  CASE WHEN len(t) >= 3
      |       THEN list_transform(range(0, len(t) - 2),
      |              i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |       ELSE [array_to_string(t, ' ')] END) AS s
      | FROM tok)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      | ROUND(CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
      |   / (len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x)))), 6) + 0.0 AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id""".stripMargin

  /** End-to-end near-dedup: LSH candidates → Jaccard ≥ 0.5 → keep-best
    * (longer text wins, ties to lower id) → surviving doc ids.
    */
  private def q50(s: SparkSession, dir: String): DataFrame =
    Dedup.nearDedup(t(s, dir, "documents"), "text", "doc_id", 3, 2, 2, 0.5)
      .select("doc_id", "n_chars")

  private val q50Sql = {
    def sig(i: Int) =
      s"list_aggregate(list_transform(sh, x -> md5('seed$i:' || x)), 'min') AS sig$i"
    """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
      |shl AS (SELECT doc_id, text,
      |  CASE WHEN len(t) >= 3
      |       THEN list_transform(range(0, len(t) - 2),
      |              i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |       ELSE [array_to_string(t, ' ')] END AS sh
      | FROM tok),
      |sig AS (SELECT doc_id, text, list_distinct(sh) AS shd, """.stripMargin +
      (0 until 4).map(sig).mkString(", ") +
      s""" FROM shl),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.text AS text_a, b.text AS text_b, a.shd AS sa, b.shd AS sb
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND $bandCondSql),
        |verified AS (SELECT *,
        |    CAST(len(list_filter(sa, x -> list_contains(sb, x))) AS DOUBLE)
        |      / (len(sa) + len(sb) - len(list_filter(sa, x -> list_contains(sb, x)))) AS jac
        |  FROM pairs),
        |losers AS (SELECT DISTINCT
        |    CASE WHEN length(text_a) > length(text_b) THEN doc_b
        |         WHEN length(text_a) < length(text_b) THEN doc_a
        |         ELSE GREATEST(doc_a, doc_b) END AS doc_id
        |  FROM verified WHERE jac >= 0.5)
        |SELECT doc_id, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin
  }

  /** The exact-first cleaning composition (`Dedup.dedupPipeline`): exact
    * dedup by digest (min id survives), THEN b×r banded near-dedup over
    * the survivors — the ordering that keeps candidate-pair generation
    * linear when a corpus carries large identical-copy groups (90× on
    * the scaling probe's adversarial corpus, PLANS.md). Oracle re-derives
    * both stages relationally: a ROW_NUMBER-over-digest CTE feeding the
    * q50 banding chain.
    */
  private def q70(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupPipeline(t(s, dir, "documents"), "text", "doc_id", 3, 2, 2, 0.5)
      .select("doc_id", "n_chars")

  private val q70Sql = {
    def sig(i: Int) =
      s"list_aggregate(list_transform(sh, x -> md5('seed$i:' || x)), 'min') AS sig$i"
    """WITH ex AS (SELECT doc_id, text, n_chars FROM (
      |    SELECT doc_id, text, n_chars,
      |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |    FROM documents) WHERE rn = 1),
      |tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM ex),
      |shl AS (SELECT doc_id, text,
      |  CASE WHEN len(t) >= 3
      |       THEN list_transform(range(0, len(t) - 2),
      |              i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |       ELSE [array_to_string(t, ' ')] END AS sh
      | FROM tok),
      |sig AS (SELECT doc_id, text, list_distinct(sh) AS shd, """.stripMargin +
      (0 until 4).map(sig).mkString(", ") +
      s""" FROM shl),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.text AS text_a, b.text AS text_b, a.shd AS sa, b.shd AS sb
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND $bandCondSql),
        |verified AS (SELECT *,
        |    CAST(len(list_filter(sa, x -> list_contains(sb, x))) AS DOUBLE)
        |      / (len(sa) + len(sb) - len(list_filter(sa, x -> list_contains(sb, x)))) AS jac
        |  FROM pairs),
        |losers AS (SELECT DISTINCT
        |    CASE WHEN length(text_a) > length(text_b) THEN doc_b
        |         WHEN length(text_a) < length(text_b) THEN doc_a
        |         ELSE GREATEST(doc_a, doc_b) END AS doc_id
        |  FROM verified WHERE jac >= 0.5)
        |SELECT doc_id, n_chars FROM ex
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin
  }

  /** Sliding-window document chunking (`TextAnalysis.chunkByTokens`):
    * 40-token windows every 32 tokens — the long-document →
    * context-window prep stage. Map-only plan (tokenize once → one
    * Generate), oracle re-derives chunks with range + list slicing.
    */
  private def q71(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkByTokens(t(s, dir, "documents"), "text", "doc_id", 40, 32)

  private val q71Sql =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |st AS (SELECT doc_id, t, unnest(range(0, len(t), 32)) AS s FROM tok)
      |SELECT doc_id, CAST(s // 32 AS INT) AS chunk_idx,
      |  CAST(LEAST(40, len(t) - s) AS INT) AS n_tok,
      |  array_to_string(t[s+1:s+40], ' ') AS chunk
      |FROM st""".stripMargin

  /** Sequence packing over the q71 chunks (`TextAnalysis.packSequences`):
    * disjoint 40-token chunks, ordered (doc_id, chunk_idx) within each
    * language shard, cut into 512-token training sequences; output is
    * the per-sequence manifest (chunk/token counts — all integers, so
    * the oracle hash is exact by construction).
    */
  private def q72(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val chunks = TextAnalysis.chunkByTokens(docs, "text", "doc_id", 40, 40)
    val withLang = chunks.join(docs.select(col("doc_id"), col("lang")), "doc_id")
    TextAnalysis.packSequences(withLang, Seq("lang"), Seq("doc_id", "chunk_idx"), "n_tok", 512)
      .groupBy(col("lang"), col("seq_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_tok")).as("n_tokens"))
  }

  private val q72Sql =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |st AS (SELECT doc_id, t, unnest(range(0, len(t), 40)) AS s FROM tok),
      |ch AS (SELECT doc_id, CAST(s // 40 AS INT) AS chunk_idx,
      |         CAST(LEAST(40, len(t) - s) AS INT) AS n_tok
      |       FROM st),
      |cl AS (SELECT ch.*, d.lang FROM ch JOIN documents d USING (doc_id)),
      |p AS (SELECT lang, n_tok,
      |        COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id, chunk_idx
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |      FROM cl)
      |SELECT lang, CAST(cum // 512 AS BIGINT) AS seq_id, COUNT(*) AS n_chunks,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      |FROM p GROUP BY 1, 2""".stripMargin

  /** Int8 embedding quantization (`Similarity.quantizeInt8`), exploded to
    * (vec_id, dim, qval, scale) rows so the oracle hash sees integers +
    * one rounded scale — the ANN-storage compression stage. Oracle
    * re-derives scale and quantized components relationally.
    */
  private def q73(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(
        t(s, dir, "embeddings").select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v")),
        "vec_id", "v")
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        posexplode(col("qvec")).as(Seq("dim", "qval")))
      .select(col("vec_id"), col("dim").cast("int").as("dim"),
        col("qval"), col("scale"))

  private val q73Sql =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |m AS (SELECT vec_id, v,
      |        GREATEST(list_aggregate(list_transform(v, x -> abs(x)), 'max'), 1e-12) / 127.0 AS sc
      |      FROM e)
      |SELECT vec_id, CAST(i - 1 AS INT) AS dim,
      |  CAST(FLOOR(x / sc + 0.5) AS INT) AS qval,
      |  ROUND(sc, 6) + 0.0 AS scale
      |FROM (SELECT vec_id, sc, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM m)""".stripMargin

  /** Intra-document repetition removal (`TextAnalysis.dedupSegments`):
    * C4-style sentence dedup — first occurrence of each distinct
    * '. '-separated segment survives, original order kept. Oracle:
    * the same min(pos)-per-segment + ordered string_agg relational
    * spelling.
    */
  private def q74(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dedupSegments(t(s, dir, "documents"), "text", "doc_id", ". ")

  private val q74Sql =
    """WITH l AS (SELECT doc_id, unnest(string_split(text, '. ')) AS seg,
      |    generate_subscripts(string_split(text, '. '), 1) AS pos
      |  FROM documents),
      |f AS (SELECT doc_id, seg, MIN(pos) AS pos FROM l GROUP BY doc_id, seg)
      |SELECT doc_id, string_agg(seg, '. ' ORDER BY pos) AS text_deduped
      |FROM f GROUP BY doc_id""".stripMargin

  /** Benchmark decontamination (`Dedup.decontaminate`): docs with
    * doc_id % 10 == 0 play the benchmark; training docs sharing any
    * word 8-gram with them are dropped (the GPT-3/PaLM overlap rule).
    * Both joins broadcast the small side — the training scan never
    * shuffles.
    */
  private def q75(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.decontaminate(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "text", "doc_id", 8)
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  private val q75Sql =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id,
      |    CASE WHEN len(t) >= 8
      |         THEN list_transform(range(0, len(t) - 7), i -> array_to_string(t[i+1:i+8], ' '))
      |         ELSE [array_to_string(t, ' ')] END AS sh
      |  FROM tok),
      |b AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 10 = 0),
      |tr AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 10 <> 0),
      |cont AS (SELECT DISTINCT tr.doc_id FROM tr JOIN b USING (g))
      |SELECT doc_id, lang, n_chars FROM documents
      |WHERE doc_id % 10 <> 0 AND doc_id NOT IN (SELECT doc_id FROM cont)""".stripMargin

  /** TF-IDF top-3 terms per document (`TextAnalysis.tfidfTopTerms`):
    * tf · ln(N/df), rank by (rounded score desc, term) — corpus
    * statistics as two partial aggregations plus a broadcast N.
    */
  private def q76(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopTerms(t(s, dir, "documents"), "text", "doc_id", 3)

  private val q76Sql =
    """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
      |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
      |sc AS (SELECT doc_id, term, tf,
      |         ROUND(tf * ln(CAST(n AS DOUBLE) / df), 6) + 0.0 AS score
      |       FROM tf JOIN dfreq USING (term) CROSS JOIN n),
      |r AS (SELECT *, CAST(ROW_NUMBER() OVER (
      |         PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rank
      |      FROM sc)
      |SELECT doc_id, term, tf, score, rank FROM r WHERE rank <= 3""".stripMargin

  /** Winnowing fingerprints (`TextAnalysis.winnowFingerprints`,
    * Schleimer et al. SIGMOD'03): k=3 word-gram md5-prefix hashes,
    * window w=4 minima, distinct — the plagiarism/overlap sketch with a
    * shared-fingerprint guarantee for any shared 6-token run.
    */
  private def q77(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowFingerprints(t(s, dir, "documents"), "text", "doc_id", 3, 4)

  private val q77Sql =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |shl AS (SELECT doc_id,
      |    CASE WHEN len(t) >= 3
      |         THEN list_transform(range(0, len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |         ELSE [array_to_string(t, ' ')] END AS sh
      |  FROM tok),
      |pe AS (SELECT doc_id, unnest(sh) AS g, generate_subscripts(sh, 1) AS pos FROM shl),
      |h AS (SELECT doc_id, pos,
      |        CAST(('0x' || substr(md5(g), 1, 8))::UBIGINT AS BIGINT) AS hv
      |      FROM pe),
      |sel AS (SELECT doc_id, pos,
      |          MIN(hv) OVER (PARTITION BY doc_id ORDER BY pos
      |            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp,
      |          COUNT(*) OVER (PARTITION BY doc_id) AS n
      |        FROM h)
      |SELECT DISTINCT doc_id, fp FROM sel WHERE pos >= LEAST(4, n)""".stripMargin

  /** Gopher repetition signals (`TextAnalysis.repetitionStats`, Rae et
    * al. 2021): duplicate-segment fraction + top-bigram fraction +
    * keep verdict at the paper's 0.30/0.20 caps.
    */
  private def q78(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(t(s, dir, "documents"), "text", "doc_id")

  private val q78Sql =
    """WITH segs AS (SELECT doc_id, string_split(text, '. ') AS s FROM documents),
      |seg AS (SELECT doc_id,
      |    ROUND(1.0 - CAST(len(list_distinct(s)) AS DOUBLE) / len(s), 6) + 0.0 AS dup_seg_frac
      |  FROM segs),
      |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT doc_id,
      |    CASE WHEN len(t) >= 2
      |         THEN list_transform(range(0, len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
      |         ELSE [array_to_string(t, ' ')] END AS b
      |  FROM tok),
      |bc AS (SELECT doc_id, g, COUNT(*) AS c
      |       FROM (SELECT doc_id, unnest(b) AS g FROM bg) GROUP BY 1, 2),
      |top AS (SELECT doc_id,
      |    ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) + 0.0 AS top_bigram_frac
      |  FROM bc GROUP BY 1)
      |SELECT doc_id, dup_seg_frac, top_bigram_frac,
      |  (dup_seg_frac <= CAST(0.3 AS DOUBLE) AND
      |   top_bigram_frac <= CAST(0.2 AS DOUBLE)) AS keep
      |FROM seg JOIN top USING (doc_id)""".stripMargin

  /** Deterministic mixture resampling (`TextAnalysis.resampleMixture`):
    * rebalance the corpus toward equal language shares; acceptance is a
    * pure md5-bucket function of doc_id, so the sample is stable across
    * engines and partitionings.
    */
  private def q79(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.resampleMixture(t(s, dir, "documents"), "lang", "doc_id",
        Map("en" -> 0.2, "es" -> 0.2, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.2))
      .select(col("doc_id"), col("lang"))

  private val q79Sql =
    """WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY 1),
      |t AS (SELECT COUNT(*) AS total FROM documents),
      |th AS (SELECT lang,
      |    CAST(FLOOR(LEAST(1.0,
      |      CAST(0.2 AS DOUBLE) * CAST(total AS DOUBLE) / CAST(cnt AS DOUBLE))
      |      * 10000) AS BIGINT) AS thresh
      |  FROM c CROSS JOIN t)
      |SELECT d.doc_id, d.lang FROM documents d JOIN th USING (lang)
      |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000
      |      < thresh""".stripMargin

  /** PII scrubbing (`TextAnalysis.redactPii`): deterministic synthetic
    * contact lines appended per doc (the test corpus carries no PII),
    * then email + long-digit-run redaction with per-class counts —
    * map-only regexp work.
    */
  private def q80(s: SparkSession, dir: String): DataFrame = {
    val aug = concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@mail.example.com ref 99887712345"))
    val (ne, nn) = TextAnalysis.piiCounts(aug)
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.redactPii(aug).as("redacted"),
      ne.as("n_emails"), nn.as("n_nums"))
  }

  private val q80Sql = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val num = "[0-9]{6,}"
    s"""WITH aug AS (SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com ref 99887712345' AS a
       |  FROM documents)
       |SELECT doc_id,
       |  regexp_replace(regexp_replace(a, '$email', '<EMAIL>', 'g'), '$num', '<NUM>', 'g') AS redacted,
       |  CAST(len(regexp_extract_all(a, '$email')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(regexp_replace(a, '$email', '<EMAIL>', 'g'), '$num')) AS INT) AS n_nums
       |FROM aug""".stripMargin
  }

  /** Unigram-LM cross-entropy quality scoring
    * (`TextAnalysis.unigramLm` + `perplexityScore`, the CCNet signal):
    * fit MLE log-probs on the corpus, score each doc by mean negative
    * log-likelihood. Exact DECIMAL sum ⇒ order-independent.
    */
  private def q81(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextAnalysis.perplexityScore(docs, "text", "doc_id",
      TextAnalysis.unigramLm(docs, "text"))
  }

  private val q81Sql =
    """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |cnt AS (SELECT term, COUNT(*) AS c FROM terms GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS total FROM terms),
      |lm AS (SELECT term, ROUND(ln(CAST(c AS DOUBLE) / CAST(total AS DOUBLE)), 6) AS logp
      |       FROM cnt CROSS JOIN tot),
      |j AS (SELECT doc_id, logp FROM terms JOIN lm USING (term))
      |SELECT doc_id, COUNT(*) AS n_tok,
      |  ROUND(-CAST(SUM(CAST(logp AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) + 0.0 AS xent
      |FROM j GROUP BY 1""".stripMargin

  /** Skew-safe salted join (`SkewJoin.saltedInner`): revenue by order
    * priority through a fact⋈dim join whose fact side is salted across 8
    * reducers — result provably identical to the plain equi-join (the
    * oracle IS the plain join), the salting buys hot-key spread at scale.
    */
  private def q82(s: SparkSession, dir: String): DataFrame = {
    val fact = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("okey"),
        col("l_extendedprice"), col("l_discount"))
    val dim = t(s, dir, "orders")
      .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
    graft.joins.SkewJoin.saltedInner(fact, dim, Seq("okey"), salts = 8)
      .groupBy(col("o_orderpriority"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private val q82Sql =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** Bucketed range join (`RangeJoin.pointInInterval`): shipments
    * falling inside 1–7-day order-date windows, as an EQUI-join on
    * 4-day buckets + residual filter instead of the nested-loop plan
    * the naive non-equi predicate would get. Oracle is that naive
    * predicate — same rows by construction.
    */
  private def q83(s: SparkSession, dir: String): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val ivs = t(s, dir, "orders")
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), epoch).cast("long").as("d_start"))
      .withColumn("d_end", col("d_start") + lit(1) + col("o_orderkey") % 7)
    // OPT-r17 (guide §2.3 "aggregate before you shuffle"): the join and
    // the final aggregate only need per-DAY totals of the fact, so the
    // fact pre-aggregates to one row per distinct ship day (~2.5k rows
    // at any SF — the day domain, not the row count) before the range
    // join; the bucketed join then matches days×intervals instead of
    // rows×intervals. Exact equivalence: COUNT(*) = Σ per-day counts
    // and the dsum DECIMAL sum is associative, so regrouping by day
    // first is identity; every day row joins exactly the intervals its
    // rows did. Before: 600k-row broadcast-join probe + 1.5M-row
    // aggregate at sf0.1 (and O(|fact|) join work at 100 TB).
    val pts = t(s, dir, "lineitem")
      .select(col("l_quantity"),
        datediff(to_date(col("l_shipdate")), epoch).cast("long").as("d_ship"))
      .groupBy(col("d_ship"))
      .agg(count(lit(1)).as("__n"),
        sum(col("l_quantity").cast(DecimalType(18, 6))).as("__qty"))
    graft.joins.RangeJoin.pointInInterval(pts, ivs, "d_ship", "d_start", "d_end",
        bucketWidth = 4L)
      .groupBy(col("o_orderkey"))
      .agg(sum(col("__n")).as("n_ship"),
        sum(col("__qty")).cast("double").as("qty"))
  }

  private val q83Sql =
    """WITH ivs AS (SELECT o_orderkey,
      |    DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d_start,
      |    DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 1 + o_orderkey % 7 AS d_end
      |  FROM orders WHERE o_orderkey % 50 = 0),
      |pts AS (SELECT l_quantity,
      |    DATEDIFF('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d_ship
      |  FROM lineitem)
      |SELECT o_orderkey, COUNT(*) AS n_ship,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
      |FROM pts JOIN ivs ON d_ship >= d_start AND d_ship < d_end
      |GROUP BY o_orderkey""".stripMargin

  /** Exact heavy hitters by sketch-prune-verify
    * (`Sketches.heavyHitters`, Misra–Gries k=64): account keys fold
    * users with `user_id % 10 < 7` onto 7 hot sentinel ids (the
    * default-account pathology), then find keys holding ≥ 1/20 of all
    * events — pass 1 ships O(k) sketch buffers instead of the full key
    * space, pass 2 exact-counts only the ≤64 candidates behind a
    * pushable isin filter. Result equals GROUP BY/HAVING exactly.
    */
  private def q84(s: SparkSession, dir: String): DataFrame = {
    val keyed = t(s, dir, "events").select(
      when(col("user_id") % 10 < 7, col("user_id") % 10)
        .otherwise(col("user_id")).cast("long").as("account"))
    graft.metrics.Sketches.heavyHitters(keyed, "account", k = 64, denom = 20L)
  }

  private val q84Sql =
    """WITH keyed AS (SELECT CASE WHEN user_id % 10 < 7 THEN user_id % 10
      |    ELSE user_id END AS account FROM events),
      |n AS (SELECT COUNT(*) AS n FROM keyed)
      |SELECT account, COUNT(*) AS cnt FROM keyed CROSS JOIN n
      |GROUP BY account, n HAVING COUNT(*) * 20 >= n""".stripMargin

  /** Bloom-prefiltered decontamination (`Dedup.decontaminateBloom`):
    * same contract as q75 but the training gram stream first passes a
    * broadcast Bloom filter built by a merging Aggregator; the exact
    * verify join kills every false positive, so the oracle is the same
    * plain overlap SQL (6-grams here). The 100 TB shape: the filter is
    * numBits/8 bytes regardless of benchmark size.
    */
  private def q85(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.decontaminateBloom(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "text", "doc_id", 6, numBits = 1 << 20, numHashes = 5)
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  private val q85Sql =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id,
      |    CASE WHEN len(t) >= 6
      |         THEN list_transform(range(0, len(t) - 5), i -> array_to_string(t[i+1:i+6], ' '))
      |         ELSE [array_to_string(t, ' ')] END AS sh
      |  FROM tok),
      |b AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 10 = 0),
      |tr AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 10 <> 0),
      |cont AS (SELECT DISTINCT tr.doc_id FROM tr JOIN b USING (g))
      |SELECT doc_id, source, n_chars FROM documents
      |WHERE doc_id % 10 <> 0 AND doc_id NOT IN (SELECT doc_id FROM cont)""".stripMargin

  /** Gopher quality rules (`TextAnalysis.gopherRules`): word-count /
    * mean-word-length / stopword / alphabetic-fraction bounds from ONE
    * native `gopher_stats` byte scan per document (the four-HOF spelling
    * would re-tokenize per stat). Thresholds sized to split this corpus.
    */
  private def q86(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRules(t(s, dir, "documents"), "text", "doc_id",
      minWords = 20, maxWords = 400, minMeanLen = 3.0, maxMeanLen = 8.0,
      minStopHits = 2, minAlphaFrac = 0.80)

  private val q86Sql = {
    val sw = TextAnalysis.EnglishStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |s AS (SELECT doc_id,
       |   CAST(len(w) AS INT) AS n_words,
       |   ROUND(list_sum(list_transform(w, x -> CAST(len(x) AS DOUBLE))) / len(w), 6) AS mean_word_len,
       |   CAST(len(list_filter(w, x -> list_contains($sw, x))) AS INT) AS stop_hits,
       |   ROUND(CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(w), 6) AS alpha_frac
       | FROM t)
       |SELECT doc_id, n_words, mean_word_len, stop_hits, alpha_frac,
       |  (n_words BETWEEN 20 AND 400 AND mean_word_len BETWEEN 3.0 AND 8.0
       |   AND stop_hits >= 2 AND alpha_frac > 0.8) AS keep
       |FROM s""".stripMargin
  }

  /** Normalized exact dedup (`Dedup.normalizedExactDedup`): reformatted
    * copies (case/spacing/punctuation) collapse onto one canonical
    * digest — the pre-hash canonicalization every production pipeline
    * runs before byte-exact dedup. Same shuffle shape as q32.
    */
  private def q93(s: SparkSession, dir: String): DataFrame =
    Dedup.normalizedExactDedup(t(s, dir, "documents"), "text", "doc_id")
      .select(col("doc_id"), col("lang"), col("n_chars"))

  private val q93Sql =
    """WITH k AS (SELECT doc_id, lang, n_chars,
      |    TRIM(regexp_replace(regexp_replace(LOWER(text),
      |      '[.,;:!?''"()\[\]{}]', '', 'g'), '\s+', ' ', 'g')) AS nk
      |  FROM documents),
      |r AS (SELECT doc_id, lang, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY nk ORDER BY doc_id) AS rn FROM k)
      |SELECT doc_id, lang, n_chars FROM r WHERE rn = 1""".stripMargin

  /** Duplicate-trigram fraction (`TextAnalysis.dupNgramFraction`): the
    * Gopher repetition signal q78 doesn't cover — occurrence-weighted
    * share of repeated 3-grams per document.
    */
  private def q94(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dupNgramFraction(t(s, dir, "documents"), "text", "doc_id", 3)

  private val q94Sql =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id,
      |    CASE WHEN len(t) >= 3
      |         THEN list_transform(range(0, len(t) - 2),
      |                i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |         ELSE [array_to_string(t, ' ')] END AS sh
      |  FROM tok),
      |g AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      |c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2)
      |SELECT doc_id,
      |  ROUND(CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / SUM(c), 6)
      |    AS dup_ngram_frac
      |FROM c GROUP BY doc_id""".stripMargin

  /** Cross-document exact-substring dedup (`Dedup.substringDedup`, the
    * Lee et al. 2021 ExactSubstr pass, word-level, l = 5): duplicated
    * 5-word runs are marked corpus-wide via positional gram digests,
    * merged into maximal spans, and excised. The oracle re-derives the
    * identical span set with DuckDB's parallel unnest + the same
    * gaps-and-islands merge — pure integer/string arithmetic, so the
    * whole operator (including the rebuilt `clean_text`) is hash-exact.
    */
  /** q95's match length — interpolated into [[q95Sql]] so the Spark call
    * and the oracle can never silently disagree on `l`. */
  private val Q95L = 5

  private def q95(s: SparkSession, dir: String): DataFrame =
    Dedup.substringDedup(t(s, dir, "documents"), "text", "doc_id", Q95L)

  private val q95Sql =
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |g AS (SELECT doc_id,
      |    unnest(range(0, len(t) - ${Q95L - 1})) AS p,
      |    unnest(list_transform(range(0, len(t) - ${Q95L - 1}),
      |           i -> md5(array_to_string(t[i+1:i+$Q95L], ' ')))) AS g
      |  FROM tok WHERE len(t) >= $Q95L),
      |c AS (SELECT g, COUNT(*) AS c FROM g GROUP BY 1),
      |dp AS (SELECT doc_id, p FROM g JOIN c USING (g) WHERE c.c > 1),
      |cov AS (SELECT DISTINCT doc_id, cp FROM
      |          (SELECT doc_id, unnest(range(p, p + $Q95L)) AS cp FROM dp)),
      |isl AS (SELECT doc_id, cp,
      |    cp - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cp) AS grp
      |  FROM cov),
      |sp AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS dup_span_words,
      |              CAST(COUNT(DISTINCT grp) AS INT) AS n_spans
      |       FROM isl GROUP BY doc_id),
      |w AS (SELECT doc_id, unnest(t) AS word,
      |             unnest(range(0, len(t))) AS pos FROM tok),
      |cl AS (SELECT w.doc_id, string_agg(w.word, ' ' ORDER BY w.pos) AS clean_text
      |       FROM w LEFT JOIN cov ON w.doc_id = cov.doc_id AND w.pos = cov.cp
      |       WHERE cov.cp IS NULL GROUP BY w.doc_id)
      |SELECT tok.doc_id, CAST(len(tok.t) AS INT) AS n_words,
      |  COALESCE(sp.dup_span_words, 0) AS dup_span_words,
      |  COALESCE(sp.n_spans, 0) AS n_spans,
      |  COALESCE(cl.clean_text, '') AS clean_text
      |FROM tok LEFT JOIN sp USING (doc_id) LEFT JOIN cl USING (doc_id)""".stripMargin

  /** D5 wavelets (`Wavelet.haarDwt`): full-depth orthonormal Haar DWT of
    * each user's first 32 values — every pyramid op is a fixed-order
    * IEEE pair sum ÷ √2, so DuckDB replays the 5 levels bit-for-bit
    * from the same list (the q45 exact-DFT pattern, one CTE per level).
    */
  private val Q96N = 32

  private def q96(s: SparkSession, dir: String): DataFrame =
    Wavelet.haarDwt(t(s, dir, "events"), "value",
      Seq("user_id"), Seq("ts", "event_id"), Q96N)

  private val q96Sql: String = {
    val levels = Integer.numberOfTrailingZeros(Q96N)
    val lvl = (1 to levels).map { l =>
      val m = Q96N >> l
      val src = if (l == 1) "x0" else s"l${l - 1}"
      s"""l$l AS (SELECT user_id,
         |    list_transform(range(0, $m), j -> (a[2*j+1] + a[2*j+2]) / sqrt(2.0)) AS a,
         |    list_transform(range(0, $m), j -> (a[2*j+1] - a[2*j+2]) / sqrt(2.0)) AS d
         |  FROM $src)""".stripMargin
    }.mkString(",\n")
    val bandSelects = (1 to levels).map { l =>
      s"""SELECT user_id, 'd$l' AS band,
         |    CAST(unnest(range(0, len(d))) AS INT) AS idx,
         |    unnest(list_transform(d, c -> ROUND(c, 6) + 0.0)) AS coef FROM l$l""".stripMargin
    } :+
      s"""SELECT user_id, 'a$levels' AS band,
         |    CAST(unnest(range(0, len(a))) AS INT) AS idx,
         |    unnest(list_transform(a, c -> ROUND(c, 6) + 0.0)) AS coef FROM l$levels""".stripMargin
    s"""WITH r AS (SELECT user_id, value,
       |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
       |  FROM events),
       |x0 AS (SELECT user_id, list(value ORDER BY rn) AS a FROM r WHERE rn <= $Q96N
       |       GROUP BY user_id HAVING COUNT(*) = $Q96N),
       |$lvl
       |${bandSelects.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** DSIR importance scores (`TextAnalysis.dsirScores`): hashed-bigram
    * bucket log-ratios of the English subcorpus (target) vs the whole
    * corpus (raw), summed per document with the exact-DECIMAL contract —
    * md5 buckets keep the whole scorer oracle-exact.
    */
  private def q90(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // OPT-r17: the target is the corpus' own English slice, so the
    // flagged one-scan spelling applies — identical rows/scores to
    // dsirScores(docs, docs.filter(lang='en'), ...) (see its scaladoc),
    // one fewer tokenize+md5 corpus scan and no bucket-count join.
    TextAnalysis.dsirScoresFlagged(docs, col("lang") === "en",
      "text", "doc_id", n = 2, buckets = 1024)
  }

  private val q90Sql =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id,
      |    CASE WHEN len(t) >= 2
      |         THEN list_transform(range(0, len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
      |         ELSE [array_to_string(t, ' ')] END AS sh
      |  FROM tok),
      |g AS (SELECT doc_id,
      |    ('0x' || substr(md5(unnest(sh)), 1, 8))::UBIGINT % 1024 AS b
      |  FROM sh),
      |rb AS (SELECT b, COUNT(*) AS rc FROM g GROUP BY 1),
      |tb AS (SELECT b, COUNT(*) AS tc FROM g JOIN documents USING (doc_id)
      |       WHERE lang = 'en' GROUP BY 1),
      |tot AS (SELECT (SELECT COUNT(*) FROM g) AS tr,
      |               (SELECT COUNT(*) FROM g JOIN documents USING (doc_id)
      |                WHERE lang = 'en') AS tt),
      |r AS (SELECT COALESCE(rb.b, tb.b) AS b, COALESCE(rc, 0) AS rc,
      |             COALESCE(tc, 0) AS tc
      |      FROM rb FULL JOIN tb ON rb.b = tb.b),
      |lr AS (SELECT b,
      |    ROUND(ln((tc + 1.0) / (tt + 1024)) - ln((rc + 1.0) / (tr + 1024)), 6) AS lr
      |  FROM r CROSS JOIN tot)
      |SELECT doc_id, COUNT(*) AS n_grams,
      |  ROUND(CAST(SUM(CAST(lr AS DECIMAL(18,6))) AS DOUBLE), 6) + 0.0 AS dsir_score
      |FROM g JOIN lr USING (b)
      |GROUP BY doc_id""".stripMargin

  /** Semantic dedup (`Dedup.semanticDedup`, SemDeDup): embedding-cosine
    * near-dup pairs (blocked equi-join) → star-contraction components →
    * keep each cluster's minimum id. Oracle re-derives the closure as a
    * recursive CTE over the same rounded-cosine pairs.
    */
  private def q89(s: SparkSession, dir: String): DataFrame =
    Dedup.semanticDedup(
        t(s, dir, "embeddings").select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("v")),
        "vec_id", "v", "label", 0.35, cacheKey = s"q89pairs|$dir")
      .select(col("vec_id"), col("label"))

  private val q89Sql =
    """WITH RECURSIVE e AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, label, v,
      |    SQRT(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |pairs AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
      |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      |  WHERE ROUND(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
      |      / (a.nrm * b.nrm), 6) >= 0.35),
      |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |          UNION SELECT doc_b, doc_a FROM pairs),
      |reach AS (SELECT src AS id, dst AS r FROM edges
      |          UNION
      |          SELECT e2.src AS id, reach.r FROM edges e2 JOIN reach ON e2.dst = reach.id),
      |losers AS (SELECT id FROM reach GROUP BY id HAVING MIN(r) < id)
      |SELECT vec_id, label FROM embeddings
      |WHERE vec_id NOT IN (SELECT id FROM losers)""".stripMargin

  /** Product-quantized ANN (`Similarity.kmeansMirrorable/pqEncode/knnPq`,
    * Jégou et al. TPAMI'11): 64-dim vectors → 8-byte codes (64×), ADC
    * scoring in 2m table adds per corpus code. HASH-EXACT oracle: the
    * fixed-iteration mirrorable fit lets `PqOracle.q87Sql` re-derive the
    * codebooks and the whole ADC ranking in DuckDB at any SF.
    */
  private def q87(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    // fit on the AnnFitLimit smallest-id rows (the kmeansMirrorable
    // bounded-input contract; the oracle mirrors the same LIMIT) —
    // encode still covers the full corpus
    val books = Similarity.kmeansMirrorable(
      emb.orderBy(col("vec_id")).limit(AnnFitLimit), "vec_id", "v",
      m = 8, k = 16, iters = 2, cacheKey = s"q87books|$dir")
    val codes = Similarity.cachedRelation(s, s"q87codes|$dir")(
      Similarity.pqEncode(emb, "vec_id", "v", books))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    Similarity.knnPq(queries, codes, "qid", "vec_id", "qv", books, k = 10)
  }

  /** IVF-PQ ANN (`buildIvfPqIndexMirrorable` + `searchIvfPq`): coarse
    * cells prune to nProbe/nCells of the corpus, PQ codes score
    * candidates in 2m table adds — the billion-scale composition.
    * Hash-exact oracle (`PqOracle.q88Sql`) via the mirrorable fits.
    */
  private def q88(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val idx = Similarity.buildIvfPqIndexMirrorable(emb, "vec_id", "v",
      nCells = 16, m = 8, ksub = 16, iters = 2, cacheKey = s"q88idx|$dir",
      fitLimit = AnnFitLimit)
    Similarity.searchIvfPq(idx, queries, "qid", "qv", nProbe = 4, k = 10)
  }

  /** Residual IVF-PQ (`buildIvfPqIndexMirrorable(residual=true)` +
    * `searchIvfPq`): codes span only within-cell spread — the quality
    * tier of the same serving architecture. Hash-exact oracle
    * (`PqOracle.q92Sql`) mirrors the residual reconstruction scoring.
    */
  private def q92(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val idx = Similarity.buildIvfPqIndexMirrorable(emb, "vec_id", "v",
      nCells = 16, m = 8, ksub = 16, iters = 2, residual = true,
      cacheKey = s"q92idx|$dir", fitLimit = AnnFitLimit)
    Similarity.searchIvfPq(idx, queries, "qid", "qv", nProbe = 4, k = 10)
  }

  // ─────────────── similarity search (embeddings) ───────────────

  /** Brute-force cosine top-k ANN baseline (queries broadcast). */
  private def q40(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", round(Similarity.cosine(col("qv"), col("v")), 6))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim"), col("rank"))
  }

  private val q40Sql =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |n AS (SELECT vec_id, v, SQRT(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |        ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i]))
      |          / (q.nrm * c.nrm), 6) + 0.0 AS cos_sim
      |      FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id)
      |SELECT query_id, neighbor_id, cos_sim, rank FROM
      |(SELECT query_id, neighbor_id, cos_sim,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
      | FROM p)
      |WHERE rank <= 3""".stripMargin

  // ─────────────── rows-only (non-SQL-expressible) ───────────────

  /** Language-ID heuristic (stopword-profile voting) — oracle-checked:
    * the struct-argmax (score, lang) is lexicographic in BOTH engines,
    * and the SQL is generated from the same `StopwordProfiles` map, so
    * the two spellings cannot drift.
    */
  private def q41(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      TextAnalysis.langId(col("text")).as("lang_pred"))

  private val q41Sql = {
    val cands = TextAnalysis.StopwordProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"{'score': len(list_filter(toks, x -> list_contains($arr, x))), 'lang': '$lang'}"
    }.mkString(", ")
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
       |s AS (SELECT doc_id, lang, [$cands] AS cands FROM t),
       |b AS (SELECT doc_id, lang, list_aggregate(cands, 'max') AS best FROM s)
       |SELECT doc_id, lang,
       |  CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS lang_pred
       |FROM b""".stripMargin
  }

  /** Multimodal image pipeline end-to-end: deterministic 16×16
    * grayscale netpbm images synthesized per event (the testdata has no
    * media table), decoded by the REAL decoder
    * (`Multimodal.decodeImagesReal` — netpbm parser; PNG/JPEG would go
    * through the JDK's ImageIO on the same path), resized 8×8, features
    * aggregated per event_type. Exercises binary column → batched
    * partition-wise decode → resize → feature → aggregate, the full
    * shape of a 100 TB media-featurization sweep. HASH-EXACT oracle
    * (q91's pattern): the pixels are a pure function of event_id, so
    * the SQL re-derives the resized-pixel values arithmetically and
    * recomputes the same features — an exact match proves the whole
    * encode → P5 parse → resize → featurize path, not just row shape.
    */
  private def q66(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val imgs = t(s, dir, "events").select("event_id", "event_type")
      .as[(Long, String)]
      .map { case (id, tpe) =>
        val px = Array.tabulate(16 * 16)(i => ((id * 31 + i * 7) % 256).toByte)
        (id, tpe, graft.multimodal.Multimodal.encodeNetpbm(
          graft.multimodal.Multimodal.RasterImage(16, 16, 1, px)))
      }
      .toDF("event_id", "event_type", "content")
    graft.multimodal.Multimodal
      .decodeImagesReal(imgs, "content", resizeTo = Some((8, 8)))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(dsum(element_at(col("chan_mean"), 1)) / count(lit(1)), 6).as("avg_brightness"),
        round(dsum(element_at(col("gray_hist"), 1)) / count(lit(1)), 6).as("avg_dark_bin"))
  }

  /** q66 oracle: pixels are `(id·31 + i·7) mod 256`; the 8×8
    * nearest-neighbor resize picks src index `32·(p/8) + 2·(p%8)`
    * (`Multimodal.resizeNearest`: sy = 2y, sx = 2x at 16→8), so the
    * resized pixel values regenerate arithmetically per (event, p).
    * `chan_mean[1]` = Σv / (64·255) — an integer sum in double, exact
    * in any order; `gray_hist[1]` = count(v < 16)/64 (v>>4 = 0 bin) —
    * /64 is a power of two, exact. Outer aggregate = the dsum
    * discipline both engines share.
    */
  private val q66Sql =
    """WITH px AS (
      |  SELECT e.event_id, e.event_type,
      |    (e.event_id * 31 + (32 * (pp.p // 8) + 2 * (pp.p % 8)) * 7) % 256 AS v
      |  FROM events e CROSS JOIN (SELECT unnest(range(0, 64)) AS p) pp),
      |feat AS (
      |  SELECT event_id, event_type,
      |    SUM(v) / 16320.0 AS mean1,
      |    SUM(CASE WHEN v < 16 THEN 1 ELSE 0 END) / 64.0 AS dark1
      |  FROM px GROUP BY event_id, event_type)
      |SELECT event_type, COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(mean1 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_brightness,
      |  ROUND(CAST(SUM(CAST(dark1 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_dark_bin
      |FROM feat GROUP BY event_type""".stripMargin

  /** Video container metadata (`Multimodal.parseMp4Meta` /
    * `probeVideoMeta`): MP4 stubs synthesized deterministically from
    * event ids (mixed mvhd v0/v1), parsed back, aggregated. The oracle
    * computes the same aggregates DIRECTLY from the ids — exact match
    * proves the encode→box-walk→extract path end-to-end.
    */
  private def q91(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vids = t(s, dir, "events").select("event_id", "event_type")
      .as[(Long, String)]
      .map { case (id, tpe) =>
        (id, tpe, graft.multimodal.Multimodal.encodeMp4Stub(
          "isom", timescale = 1000, duration = (id % 100 + 1) * 500,
          nTracks = (id % 3 + 1).toInt, v1 = id % 2 == 0))
      }
      .toDF("event_id", "event_type", "content")
    graft.multimodal.Multimodal.probeVideoMeta(vids, "content")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(dsum(col("duration_s")) / count(lit(1)), 6).as("avg_duration"),
        sum(col("n_tracks").cast("long")).as("total_tracks"))
  }

  private val q91Sql =
    """SELECT event_type, COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST((event_id % 100 + 1) * 0.5 AS DECIMAL(18,6))) AS DOUBLE)
      |    / COUNT(*), 6) AS avg_duration,
      |  CAST(SUM(event_id % 3 + 1) AS BIGINT) AS total_tracks
      |FROM events GROUP BY event_type""".stripMargin

  /** SimHash 64-bit near-dup fingerprint (md5-based, native expression)
    * — rows-only.
    */
  private def q42(s: SparkSession, dir: String): DataFrame =
    Dedup.withSimhash(t(s, dir, "documents").select("doc_id", "text"), "text")
      .select("doc_id", "simhash")

  /** simhash64 re-derived in pure SQL: per token the first 8 md5 bytes as
    * a UBIGINT, majority-vote each of the 64 bits (strict >), reassemble,
    * then two's-complement fold into the signed BIGINT Spark emits.
    */
  private val q42Sql =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h FROM tok),
      |bits AS (SELECT doc_id, bit,
      |    SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE 0 END) AS ones,
      |    COUNT(*) AS total
      |  FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS bit) b
      |  GROUP BY doc_id, bit),
      |acc AS (SELECT doc_id,
      |    SUM(CASE WHEN ones * 2 > total THEN (1::UBIGINT << bit)::HUGEINT ELSE 0 END) AS u
      |  FROM bits GROUP BY doc_id)
      |SELECT doc_id,
      | CAST(CASE WHEN u >= 9223372036854775808 THEN u - 18446744073709551616
      |           ELSE u END AS BIGINT) AS simhash
      |FROM acc""".stripMargin

  /** F12 positional encoding as a driver-checked literal table: the
    * transformer sin/cos table (pos, dim, value) rounded to 6 d.p. —
    * oracle re-derives it from `range()` cross products.
    */
  private def q69(s: SparkSession, dir: String): DataFrame =
    graft.ts.TS.positionalEncoding(s, 64, 8)
      .select(col("pos"), posexplode(col("encoding")).as(Seq("dim", "v")))
      .select(col("pos"), col("dim").cast("int").as("dim"), round(col("v"), 6).as("v"))

  private val q69Sql =
    """SELECT p.pos, CAST(j.j AS INT) AS dim,
      |  ROUND(CASE WHEN j.j % 2 = 0
      |    THEN sin(p.pos / pow(10000.0, CAST(2 * (j.j // 2) AS DOUBLE) / 8))
      |    ELSE cos(p.pos / pow(10000.0, CAST(2 * (j.j // 2) AS DOUBLE) / 8)) END, 6) + 0.0 AS v
      |FROM (SELECT unnest(range(0, 64)) AS pos) p
      |CROSS JOIN (SELECT unnest(range(0, 8)) AS j) j""".stripMargin

  /** SimHash near-dup pairs via chunk banding (Hamming ≤ 3 ⇒ pigeonhole
    * guarantees an equal 16-bit chunk): equi-join on (chunk, value),
    * exact bit_count verify on candidates only. Oracle re-derives the
    * hash (q42's SQL kernel) and the banding relationally.
    */
  private def q68(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDupPairs(
      t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id", maxDist = 3)
      .withColumn("hamming", col("hamming").cast("int"))

  private val q68Sql =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h FROM tok),
      |bits AS (SELECT doc_id, bit,
      |    SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE 0 END) AS ones,
      |    COUNT(*) AS total
      |  FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS bit) b
      |  GROUP BY doc_id, bit),
      |acc AS (SELECT doc_id,
      |    CAST(SUM(CASE WHEN ones * 2 > total THEN (1::UBIGINT << bit)::HUGEINT ELSE 0 END)
      |      AS UBIGINT) AS u
      |  FROM bits GROUP BY doc_id),
      |band AS (SELECT doc_id, u, j, (u >> (16 * j)) & 65535 AS cv
      |  FROM acc CROSS JOIN (SELECT unnest(range(0, 4)) AS j) js),
      |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(bit_count(xor(a.u, b.u)) AS INT) AS hamming
      |  FROM band a JOIN band b ON a.j = b.j AND a.cv = b.cv AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= 3""".stripMargin

  /** LSH-bucketed ANN (scale path of q40) — ORACLE-checked: the md5
    * hyperplanes are engine-agnostic, so DuckDB re-derives buckets,
    * per-bucket cosine, and the rounded-rank top-k relationally.
    */
  private def q43(s: SparkSession, dir: String): DataFrame =
    Similarity.knnLsh(
      t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v")),
      "vec_id", "v", nPlanes = 8, k = 3, dim = 64)

  private val q43Sql =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |pl AS (SELECT p, d,
      |    (('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8))::UBIGINT
      |      % 1000000) / 1e6 - 0.5 AS w
      |  FROM (SELECT unnest(range(0, 8)) AS p) pp
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS d) dd),
      |vd AS (SELECT vec_id, d, v[d + 1] AS x
      |  FROM e CROSS JOIN (SELECT unnest(range(0, 64)) AS d) dd),
      |proj AS (SELECT vec_id, p, SUM(x * w) AS dot
      |  FROM vd JOIN pl USING (d) GROUP BY vec_id, p),
      |buck AS (SELECT vec_id,
      |    SUM(CASE WHEN dot >= 0 THEN (1::UBIGINT << p)::HUGEINT ELSE 0 END) AS bucket
      |  FROM proj GROUP BY vec_id),
      |n AS (SELECT e.vec_id, v, bucket,
      |    SQRT(list_sum(list_transform(v, x -> x * x))) AS nrm
      |  FROM e JOIN buck ON e.vec_id = buck.vec_id),
      |p2 AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |    ROUND(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
      |      / (a.nrm * b.nrm), 6) + 0.0 AS cos_sim
      |  FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
      |SELECT query_id, neighbor_id, cos_sim, rank FROM (
      |  SELECT query_id, neighbor_id, cos_sim,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
      |  FROM p2)
      |WHERE rank <= 3""".stripMargin

  /** D1 STL decomposition per user series (period 24) — HASH-EXACT
    * oracle (`StlOracle.q44Sql`) since round 6: the mirrorable variant
    * pins the tricube weights to shared 12 dp constants, runs every
    * cross-point sum in exact decimal space and the LOESS solves as
    * straight-line IEEE ops, so DuckDB replays the full two-iteration
    * Cleveland inner loop bit-for-bit. (`Stl.decomposeDF` remains the
    * plain-double production face; `StlMirrorableSpec` pins the two
    * within stage-quantization distance.)
    */
  private def q44(s: SparkSession, dir: String): DataFrame =
    StlMirrorable.decomposeDF(
        t(s, dir, "events").select("event_id", "user_id", "ts", "value"),
        Seq("user_id"), Seq("ts", "event_id"), "value",
        period = 24, seasonalSmoother = 7)
      .select(col("event_id"), col("user_id"),
        col("trend"), col("seasonal"), col("resid"))

  /** D3 causal FFT features: trailing 16-value window per series →
    * first 5 normalized DFT magnitude bins via the native Catalyst
    * expression `fft_mag` — ORACLE-checked: the direct DFT re-derived in
    * DuckDB with trig + list ops is bit-exact after the round-6 contract.
    */
  private def q45(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val withWin = t(s, dir, "events")
      .withColumn("win", collect_list(col("value")).over(evWindow.rowsBetween(-15, 0)))
      .filter(size(col("win")) === 16)
    // explode(array(...)) Generate barrier: fft_mag is CodegenFallback,
    // so the composed fft_mag_norm referenced 5× below would clone the
    // whole DFT per bin — and once more per reference inside its own
    // normalization (the q63 lesson — see PLANS.md). After the barrier
    // `__raw` is a bound ATTRIBUTE: every further reference is free, so
    // the DFT runs exactly once per row and the normalization reads it.
    withWin
      .select(col("event_id"), col("user_id"),
        explode(array(GraftFunctions.fft_mag(col("win"), lit(5)))).as("__raw"))
      .withColumn("__s", aggregate(col("__raw"), lit(0.0), (a, x) => a + x))
      .select(Seq(col("event_id"), col("user_id")) ++
        (0 until 5).map(i => round(
          when(col("__s") > 0.0, element_at(col("__raw"), i + 1) / col("__s"))
            .otherwise(lit(1.0) / 5), 6).as(s"f$i")): _*)
  }

  private val q45Sql =
    """WITH g AS (SELECT event_id, user_id, value,
      |   list(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |     ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS win
      | FROM events),
      |f AS (SELECT event_id, user_id, win FROM g WHERE len(win) = 16),
      |m AS (SELECT event_id, user_id,
      |   list_transform(range(0, 5), j -> sqrt(
      |     pow(list_sum(list_transform(range(0, 16), i -> win[i+1] * cos(-2*pi()*j*i/16))), 2) +
      |     pow(list_sum(list_transform(range(0, 16), i -> win[i+1] * sin(-2*pi()*j*i/16))), 2))) AS mags
      | FROM f),
      |n AS (SELECT event_id, user_id, mags, list_sum(mags) AS s FROM m)
      |SELECT event_id, user_id,
      |  ROUND(CASE WHEN s > 0 THEN mags[1]/s ELSE 0.2 END, 6) + 0.0 AS f0,
      |  ROUND(CASE WHEN s > 0 THEN mags[2]/s ELSE 0.2 END, 6) + 0.0 AS f1,
      |  ROUND(CASE WHEN s > 0 THEN mags[3]/s ELSE 0.2 END, 6) + 0.0 AS f2,
      |  ROUND(CASE WHEN s > 0 THEN mags[4]/s ELSE 0.2 END, 6) + 0.0 AS f3,
      |  ROUND(CASE WHEN s > 0 THEN mags[5]/s ELSE 0.2 END, 6) + 0.0 AS f4
      |FROM n""".stripMargin

  /** D5 multi-taper spectral estimate (`Multitaper`): K sine-taper
    * periodograms of the trailing 16-value window, averaged per bin —
    * the variance-reduced spectrum the reference's `use_multi_tapper`
    * flag names. Taper weights are 12 dp-pinned constants inlined into
    * both engines; the DFT rides q45's exact-DFT oracle contract.
    */
  private val Q97K = 3

  private def q97(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val withWin = t(s, dir, "events")
      .withColumn("win", collect_list(col("value")).over(evWindow.rowsBetween(-15, 0)))
      .filter(size(col("win")) === 16)
    val tapers = Multitaper.sineTapers(16, Q97K)
    // one struct of the K taper-DFTs behind a single Generate barrier:
    // fft_mag is CodegenFallback, so each DFT must be referenced exactly
    // once before becoming a bound attribute (the q45/q63 lesson)
    val mags = tapers.zipWithIndex.map { case (tp, i) =>
      GraftFunctions.fft_mag(Multitaper.tapered(col("win"), tp), lit(5)).as(s"m$i")
    }
    val k = lit(Q97K.toDouble)
    withWin
      .select(col("event_id"), col("user_id"),
        explode(array(struct(mags: _*))).as("__m"))
      .select(Seq(col("event_id"), col("user_id")) ++
        (0 until 5).map { j =>
          val sq = (0 until Q97K)
            .map(i => pow(element_at(col("__m").getField(s"m$i"), j + 1), 2))
            .reduce(_ + _)
          round(sq / k, 6).as(s"s$j")
        }: _*)
  }

  private val q97Sql: String = {
    val tapers = Multitaper.sineTapers(16, Q97K)
    def lits(tp: Seq[Double]): String =
      tp.map(w => BigDecimal(w).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.toPlainString).mkString("[", ", ", "]")
    val taperCtes = tapers.zipWithIndex.map { case (tp, i) =>
      s"""m$i AS (SELECT event_id, user_id,
         |   list_transform(range(0, 5), j -> sqrt(
         |     pow(list_sum(list_transform(range(0, 16), i -> win[i+1] * (${lits(tp)})[i+1] * cos(-2*pi()*j*i/16))), 2) +
         |     pow(list_sum(list_transform(range(0, 16), i -> win[i+1] * (${lits(tp)})[i+1] * sin(-2*pi()*j*i/16))), 2))) AS mags
         | FROM f)""".stripMargin
    }.mkString(",\n")
    val joins = (1 until Q97K).map(i => s"JOIN m$i USING (event_id, user_id)").mkString(" ")
    val bins = (0 until 5).map { j =>
      val sq = (0 until Q97K).map(i => s"pow(m$i.mags[${j + 1}], 2)").mkString(" + ")
      s"ROUND(($sq) / ${Q97K}.0, 6) + 0.0 AS s$j"
    }.mkString(",\n  ")
    s"""WITH g AS (SELECT event_id, user_id, value,
       |   list(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
       |     ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS win
       | FROM events),
       |f AS (SELECT event_id, user_id, win FROM g WHERE len(win) = 16),
       |$taperCtes
       |SELECT event_id, user_id,
       |  $bins
       |FROM m0 $joins""".stripMargin
  }

  /** ARIMA(2,1,1) per-series fit + 3-step forecast (`Arima.fitForecast`
    * — the reference's `app/arima_optimizer.py` capability re-expressed
    * as the mirrorable Hannan–Rissanen two-stage OLS + CSS AIC; fit
    * input capped at the first [[Q98Steps]] points per series, the
    * reference's `--max_steps` contract). HASH-EXACT oracle
    * (`ArimaOracle.fitSql`): differencing, both normal-equation systems
    * (exact-decimal sums + no-pivot elimination), σ²/AIC, and the
    * unrolled forecast recursion are replayed bit-for-bit in DuckDB. */
  private val Q98Order = (2, 1, 1)
  private val Q98H = 3
  private val Q98Steps = 64

  private def q98(s: SparkSession, dir: String): DataFrame =
    graft.ml.Arima.fitForecast(t(s, dir, "events"), Seq("user_id"),
      Seq("ts", "event_id"), "value",
      Q98Order._1, Q98Order._2, Q98Order._3, Q98H, Q98Steps)

  private val q98Sql: String =
    graft.oracle.ArimaOracle.fitSql(
      Q98Order._1, Q98Order._2, Q98Order._3, Q98H, Q98Steps)

  /** AIC order search over the candidate lattice (`Arima.orderSearch` —
    * the reference's DEAP GA objective, `arima_optimizer.py:12-22`,
    * evaluated exhaustively in ONE per-series pass; same 1e6 penalty on
    * degenerate fits). All candidates share the single capped collect;
    * the oracle unions one mirrored pipeline per candidate and applies
    * the identical (aic, p+q, d, p) tie-break. */
  private val Q99Cands = Seq((1, 0, 0), (1, 1, 0), (0, 1, 1), (1, 1, 1), (2, 1, 0), (2, 1, 1))

  private def q99(s: SparkSession, dir: String): DataFrame =
    graft.ml.Arima.orderSearch(t(s, dir, "events"), Seq("user_id"),
      Seq("ts", "event_id"), "value", Q99Cands, Q98Steps)

  private val q99Sql: String =
    graft.oracle.ArimaOracle.orderSearchSql(Q99Cands, Q98Steps)

  /** Cluster-balanced resampling (`Similarity.clusterBalanceMirrorable`
    * — DataComp/SemDeDup-style semantic-region mass capping): mirrorable
    * k-means cells over the embedding corpus, per-cell counts, capped
    * keep weights and the deterministic md5-uniform keep decision.
    * HASH-EXACT oracle (`PqOracle.q100Sql`). */
  private val Q100Cap = 40.0

  private def q100(s: SparkSession, dir: String): DataFrame =
    Similarity.clusterBalanceMirrorable(
      t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v")),
      "vec_id", "v", nCells = 16, cap = Q100Cap, iters = 2,
      fitLimit = AnnFitLimit, cacheKey = s"q100cells|$dir")

  private val q100Sql: String = graft.oracle.PqOracle.q100Sql(
    d = 64, nCells = 16, iters = 2, fitLimit = AnnFitLimit, cap = Q100Cap)

  /** ACF + Ljung–Box per series (`Arima.acfLjungBox` — the
    * model-diagnostic companion of q98's fit; Ljung & Box 1978).
    * HASH-EXACT oracle (`ArimaOracle.acfSql`): mean/covariance sums
    * under the dsum discipline, 6-dp ρ, Q folded from the rounded ρ. */
  private val Q101Lags = 5

  private def q101(s: SparkSession, dir: String): DataFrame =
    graft.ml.Arima.acfLjungBox(t(s, dir, "events"), Seq("user_id"),
      Seq("ts", "event_id"), "value", Q101Lags, Q98Steps)

  private val q101Sql: String =
    graft.oracle.ArimaOracle.acfSql(Q101Lags, Q98Steps)

  /** Plot-data downsample (the distributed half of the plots sink,
    * `graft.io.Plots.downsample` — `stl_plots.py`'s every-k-th thinning
    * re-expressed as value bucketing): ≤ N bucket means over the event
    * stream, dsum-disciplined so the 6-dp means are order-independent
    * and DuckDB-matchable. HASH-EXACT oracle.
    */
  private val Q102Buckets = 500

  private def q102(s: SparkSession, dir: String): DataFrame =
    graft.io.Plots.downsample(
      t(s, dir, "events").select(col("event_id").cast("double").as("x"),
        col("value")),
      "x", Seq("value"), Q102Buckets)

  private val q102Sql: String =
    s"""WITH src AS (SELECT CAST(event_id AS DOUBLE) AS x, value FROM events),
       | mm AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM src),
       | b AS (SELECT CAST(LEAST(FLOOR((x - mn) / (CASE WHEN mx > mn THEN mx - mn ELSE 1 END) * $Q102Buckets),
       |                         ${Q102Buckets - 1}) AS INT) AS bk, x, value
       |       FROM src CROSS JOIN mm)
       |SELECT round(CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6) AS x,
       |       round(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6) AS value
       |FROM b GROUP BY bk ORDER BY x""".stripMargin

  /** Technical indicators over the per-user event series (the phase-3
    * feature schema's bounded-window family — momentum, ROC, Lane
    * stochastic %K, Williams %R, SMA-ATR; `graft.ts.TechIndicators`).
    * OHLC is derived deterministically from `value` (high/low as
    * |1-step-return| envelopes) so the same formulas are exercised on a
    * table DuckDB also sees. Warm-up rows emit null on both sides. The
    * recursive Wilder family (EMA/RSI/ADX/MACD) is inherently IIR —
    * not expressible in a DuckDB window — and is spec-verified instead
    * (`TechIndicatorsSpec` vs independent array references).
    */
  private def q103(s: SparkSession, dir: String): DataFrame = {
    import graft.ts.TechIndicators
    val ret1 = coalesce(col("value") - lag(col("value"), 1).over(evWindow), lit(0.0))
    val base = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"),
      col("value").as("close"),
      (col("value") + lit(0.5) * abs(ret1)).as("high"),
      (col("value") - lit(0.3) * abs(ret1)).as("low"))
    val withTr = base.withColumn("tr",
      TechIndicators.trueRange(col("high"), col("low"), col("close"), evWindow))
    // %K materialized UNROUNDED so %D smooths the same values DuckDB's
    // subquery sees (window-over-window needs its own projection level)
    val withK = withTr.withColumn("k14",
      TechIndicators.stochasticK(col("close"), col("high"), col("low"), evWindow, 14))
    withK.select(col("event_id"), col("user_id"),
      round(TechIndicators.momentum(col("close"), evWindow, 6), 6).as("mom_6"),
      round(TechIndicators.roc(col("close"), evWindow, 6), 6).as("roc_6"),
      round(col("k14"), 6).as("stoch_k_14"),
      round(TechIndicators.stochasticD(col("k14"), evWindow), 6).as("stoch_d_14"),
      round(TechIndicators.williamsR(col("close"), col("high"), col("low"), evWindow, 14), 6).as("wr_14"),
      round(TechIndicators.atrSma(col("tr"), evWindow, 14), 6).as("atr_14"),
      round(TechIndicators.cci(col("high"), col("low"), col("close"), evWindow, 20), 6).as("cci_20"))
  }

  private val q103Sql: String =
    """WITH base AS (
      |  SELECT event_id, user_id, ts, value AS close,
      |    value + 0.5*ABS(COALESCE(value - LAG(value,1) OVER w, 0)) AS high,
      |    value - 0.3*ABS(COALESCE(value - LAG(value,1) OVER w, 0)) AS low
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |trr AS (
      |  SELECT *, CASE WHEN LAG(close,1) OVER w IS NULL THEN high - low
      |    ELSE GREATEST(high - low, ABS(high - LAG(close,1) OVER w), ABS(low - LAG(close,1) OVER w)) END AS tr,
      |    (high + low + close)/3 AS tp
      |  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |k AS (
      |  SELECT *,
      |    CASE WHEN COUNT(*) OVER w14 >= 14 AND MAX(high) OVER w14 <> MIN(low) OVER w14
      |      THEN (close - MIN(low) OVER w14)/(MAX(high) OVER w14 - MIN(low) OVER w14)*100 END AS k14,
      |    CASE WHEN COUNT(*) OVER w14 >= 14 AND MAX(high) OVER w14 <> MIN(low) OVER w14
      |      THEN (MAX(high) OVER w14 - close)/(MAX(high) OVER w14 - MIN(low) OVER w14)*-100 END AS wr14,
      |    CASE WHEN COUNT(*) OVER w14 >= 14 THEN AVG(tr) OVER w14 END AS atr14,
      |    AVG(tp) OVER w20 AS tpm, COUNT(*) OVER w20 AS tpc, list(tp) OVER w20 AS tpl
      |  FROM trr WINDOW
      |    w14 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
      |    w20 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id,
      |  ROUND(close - LAG(close,6) OVER w, 6) + 0.0 AS mom_6,
      |  ROUND(CASE WHEN LAG(close,6) OVER w <> 0 THEN (close/LAG(close,6) OVER w - 1)*100 END, 6) + 0.0 AS roc_6,
      |  ROUND(k14, 6) + 0.0 AS stoch_k_14,
      |  ROUND(CASE WHEN COUNT(k14) OVER w3 >= 3 THEN AVG(k14) OVER w3 END, 6) + 0.0 AS stoch_d_14,
      |  ROUND(wr14, 6) + 0.0 AS wr_14,
      |  ROUND(atr14, 6) + 0.0 AS atr_14,
      |  ROUND(CASE WHEN tpc >= 20
      |      AND list_aggregate(list_transform(list_sort(tpl), x -> abs(x - tpm)), 'sum')/20 <> 0
      |    THEN (tp - tpm)/(0.015 * (list_aggregate(list_transform(list_sort(tpl), x -> abs(x - tpm)), 'sum')/20)) END, 6) + 0.0 AS cci_20
      |FROM k
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
      |  w3 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin

  /** W14 time-axis reversal as a driver query (previously spec-only):
    * the last-6 inclusive window per event, REVERSED
    * (`Windows.reverseWindow` — step 0 = the row itself, step 5 = the
    * oldest), emitted long-form like q65 so no array column crosses the
    * oracle hash. Values are copied, not computed — hash-exact.
    */
  private def q104(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "events").select("event_id", "user_id", "ts", "value")
    graft.feature.Windows.slidingInclusive(base, Seq("value"), 6, evWindow)
      .withColumn("rw", graft.feature.Windows.reverseWindow(col("window")))
      .select(col("user_id"), col("event_id"),
        posexplode(col("rw")).as(Seq("step", "__v")))
      .select(col("user_id"), col("event_id"),
        col("step").cast("int").as("step"), col("__v")(0).as("value_rw"))
  }

  private val q104Sql =
    """WITH g AS (SELECT user_id, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events)
      |SELECT a.user_id, a.event_id, CAST(s.step AS INT) AS step,
      |       b.value AS value_rw
      |FROM g a
      |JOIN (SELECT UNNEST(range(6)) AS step) s ON true
      |JOIN g b ON b.user_id = a.user_id AND b.rn = a.rn - s.step
      |WHERE a.rn >= 6""".stripMargin

  /** J4 horizontal concat as a driver query (previously spec-only), in
    * its keyed at-scale form (`Windows.alignByRowNumberKeyed`): the
    * k-th click aligned with the k-th purchase within each user —
    * row numbers under `partitionBy(user_id)`, then a plain equi-join
    * on (user_id, position). No single-partition window.
    */
  private def q105(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select("event_id", "user_id", "ts", "event_type", "value")
    def side(tpe: String, as: String) =
      ev.filter(col("event_type") === tpe)
        .select(col("user_id"), col("ts"), col("event_id"), col("value").as(as))
    graft.feature.Windows.alignByRowNumberKeyed(
        side("click", "click_value"), side("purchase", "purchase_value"),
        Seq("user_id"), Seq("ts", "event_id"), Seq("ts", "event_id"))
      .select("user_id", "rn", "click_value", "purchase_value")
  }

  private val q105Sql =
    """WITH x AS (SELECT user_id, value AS click_value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events WHERE event_type = 'click'),
      |y AS (SELECT user_id, value AS purchase_value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events WHERE event_type = 'purchase')
      |SELECT x.user_id, CAST(x.rn AS BIGINT) AS rn, click_value, purchase_value
      |FROM x JOIN y ON x.user_id = y.user_id AND x.rn = y.rn""".stripMargin

  /** Shared trades relation for q46/q47: the state machine is the
    * expensive part (shuffle + ordered single pass per symbol), and the
    * summary is an aggregate OVER its output — computing it twice doubled
    * the pair's cost (r2 finding #3). Memoized per (session, dir) and
    * persisted so whichever of q46/q47 runs first materializes it once;
    * the trades table is tiny relative to the bars (one row per closed
    * trade), so MEMORY_AND_DISK is safe at any SF.
    */
  private val tradesCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Dataset[Backtest.Trade]]

  /** Unpersist and drop every memoized trades relation — the same
    * lifecycle contract as `Dedup.clearCaches`/`Similarity.clearCaches`:
    * long-lived sessions call this between rounds, else the map retains
    * one persisted relation (and a strong SparkSession reference) per
    * (session, dir) forever.
    */
  def clearTradesCache(): Unit = {
    tradesCache.values.foreach(_.unpersist(blocking = false))
    tradesCache.clear()
    feedCache.clear()
    deleteTempFactDirs()
  }

  /** q122/q123's committed fact tables live under per-(session, dir)
    * temp dirs — delete the whole temp roots (the graft-q12x-fact
    * parents, not just the fact subdirs) and evict the cache entries.
    * Pure filesystem work (no Spark calls), so it is safe from the JVM
    * shutdown hook below. */
  private[graft] def deleteTempFactDirs(): Unit = {
    factCache.values.foreach { p =>
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(p).getParentFile)
    }
    factCache.clear()
    q123Cache.values.foreach { case (p, _) =>
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(p).getParentFile)
    }
    q123Cache.clear()
  }

  /** JVM-exit safety net (r17, carried r15/r16 nit): a host that never
    * calls [[clearTradesCache]] (an interrupted Bench, an ad-hoc
    * session) would otherwise leave one committed temp fact per
    * (session, dir) on disk. Registered once at object init; the
    * in-session lifecycle contract (call clearTradesCache between
    * rounds) is unchanged. */
  private[graft] val tempFactCleanupHook: Thread = {
    val t = new Thread(() => deleteTempFactDirs(), "graft-temp-fact-cleanup")
    Runtime.getRuntime.addShutdownHook(t)
    t
  }

  /** One collected (key, ts-millis, user_id, event_id) feed per
    * (session, dir, cap), shared by the distinct/sample streaming
    * differentials — a full Verify run collects the events feed ONCE
    * instead of once per family. Bounded (≤ maxTicks rows per entry)
    * and cleared by [[clearTradesCache]] (Verify's shutdown hook).
    */
  private val feedCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int), Array[(String, Long, Long, Long)]]

  private def eventsIdFeed(s: SparkSession, dir: String,
      maxTicks: Int): Array[(String, Long, Long, Long)] =
    // keyed on the session OBJECT (the tradesCache pattern, same
    // clearTradesCache lifecycle) — an identityHashCode key could
    // collide across sessions and serve a feed collected under another
    // session's catalog/config (ADVICE r14)
    feedCache.getOrElseUpdate(
      (s, dir, maxTicks), {
        import s.implicits._
        val src = t(s, dir, "events")
          .select(col("event_type").as("key"),
            (unix_micros(col("ts")) / 1000L).cast("long").as("ts"),
            col("user_id"), col("event_id"))
          .as[(String, Long, Long, Long)]
        cappedSortedFeed(src, maxTicks,
          (r: (String, Long, Long, Long)) => (r._2, r._4))
      })

  private val BtParams = Backtest.Params(threshold = 10.0, tp = 20.0, sl = 10.0)

  private def backtestBars(s: SparkSession, dir: String): Dataset[Backtest.Bar] = {
    import s.implicits._
    t(s, dir, "events").select(
      col("user_id").cast("string").as("symbol"),
      unix_micros(col("ts")).as("ts"),
      col("value").as("open"),
      (col("value") * 1.01).as("high"),
      (col("value") * 0.99).as("low"),
      col("value").as("close"),
      (col("value") + (get_json_object(col("props"), "$.k").cast("double") - 50.0) / 2.0)
        .as("pred")).as[Backtest.Bar]
  }

  private def backtestTrades(s: SparkSession, dir: String): Dataset[Backtest.Trade] =
    tradesCache.getOrElseUpdate((s, dir),
      Backtest.run(backtestBars(s, dir), BtParams)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The q46/q47 differential gate, run against the ACTUAL sfDir feed
    * (not just the spec fixture): replays the same bars q46 consumes
    * through the streaming `flatMapGroupsWithState` face in `chunks`
    * ts-ordered micro-batches (state must survive the boundaries
    * mid-trade) and compares trade-for-trade against the batch
    * authority, then compares `Backtest.summary` over both trade sets
    * (each single-partition ts-sorted, so float aggregation order is
    * identical and exact equality is well-defined). `Verify` records
    * the result in `differential.json` next to the parquet dumps —
    * the structurally-no-oracle q46/q47 rows get a machine-checked
    * verdict instead of a bare rows-only check.
    *
    * The streaming replay is inherently driver-side (MemoryStream), so
    * the bar collect is capped to a ts-ordered prefix of `maxBars`; when
    * the cap binds, BOTH sides (batch authority and stream) replay the
    * same prefix, so the differential stays apples-to-apples instead of
    * OOMing the driver on a large sfDir. At verify scale (sf≤0.1 ≪
    * maxBars) the cap never binds and the full-feed behavior is
    * unchanged.
    *
    * Returns (batchTrades, streamTrades, tradesMatch, summaryMatch).
    */
  def backtestDifferential(s: SparkSession, dir: String,
      chunks: Int = 3, maxBars: Int = 2000000): (Long, Long, Boolean, Boolean) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val tradeKey = (t: Backtest.Trade) => (t.symbol, t.entryTs, t.exitTs)
    // bounded probe: limit(maxBars+1).count() answers "more than
    // maxBars?" with capped work instead of a full-table count scan
    val capped = backtestBars(s, dir).limit(maxBars + 1).count() > maxBars
    val bars =
      if (!capped) backtestBars(s, dir).collect().sortBy(_.ts)
      // every Bar column joins the sort so the capped prefix is a
      // deterministic function of the data even if (ts, symbol) repeats
      // — repeated runs on large data must compare the SAME prefix
      else backtestBars(s, dir).orderBy(col("ts"), col("symbol"),
          col("open"), col("high"), col("low"), col("close"), col("pred"))
        .limit(maxBars).as[Backtest.Bar].collect()
    val batchDs =
      if (!capped) backtestTrades(s, dir)
      else Backtest.run(s.createDataset(bars.toIndexedSeq), BtParams)
    val batch = batchDs.collect().toSeq.sortBy(tradeKey)
    val mem = MemoryStream[Backtest.Bar]
    val name = s"btdiff_${math.abs(dir.hashCode)}"
    val q = graft.streaming.StreamOps.streamingBacktest(mem.toDS(), BtParams)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    val stream =
      try {
        val per = math.max(1, (bars.length + chunks - 1) / chunks)
        bars.grouped(per).foreach { c =>
          mem.addData(c.toIndexedSeq: _*); q.processAllAvailable()
        }
        s.table(name).as[Backtest.Trade].collect().toSeq.sortBy(tradeKey)
      } finally q.stop()
    def summarize(ts: Seq[Backtest.Trade]) =
      Backtest.summary(s.createDataset(ts).coalesce(1).as[Backtest.Trade])
        .orderBy(col("symbol")).collect().toSeq
    val summaryMatch = summarize(batch) == summarize(stream)
    (batch.length.toLong, stream.length.toLong, batch == stream, summaryMatch)
  }

  /** §2.10 backtest state machine on per-user event series (close=value,
    * pseudo-prediction from the JSON payload) — hash-exact since r12
    * against `BacktestOracle.q46Sql`'s recursive-CTE replay; the
    * batch≡streaming differential remains a second check.
    */
  private def q46(s: SparkSession, dir: String): DataFrame =
    backtestTrades(s, dir).toDF()

  /** A10 backtest trade summary per symbol — hash-exact since r12
    * against `BacktestOracle.q47Sql` (aggregates the SAME persisted
    * trades relation as q46, not a recomputation).
    */
  private def q47(s: SparkSession, dir: String): DataFrame =
    Backtest.summary(backtestTrades(s, dir))

  /** The strategy-parameter grid the q114 driver query evaluates — three
    * spreads around `BtParams` covering loose/tight entry gates and
    * asymmetric TP/SL, i.e. the corners `StrategyOptimizer`'s genome
    * space moves through.
    */
  private val Q114Grid: Seq[(Int, Backtest.Params)] = Seq(
    1 -> BtParams,
    2 -> Backtest.Params(threshold = 5.0, tp = 10.0, sl = 6.0),
    3 -> Backtest.Params(threshold = 15.0, tp = 30.0, sl = 8.0))

  /** The `optimizer_ga.py` EVALUATION kernel as a driver query: the same
    * bar feed as q46, backtested under a fixed 3-point strategy grid —
    * one row per parameter set with its corpus-wide trade count and
    * exact-decimal total/abs profit (the scalar the GA maximizes). Each
    * set is an independent distributed backtest (repartition(symbol) +
    * fold); the oracle replays each set's walk via
    * [[graft.oracle.BacktestOracle]] and folds the SAME per-trade
    * decimal casts, so the whole grid evaluation is hash-exact. (The GA
    * champion itself is data-dependent — not expressible as static
    * oracle SQL — so the kernel it iterates is what gets the hard
    * driver row; the search loop is spec'd in `StrategyOptimizerSpec`.)
    */
  private def q114(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // OPT-r17 (guide §2.4): one sorted pass steps all 3 grid machines
    // (Backtest.runGrid) — was 3 independent scan+shuffle+sort+walk
    // pipelines union'd. Per-param trades are identical trade-for-trade
    // (GridBacktestSpec), the dsum decimal aggregates are the same, and
    // the grid-meta left join reinstates the zero-trade row the old
    // global agg emitted (count/sums coalesced exactly as before).
    val bars = backtestBars(s, dir)
    val agg = Backtest.runGrid(bars, Q114Grid).toDF("param_id", "trade")
      .groupBy(col("param_id"))
      .agg(count(lit(1)).as("n_trades"),
        dsum(col("trade.profit")).as("total_profit"),
        dsum(abs(col("trade.profit"))).as("total_abs_profit"))
    val meta = Q114Grid
      .map { case (id, p) => (id, p.threshold, p.tp, p.sl) }
      .toDF("param_id", "threshold", "tp", "sl")
    meta.join(agg, Seq("param_id"), "left")
      .select(col("param_id"), col("threshold"), col("tp"), col("sl"),
        coalesce(col("n_trades"), lit(0L)).as("n_trades"),
        coalesce(col("total_profit"), lit(0.0)).as("total_profit"),
        coalesce(col("total_abs_profit"), lit(0.0)).as("total_abs_profit"))
  }

  private def q114Sql: String =
    Q114Grid.map { case (id, p) =>
      s"""SELECT CAST($id AS INTEGER) AS param_id,
         | CAST(${p.threshold} AS DOUBLE) AS threshold,
         | CAST(${p.tp} AS DOUBLE) AS tp, CAST(${p.sl} AS DOUBLE) AS sl,
         | COUNT(*) AS n_trades,
         | COALESCE(CAST(SUM(CAST(profit AS DECIMAL(18,6))) AS DOUBLE),
         |          CAST(0.0 AS DOUBLE)) AS total_profit,
         | COALESCE(CAST(SUM(CAST(ABS(profit) AS DECIMAL(18,6))) AS DOUBLE),
         |          CAST(0.0 AS DOUBLE)) AS total_abs_profit
         |FROM (
         |${graft.oracle.BacktestOracle.q46Sql(p)}
         |)""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** `fact_strategy_params` as a driver query — the OLAP landing of the
    * strategy-optimizer champion (`olap_schema_postgres.sql:80-87`; the
    * walk-forward loader face is
    * `StrategyOptimizer.walkForwardFactRows` →
    * `OlapEtl.loadFactStrategyParamsRows`, SnapshotStore-committed and
    * round-tripped in `StrategyOptimizerSpec`): the grid champion —
    * argmax total_profit over the q114 evaluation kernel, param_id
    * tie-break — becomes the fact's JSONB params payload (both engines
    * build the identical JSON text from the same walked values, the
    * q63 discipline) and flattens back out through
    * `OlapEtl.deepConfigKv` (J5's recursive JSONB flatten). Champion
    * selection is a TakeOrdered over the 3 aggregate rows — no window,
    * no shuffle beyond q114's own backtests.
    */
  private def q116(s: SparkSession, dir: String): DataFrame = {
    val champ = q114(s, dir)
      .orderBy(col("total_profit").desc, col("param_id")).limit(1)
    val payload = concat(
      lit("""{"strategy_name":"grid_champion","threshold":"""),
      col("threshold").cast("string"),
      lit(""","tp":"""), col("tp").cast("string"),
      lit(""","sl":"""), col("sl").cast("string"),
      lit(""","n_trades":"""), col("n_trades").cast("string"),
      lit("}"))
    val fact = champ.select(
      lit("exp_grid").as("experiment_key"),
      lit("grid_champion").as("strategy_name"),
      lit("1h").as("freq"),
      payload.as("params"))
    graft.olap.OlapEtl.deepConfigKv(fact, "strategy_name", "params")
  }

  private def q116Sql: String =
    s"""WITH eval AS (
       |${q114Sql}
       |), champ AS (
       |  SELECT * FROM eval ORDER BY total_profit DESC, param_id LIMIT 1)
       |SELECT 'grid_champion' AS strategy_name,
       |       'strategy_name' AS conf_path, 'grid_champion' AS conf_value
       |FROM champ
       |UNION ALL SELECT 'grid_champion', 'threshold', CAST(threshold AS VARCHAR) FROM champ
       |UNION ALL SELECT 'grid_champion', 'tp', CAST(tp AS VARCHAR) FROM champ
       |UNION ALL SELECT 'grid_champion', 'sl', CAST(sl AS VARCHAR) FROM champ
       |UNION ALL SELECT 'grid_champion', 'n_trades', CAST(n_trades AS VARCHAR) FROM champ""".stripMargin

  /** Legacy OLAP fact_trade_metrics as a driver query
    * (`olap_schema_postgres.sql:66-78`; loader face =
    * `OlapEtl.tradeMetrics`): one strategy-results row per symbol
    * (each per-series backtest standing in for an experiment run) from
    * the SAME persisted trades relation as q46/q47. The ratio columns
    * are computed via the exact-decimal sum discipline instead of
    * `stddev_pop` (whose single-pass central-moment accumulation is
    * engine-private): per-trade profits come bit-identical out of the
    * sequential state machine, their decimal-cast sums are order-free,
    * and sharpe/sortino re-derive from (Σp, Σp², Σdown², n) with the
    * same straight-line IEEE ops on both engines — hash-exact. The
    * nullable horizon FK is omitted (an all-NULL int column has no
    * stable cross-engine pandas dtype).
    */
  private def q111(s: SparkSession, dir: String): DataFrame = {
    val tr = backtestTrades(s, dir).toDF()
    def d4(c: Column) = sum(c.cast(DecimalType(18, 4))).cast("double")
    val mean = col("__sp") / col("__n")
    val sd = sqrt(col("__spp") / col("__n") - mean * mean)
    val dd = sqrt(col("__sdd") / col("__n"))
    tr.groupBy(col("symbol"))
      .agg(
        dsum(col("profit")).as("__sp"),
        d4(col("profit") * col("profit")).as("__spp"),
        d4(when(col("profit") < 0.0, col("profit") * col("profit"))
          .otherwise(lit(0.0))).as("__sdd"),
        max(col("maxDrawdown")).as("max_drawdown"),
        count(when(col("profit") > 0.0, 1)).as("__wins"),
        count(lit(1)).as("__n"))
      .select(
        col("symbol").as("experiment_key"),
        col("__sp").as("total_profit"),
        col("max_drawdown"),
        when(sd > 0.0, mean / sd).as("sharpe"),
        when(dd > 0.0, mean / dd).as("sortino"),
        (col("__wins") / col("__n")).as("win_rate"),
        mean.as("avg_trade_return"),
        col("__n").cast("int").as("trades_count"))
  }

  private def q111Sql: String =
    graft.oracle.BacktestOracle.walkCte(BtParams) + """
      |, tm AS (
      |  SELECT symbol,
      |    CAST(SUM(CAST(t_profit AS DECIMAL(18,6))) AS DOUBLE) AS sp,
      |    CAST(SUM(CAST(t_profit * t_profit AS DECIMAL(18,4))) AS DOUBLE) AS spp,
      |    CAST(SUM(CAST(CASE WHEN t_profit < 0 THEN t_profit * t_profit
      |                       ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS sdd,
      |    MAX(t_max_dd) AS max_drawdown,
      |    COUNT(CASE WHEN t_profit > 0 THEN 1 END) AS wins,
      |    COUNT(*) AS n
      |  FROM walk WHERE t_reason IS NOT NULL GROUP BY symbol)
      |SELECT symbol AS experiment_key, sp AS total_profit, max_drawdown,
      |  CASE WHEN SQRT(spp / n - (sp / n) * (sp / n)) > 0
      |    THEN (sp / n) / SQRT(spp / n - (sp / n) * (sp / n)) END AS sharpe,
      |  CASE WHEN SQRT(sdd / n) > 0
      |    THEN (sp / n) / SQRT(sdd / n) END AS sortino,
      |  wins / n AS win_rate,
      |  sp / n AS avg_trade_return,
      |  CAST(n AS INTEGER) AS trades_count
      |FROM tm""".stripMargin

  /** Legacy OLAP fact_experiment_metrics as a driver query
    * (`olap_schema_postgres.sql:40-52`; loader face =
    * `OlapEtl.experimentMetrics`): synthesize the S8 results-CSV shape
    * from events (metric string per row, Average = exact-decimal mean),
    * then regex-parse + canonicalize + PIVOT the five metrics into the
    * wide fact columns — one grouped conditional-aggregation pass, no
    * `pivot()` plan (the metric set is fixed by the DDL).
    */
  private def q112(s: SparkSession, dir: String): DataFrame = {
    val metric = concat(
      when(col("event_id") % 3 === 0, "Train")
        .when(col("event_id") % 3 === 1, "Validation")
        .otherwise("Test"),
      lit(" "),
      when(col("event_id") % 5 === 0, "MAE")
        .when(col("event_id") % 5 === 1, "Naive MAE")
        .when(col("event_id") % 5 === 2, "R2")
        .when(col("event_id") % 5 === 3, "Uncertainty")
        .otherwise("SNR"),
      lit(" H"), (col("event_id") % 6 + 1).cast("string"))
    val results = t(s, dir, "events")
      .select(metric.as("Metric"), col("value"))
      .groupBy(col("Metric"))
      .agg(
        (dsum(col("value")) / count(lit(1))).as("Average"),
        lit(0.0).as("Std Dev"),
        min(col("value")).as("Min"),
        max(col("value")).as("Max"))
    graft.olap.OlapEtl.experimentMetrics(results, "exp_events")
  }

  private val q112Sql =
    """WITH m AS (SELECT
      |  (CASE WHEN event_id % 3 = 0 THEN 'Train'
      |        WHEN event_id % 3 = 1 THEN 'Validation' ELSE 'Test' END
      |   || ' ' ||
      |   CASE WHEN event_id % 5 = 0 THEN 'MAE'
      |        WHEN event_id % 5 = 1 THEN 'Naive MAE'
      |        WHEN event_id % 5 = 2 THEN 'R2'
      |        WHEN event_id % 5 = 3 THEN 'Uncertainty' ELSE 'SNR' END
      |   || ' H' || CAST(event_id % 6 + 1 AS VARCHAR)) AS metric, value
      | FROM events),
      |r AS (SELECT metric,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_v
      | FROM m GROUP BY metric),
      |p AS (SELECT
      |  lower(regexp_extract(metric, '^(Train|Validation|Test) (.+?) H(\d+)$', 1)) AS split_key,
      |  regexp_extract(metric, '^(Train|Validation|Test) (.+?) H(\d+)$', 2) AS name,
      |  CAST(regexp_extract(metric, '^(Train|Validation|Test) (.+?) H(\d+)$', 3) AS INTEGER) AS horizon_key,
      |  avg_v FROM r)
      |SELECT 'exp_events' AS experiment_key, split_key, horizon_key,
      |  MAX(CASE WHEN name = 'MAE' THEN avg_v END) AS mae,
      |  MAX(CASE WHEN name = 'R2' THEN avg_v END) AS r2,
      |  MAX(CASE WHEN name = 'Uncertainty' THEN avg_v END) AS uncertainty,
      |  MAX(CASE WHEN name = 'SNR' THEN avg_v END) AS snr,
      |  MAX(CASE WHEN name = 'Naive MAE' THEN avg_v END) AS naive_error
      |FROM p GROUP BY split_key, horizon_key""".stripMargin

  /** The q61 differential gate: Spark's `approx_percentile` is
    * implementation-defined (no DuckDB-matchable bits), but its
    * Greenwald–Khanna contract IS checkable — the returned value's rank
    * inside the group must lie within n/accuracy of the target rank
    * p·n. Computed distributedly (the approx relation is #groups × #ps
    * rows → broadcast join back to the events, one grouped count pass);
    * `Verify` records the verdict in `differential.json` beside
    * q46/q47, turning the last structurally-no-oracle row into a
    * machine-checked bound.
    *
    * Returns (checks, violations, maxRankErrFrac, boundFrac): rank
    * error as a fraction of n vs the sketch bound 1/accuracy (+1 rank
    * of interpolation slack).
    */
  /** GK contract check over q61's sketch values. Returns
    * (checks, violations, maxErrRanks, maxBoundRanks, maxErrOverBound,
    * nominalFrac): the ENFORCED bound is `n/accuracy + 1` ABSOLUTE ranks
    * per (group, p) — at small n the `+1` interpolation rank dominates,
    * so the per-n error FRACTION legitimately exceeds the nominal
    * `1/accuracy` without any violation. `maxErrOverBound` is the
    * self-consistent verdict number: ≤ 1.0 ⟺ violations == 0.
    */
  def percentileDifferential(s: SparkSession, dir: String,
      accuracy: Int = 10000): (Long, Long, Double, Double, Double, Double) = {
    val (checks, violations, maxErrRanks, maxBoundRanks, maxErrOverBound) =
      rankDifferential(s, dir, stackSketch(q61Approx(s, dir), Q61Ps),
        (_, n) => n.toDouble / accuracy + 1.0) // +1 rank of slack
    (checks, violations, maxErrRanks, maxBoundRanks, maxErrOverBound, 1.0 / accuracy)
  }

  /** Quantitative t-digest verdict for differential.json — q115's
    * within_bound booleans with the margin numbers kept: how close the
    * mergeable digest's worst (group, p) sits to the 8·n·p(1−p)/δ + 2
    * rank bound.
    */
  def tdigestDifferential(s: SparkSession, dir: String)
      : (Long, Long, Double, Double, Double) =
    rankDifferential(s, dir, stackSketch(q115Digest(s, dir), Q115Ps),
      (p, n) => 8.0 * n * p * (1.0 - p) / Q115Compression + 2.0)

  /** Batch≡streaming differential for the quantile family (the
    * q46/q47 pattern): the events feed, keyed by event_type, replays
    * through `StreamOps.streamingQuantiles` (the §2.10 face of q115's
    * mergeable t-digest) in `chunks` deterministic micro-batches, and
    * three verdicts are recorded:
    *
    *  1. `foldMatch` — the stream's FULL emission history (every
    *     live-update row) equals a driver-side replay of the same
    *     chunks through the same `QuantilesAgg` fold, bit-for-bit:
    *     state carry, in-batch ordering, and loss/duplication are all
    *     pinned (the digest is deterministic GIVEN chunk boundaries;
    *     the boundaries are fixed by the (ts, event_id) sort).
    *  2. `nMatch` — each key's final count equals the batch count.
    *  3. the final streaming digest per key obeys q115's rank bound
    *     (8·n·p(1−p)/δ + 2) against the exact sorted values — stream
    *     and batch-UDAF merge trees differ, so the CONTRACT is their
    *     shared invariant, exactly as across shuffle partitionings.
    *
    * The tick collect is capped like [[backtestDifferential]]'s
    * (deterministic (ts, event_id)-prefix; cap never binds at verify
    * scale). Returns (ticks, keys, foldMatch, nMatch, violations,
    * maxErrOverBound).
    */
  /** Deterministic capped feed collect shared by the streaming
    * differentials: ONE scan in the uncapped (normal) case — the cap
    * probe is collected directly, and only when the cap binds is a
    * deterministic prefix re-collected, ordered by `sortCols`. The
    * caller's `key` MUST extract exactly the `sortCols` values in the
    * same order (the driver-side sortBy and the capped re-collect's
    * orderBy must agree, or the prefix and its ordering diverge) —
    * passing them together keeps that coupling in one signature
    * (ADVICE r14: the pair was previously hardcoded to (ts, event_id)
    * while `key` was caller-supplied).
    */
  private def cappedSortedFeed[T](src: Dataset[T], maxTicks: Int,
      key: T => (Long, Long),
      sortCols: Seq[String] = Seq("ts", "event_id"))(
      implicit ct: scala.reflect.ClassTag[T]): Array[T] = {
    val probe = src.limit(maxTicks + 1).collect()
    (if (probe.length <= maxTicks) probe
     else src.orderBy(sortCols.map(col): _*).limit(maxTicks).collect())
      .sortBy(key)
  }

  /** Feed `ticks` through a streaming face in `per`-sized deterministic
    * micro-batches (MemoryStream → Update-mode memory sink) and return
    * the full emission history — the chunk scaffolding shared by both
    * streaming differentials so the cap/boundary handling cannot drift
    * between the quantile and cardinality families.
    */
  private def runStreamChunks[T, R](s: SparkSession, ticks: Seq[T],
      per: Int, name: String,
      build: Dataset[T] => Dataset[R])(
      implicit te: org.apache.spark.sql.Encoder[T],
      re: org.apache.spark.sql.Encoder[R]): Seq[R] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[T]
    val q = build(mem.toDS())
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try {
      ticks.grouped(per).foreach { c =>
        mem.addData(c.toIndexedSeq: _*); q.processAllAvailable()
      }
      s.table(name).as[R].collect().toSeq
    } finally q.stop()
  }

  def streamingQuantilesDifferential(s: SparkSession, dir: String,
      chunks: Int = 3, maxTicks: Int = 2000000)
      : (Long, Long, Boolean, Boolean, Long, Double) = {
    import s.implicits._
    import graft.streaming.StreamOps
    val ps = Q115Ps
    val agg = new graft.metrics.TDigest.QuantilesAgg(ps, Q115Compression)
    // QuantileTick.ts is epoch MILLIS (the streamingQuantiles watermark
    // contract — a micros feed would shrink event-time idle budgets
    // 1000×); nulls are excluded exactly as the digests exclude them
    val src = t(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("key"),
        (unix_micros(col("ts")) / 1000L).cast("long").as("ts"),
        col("value"), col("event_id"))
      .as[(String, Long, Double, Long)]
    val raw = cappedSortedFeed(src, maxTicks,
      (r: (String, Long, Double, Long)) => (r._2, r._4))
    val ticks = raw.map(r => StreamOps.QuantileTick(r._1, r._2, r._3))
    // ONE chunk-size definition: the stream feed and the driver replay
    // must fold identical micro-batch boundaries
    val per = math.max(1, (ticks.length + chunks - 1) / chunks)
    val streamRows = runStreamChunks(s, ticks.toSeq, per,
      s"qdiff_${math.abs(dir.hashCode)}",
      (in: Dataset[StreamOps.QuantileTick]) =>
        StreamOps.streamingQuantiles(in, ps, Q115Compression))
    // the ONE reference fold both this differential and the spec use
    val replay = StreamOps.replayQuantileChunks(
      ticks.grouped(per).map(_.toSeq), agg)
    def sorted(rs: Seq[StreamOps.QuantileRow]) =
      rs.sortBy(r => (r.key, r.n)).map(r =>
        (r.key, r.n, r.closed, r.quantiles.toList))
    val foldMatch = sorted(streamRows) == sorted(replay)
    // final digest per key: count parity + q115's rank contract
    val valuesByKey = raw.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._3).sorted }
    var nMatch = streamRows.nonEmpty
    var violations = 0L
    var maxOver = 0.0
    streamRows.groupBy(_.key).foreach { case (k, rs) =>
      val fin = rs.maxBy(_.n)
      val values = valuesByKey(k)
      val n = values.length
      if (fin.n != n) nMatch = false
      ps.zip(fin.quantiles).foreach { case (p, v) =>
        val rle = values.count(_ <= v).toLong
        val rlt = values.count(_ < v).toLong
        val target = p * n
        val err =
          if (target < rlt + 1) (rlt + 1) - target
          else if (target > rle) target - rle
          else 0.0
        val bound = 8.0 * n * p * (1.0 - p) / Q115Compression + 2.0
        if (err > bound) violations += 1
        maxOver = math.max(maxOver, err / bound)
      }
    }
    (ticks.length.toLong, valuesByKey.size.toLong, foldMatch, nMatch,
      violations, maxOver)
  }

  /** Quantitative q120 verdict for differential.json: worst-group
    * margins of the union estimate vs 6·rsd·exact + 1 and the
    * inclusion–exclusion intersection estimate vs
    * 6·rsd·√(a²+b²+u²) + 3 — read straight off ONE distributed
    * [[q120Verdict]] execution (only the 5 priority rows reach the
    * driver; works unchanged at any scale).
    */
  def hllSetopsDifferential(s: SparkSession, dir: String)
      : (Long, Long, Double, Double) = {
    val rows = q120Verdict(s, dir).select(
      col("union_exact"), col("inter_exact"),
      col("est_a"), col("est_b"), col("est_union"),
      col("err_bound_union"), col("err_bound_inter"),
      col("union_within"), col("inter_within"), col("sides_covered")).collect()
    var checks = 0L; var viols = 0L; var maxU = 0.0; var maxI = 0.0
    rows.foreach { r =>
      checks += 1
      if (!r.getBoolean(9)) {
        // uncovered priority: estimates are NULL by design — count the
        // named failure, don't NPE on the margin arithmetic
        viols += 1
      } else {
        val errU = math.abs(r.getLong(4) - r.getLong(0)).toDouble
        val errI =
          math.abs((r.getLong(2) + r.getLong(3) - r.getLong(4)) - r.getLong(1))
            .toDouble
        if (!r.getBoolean(7) || !r.getBoolean(8)) viols += 1
        maxU = math.max(maxU, errU / r.getDouble(5))
        maxI = math.max(maxI, errI / r.getDouble(6))
      }
    }
    (checks, viols, maxU, maxI)
  }

  /** q122's stored-grain width: one sketch row per (event_type, day).
    * private[graft]: ScaleProbe's read-vs-rescan comparison must
    * baseline the SAME slice these define, not re-derived copies. */
  private[graft] val Q122GrainUs = 86400000000L
  private val Q122Ps = Seq(0.5, 0.99)
  /** The read-range bounds, INTEGER epoch days (tz-safe like q119's
    * grains): 2024-01-10 .. 2024-01-19 inclusive — a strict interior
    * slice of the testdata's 30-day span, so the pruning is real at
    * every SF. */
  private[graft] val Q122GrainLo: Long = java.time.LocalDate.of(2024, 1, 10).toEpochDay
  private[graft] val Q122GrainHi: Long = java.time.LocalDate.of(2024, 1, 19).toEpochDay
  /** q123's fact keeps HOUR units after hour→day compaction (the r17
    * grain representation: compaction preserves ingest units, coarse
    * rows sit at window starts) — the same day range as q122, spelled
    * in epoch-hours and day-ALIGNED on both ends (lo ≡ 0, hi ≡ 23 mod
    * 24), as the mixed-grain read contract requires. */
  private[graft] val Q123GrainLo: Long = Q122GrainLo * 24L
  private[graft] val Q123GrainHi: Long = Q122GrainHi * 24L + 23L

  /** Sketch-fact READ face — the query a warehouse user actually runs
    * against the [[graft.olap.OlapEtl.loadFactSketches]] landing,
    * closing the loop q117/q119 opened (they pin the rollup ALGEBRA
    * over raw tables; this answers a real percentile + distinct-count
    * question for a key/time-range FROM the committed fact): ingest
    * one digest+HLL row per (event_type, day) via the loader
    * (SnapshotStore-committed — at 100 TB this half already ran at
    * ingest time and the events are cold storage), then answer
    * "p50/p99 of value and distinct users for days 10–19" by a
    * grain-PRUNED scan of the fact — the `grain BETWEEN` predicate
    * reaches the parquet scan as a pushed filter (PlanShapeSpec-pinned;
    * no raw-events access anywhere on the estimate side) — rolled up
    * with `MergeDigestsAgg`/`MergeSketchesAgg`. Verdicts ride as data
    * against exact aggregates over the same raw slice (oracle asserts
    * all TRUE):
    *
    *  - `within_p50`/`within_p99`: the q115/q117 rank contract,
    *    8·n·p(1−p)/δ + 2 — a two-level rollup is one more merge tree
    *    over the same k₁-capped centroids;
    *  - `id_within`: the q118/q119 cardinality contract,
    *    6·rsd·exact + 1 — register-max rollup is lossless;
    *  - `nrows_match`: Σ n_rows over the pruned grains EQUALS the
    *    exact row count of the raw slice — the fact's exact column is
    *    exact, or the loader's grain bucketing drifted.
    *
    * [[sketchFactReadDifferential]] records the quantitative margins in
    * differential.json.
    */
  private def q122(s: SparkSession, dir: String): DataFrame =
    q122Verdict(s, dir).select(
      col("series_key"), col("n_exact"), col("id_exact"),
      col("err_bound_p50"), col("err_bound_p99"), col("id_err_bound"),
      col("nrows_match"), col("within_p50"), col("within_p99"),
      col("id_within"))

  /** One committed q122 fact table per (session, dir) — the ingest is
    * the warehouse's one-time cost, so a Verify run (query dump + the
    * differential re-run) and Bench's warm loops must not pay it per
    * call, nor leave one orphaned temp dir each (review r15 finding).
    * Cleared — and the temp dirs deleted — by [[clearTradesCache]]. */
  private val factCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** Ingest leg of q122: land the per-(event_type, day) sketch fact in
    * a SnapshotStore table (memoized per session+dir) and return its
    * path. Split out so the plan-shape spec can pin the READ plan in
    * isolation. */
  private[graft] def q122Ingest(s: SparkSession, dir: String): String =
    factCache.getOrElseUpdate((s, dir), {
      val factPath = java.nio.file.Files
        .createTempDirectory("graft-q122-fact").toString + "/fact"
      graft.olap.OlapEtl.loadFactSketches(s, t(s, dir, "events"),
        "event_type", "ts", "value", "user_id", Q122GrainUs, factPath,
        Q115Compression, Q119P)
      factPath
    })

  /** READ leg of q122: grain-pruned scan of the committed fact →
    * per-key rollup. Touches ONLY the fact table — the raw events never
    * appear in this plan (the PlanShapeSpec pin). */
  private[graft] def q122Estimate(s: SparkSession, factPath: String): DataFrame =
    q122Estimate(s, factPath, Q122GrainLo, Q122GrainHi)

  /** q123's read face: the identical rollup over the compacted fact,
    * whose grain column stays in HOUR units (window-start day rows). */
  private[graft] def q123Estimate(s: SparkSession, factPath: String): DataFrame =
    q122Estimate(s, factPath, Q123GrainLo, Q123GrainHi)

  /** Bound-parametric read leg: `lo`/`hi` in the FACT's grain units
    * (q122's day-grain fact takes epoch-days; q123's hour-ingested,
    * day-compacted fact takes epoch-hours — same wall-clock range). */
  private[graft] def q122Estimate(s: SparkSession, factPath: String,
      lo: Long, hi: Long): DataFrame = {
    // manifest-level FILE pruning first (r16: the partitioned fact's
    // manifest carries each file's grain range, so out-of-range files
    // are never even listed — at 100 TB that is O(range) file opens,
    // not O(|fact|)), then the row-level BETWEEN still pushes into the
    // scan (the PlanShapeSpec pin, unchanged)
    val fact = graft.olap.PartitionedSnapshotStore
      .readRange(s, factPath, lo, hi)
      .orElse(graft.olap.SnapshotStore.read(s, factPath)).get
      .filter(col("grain").between(lo, hi))
    val roll = udaf(
      new graft.metrics.TDigest.MergeDigestsAgg(Q122Ps, Q115Compression),
      Encoders.product[graft.metrics.TDigest.Digest])
    val hll = udaf(new graft.metrics.Hll.MergeSketchesAgg(Q119P),
      Encoders.product[graft.metrics.Hll.Sketch])
    fact.groupBy(col("series_key"))
      .agg(
        roll(col("value_digest.means"), col("value_digest.weights")).as("__qs"),
        hll(col("id_sketch.regs")).as("id_est"),
        sum(col("n_rows")).as("n_fact"))
      .select(col("series_key"),
        element_at(col("__qs"), 1).as("qv50"),
        element_at(col("__qs"), 2).as("qv99"),
        col("id_est"), col("n_fact"))
  }

  /** q122 with the raw estimate columns (differential face — the
    * sketch values are merge-tree-specific, so the driver row keeps
    * bounds + booleans only). The verdict join is the
    * [[sketchRankVerdict]] shape widened to two ps + the cardinality
    * columns: the 5-row estimate relation broadcasts back onto ONE
    * grouped pass over the raw slice. */
  private[graft] def q122Verdict(s: SparkSession, dir: String): DataFrame =
    sketchFactVerdict(s, dir, q122Ingest(s, dir), Q122GrainLo, Q122GrainHi)

  /** The q122 verdict machinery, fact-path-parametric (r16) and
    * fact-bound-parametric (r17): q123 runs the SAME read-and-verify
    * over its compacted fact, whose grain units are hours. The exact
    * side always slices raw events by DAY (both bound pairs name the
    * same wall-clock range). */
  private def sketchFactVerdict(s: SparkSession, dir: String,
      factPath: String, factLo: Long, factHi: Long): DataFrame = {
    val est = q122Estimate(s, factPath, factLo, factHi)
    val ev = t(s, dir, "events")
      .filter(col("value").isNotNull && col("user_id").isNotNull)
      .filter(graft.olap.OlapEtl.grainCol(col("ts"), Q122GrainUs)
        .between(Q122GrainLo, Q122GrainHi))
      .select(col("event_type").as("series_key"), col("value"), col("user_id"))
    // the joined estimate columns are constant per series_key, so they
    // ride as GROUP KEYS (deterministic — no first() on a shuffle)
    val agg = ev.join(broadcast(est), "series_key")
      .groupBy(col("series_key"), col("qv50"), col("qv99"),
        col("id_est"), col("n_fact"))
      .agg(
        count(lit(1)).as("n_exact"),
        countDistinct(col("user_id")).as("id_exact"),
        sum(when(col("value") <= col("qv50"), 1L).otherwise(0L)).as("rle50"),
        sum(when(col("value") < col("qv50"), 1L).otherwise(0L)).as("rlt50"),
        sum(when(col("value") <= col("qv99"), 1L).otherwise(0L)).as("rle99"),
        sum(when(col("value") < col("qv99"), 1L).otherwise(0L)).as("rlt99"))
    def rankErr(p: Double, rle: Column, rlt: Column): Column = {
      val target = lit(p) * col("n_exact")
      when(target < rlt + lit(1L), rlt + lit(1L) - target)
        .when(target > rle, target - rle)
        .otherwise(lit(0.0))
    }
    def qBound(p: Double): Column =
      lit(8.0) * col("n_exact") * lit(p * (1.0 - p)) / lit(Q115Compression) +
        lit(2.0)
    val idBound = lit(6.0) * lit(Q119Rsd) * col("id_exact") + lit(1.0)
    agg.select(col("series_key"), col("n_exact"), col("id_exact"),
      col("qv50"), col("qv99"), col("id_est"), col("n_fact"),
      rankErr(0.5, col("rle50"), col("rlt50")).as("rank_err_p50"),
      rankErr(0.99, col("rle99"), col("rlt99")).as("rank_err_p99"),
      qBound(0.5).as("err_bound_p50"),
      qBound(0.99).as("err_bound_p99"),
      idBound.as("id_err_bound"),
      (col("n_fact") === col("n_exact")).as("nrows_match"),
      (rankErr(0.5, col("rle50"), col("rlt50")) <= qBound(0.5)).as("within_p50"),
      (rankErr(0.99, col("rle99"), col("rlt99")) <= qBound(0.99)).as("within_p99"),
      (abs(col("id_est") - col("id_exact")).cast("double") <= idBound)
        .as("id_within"))
  }

  private def q122Sql = {
    val pq50 = 0.5 * (1.0 - 0.5)
    val pq99 = 0.99 * (1.0 - 0.99)
    s"""SELECT event_type AS series_key,
       | COUNT(*) AS n_exact,
       | COUNT(DISTINCT user_id) AS id_exact,
       | CAST(8.0 AS DOUBLE) * COUNT(*) * CAST($pq50 AS DOUBLE)
       |   / CAST($Q115Compression AS DOUBLE) + CAST(2.0 AS DOUBLE)
       |   AS err_bound_p50,
       | CAST(8.0 AS DOUBLE) * COUNT(*) * CAST($pq99 AS DOUBLE)
       |   / CAST($Q115Compression AS DOUBLE) + CAST(2.0 AS DOUBLE)
       |   AS err_bound_p99,
       | CAST(6.0 AS DOUBLE) * CAST($Q119Rsd AS DOUBLE)
       |   * COUNT(DISTINCT user_id) + CAST(1.0 AS DOUBLE) AS id_err_bound,
       | TRUE AS nrows_match,
       | TRUE AS within_p50,
       | TRUE AS within_p99,
       | TRUE AS id_within
       |FROM events
       |WHERE value IS NOT NULL AND user_id IS NOT NULL
       |  AND epoch_us(ts) // $Q122GrainUs BETWEEN $Q122GrainLo AND $Q122GrainHi
       |GROUP BY event_type""".stripMargin
  }

  /** One compacted fact per (session, dir, query): the HOUR-grain
    * ingest + hour→day compaction (q123: whole-table; q124: scoped to
    * the aged range below [[Q124BoundaryGrain]]) is the lifecycle's
    * one-time cost (memoized like [[q122Ingest]]; temp dirs cleaned by
    * [[clearTradesCache]] and the shutdown hook). Also captures the
    * PRE-compaction fine-grain HLL rollup per key over the read range
    * — the reference for the lossless verdict. */
  private val q123Cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), (String, Map[String, Long])]

  private def compactedHourFact(s: SparkSession, dir: String, tag: String,
      upToGrain: Option[Long]): (String, Map[String, Long]) =
    q123Cache.getOrElseUpdate((s, dir, tag), {
      // ONE hour-grain ingest + fine rollup per (session, dir), shared
      // by q123 and q124 (r17 review: each tag re-ran the full ingest);
      // the committed table is immutable files + a pointer, so a plain
      // directory copy seeds each tag's own compaction victim
      val (basePath, fine) = q123Cache.getOrElseUpdate((s, dir, "hour-base"), {
        val factPath = java.nio.file.Files
          .createTempDirectory("graft-hour-base-fact").toString + "/fact"
        graft.olap.OlapEtl.loadFactSketches(s, t(s, dir, "events"),
          "event_type", "ts", "value", "user_id", Q122GrainUs / 24L,
          factPath, Q115Compression, Q119P)
        // fine-grain (hourly) rollup over the SAME time range the read
        // faces query, BEFORE any compaction — day d covers hour grains
        // [24d, 24d+23], i.e. exactly [Q123GrainLo, Q123GrainHi]
        val hll = udaf(new graft.metrics.Hll.MergeSketchesAgg(Q119P),
          Encoders.product[graft.metrics.Hll.Sketch])
        val fine = graft.olap.SnapshotStore.read(s, factPath).get
          .filter(col("grain").between(Q123GrainLo, Q123GrainHi))
          .groupBy(col("series_key")).agg(hll(col("id_sketch.regs")).as("est"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        (factPath, fine)
      })
      val factPath = java.nio.file.Files
        .createTempDirectory(s"graft-$tag-fact").toString + "/fact"
      // zero-copy seed (r18, VERDICT r17 #1): the committed table is
      // immutable files + a pointer, so each tag's compaction victim is
      // a hardlink clone — the r17 FileUtils.copyDirectory here was
      // pure driver-side serial I/O over the whole table per tag, the
      // driver's #1 absolute regression (q123 0.89→6.83 s)
      graft.olap.SnapshotStore.cloneTable(basePath, factPath)
      graft.olap.OlapEtl.compactFactSketches(s, factPath,
        Q122GrainUs / 24L, Q122GrainUs, Q115Compression, Q119P, upToGrain)
      (factPath, fine)
    })

  private[graft] def q123Ingest(s: SparkSession, dir: String)
      : (String, Map[String, Long]) =
    compactedHourFact(s, dir, "q123", None)

  /** q124's scoped-compaction boundary: 2024-01-15 in the fact's HOUR
    * units, day-aligned. Days before it age into coarse day rows; the
    * hot tail (including half the q122 read range) stays hourly — the
    * read range straddles the boundary by construction. */
  private[graft] val Q124BoundaryGrain: Long =
    java.time.LocalDate.of(2024, 1, 15).toEpochDay * 24L

  private[graft] def q124Ingest(s: SparkSession, dir: String)
      : (String, Map[String, Long]) =
    compactedHourFact(s, dir, "q124", Some(Q124BoundaryGrain))

  /** q123: the sketch-fact COMPACTION lifecycle as a driver query —
    * ingest the events at HOUR grains (24× finer than q122's day
    * fact), compact hour→day with
    * [[graft.olap.OlapEtl.compactFactSketches]] (pure sketch algebra:
    * register-max HLL, centroid-merged digests, summed counts — no
    * raw-data access), then answer q122's p50/p99 + distinct-users
    * range question from the COMPACTED fact. Verdicts as data (oracle
    * asserts all TRUE): the q115 rank bounds and q118/q119 cardinality
    * bound at the post-compaction rollup level, Σ n_rows ≡ exact count
    * over the raw slice, and `compact_lossless` — the compacted fact's
    * per-key distinct estimate EXACTLY equals the pre-compaction
    * hourly rollup's (register max loses nothing across the re-grain;
    * the digest's contract is the rank bound, carried by within_p*).
    */
  private def q123(s: SparkSession, dir: String): DataFrame =
    compactionVerdictQuery(s, dir, q123Ingest(s, dir), "compact_lossless")

  /** q124: the RANGE-SCOPED compaction lifecycle as a driver query
    * (r17) — ingest at HOUR grains, age only the days below
    * [[Q124BoundaryGrain]] into coarse day rows
    * (`compactFactSketches(upToGrain)`: only the aged buckets restage,
    * the hot tail's files re-list verbatim), then answer q122's range
    * question over the resulting MIXED-grain fact — the read range
    * straddles the boundary (days 10–14 coarse, 15–19 still hourly),
    * exercising the r17 grain-representation contract end-to-end.
    * Verdicts as data (oracle asserts all TRUE): the q122 rank and
    * cardinality bounds, Σ n_rows ≡ exact count across the boundary,
    * and `scoped_lossless` — the mixed fact's per-key distinct
    * estimate EXACTLY equals the pre-compaction hourly rollup's.
    */
  private def q124(s: SparkSession, dir: String): DataFrame =
    compactionVerdictQuery(s, dir, q124Ingest(s, dir), "scoped_lossless")

  /** Shared q123/q124 body: the q122 verdict over a (fully or
    * partially) compacted hour-unit fact plus the lossless-identity
    * column against the captured pre-compaction rollup. */
  private def compactionVerdictQuery(s: SparkSession, dir: String,
      ingested: (String, Map[String, Long]), losslessName: String): DataFrame = {
    import s.implicits._
    val (factPath, fine) = ingested
    val fineDf = fine.toSeq.toDF("series_key", "fine_est")
    sketchFactVerdict(s, dir, factPath, Q123GrainLo, Q123GrainHi)
      .join(broadcast(fineDf), Seq("series_key"), "left")
      .select(
        col("series_key"), col("n_exact"), col("id_exact"),
        col("err_bound_p50"), col("err_bound_p99"), col("id_err_bound"),
        col("nrows_match"), col("within_p50"), col("within_p99"),
        col("id_within"),
        coalesce(col("id_est") === col("fine_est"), lit(false))
          .as(losslessName))
  }

  /** q122's oracle (same raw slice, same bounds) plus one extra
    * all-TRUE verdict column. Text surgery on q122Sql: a reformat there
    * would make the replace a silent no-op and drop the lossless column
    * from the oracle, surfacing only as a downstream schema mismatch —
    * hence the anchor tripwire (r16 advisory), kept in ONE place for
    * both derived oracles. */
  private def q122SqlPlusVerdict(verdictCol: String) = {
    val out = q122Sql.replace(" TRUE AS id_within",
      s" TRUE AS id_within,\n TRUE AS $verdictCol")
    require(out != q122Sql,
      s"$verdictCol oracle anchor ' TRUE AS id_within' no longer " +
        "present in q122Sql")
    out
  }

  /** q122's bounds plus the compaction lossless verdict — all four
    * booleans must come back TRUE. */
  private def q123Sql = q122SqlPlusVerdict("compact_lossless")

  /** q122's bounds plus the scoped lossless verdict — the mixed-grain
    * fact must answer the straddling range question with every contract
    * column TRUE. */
  private def q124Sql = q122SqlPlusVerdict("scoped_lossless")

  /** Quantitative q122 verdict for differential.json: worst-key margins
    * of both rank contracts and the cardinality contract, plus the
    * exact-count identity. Returns (keys, violations, maxRankOverBound,
    * maxHllOverBound, nrowsAllMatch). */
  def sketchFactReadDifferential(s: SparkSession, dir: String)
      : (Long, Long, Double, Double, Boolean) = {
    val rows = q122Verdict(s, dir).select(
      col("rank_err_p50"), col("rank_err_p99"),
      col("err_bound_p50"), col("err_bound_p99"),
      col("id_est"), col("id_exact"), col("id_err_bound"),
      col("nrows_match"), col("within_p50"), col("within_p99"),
      col("id_within")).collect()
    var keys = 0L; var viols = 0L
    var maxRank = 0.0; var maxHll = 0.0; var nrowsAll = true
    rows.foreach { r =>
      keys += 1
      if (!r.getBoolean(8) || !r.getBoolean(9) || !r.getBoolean(10)) viols += 1
      if (!r.getBoolean(7)) nrowsAll = false
      maxRank = math.max(maxRank,
        math.max(r.getDouble(0) / r.getDouble(2), r.getDouble(1) / r.getDouble(3)))
      maxHll = math.max(maxHll,
        math.abs(r.getLong(4) - r.getLong(5)).toDouble / r.getDouble(6))
    }
    (keys, viols, maxRank, maxHll, nrowsAll)
  }

  /** Quantitative q123 verdict for differential.json: the q122 margins
    * re-measured over the COMPACTED fact, plus the lossless identity —
    * every key's post-compaction HLL rollup estimate equals the
    * pre-compaction hourly rollup's. Returns (keys, violations,
    * maxRankOverBound, maxHllOverBound, nrowsAllMatch, losslessAll). */
  def sketchCompactionDifferential(s: SparkSession, dir: String)
      : (Long, Long, Double, Double, Boolean, Boolean) =
    compactionDifferentialFor(s, dir, q123Ingest(s, dir))

  /** q124's margins: the q123 differential re-measured over the
    * SCOPED-compaction mixed-grain fact (read range straddling the
    * boundary), lossless identity against the pre-compaction hourly
    * rollup. */
  def sketchScopedCompactionDifferential(s: SparkSession, dir: String)
      : (Long, Long, Double, Double, Boolean, Boolean) =
    compactionDifferentialFor(s, dir, q124Ingest(s, dir))

  private def compactionDifferentialFor(s: SparkSession, dir: String,
      ingested: (String, Map[String, Long]))
      : (Long, Long, Double, Double, Boolean, Boolean) = {
    val (factPath, fine) = ingested
    val rows = sketchFactVerdict(s, dir, factPath, Q123GrainLo, Q123GrainHi)
      .select(
      col("rank_err_p50"), col("rank_err_p99"),
      col("err_bound_p50"), col("err_bound_p99"),
      col("id_est"), col("id_exact"), col("id_err_bound"),
      col("nrows_match"), col("within_p50"), col("within_p99"),
      col("id_within"), col("series_key")).collect()
    var keys = 0L; var viols = 0L
    var maxRank = 0.0; var maxHll = 0.0
    var nrowsAll = true; var losslessAll = rows.nonEmpty
    rows.foreach { r =>
      keys += 1
      if (!r.getBoolean(8) || !r.getBoolean(9) || !r.getBoolean(10)) viols += 1
      if (!r.getBoolean(7)) nrowsAll = false
      if (!fine.get(r.getString(11)).contains(r.getLong(4))) losslessAll = false
      maxRank = math.max(maxRank,
        math.max(r.getDouble(0) / r.getDouble(2), r.getDouble(1) / r.getDouble(3)))
      maxHll = math.max(maxHll,
        math.abs(r.getLong(4) - r.getLong(5)).toDouble / r.getDouble(6))
    }
    (keys, viols, maxRank, maxHll, nrowsAll, losslessAll)
  }

  /** Batch ≡ streaming differential for the windowed grain-ingest face
    * (`StreamOps.streamingSketchGrains` → `OlapEtl.loadFactSketchRows`):
    * the actual sfDir events feed replays through a real MemoryStream
    * query in ts-ordered chunks, each watermark-closed grain lands in a
    * temp fact via the replace-upsert sink, and the landed table is
    * compared against the BATCH loader over the same closed rows:
    *
    *  1. `complete` — the landed grain set is exactly the data's grains
    *     strictly below the feed's final (still-open) grain: nothing
    *     early, nothing missing (the watermark completeness gate).
    *  2. `nMatch` — per-grain exact row counts equal.
    *  3. `hllMatch` — per-grain HLL registers BIT-equal (register folds
    *     are tree-insensitive, so streaming ≡ batch exactly).
    *  4. `wMatch` — per-grain digest weights carry the full row count
    *     (digest VALUES are merge-tree-specific between the windowed
    *     incremental fold and the batch fold; their shared invariants
    *     are the weight mass here and the q115 rank bound pinned at the
    *     rollup level).
    *
    * Returns (ticks, grains, complete, nMatch, hllMatch, wMatch).
    */
  def streamingGrainsDifferential(s: SparkSession, dir: String,
      chunks: Int = 3, maxTicks: Int = 2000000)
      : (Long, Long, Boolean, Boolean, Boolean, Boolean) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    import graft.streaming.StreamOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val src = t(s, dir, "events")
      .filter(col("value").isNotNull && col("user_id").isNotNull)
      .select(col("event_type").as("key"), unix_micros(col("ts")).as("ts"),
        col("value"), col("user_id").as("id"), col("event_id"))
      .as[(String, Long, Double, Long, Long)]
    val raw = cappedSortedFeed(src, maxTicks,
      (r: (String, Long, Double, Long, Long)) => (r._2, r._5))
    val ticks = raw.map(r => StreamOps.FactTick(r._1, r._2, r._3, r._4))
    val per = math.max(1, (ticks.length + chunks - 1) / chunks)
    val tmp = java.nio.file.Files.createTempDirectory("graft-grains-diff")
    try {
      val streamPath = tmp.toString + "/stream"
      val mem = MemoryStream[StreamOps.FactTick]
      val q = StreamOps.streamingSketchGrains(mem.toDS(), Q122GrainUs,
          scala.concurrent.duration.Duration.Zero)
        .writeStream.outputMode("append")
        .foreachBatch { (df: DataFrame, _: Long) =>
          if (!df.isEmpty) {
            graft.olap.OlapEtl.loadFactSketchRows(s, df, streamPath)
            ()
          }
        }
        .start()
      try {
        ticks.grouped(per).foreach { c =>
          mem.addData(c.toIndexedSeq: _*); q.processAllAvailable()
        }
      } finally q.stop()
      // the still-open grain at feed end (lateness 0: watermark = max ts)
      val lastGrain = math.floorDiv(raw.map(_._2).max, Q122GrainUs)
      val closed = ticks.filter(t => math.floorDiv(t.ts, Q122GrainUs) < lastGrain)
      val batchPath = tmp.toString + "/batch"
      val batchFact = graft.olap.OlapEtl.loadFactSketches(s,
        closed.toSeq.toDF("k", "ts_us", "v", "id")
          .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us"),
        "k", "ts", "v", "id", Q122GrainUs, batchPath,
        Q115Compression, Q119P)
      def byGrain(df: DataFrame) = df.select(col("series_key"), col("grain"),
        col("n_rows"), col("id_sketch.regs"), col("value_digest.weights"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getAs[Array[Byte]](3).toSeq,
            r.getAs[Seq[Double]](4).sum))).toMap
      val a = byGrain(batchFact)
      val b = graft.olap.SnapshotStore.read(s, streamPath)
        .map(byGrain).getOrElse(Map.empty)
      val complete = a.keySet == b.keySet
      val nMatch = complete && a.forall { case (k, (n, _, _)) => b(k)._1 == n }
      val hllMatch = complete && a.forall { case (k, (_, regs, _)) => b(k)._2 == regs }
      val wMatch = complete &&
        b.forall { case (_, (n, _, w)) => math.rint(w).toLong == n }
      (ticks.length.toLong, b.size.toLong, complete, nMatch, hllMatch, wMatch)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }

  /** Batch≡streaming differential for the cardinality family (the
    * q115 pattern, with a STRONGER terminal verdict): the events feed,
    * keyed by event_type with user_id as the counted entity, replays
    * through `StreamOps.streamingDistinct` in `chunks` deterministic
    * micro-batches, and three verdicts are recorded:
    *
    *  1. `foldMatch` — the stream's full emission history equals the
    *     driver replay of the same chunks, bit-for-bit.
    *  2. `estMatch` — each key's TERMINAL streaming estimate EXACTLY
    *     equals the batch `Hll.DistinctAgg` aggregate: register-max
    *     folding is order/partition/chunking-insensitive, so stream
    *     and batch must agree to the bit, not merely within a bound
    *     (the t-digest family's merge trees can only share a bound —
    *     this is the algebraic payoff of a lossless sketch).
    *  3. the estimate obeys the q118/q119 6·rsd·exact + 1 contract per
    *     key against the exact distinct count.
    *
    * Returns (ticks, keys, foldMatch, estMatch, violations,
    * maxErrOverBound).
    */
  def streamingDistinctDifferential(s: SparkSession, dir: String,
      chunks: Int = 3, maxTicks: Int = 2000000)
      : (Long, Long, Boolean, Boolean, Long, Double) = {
    import s.implicits._
    import graft.streaming.StreamOps
    val p = Q119P
    val raw = eventsIdFeed(s, dir, maxTicks)
    val ticks = raw.map(r => StreamOps.DistinctTick(r._1, r._2, r._3))
    val per = math.max(1, (ticks.length + chunks - 1) / chunks)
    val streamRows = runStreamChunks(s, ticks.toSeq, per,
      s"ddiff_${math.abs(dir.hashCode)}",
      (in: Dataset[StreamOps.DistinctTick]) =>
        StreamOps.streamingDistinct(in, p))
    val replay = StreamOps.replayDistinctChunks(
      ticks.grouped(per).map(_.toSeq), p)
    def sorted(rs: Seq[StreamOps.DistinctRow]) =
      rs.sortBy(r => (r.key, r.n)).map(r => (r.key, r.n, r.closed, r.estimate))
    val foldMatch = sorted(streamRows) == sorted(replay)
    // batch reference: the same fold as ONE aggregate over all rows,
    // plus the exact distinct count for the contract check
    val idsByKey = raw.groupBy(_._1)
    var estMatch = streamRows.nonEmpty
    var violations = 0L
    var maxOver = 0.0
    streamRows.groupBy(_.key).foreach { case (k, rs) =>
      val fin = rs.maxBy(_.n)
      val regs = graft.metrics.Hll.emptyRegs(p)
      idsByKey(k).foreach(r => graft.metrics.Hll.add(regs, p, r._3))
      val batchEst = graft.metrics.Hll.estimate(regs)
      if (fin.estimate != batchEst) estMatch = false
      val exact = idsByKey(k).map(_._3).distinct.length
      val bound = 6.0 * Q119Rsd * exact + 1.0
      val err = math.abs(fin.estimate - exact).toDouble
      if (err > bound) violations += 1
      maxOver = math.max(maxOver, err / bound)
    }
    (ticks.length.toLong, idsByKey.size.toLong, foldMatch, estMatch,
      violations, maxOver)
  }

  /** Batch≡streaming differential for the sampling family: the events
    * feed (event_type keys, user_id identities) replays through
    * `StreamOps.streamingSample` (q121's mergeable top-k as group
    * state) in deterministic micro-batches. Two verdicts, both EXACT —
    * top-k-by-(md5, id) membership is decided by a total order and
    * nothing else, so like the HLL face (and unlike the t-digest's
    * bound) the stream owes bit-equality:
    *
    *  1. `foldMatch` — full emission history == the driver chunk
    *     replay.
    *  2. `sampleMatch` — each key's terminal sample == the batch
    *     top-k over all of the key's rows, order-free.
    *
    * Returns (ticks, keys, foldMatch, sampleMatch).
    */
  def streamingSampleDifferential(s: SparkSession, dir: String,
      chunks: Int = 3, maxTicks: Int = 2000000, k: Int = 5)
      : (Long, Long, Boolean, Boolean) = {
    import s.implicits._
    import graft.streaming.StreamOps
    val raw = eventsIdFeed(s, dir, maxTicks)
    val ticks = raw.map(r => StreamOps.SampleTick(r._1, r._2, r._3))
    val per = math.max(1, (ticks.length + chunks - 1) / chunks)
    val streamRows = runStreamChunks(s, ticks.toSeq, per,
      s"sdiff_${math.abs(dir.hashCode)}",
      (in: Dataset[StreamOps.SampleTick]) => StreamOps.streamingSample(in, k))
    val agg = new graft.ml.Splits.HashTopKAgg(k)
    val replay = StreamOps.replaySampleChunks(
      ticks.grouped(per).map(_.toSeq), agg)
    def sorted(rs: Seq[StreamOps.SampleRow]) =
      rs.sortBy(r => (r.key, r.n)).map(r => (r.key, r.n, r.closed, r.sample.toList))
    val foldMatch = sorted(streamRows) == sorted(replay)
    val idsByKey = raw.groupBy(_._1)
    var sampleMatch = streamRows.nonEmpty
    streamRows.groupBy(_.key).foreach { case (kk, rs) =>
      val fin = rs.maxBy(_.n)
      val batch = idsByKey(kk).map(_._3)
        .map(id => (StreamOps.samplePriority(id), id))
        .foldLeft(agg.zero)(agg.reduce)
      if (fin.sample.toList != agg.finish(batch).toList) sampleMatch = false
    }
    (ticks.length.toLong, idsByKey.size.toLong, foldMatch, sampleMatch)
  }

  /** Shared driver-side fold of [[sketchRankVerdict]]'s rank intervals:
    * returns (checks, violations, maxErrRanks, maxBoundRanks,
    * maxErrOverBound) under `boundFn(p, n)`.
    */
  private def rankDifferential(s: SparkSession, dir: String,
      stacked: DataFrame, boundFn: (Double, Long) => Double)
      : (Long, Long, Double, Double, Double) = {
    val ranks = t(s, dir, "events").select(col("event_type"), col("value"))
      .filter(col("value").isNotNull) // match sketchRankVerdict's n
      .join(broadcast(stacked), "event_type")
      .groupBy(col("event_type"), col("p"))
      .agg(
        sum(when(col("value") <= col("av"), 1L).otherwise(0L)).as("rle"),
        sum(when(col("value") < col("av"), 1L).otherwise(0L)).as("rlt"),
        count(lit(1)).as("n"))
      .collect()
    var checks = 0L
    var violations = 0L
    var maxErrRanks = 0.0
    var maxBoundRanks = 0.0
    var maxErrOverBound = 0.0
    ranks.foreach { r =>
      val p = r.getAs[Double]("p")
      val rle = r.getAs[Long]("rle"); val rlt = r.getAs[Long]("rlt")
      val n = r.getAs[Long]("n")
      val target = p * n
      // the value occupies rank interval [rlt+1, rle]; error = distance
      // from the target rank to that interval
      val err =
        if (target < rlt + 1) (rlt + 1) - target
        else if (target > rle) target - rle
        else 0.0
      val bound = boundFn(p, n)
      checks += 1
      if (err > bound) violations += 1
      maxErrRanks = math.max(maxErrRanks, err)
      maxBoundRanks = math.max(maxBoundRanks, bound)
      maxErrOverBound = math.max(maxErrOverBound, err / bound)
    }
    (checks, violations, maxErrRanks, maxBoundRanks, maxErrOverBound)
  }

  /** The BASELINE-comparable preprocessing+metrics path (SURVEY §7 slice
    * at the reference's 25,200-row scale): per-series symlog feature +
    * log return, strict-causal ws=144 window tensors (materialized — the
    * reference's hot spot), H∈1..6 return targets, per-series naive
    * MAE/R² — rows-only (shape benchmark, verified piecewise by
    * q10/q13/q18/q25 oracles).
    */
  private def q48(s: SparkSession, dir: String): DataFrame = {
    // HASH-EXACT composite: transcendentals round to 6 dp at
    // construction (the q10/q16 contract), the window-tensor checksum
    // folds those pre-rounded values and rounds again, and every
    // cross-row sum runs in exact decimal space (the dsum discipline) —
    // so the whole slice, including the data-driven ws choice, is
    // re-derivable in DuckDB (q48Sql).
    val ev = t(s, dir, "events").select("event_id", "user_id", "ts", "value")
      .withColumn("log_ret", round(TS.logReturn(col("value"), evWindow), 6))
      .withColumn("symlog", round(TS.symLog1p(col("value") - 100), 6))
    // BASELINE comparability: the reference preprocesses at ws=144
    // (`sliding_windows.py` hot loop). Use 144 whenever the per-user
    // series are long enough to emit windows at it (sf0.1+: ~670
    // rows/user); tiny gate scales (~7-67 rows/user) fall back to ws=24
    // so the query stays non-degenerate there. One single-row aggregate
    // pull decides — same "fit statistic" pattern as the scaler paths.
    // coalesce: an empty events table yields max=NULL — fall back to the
    // small ws rather than NPE. (This single-row pull runs at plan-
    // CONSTRUCTION time by design: ws must be a literal in the plan.)
    val maxLen = ev.groupBy(col("user_id")).count()
      .agg(coalesce(max(col("count")), lit(0L))).head().getLong(0)
    val ws = if (maxLen >= 2 * 144) 144 else 24
    val windowed = graft.feature.Windows.slidingCausal(
      ev, Seq("value", "log_ret", "symlog"), ws, evWindow)
    val targets = Targets.multiHorizonReturns(windowed, "value", 1 to 6, evWindow)
    // checksum forces the window tensors to actually materialize under a
    // pruning sink; metrics mirror the reference's naive evaluation
    // Every summed term is round(x, 6) in DOUBLE first (bit-identical
    // across engines, q10/q16-proven), THEN cast to DECIMAL(18,6): the
    // rounded double sits ~1e-10 quanta away from any cast boundary, so
    // the two engines' double->decimal conversions (shortest-string vs
    // exact-binary) cannot land on different quanta. Casting RAW doubles
    // at high scale (e.g. DECIMAL(28,14)) is NOT safe — the quantum
    // falls inside double conversion noise and sf0.1 showed real
    // one-quantum divergences on r2's sums.
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    def dsum6(c: org.apache.spark.sql.Column) = sum(round(c, 6).cast(dec6)).cast("double")
    val nD = count(lit(1)).cast("double")
    val s1 = dsum6(col("ret_h1"))
    val s2 = dsum6(col("ret_h1") * col("ret_h1"))
    targets
      .withColumn("win_sum",
        round(aggregate(flatten(col("window")), lit(0.0), (a, x) => a + x), 6))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(col("win_sum").cast(dec6)).cast("double").as("tensor_checksum"),
        (dsum6(abs(col("ret_h1"))) / nD).as("naive_mae_h1"),
        (dsum6(abs(col("ret_h6"))) / nD).as("naive_mae_h6"),
        (lit(1.0) - s2 / (s2 - s1 * s1 / nD)).as("r2_naive_h1"))
  }

  /** q48 re-derived in SQL: same rn ordering, the SAME data-driven ws
    * choice (a scalar CTE), q10/q16's rounded transcendentals, the
    * window fold as `list_sum(flatten(list(... ORDER BY rn)))` over the
    * causal frame, return targets as exact value differences at rn+h
    * (inner joins enforce the lead-trim), and dsum decimal aggregates.
    */
  private val q48Sql =
    """WITH base AS MATERIALIZED (
      |  SELECT event_id, user_id, ts, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |wsv AS MATERIALIZED (
      |  SELECT CASE WHEN COALESCE(MAX(cnt), 0) >= 288 THEN 144 ELSE 24 END AS w
      |  FROM (SELECT COUNT(*) AS cnt FROM base GROUP BY user_id)),
      |feat AS MATERIALIZED (
      |  SELECT b.event_id, b.user_id, b.rn, b.value,
      |    ROUND(CASE WHEN p.value IS NULL OR p.value <= 0 OR b.value <= 0 THEN 0
      |          ELSE LN(b.value / p.value) END, 6) + 0.0 AS log_ret,
      |    ROUND(SIGN(b.value - 100) * LN(1 + ABS(b.value - 100)), 6) + 0.0 AS symlog
      |  FROM base b LEFT JOIN base p ON p.user_id = b.user_id AND p.rn = b.rn - 1),
      |wsum AS MATERIALIZED (
      |  SELECT a.user_id, a.rn,
      |    ROUND(list_sum(flatten(list([b.value, b.log_ret, b.symlog] ORDER BY b.rn))), 6)
      |      + 0.0 AS win_sum
      |  FROM feat a CROSS JOIN wsv JOIN feat b
      |    ON b.user_id = a.user_id AND b.rn BETWEEN a.rn - wsv.w AND a.rn - 1
      |  GROUP BY a.user_id, a.rn
      |  HAVING COUNT(*) = MIN(wsv.w)),
      |tg AS MATERIALIZED (
      |  SELECT f.user_id, f.rn,
      |    l1.value - f.value AS ret_h1,
      |    l6.value - f.value AS ret_h6
      |  FROM feat f
      |  JOIN feat l1 ON l1.user_id = f.user_id AND l1.rn = f.rn + 1
      |  JOIN feat l6 ON l6.user_id = f.user_id AND l6.rn = f.rn + 6),
      |j AS MATERIALIZED (
      |  SELECT w.user_id, w.win_sum, t.ret_h1, t.ret_h6
      |  FROM wsum w JOIN tg t ON t.user_id = w.user_id AND t.rn = w.rn)
      |SELECT user_id,
      |  COUNT(*) AS n_windows,
      |  CAST(SUM(CAST(win_sum AS DECIMAL(18,6))) AS DOUBLE) AS tensor_checksum,
      |  CAST(SUM(CAST(ROUND(ABS(ret_h1), 6) AS DECIMAL(18,6))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS naive_mae_h1,
      |  CAST(SUM(CAST(ROUND(ABS(ret_h6), 6) AS DECIMAL(18,6))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS naive_mae_h6,
      |  1.0 - CAST(SUM(CAST(ROUND(ret_h1 * ret_h1, 6) AS DECIMAL(18,6))) AS DOUBLE)
      |    / (CAST(SUM(CAST(ROUND(ret_h1 * ret_h1, 6) AS DECIMAL(18,6))) AS DOUBLE)
      |       - CAST(SUM(CAST(ROUND(ret_h1, 6) AS DECIMAL(18,6))) AS DOUBLE)
      |         * CAST(SUM(CAST(ROUND(ret_h1, 6) AS DECIMAL(18,6))) AS DOUBLE)
      |         / CAST(COUNT(*) AS DOUBLE)) AS r2_naive_h1
      |FROM j GROUP BY user_id""".stripMargin

  /** IVF ANN (scale path of q40): mirrorable KMeans cells, 2-probe
    * cosine top-3 — HASH-EXACT oracle (`PqOracle.q53Sql`) since the
    * coarse fit is `kmeansMirrorable` and all similarities follow the
    * q40 6-dp rounding contract.
    */
  private def q53(s: SparkSession, dir: String): DataFrame =
    Similarity.knnIvfMirrorable(
      t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v")),
      "vec_id", "v", nCells = 16, nProbe = 2, k = 3, iters = 2,
      cacheKey = s"q53cells|$dir", fitLimit = AnnFitLimit)

  /** Transitive-closure dedup clusters: minhash candidate pairs →
    * iterative connected components → (doc_id, component) for every doc
    * in a dup cluster — rows-only (iterative min-label propagation has no
    * single-query SQL form).
    */
  private def q56(s: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
      Dedup.minhashCandidatePairs(t(s, dir, "documents"), "text", "doc_id", 3, 2, 2))

  /** Min-label connected components re-derived as a DuckDB recursive CTE
    * over the SAME banded candidate pairs as q34: component(id) =
    * min(id, min over reachable ids) — reachability closure via UNION
    * (distinct) guarantees termination.
    */
  private val q56Sql = {
    def sig(i: Int) =
      s"list_aggregate(list_transform(sh, x -> md5('seed$i:' || x)), 'min') AS sig$i"
    """WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |shl AS (SELECT doc_id,
      |  CASE WHEN len(t) >= 3
      |       THEN list_transform(range(0, len(t) - 2),
      |              i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |       ELSE [array_to_string(t, ' ')] END AS sh
      | FROM tok),
      |sig AS (SELECT doc_id, """.stripMargin +
      (0 until 4).map(sig).mkString(", ") +
      s""" FROM shl),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND $bandCondSql),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (SELECT src AS id, dst AS r FROM edges
        |          UNION
        |          SELECT e.src AS id, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
        |SELECT id, LEAST(id, MIN(r)) AS component FROM reach GROUP BY id""".stripMargin
  }

  /** M9 Prophet-analog: per-series trend + daily-Fourier regression fit
    * (closed-form, one streaming pass per series) — HASH-EXACT oracle
    * (`SeasonalOracle.q49Sql`): the mirrorable fit pins the design
    * (period-scaled trend, 6-dp sin/cos), the normal-equation sums
    * (exact decimal) and the solve (no-pivot elimination = straight-line
    * IEEE ops), so DuckDB re-derives the coefficients bit-for-bit.
    */
  private def q49(s: SparkSession, dir: String): DataFrame =
    graft.ml.SeasonalRegression.fitPredictMirrorable(
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            (unix_micros(col("ts")) / 1e6).as("t_sec"), col("value")),
        Seq("user_id"), "t_sec", "value", period = 86400.0, harmonics = 2)
      .select(col("event_id"), col("user_id"),
        round(col("fitted"), 6).as("fitted"), round(col("resid"), 6).as("resid"))

  // ───────────────────────── driver contract ─────────────────────────

  /** Flagship query on sf=0.001; driver smoke-checks rows > 0. The
    * reference's core dataflow: per-series feature engineering → causal
    * window tensors → multi-horizon targets → naive forecast metrics.
    */
  def entry(spark: SparkSession): DataFrame =
    q48(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01 _),
    "q02_filter_project" -> (q02 _),
    "q03_star_join" -> (q03 _),
    "q04_topk_orders" -> (q04 _),
    "q05_distinct_triples" -> (q05 _),
    "q06_union_splits" -> (q06 _),
    "q07_semi_anti" -> (q07 _),
    "q08_window_rank" -> (q08 _),
    "q10_log_return" -> (q10 _),
    "q11_first_diff" -> (q11 _),
    "q12_multi_horizon" -> (q12 _),
    "q13_return_targets" -> (q13 _),
    "q14_rolling_stats" -> (q14 _),
    "q15_cyclic_encode" -> (q15 _),
    "q16_symlog" -> (q16 _),
    "q17_zscore_join" -> (q17 _),
    "q18_naive_mae" -> (q18 _),
    "q19_hourly_agg" -> (q19 _),
    "q20_overlap_add" -> (q20 _),
    "q21_asof_join" -> (q21 _),
    "q57_asof_native" -> (q57 _),
    "q22_rolling_count_5d" -> (q22 _),
    "q23_json_extract" -> (q23 _),
    "q24_metric_regex_cube" -> (q24 _),
    "q58_sessionize" -> (q58 _),
    "q59_hash_split" -> (q59 _),
    "q60_percentiles" -> (q60 _),
    "q61_percentiles_approx" -> (q61 _),
    "q62_deep_flatten" -> (q62 _),
    "q63_dim_experiment" -> (q63 _),
    "q64_embed_dedup" -> (q64 _),
    "q65_long_windows" -> (q65 _),
    "q67_corpus_curation" -> (q67 _),
    "q68_simhash_pairs" -> (q68 _),
    "q69_positional_encoding" -> (q69 _),
    "q25_r2_naive" -> (q25 _),
    "q26_config_kv" -> (q26 _),
    "q37_mmd" -> (q37 _),
    "q38_strided" -> (q38 _),
    "q51_huber_naive" -> (q51 _),
    "q52_snr" -> (q52 _),
    "q54_group_corr" -> (q54 _),
    "q55_count_distinct" -> (q55 _),
    "q56_dedup_clusters" -> (q56 _),
    "q30_text_quality" -> (q30 _),
    "q31_quality_score" -> (q31 _),
    "q32_exact_dup" -> (q32 _),
    "q33_minhash_sig" -> (q33 _),
    "q34_minhash_pairs" -> (q34 _),
    "q35_ngram_jaccard" -> (q35 _),
    "q36_olap_parse" -> (q36 _),
    "q50_near_dedup" -> (q50 _),
    "q70_dedup_pipeline" -> (q70 _),
    "q71_doc_chunking" -> (q71 _),
    "q72_sequence_packing" -> (q72 _),
    "q73_quantize_int8" -> (q73 _),
    "q74_segment_dedup" -> (q74 _),
    "q75_decontaminate" -> (q75 _),
    "q76_tfidf" -> (q76 _),
    "q77_winnow_fingerprints" -> (q77 _),
    "q78_repetition_filter" -> (q78 _),
    "q79_mixture_resample" -> (q79 _),
    "q80_pii_redaction" -> (q80 _),
    "q81_unigram_xent" -> (q81 _),
    "q82_salted_join" -> (q82 _),
    "q83_range_join" -> (q83 _),
    "q84_heavy_hitters" -> (q84 _),
    "q85_bloom_decontaminate" -> (q85 _),
    "q86_gopher_rules" -> (q86 _),
    "q40_knn_cosine" -> (q40 _),
    "q41_langid" -> (q41 _),
    "q66_image_features" -> (q66 _),
    "q91_video_meta" -> (q91 _),
    "q42_simhash" -> (q42 _),
    "q43_lsh_ann" -> (q43 _),
    "q44_stl_decompose" -> (q44 _),
    "q45_fft_features" -> (q45 _),
    "q46_backtest_trades" -> (q46 _),
    "q47_backtest_summary" -> (q47 _),
    "q48_preprocess_slice" -> (q48 _),
    "q49_seasonal_fit" -> (q49 _),
    "q53_ivf_ann" -> (q53 _),
    "q87_pq_ann" -> (q87 _),
    "q88_ivfpq_ann" -> (q88 _),
    "q89_semantic_dedup" -> (q89 _),
    "q90_dsir_scores" -> (q90 _),
    "q92_ivfpq_residual" -> (q92 _),
    "q93_normalized_dedup" -> (q93 _),
    "q94_dup_ngrams" -> (q94 _),
    "q95_substring_dedup" -> (q95 _),
    "q96_haar_dwt" -> (q96 _),
    "q97_multitaper" -> (q97 _),
    "q98_arima_fit" -> (q98 _),
    "q99_arima_order" -> (q99 _),
    "q100_cluster_balance" -> (q100 _),
    "q101_acf_ljungbox" -> (q101 _),
    "q102_plot_downsample" -> (q102 _),
    "q103_tech_indicators" -> (q103 _),
    "q104_time_reversal" -> (q104 _),
    "q105_row_concat" -> (q105 _),
    "q106_minmax_norm" -> (q106 _),
    "q107_daily_targets" -> (q107 _),
    "q108_mc_welford" -> (q108 _),
    "q109_delta_rescale" -> (q109 _),
    "q110_fact_predictions" -> (q110 _),
    "q111_fact_trade_metrics" -> (q111 _),
    "q112_experiment_metrics" -> (q112 _),
    "q113_tdigest_values" -> (q113 _),
    "q114_strategy_grid" -> (q114 _),
    "q115_tdigest_mergeable" -> (q115 _),
    "q116_strategy_fact" -> (q116 _),
    "q117_tdigest_rollup" -> (q117 _),
    "q118_hll_contract" -> (q118 _),
    "q119_hll_rollup" -> (q119 _),
    "q120_hll_setops" -> (q120 _),
    "q121_hash_sample" -> (q121 _),
    "q122_sketch_fact_read" -> (q122 _),
    "q123_sketch_compaction" -> (q123 _),
    "q124_scoped_compaction" -> (q124 _)
  )

  /** A/B alternates (r18, VERDICT r17 #5/#6): the PRE-r17 spellings of
    * the sketch-family queries the r17 optimizer restructured, kept
    * compilable so `graft.tools.AbCompare` can time old-vs-new shapes
    * INTERLEAVED in one JVM — the only comparison this host's co-tenant
    * waves can't fake. NOT part of [[queries]]: never benched, never
    * oracle-checked as standalone entries; each alternate computes the
    * same rows as its production query (that equivalence was the r17
    * round's argument and is re-checked by AbCompare's row compare).
    */
  private[graft] def stackSketchUnion(wide: DataFrame, ps: Seq[Double]): DataFrame =
    ps.map(p => wide.select(col("event_type"),
        lit(p).as("p"), col(graft.metrics.Quantiles.label(p)).as("av")))
      .reduce(_.unionByName(_))

  private[graft] val abAlternates: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_union" -> ((s: SparkSession, dir: String) =>
      sketchRankVerdict(t(s, dir, "events"),
        stackSketchUnion(q61Approx(s, dir), Q61Ps),
        col("n") / lit(Q61Accuracy.toDouble) + lit(1.0))),
    "q115_union" -> ((s: SparkSession, dir: String) =>
      sketchRankVerdict(t(s, dir, "events"),
        stackSketchUnion(q115Digest(s, dir), Q115Ps),
        lit(4.0) * lit(2.0) * col("n") * col("p") * (lit(1.0) - col("p"))
          / lit(Q115Compression) + lit(2.0))),
    "q117_union" -> ((s: SparkSession, dir: String) =>
      sketchRankVerdict(t(s, dir, "events"),
        stackSketchUnion(q117Rollup(s, dir, 86400000000L), Q115Ps),
        lit(4.0) * lit(2.0) * col("n") * col("p") * (lit(1.0) - col("p"))
          / lit(Q115Compression) + lit(2.0))),
    "q114_3pass" -> ((s: SparkSession, dir: String) => {
      val bars = backtestBars(s, dir)
      Q114Grid.map { case (id, p) =>
        Backtest.run(bars, p).agg(
            count(lit(1)).as("n_trades"),
            coalesce(dsum(col("profit")), lit(0.0)).as("total_profit"),
            coalesce(dsum(abs(col("profit"))), lit(0.0)).as("total_abs_profit"))
          .select(lit(id).as("param_id"), lit(p.threshold).as("threshold"),
            lit(p.tp).as("tp"), lit(p.sl).as("sl"),
            col("n_trades"), col("total_profit"), col("total_abs_profit"))
      }.reduce(_.unionByName(_))
    }),
    "q118_coplanned" -> ((s: SparkSession, dir: String) => {
      val bound = lit(6.0) * lit(Q118Rsd) * col("n_exact") + lit(1.0)
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(
          countDistinct(col("l_partkey")).as("n_exact"),
          approx_count_distinct(col("l_partkey"), Q118Rsd).as("n_approx"))
        .select(col("l_suppkey"), col("n_exact"),
          bound.as("err_bound"),
          (abs(col("n_approx") - col("n_exact")).cast("double") <= bound)
            .as("within_bound"))
    }),
    "q119_3join" -> ((s: SparkSession, dir: String) => {
      import graft.metrics.Hll
      val li = t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_partkey"),
          (unix_micros(col("l_shipdate")) / Q119GrainUs).cast("long").as("grain"))
      val mk = udaf(new Hll.SketchAgg(Q119P), Encoders.scalaLong)
      val grains = li.groupBy(col("l_suppkey"), col("grain"))
        .agg(mk(col("l_partkey")).as("sk"))
      val roll = udaf(new Hll.MergeSketchesAgg(Q119P),
        Encoders.product[Hll.Sketch])
      val rolled = grains.groupBy(col("l_suppkey"))
        .agg(roll(col("sk.regs")).as("est_rollup"),
          count(lit(1)).as("n_grains"))
      val directAgg = udaf(new Hll.DistinctAgg(Q119P), Encoders.scalaLong)
      val direct = li.groupBy(col("l_suppkey"))
        .agg(directAgg(col("l_partkey")).as("est_direct"))
      val exact = li.groupBy(col("l_suppkey"))
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      val bound = lit(6.0) * lit(Q119Rsd) * col("n_exact") + lit(1.0)
      rolled.join(direct, "l_suppkey").join(exact, "l_suppkey")
        .select(col("l_suppkey"), col("n_grains"), col("n_exact"),
          bound.as("err_bound"),
          (abs(col("est_rollup") - col("n_exact")).cast("double") <= bound)
            .as("within_bound"),
          (col("est_rollup") === col("est_direct")).as("rollup_lossless"))
    }),
    "q120_2scan" -> ((s: SparkSession, dir: String) => {
      import graft.metrics.Hll
      val ord = t(s, dir, "orders")
      val isA = col("o_orderdate") < utcDay(Q120Pivot)
      val mk = udaf(new Hll.SketchAgg(Q119P), Encoders.scalaLong)
      val skA = ord.filter(isA).groupBy(col("o_orderpriority"))
        .agg(mk(col("o_custkey")).as("sk_a"))
      val skB = ord.filter(!isA).groupBy(col("o_orderpriority"))
        .agg(mk(col("o_custkey")).as("sk_b"))
      val exact = ord.groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(when(isA, col("o_custkey"))).as("a_exact"),
          countDistinct(when(!isA, col("o_custkey"))).as("b_exact"),
          countDistinct(col("o_custkey")).as("union_exact"))
      val est = udf((regs: Array[Byte]) => Hll.encEstimate(regs, Q119P))
      val estUnion = udf((a: Array[Byte], b: Array[Byte]) =>
        Hll.encEstimate(Hll.encMerge(
          java.util.Arrays.copyOf(a, a.length),
          java.util.Arrays.copyOf(b, b.length), Q119P), Q119P))
      val boundU = lit(6.0) * lit(Q119Rsd) * col("union_exact") + lit(1.0)
      val boundI = lit(6.0) * lit(Q119Rsd) *
        sqrt((col("a_exact") * col("a_exact") + col("b_exact") * col("b_exact")
          + col("union_exact") * col("union_exact")).cast("double")) + lit(3.0)
      val covered = col("sk_a").isNotNull && col("sk_b").isNotNull
      exact.join(skA, Seq("o_orderpriority"), "left")
        .join(skB, Seq("o_orderpriority"), "left")
        .select(col("o_orderpriority"), col("a_exact"), col("b_exact"),
          col("union_exact"),
          (col("a_exact") + col("b_exact") - col("union_exact")).as("inter_exact"),
          covered.as("sides_covered"),
          when(covered, est(col("sk_a.regs"))).as("est_a"),
          when(covered, est(col("sk_b.regs"))).as("est_b"),
          when(covered, estUnion(col("sk_a.regs"), col("sk_b.regs")))
            .as("est_union"),
          boundU.as("err_bound_union"), boundI.as("err_bound_inter"))
        .select(col("o_orderpriority"), col("a_exact"), col("b_exact"),
          col("union_exact"), col("inter_exact"),
          col("err_bound_union"), col("err_bound_inter"),
          col("sides_covered"),
          coalesce(abs(col("est_union") - col("union_exact")).cast("double")
            <= col("err_bound_union"), lit(false)).as("union_within"),
          coalesce(abs((col("est_a") + col("est_b") - col("est_union"))
            - col("inter_exact")).cast("double")
            <= col("err_bound_inter"), lit(false)).as("inter_within"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_star_join" -> q03Sql,
    "q04_topk_orders" -> q04Sql,
    "q05_distinct_triples" -> q05Sql,
    "q06_union_splits" -> q06Sql,
    "q07_semi_anti" -> q07Sql,
    "q08_window_rank" -> q08Sql,
    "q10_log_return" -> q10Sql,
    "q11_first_diff" -> q11Sql,
    "q12_multi_horizon" -> q12Sql,
    "q13_return_targets" -> q13Sql,
    "q14_rolling_stats" -> q14Sql,
    "q15_cyclic_encode" -> q15Sql,
    "q16_symlog" -> q16Sql,
    "q17_zscore_join" -> q17Sql,
    "q18_naive_mae" -> q18Sql,
    "q19_hourly_agg" -> q19Sql,
    "q20_overlap_add" -> q20Sql,
    "q21_asof_join" -> q21Sql,
    "q57_asof_native" -> q21Sql,
    "q22_rolling_count_5d" -> q22Sql,
    "q23_json_extract" -> q23Sql,
    "q24_metric_regex_cube" -> q24Sql,
    "q58_sessionize" -> q58Sql,
    "q59_hash_split" -> q59Sql,
    "q60_percentiles" -> q60Sql,
    "q62_deep_flatten" -> q62Sql,
    "q63_dim_experiment" -> q63Sql,
    "q64_embed_dedup" -> q64Sql,
    "q65_long_windows" -> q65Sql,
    "q67_corpus_curation" -> q67Sql,
    "q68_simhash_pairs" -> q68Sql,
    "q69_positional_encoding" -> q69Sql,
    "q25_r2_naive" -> q25Sql,
    "q26_config_kv" -> q26Sql,
    "q37_mmd" -> q37Sql,
    "q38_strided" -> q38Sql,
    "q51_huber_naive" -> q51Sql,
    "q52_snr" -> q52Sql,
    "q54_group_corr" -> q54Sql,
    "q55_count_distinct" -> q55Sql,
    "q30_text_quality" -> q30Sql,
    "q31_quality_score" -> q31Sql,
    "q32_exact_dup" -> q32Sql,
    "q33_minhash_sig" -> q33Sql,
    "q34_minhash_pairs" -> q34Sql,
    "q35_ngram_jaccard" -> q35Sql,
    "q36_olap_parse" -> q36Sql,
    "q40_knn_cosine" -> q40Sql,
    "q42_simhash" -> q42Sql,
    "q43_lsh_ann" -> q43Sql,
    "q45_fft_features" -> q45Sql,
    "q41_langid" -> q41Sql,
    "q50_near_dedup" -> q50Sql,
    "q70_dedup_pipeline" -> q70Sql,
    "q71_doc_chunking" -> q71Sql,
    "q72_sequence_packing" -> q72Sql,
    "q73_quantize_int8" -> q73Sql,
    "q74_segment_dedup" -> q74Sql,
    "q75_decontaminate" -> q75Sql,
    "q76_tfidf" -> q76Sql,
    "q77_winnow_fingerprints" -> q77Sql,
    "q78_repetition_filter" -> q78Sql,
    "q79_mixture_resample" -> q79Sql,
    "q80_pii_redaction" -> q80Sql,
    "q81_unigram_xent" -> q81Sql,
    "q82_salted_join" -> q82Sql,
    "q83_range_join" -> q83Sql,
    "q84_heavy_hitters" -> q84Sql,
    "q85_bloom_decontaminate" -> q85Sql,
    "q86_gopher_rules" -> q86Sql,
    "q89_semantic_dedup" -> q89Sql,
    "q90_dsir_scores" -> q90Sql,
    "q91_video_meta" -> q91Sql,
    "q66_image_features" -> q66Sql,
    "q93_normalized_dedup" -> q93Sql,
    "q94_dup_ngrams" -> q94Sql,
    "q95_substring_dedup" -> q95Sql,
    "q96_haar_dwt" -> q96Sql,
    "q97_multitaper" -> q97Sql,
    "q98_arima_fit" -> q98Sql,
    "q99_arima_order" -> q99Sql,
    "q100_cluster_balance" -> q100Sql,
    "q101_acf_ljungbox" -> q101Sql,
    "q102_plot_downsample" -> q102Sql,
    "q103_tech_indicators" -> q103Sql,
    "q104_time_reversal" -> q104Sql,
    "q105_row_concat" -> q105Sql,
    "q106_minmax_norm" -> q106Sql,
    "q107_daily_targets" -> q107Sql,
    "q108_mc_welford" -> q108Sql,
    "q109_delta_rescale" -> q109Sql,
    "q110_fact_predictions" -> q110Sql,
    "q111_fact_trade_metrics" -> q111Sql,
    "q112_experiment_metrics" -> q112Sql,
    "q56_dedup_clusters" -> q56Sql,
    // Backtest family: generated recursive-CTE replay of the per-symbol
    // TP/SL state machine (graft.oracle.BacktestOracle) — hash-exact;
    // the batch≡streaming differential stays as a second, independent
    // check in differential.json.
    "q46_backtest_trades" -> graft.oracle.BacktestOracle.q46Sql(BtParams),
    "q47_backtest_summary" -> graft.oracle.BacktestOracle.q47Sql(BtParams),
    // t-digest value face: generated recursive-CTE replay of the
    // deterministic ascending fold (graft.oracle.TDigestOracle)
    "q113_tdigest_values" -> graft.oracle.TDigestOracle.q113Sql(Q113Compression),
    // strategy grid: one BacktestOracle walk per parameter set
    "q114_strategy_grid" -> q114Sql,
    // grid champion → fact_strategy_params payload → JSONB flatten
    "q116_strategy_fact" -> q116Sql,
    // The sketch contract emitted as data: the oracle asserts
    // within_bound=TRUE per (group, p); a GK-bound violation on the
    // Spark side is a hash FAIL (see q61's scaladoc).
    "q61_percentiles_approx" -> q61Sql,
    // Same pattern for the mergeable t-digest UDAF (q115): the t-digest
    // rank bound 8·n·p(1−p)/δ + 2 asserted TRUE per (group, p).
    "q115_tdigest_mergeable" -> q115Sql,
    // q117 rolls per-day digests up to the same per-group contract —
    // identical oracle: the bound does not depend on the merge tree.
    "q117_tdigest_rollup" -> q115Sql,
    // HLL++ count-distinct contract: |estimate − exact| ≤ 6·rsd·exact+1
    // asserted TRUE per group (the q61/q115 pattern for cardinality).
    "q118_hll_contract" -> q118Sql,
    "q119_hll_rollup" -> q119Sql,
    "q120_hll_setops" -> q120Sql,
    "q121_hash_sample" -> q121Sql,
    "q122_sketch_fact_read" -> q122Sql,
    "q123_sketch_compaction" -> q123Sql,
    "q124_scoped_compaction" -> q124Sql,
    // PQ family: generated SQL re-derives the mirrorable kmeans fits and
    // the ADC scoring term-by-term (graft.oracle.PqOracle) — hash-exact
    // at any SF, no data-pinned literals.
    "q87_pq_ann" -> graft.oracle.PqOracle.q87Sql(
      m = 8, ksub = 16, d = 64, iters = 2, k = 10, qPred = "vec_id < 5",
      fitLimit = AnnFitLimit),
    "q88_ivfpq_ann" -> graft.oracle.PqOracle.q88Sql(
      m = 8, ksub = 16, d = 64, iters = 2, nCells = 16, nProbe = 4, k = 10,
      qPred = "vec_id < 5", fitLimit = AnnFitLimit),
    "q92_ivfpq_residual" -> graft.oracle.PqOracle.q92Sql(
      m = 8, ksub = 16, d = 64, iters = 2, nCells = 16, nProbe = 4, k = 10,
      qPred = "vec_id < 5", fitLimit = AnnFitLimit),
    "q53_ivf_ann" -> graft.oracle.PqOracle.q53Sql(
      d = 64, nCells = 16, iters = 2, nProbe = 2, k = 3,
      fitLimit = AnnFitLimit),
    "q48_preprocess_slice" -> q48Sql,
    "q49_seasonal_fit" -> graft.oracle.SeasonalOracle.q49Sql(
      period = 86400.0, harmonics = 2),
    "q44_stl_decompose" -> graft.oracle.StlOracle.q44Sql(
      period = 24, seasonalSmoother = 7, nInner = 2)
  )
}
