package graft.oracle

/** DuckDB oracle for the deterministic ascending-fold t-digest (q113) —
  * the VALUE-exact percentile face the q61 GK contract row can't give
  * (approx_percentile's values are engine-specific; this construction's
  * are not). Replays `TDigest.sortedStep` + `TDigest.quantile` as a
  * generated recursive CTE, the BacktestOracle pattern applied to a
  * sketch: one recursion step per value per group, the centroid state
  * carried as `DOUBLE[]` lists exactly like the Scala ArrayBuffers.
  *
  * Cross-engine exactness argument (BacktestOracle.scala's, restated):
  * the fold is sequential per group over a DEFINED order (value
  * ascending — ties are interchangeable because equal inputs produce
  * identical centroid updates), so every double op has a fixed order;
  * each step is straight-line IEEE-754 arithmetic both engines evaluate
  * identically; weights are integer-valued doubles, so their sums
  * (wsum, the quantile pass's cumulative weights) are exact and
  * order-free. The quantile extraction replays
  * `TDigest.quantile`'s midpoint interpolation — including the first/
  * last-centroid clamps and the single-centroid short-circuit — with
  * the same op order. Prototyped bit-exact against an independent
  * Python simulation at sf0.001/0.01/0.1 (`tools/proto_tdigest_oracle
  * .py`: 1665 groups, 0 mismatches).
  *
  * Depth = max values per group (~67 per user at every SF); total work
  * is linear in the row count — each value joins the walk exactly once.
  */
object TDigestOracle {

  private def d(x: Double): String = s"CAST($x AS DOUBLE)"

  /** q113: per-user centroid count + p50/p90/p99 of `value` from the
    * ascending-fold digest at `compression`.
    */
  def q113Sql(compression: Double): String = {
    val c = d(compression)
    s"""WITH RECURSIVE vals AS MATERIALIZED (
       |  SELECT user_id,
       |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value) - 1 AS rn,
       |         COUNT(*) OVER (PARTITION BY user_id) AS n,
       |         value AS x
       |  FROM events),
       |walk AS (
       |  SELECT user_id, CAST(-1 AS BIGINT) AS rn, n,
       |         CAST([] AS DOUBLE[]) AS means, CAST([] AS DOUBLE[]) AS weights,
       |         ${d(0.0)} AS wsum
       |  FROM (SELECT DISTINCT user_id, n FROM vals)
       |  UNION ALL
       |  SELECT user_id, rn, n,
       |    CASE WHEN len(means) = 0 THEN [x]
       |         WHEN do_merge THEN list_append(means[1:len(means)-1],
       |           means[len(means)] + (x - means[len(means)]) * ${d(1.0)} / mergedw)
       |         ELSE list_append(means, x) END AS means,
       |    CASE WHEN len(weights) = 0 THEN [${d(1.0)}]
       |         WHEN do_merge THEN list_append(weights[1:len(weights)-1], mergedw)
       |         ELSE list_append(weights, ${d(1.0)}) END AS weights,
       |    w2 AS wsum
       |  FROM (
       |    SELECT *,
       |      len(weights) > 0 AND mergedw <= GREATEST(
       |        ${d(4.0)} * totw * ((wbefore + mergedw / ${d(2.0)}) / totw)
       |          * (${d(1.0)} - (wbefore + mergedw / ${d(2.0)}) / totw)
       |          / $c,
       |        ${d(1.0)}) AS do_merge
       |    FROM (
       |      SELECT w.user_id, v.rn, w.n, w.means, w.weights, v.x,
       |             w.wsum + ${d(1.0)} AS w2,
       |             CAST(w.n AS DOUBLE) AS totw,
       |             CASE WHEN len(w.weights) = 0 THEN ${d(0.0)}
       |                  ELSE w.wsum - w.weights[len(w.weights)] END AS wbefore,
       |             CASE WHEN len(w.weights) = 0 THEN ${d(1.0)}
       |                  ELSE w.weights[len(w.weights)] + ${d(1.0)} END AS mergedw
       |      FROM walk w JOIN vals v ON v.user_id = w.user_id AND v.rn = w.rn + 1
       |    )
       |  )
       |),
       |fin AS (
       |  SELECT user_id, means, weights, len(means) AS ncent
       |  FROM walk WHERE rn = n - 1),
       |cents AS (
       |  SELECT user_id, ncent,
       |         UNNEST(means) AS m, UNNEST(weights) AS w,
       |         UNNEST(generate_series(1, len(means))) AS i
       |  FROM fin),
       |cum AS (
       |  SELECT user_id, ncent, m, w, i,
       |         SUM(w) OVER (PARTITION BY user_id ORDER BY i) - w AS cumbefore,
       |         SUM(w) OVER (PARTITION BY user_id) AS totw,
       |         LAG(m) OVER (PARTITION BY user_id ORDER BY i) AS prevm,
       |         LAG(w) OVER (PARTITION BY user_id ORDER BY i) AS prevw
       |  FROM cents),
       |ps(p) AS (VALUES (${d(0.5)}), (${d(0.9)}), (${d(0.99)})),
       |hits AS (
       |  SELECT c.user_id, ps.p, c.ncent, c.m, c.prevm, c.i,
       |         c.cumbefore + c.w / ${d(2.0)} AS mid,
       |         c.cumbefore - c.prevw / ${d(2.0)} AS prevmid,
       |         ps.p * c.totw AS target,
       |         ROW_NUMBER() OVER (PARTITION BY c.user_id, ps.p ORDER BY c.i) AS pick
       |  FROM cum c CROSS JOIN ps
       |  WHERE ps.p * c.totw <= c.cumbefore + c.w / ${d(2.0)}),
       |lasts AS (
       |  SELECT user_id, ncent,
       |         means[len(means)] AS mlast, means[1] AS mfirst
       |  FROM fin),
       |res AS (
       |  SELECT l.user_id, ps.p, l.ncent,
       |    CASE WHEN l.ncent = 1 THEN l.mfirst
       |         WHEN h.i IS NULL THEN l.mlast
       |         WHEN h.i = 1 THEN h.m
       |         ELSE h.prevm + (h.target - h.prevmid) / (h.mid - h.prevmid) * (h.m - h.prevm)
       |    END AS v
       |  FROM lasts l CROSS JOIN ps
       |  LEFT JOIN (SELECT * FROM hits WHERE pick = 1) h
       |    ON h.user_id = l.user_id AND h.p = ps.p)
       |SELECT user_id, CAST(ncent AS INTEGER) AS n_centroids,
       |       MAX(CASE WHEN p = ${d(0.5)} THEN v END) AS p50,
       |       MAX(CASE WHEN p = ${d(0.9)} THEN v END) AS p90,
       |       MAX(CASE WHEN p = ${d(0.99)} THEN v END) AS p99
       |FROM res GROUP BY user_id, ncent""".stripMargin
  }
}
