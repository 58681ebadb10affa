#!/usr/bin/env python3
"""Prototype for oracle/TDigestOracle: replay the deterministic
ascending-fold t-digest (TDigest.sortedStep + TDigest.quantile) as a
DuckDB recursive CTE and bit-compare against a direct Python simulation
on the real events table. Usage: proto_tdigest_oracle.py [sfDir]"""
import sys, math, struct
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
C = 20.0
PS = [0.5, 0.9, 0.99]


def fold(values, c):
    means, weights, wsum = [], [], 0.0
    totw = float(len(values))
    for x in values:
        if not means:
            means.append(x); weights.append(1.0); wsum = 1.0
            continue
        mergedw = weights[-1] + 1.0
        wbefore = wsum - weights[-1]
        q = (wbefore + mergedw / 2.0) / totw
        limit = 4.0 * totw * q * (1.0 - q) / c
        if mergedw <= max(limit, 1.0):
            means[-1] = means[-1] + (x - means[-1]) * 1.0 / mergedw
            weights[-1] = mergedw
        else:
            means.append(x); weights.append(1.0)
        wsum = wsum + 1.0
    return means, weights


def quantile(means, weights, p):
    n = len(means)
    if n == 1:
        return means[0]
    totw = math.fsum(weights)  # exact (integer-valued)
    target = p * totw
    cumbefore = 0.0
    for i in range(n):
        mid = cumbefore + weights[i] / 2.0
        if target <= mid:
            if i == 0:
                return means[0]
            prevmid = cumbefore - weights[i - 1] / 2.0
            frac = (target - prevmid) / (mid - prevmid)
            return means[i - 1] + frac * (means[i] - means[i - 1])
        cumbefore += weights[i]
    return means[n - 1]


con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")

sim = {}
rows = con.execute(
    "SELECT user_id, value FROM events ORDER BY user_id, value").fetchall()
from itertools import groupby
for uid, grp in groupby(rows, key=lambda r: r[0]):
    vals = [v for _, v in grp]
    m, w = fold(vals, C)
    sim[uid] = (len(m),) + tuple(quantile(m, w, p) for p in PS)

SQL = f"""
WITH RECURSIVE vals AS MATERIALIZED (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value) - 1 AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         value AS x
  FROM events),
walk AS (
  SELECT user_id, CAST(-1 AS BIGINT) AS rn, n,
         CAST([] AS DOUBLE[]) AS means, CAST([] AS DOUBLE[]) AS weights,
         CAST(0 AS DOUBLE) AS wsum
  FROM (SELECT DISTINCT user_id, n FROM vals)
  UNION ALL
  SELECT user_id, rn, n,
    CASE WHEN len(means) = 0 THEN [x]
         WHEN do_merge THEN list_append(means[1:len(means)-1],
           means[len(means)] + (x - means[len(means)]) * CAST(1.0 AS DOUBLE) / mergedw)
         ELSE list_append(means, x) END AS means,
    CASE WHEN len(weights) = 0 THEN [CAST(1.0 AS DOUBLE)]
         WHEN do_merge THEN list_append(weights[1:len(weights)-1], mergedw)
         ELSE list_append(weights, CAST(1.0 AS DOUBLE)) END AS weights,
    w2 AS wsum
  FROM (
    SELECT *,
      len(weights) > 0 AND mergedw <= GREATEST(
        CAST(4.0 AS DOUBLE) * totw * ((wbefore + mergedw / CAST(2.0 AS DOUBLE)) / totw)
          * (CAST(1.0 AS DOUBLE) - (wbefore + mergedw / CAST(2.0 AS DOUBLE)) / totw)
          / CAST({C} AS DOUBLE),
        CAST(1.0 AS DOUBLE)) AS do_merge
    FROM (
      SELECT w.user_id, v.rn, w.n, w.means, w.weights, v.x,
             w.wsum + CAST(1.0 AS DOUBLE) AS w2,
             CAST(w.n AS DOUBLE) AS totw,
             CASE WHEN len(w.weights) = 0 THEN CAST(0.0 AS DOUBLE)
                  ELSE w.wsum - w.weights[len(w.weights)] END AS wbefore,
             CASE WHEN len(w.weights) = 0 THEN CAST(1.0 AS DOUBLE)
                  ELSE w.weights[len(w.weights)] + CAST(1.0 AS DOUBLE) END AS mergedw
      FROM walk w JOIN vals v ON v.user_id = w.user_id AND v.rn = w.rn + 1
    )
  )
),
fin AS (
  SELECT user_id, means, weights, len(means) AS ncent
  FROM walk WHERE rn = n - 1),
cents AS (
  SELECT user_id, ncent,
         UNNEST(means) AS m, UNNEST(weights) AS w,
         UNNEST(generate_series(1, len(means))) AS i
  FROM fin),
cum AS (
  SELECT user_id, ncent, m, w, i,
         SUM(w) OVER (PARTITION BY user_id ORDER BY i) - w AS cumbefore,
         SUM(w) OVER (PARTITION BY user_id) AS totw,
         LAG(m) OVER (PARTITION BY user_id ORDER BY i) AS prevm,
         LAG(w) OVER (PARTITION BY user_id ORDER BY i) AS prevw
  FROM cents),
ps(p) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)), (CAST(0.99 AS DOUBLE))),
hits AS (
  SELECT c.user_id, ps.p, c.ncent, c.m, c.prevm, c.i,
         c.cumbefore + c.w / CAST(2.0 AS DOUBLE) AS mid,
         c.cumbefore - c.prevw / CAST(2.0 AS DOUBLE) AS prevmid,
         ps.p * c.totw AS target,
         ROW_NUMBER() OVER (PARTITION BY c.user_id, ps.p ORDER BY c.i) AS pick
  FROM cum c CROSS JOIN ps
  WHERE ps.p * c.totw <= c.cumbefore + c.w / CAST(2.0 AS DOUBLE)),
lasts AS (
  SELECT user_id, ncent,
         means[len(means)] AS mlast, means[1] AS mfirst
  FROM fin),
res AS (
  SELECT l.user_id, ps.p, l.ncent,
    CASE WHEN l.ncent = 1 THEN l.mfirst
         WHEN h.i IS NULL THEN l.mlast
         WHEN h.i = 1 THEN h.m
         ELSE h.prevm + (h.target - h.prevmid) / (h.mid - h.prevmid) * (h.m - h.prevm)
    END AS v
  FROM lasts l CROSS JOIN ps
  LEFT JOIN (SELECT * FROM hits WHERE pick = 1) h
    ON h.user_id = l.user_id AND h.p = ps.p)
SELECT user_id, CAST(ncent AS INTEGER) AS n_centroids,
       MAX(CASE WHEN p = 0.5 THEN v END) AS p50,
       MAX(CASE WHEN p = 0.9 THEN v END) AS p90,
       MAX(CASE WHEN p = 0.99 THEN v END) AS p99
FROM res GROUP BY user_id, ncent
"""

got = {r[0]: tuple(r[1:]) for r in con.execute(SQL).fetchall()}
assert set(got) == set(sim), (len(got), len(sim))
bad = 0
for uid in sim:
    s, g = sim[uid], got[uid]
    if s[0] != g[0]:
        bad += 1
        print(f"user {uid}: ncent sim={s[0]} sql={g[0]}")
        continue
    for k in range(1, 4):
        if struct.pack("<d", s[k]) != struct.pack("<d", g[k]):
            bad += 1
            print(f"user {uid} p{k}: sim={s[k]!r} sql={g[k]!r}")
print(f"{len(sim)} users, {bad} mismatches -> {'FAIL' if bad else 'BIT-EXACT PASS'}")
