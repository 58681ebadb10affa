package graft.oracle

/** DuckDB oracle-SQL generators for the PQ ANN family (q87/q88/q92).
  *
  * The Spark side fits its codebooks with `Similarity.kmeansMirrorable`
  * (fixed-iteration Lloyd's: init = the k smallest-id vectors, squared-L2
  * assignment as a fixed left-assoc fold, centroid means via the
  * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)` dsum
  * discipline, no early exit). These generators re-derive the SAME
  * codebooks in pure SQL and then mirror the ADC scoring loops of
  * `Similarity.knnPq` / `searchIvfPq` term by term:
  *
  *   - every multi-term float sum is emitted UNROLLED and LEFT-ASSOC so
  *     the IEEE evaluation order matches the Scala `while` loops exactly
  *     (`a + b + c` parses as `(a + b) + c` in both engines);
  *   - aggregation only ever happens in exact decimal space (the means)
  *     or on order-insensitive joins feeding `list(... ORDER BY s)`;
  *   - ranking happens on the ROUNDED similarity with an id tie-break,
  *     the q40 determinism contract.
  *
  * The result: the driver's raw-byte hash check holds at ANY scale
  * factor — nothing here pins literals from one dataset.
  */
object PqOracle {

  /** `f(1) + f(2) + ... + f(n)` — left-assoc by SQL grammar. */
  private def terms(n: Int)(f: Int => String): String =
    (1 to n).map(f).mkString(" + ")

  /** Squared L2 between list columns over dims 1..d (fixed fold order;
    * `(a-b)²` is bit-equal to Scala's `(b-a)²` — IEEE negation is exact).
    */
  private def dist2(a: String, b: String, d: Int): String =
    terms(d)(j => s"($a[$j]-$b[$j])*($a[$j]-$b[$j])")

  private def dot(a: String, b: String, d: Int): String =
    terms(d)(j => s"$a[$j]*$b[$j]")

  /** Fixed-iteration kmeans over a points CTE `pts(id, s, p)`:
    * emits CTEs `{pfx}0` (init) .. `{pfx}{iters}` (final books, columns
    * s, c, cv). Returns (cteSql, finalName).
    */
  private def kmeansCtes(pfx: String, pts: String, k: Int, dsub: Int,
      iters: Int): (String, String) = {
    val sb = new StringBuilder
    sb.append(
      s"""${pfx}0 AS MATERIALIZED (SELECT s, rn - 1 AS c, p AS cv FROM (
         |  SELECT s, p, ROW_NUMBER() OVER (PARTITION BY s ORDER BY id) AS rn FROM $pts)
         |  WHERE rn <= $k)""".stripMargin)
    var prev = s"${pfx}0"
    for (t <- 1 to iters) {
      sb.append(
        s""",
           |${pfx}a$t AS MATERIALIZED (SELECT id, s, c FROM (
           |  SELECT pt.id, pt.s, ct.c,
           |    ROW_NUMBER() OVER (PARTITION BY pt.id, pt.s
           |      ORDER BY (${dist2("pt.p", "ct.cv", dsub)}), ct.c) AS rn
           |  FROM $pts pt JOIN $prev ct USING (s)) WHERE rn = 1),
           |${pfx}u$t AS MATERIALIZED (SELECT a.s, a.c, j.j AS j,
           |    CAST(SUM(CAST(pt.p[j.j] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mj
           |  FROM ${pfx}a$t a JOIN $pts pt ON a.id = pt.id AND a.s = pt.s
           |  CROSS JOIN (SELECT unnest(range(1, ${dsub + 1})) AS j) j
           |  GROUP BY a.s, a.c, j.j),
           |${pfx}$t AS MATERIALIZED (SELECT i.s, i.c, COALESCE(u.cv, i.cv) AS cv
           |  FROM $prev i LEFT JOIN (SELECT s, c, list(mj ORDER BY j) AS cv
           |    FROM ${pfx}u$t GROUP BY s, c) u USING (s, c))""".stripMargin)
      prev = s"$pfx$t"
    }
    (sb.toString, prev)
  }

  /** Argmin-encode a points CTE against a books CTE: emits
    * `name(id, s, code)` with ties to the lowest centroid index —
    * mirrors `Similarity.pqEncode`'s strict `<`.
    */
  private def encCte(name: String, pts: String, books: String,
      dsub: Int): String =
    s"""$name AS MATERIALIZED (SELECT id, s, c AS code FROM (
       |  SELECT pt.id, pt.s, ct.c,
       |    ROW_NUMBER() OVER (PARTITION BY pt.id, pt.s
       |      ORDER BY (${dist2("pt.p", "ct.cv", dsub)}), ct.c) AS rn
       |  FROM $pts pt JOIN $books ct USING (s)) WHERE rn = 1)""".stripMargin

  /** Shared preamble: doubled embeddings, the query set, query norms²,
    * the m-subspace point slices, and the bounded deterministic fit
    * sample (`fe` = the `fitLimit` smallest vec_ids; `fpts` = their
    * subspace slices) — the exact mirror of the Spark side's
    * `orderBy(vec_id).limit(fitLimit)` fit input, so the kmeans fits
    * stay hash-exact while touching only the sample.
    */
  private def preamble(m: Int, dsub: Int, d: Int, qPred: String,
      fitLimit: Int): String =
    s"""e AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM e WHERE $qPred),
       |qn AS MATERIALIZED (SELECT qid, (${dot("qv", "qv", d)}) AS qn2 FROM q),
       |fe AS MATERIALIZED (SELECT vec_id FROM e ORDER BY vec_id LIMIT $fitLimit),
       |bpts AS MATERIALIZED (SELECT vec_id AS id, ss.s AS s,
       |    list_slice(v, ss.s*$dsub + 1, ss.s*$dsub + $dsub) AS p
       |  FROM e CROSS JOIN (SELECT unnest(range(0, $m)) AS s) ss),
       |fpts AS MATERIALIZED (SELECT * FROM bpts
       |  WHERE id IN (SELECT vec_id FROM fe))""".stripMargin

  /** Per-query ADC lookup tables over a books CTE: ip(q,s,c) and the
    * centroid norms² — mirrors the driver-side `luts`/`norms2` loops.
    */
  private def lutCte(books: String, dsub: Int): String =
    s"""lut AS MATERIALIZED (SELECT q.qid, b.s, b.c,
       |    (${terms(dsub)(j => s"q.qv[b.s*$dsub+$j]*b.cv[$j]")}) AS ip,
       |    (${dot("b.cv", "b.cv", dsub)}) AS n2
       |  FROM q CROSS JOIN $books b)""".stripMargin

  /** Final rounded-similarity top-k — the q40 ranking contract. */
  private def rankSelect(k: Int): String =
    s"""SELECT query_id, neighbor_id, pq_sim, CAST(rn AS INT) AS rank FROM (
       |  SELECT query_id, neighbor_id, pq_sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY pq_sim DESC, neighbor_id) AS rn FROM fin)
       |WHERE rn <= $k""".stripMargin

  /** q87: flat PQ ADC (`Similarity.kmeansMirrorable` books + `knnPq`).
    * Books fit on the `fitLimit`-bounded sample (`fpts`); the encode and
    * the ADC ranking still cover the full corpus. `ROUND(...) + 0.0`
    * normalizes DuckDB's −0.0 to Spark's +0.0 (the q15/q53 pattern) —
    * a |sim| < 5e-7 negative ADC cosine would otherwise byte-differ.
    */
  def q87Sql(m: Int, ksub: Int, d: Int, iters: Int, k: Int,
      qPred: String, fitLimit: Int): String = {
    val dsub = d / m
    val (bookCtes, books) = kmeansCtes("bk", "fpts", ksub, dsub, iters)
    s"""WITH ${preamble(m, dsub, d, qPred, fitLimit)},
       |$bookCtes,
       |${encCte("enc", "bpts", books, dsub)},
       |${lutCte(books, dsub)},
       |pair AS MATERIALIZED (SELECT l.qid, en.id AS nid,
       |    list(l.ip ORDER BY en.s) AS ips, list(l.n2 ORDER BY en.s) AS n2s
       |  FROM enc en JOIN lut l ON l.s = en.s AND l.c = en.code
       |  GROUP BY l.qid, en.id),
       |sc AS (SELECT qid, nid,
       |    (${terms(m)(i => s"ips[$i]")}) AS ip,
       |    (${terms(m)(i => s"n2s[$i]")}) AS n2 FROM pair),
       |fin AS (SELECT sc.qid AS query_id, sc.nid AS neighbor_id,
       |    ROUND(CASE WHEN sc.n2 = 0 OR qn.qn2 = 0 THEN 0.0
       |      ELSE sc.ip / SQRT(sc.n2 * qn.qn2) END, 6) + 0.0 AS pq_sim
       |  FROM sc JOIN qn USING (qid) WHERE sc.nid <> sc.qid)
       |${rankSelect(k)}""".stripMargin
  }

  /** q53: mirrorable IVF ANN (`Similarity.knnIvfMirrorable`). Coarse
    * centroids re-derived with the same kmeans CTEs as q88 (m = 1 over
    * the full vectors), then the search mirrors `ivfSearch` exactly:
    * argmin-L2 cell assignment (ties to the lower cell), per-query
    * nProbe nearest cells by ROUNDED centroid cosine (DESC, cell
    * tie-break), exact 6-dp cosine top-k within the probed cells. Every
    * vector is a query (self-join ANN). `ROUND(...) + 0.0` normalizes
    * DuckDB's −0.0 to match Spark's BigDecimal round, the q40 pattern —
    * applied to the probe ordering too, where a −0.0-vs-+0.0 sort
    * divergence would silently reorder probes.
    */
  def q53Sql(d: Int, nCells: Int, iters: Int, nProbe: Int, k: Int,
      fitLimit: Int): String = {
    val (ck, cfinal) = kmeansCtes("ck", "cfpts", nCells, d, iters)
    s"""WITH e AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS MATERIALIZED (SELECT vec_id, v,
       |  SQRT(${dot("v", "v", d)}) AS nrm FROM e),
       |fe AS MATERIALIZED (SELECT vec_id FROM e ORDER BY vec_id LIMIT $fitLimit),
       |cpts AS MATERIALIZED (SELECT vec_id AS id, 0 AS s, v AS p FROM e),
       |cfpts AS MATERIALIZED (SELECT * FROM cpts
       |  WHERE id IN (SELECT vec_id FROM fe)),
       |$ck,
       |coarse AS MATERIALIZED (SELECT c, cv,
       |  SQRT(${dot("cv", "cv", d)}) AS cnrm FROM $cfinal),
       |cells AS MATERIALIZED (SELECT id AS vec_id, c AS cell FROM (
       |  SELECT pt.id, ct.c,
       |    ROW_NUMBER() OVER (PARTITION BY pt.id
       |      ORDER BY (${dist2("pt.p", "ct.cv", d)}), ct.c) AS rn
       |  FROM cpts pt CROSS JOIN coarse ct) WHERE rn = 1),
       |probe AS MATERIALIZED (SELECT vec_id AS query_id, cell FROM (
       |  SELECT nq.vec_id, ct.c AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY nq.vec_id ORDER BY
       |      ROUND((${terms(d)(i => s"nq.v[$i]*ct.cv[$i]")})
       |        / (nq.nrm * ct.cnrm), 6) + 0.0 DESC, ct.c) AS rn
       |  FROM n nq CROSS JOIN coarse ct) WHERE rn <= $nProbe),
       |fin AS (SELECT pr.query_id, nc.vec_id AS neighbor_id,
       |    ROUND((${terms(d)(i => s"nq.v[$i]*nc.v[$i]")})
       |      / (nq.nrm * nc.nrm), 6) + 0.0 AS cos_sim
       |  FROM probe pr
       |  JOIN cells cl ON cl.cell = pr.cell
       |  JOIN n nc ON nc.vec_id = cl.vec_id
       |  JOIN n nq ON nq.vec_id = pr.query_id
       |  WHERE nc.vec_id <> pr.query_id)
       |SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INT) AS rank FROM (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id) AS rn FROM fin)
       |WHERE rn <= $k""".stripMargin
  }

  /** q100: cluster-balanced resampling
    * (`Similarity.clusterBalanceMirrorable`). Centroids re-derived with
    * the same kmeans CTEs as q53 (m = 1 over the full vectors),
    * argmin-L2 cell assignment (ties to the lower cell), per-cell
    * counts, weight = ROUND(LEAST(1, cap/n), 6), and the md5-uniform
    * keep decision in the q59 hash-split syntax — every step replays
    * the Spark operator bit-for-bit at any scale factor.
    */
  def q100Sql(d: Int, nCells: Int, iters: Int, fitLimit: Int,
      cap: Double): String = {
    val (ck, cfinal) = kmeansCtes("ck", "cfpts", nCells, d, iters)
    val weight = s"ROUND(LEAST(1.0, $cap / CAST(ct.cluster_n AS DOUBLE)), 6) + 0.0"
    s"""WITH e AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |fe AS MATERIALIZED (SELECT vec_id FROM e ORDER BY vec_id LIMIT $fitLimit),
       |cpts AS MATERIALIZED (SELECT vec_id AS id, 0 AS s, v AS p FROM e),
       |cfpts AS MATERIALIZED (SELECT * FROM cpts
       |  WHERE id IN (SELECT vec_id FROM fe)),
       |$ck,
       |coarse AS MATERIALIZED (SELECT c, cv FROM $cfinal),
       |cells AS MATERIALIZED (SELECT id AS vec_id, c AS cell FROM (
       |  SELECT pt.id, ct.c,
       |    ROW_NUMBER() OVER (PARTITION BY pt.id
       |      ORDER BY (${dist2("pt.p", "ct.cv", d)}), ct.c) AS rn
       |  FROM cpts pt CROSS JOIN coarse ct) WHERE rn = 1),
       |counts AS MATERIALIZED (SELECT cell, CAST(COUNT(*) AS INT) AS cluster_n
       |  FROM cells GROUP BY cell)
       |SELECT c.vec_id, CAST(c.cell AS INT) AS cell, ct.cluster_n,
       |  $weight AS keep_weight,
       |  (('0x' || substr(md5(CAST(c.vec_id AS VARCHAR)), 1, 8))::UBIGINT
       |     / 4294967296.0) < $weight AS keep
       |FROM cells c JOIN counts ct USING (cell)""".stripMargin
  }

  /** Coarse-quantizer CTEs shared by q88/q92: centroids (re-derived
    * kmeans over the `fe`-bounded fit sample's full vectors), per-vector
    * cell assignment (full corpus), and the per-query probe set (nProbe
    * nearest cells by ROUNDED centroid cosine — `ROUND(...,6) + 0.0`,
    * matching `searchIvfPq`'s driver loop's BigDecimal round so a
    * ±0.0-vs-raw-sim ordering divergence can't pick different probes;
    * ties to the lower cell).
    */
  private def coarseCtes(d: Int, nCells: Int, iters: Int,
      nProbe: Int): String = {
    val (ck, cfinal) = kmeansCtes("ck", "cfpts", nCells, d, iters)
    s"""cpts AS MATERIALIZED (SELECT vec_id AS id, 0 AS s, v AS p FROM e),
       |cfpts AS MATERIALIZED (SELECT * FROM cpts
       |  WHERE id IN (SELECT vec_id FROM fe)),
       |$ck,
       |coarse AS MATERIALIZED (SELECT c, cv FROM $cfinal),
       |cells AS MATERIALIZED (SELECT id AS vec_id, c AS cell FROM (
       |  SELECT pt.id, ct.c,
       |    ROW_NUMBER() OVER (PARTITION BY pt.id
       |      ORDER BY (${dist2("pt.p", "ct.cv", d)}), ct.c) AS rn
       |  FROM cpts pt CROSS JOIN coarse ct) WHERE rn = 1),
       |probe AS MATERIALIZED (SELECT qid, cell FROM (
       |  SELECT q.qid, ct.c AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
       |      ROUND(CASE WHEN (${dot("ct.cv", "ct.cv", d)}) = 0
       |            OR (${dot("q.qv", "q.qv", d)}) = 0 THEN 0.0
       |       ELSE (${terms(d)(j => s"ct.cv[$j]*q.qv[$j]")})
       |         / SQRT((${dot("ct.cv", "ct.cv", d)}) * (${dot("q.qv", "q.qv", d)})) END, 6)
       |      + 0.0 DESC, ct.c) AS rn
       |  FROM q CROSS JOIN coarse ct) WHERE rn <= $nProbe)""".stripMargin
  }

  /** q88: IVF-PQ, plain mode (`buildIvfPqIndexMirrorable` +
    * `searchIvfPq` with zero effective centroids — ip/n2 reduce to the
    * flat ADC sums over the probed cells only).
    */
  def q88Sql(m: Int, ksub: Int, d: Int, iters: Int, nCells: Int,
      nProbe: Int, k: Int, qPred: String, fitLimit: Int): String = {
    val dsub = d / m
    val (bookCtes, books) = kmeansCtes("bk", "fpts", ksub, dsub, iters)
    s"""WITH ${preamble(m, dsub, d, qPred, fitLimit)},
       |${coarseCtes(d, nCells, iters, nProbe)},
       |$bookCtes,
       |${encCte("enc", "bpts", books, dsub)},
       |${lutCte(books, dsub)},
       |pair AS MATERIALIZED (SELECT pr.qid, en.id AS nid,
       |    list(l.ip ORDER BY en.s) AS ips, list(l.n2 ORDER BY en.s) AS n2s
       |  FROM enc en JOIN cells cl ON cl.vec_id = en.id
       |  JOIN probe pr ON pr.cell = cl.cell
       |  JOIN lut l ON l.qid = pr.qid AND l.s = en.s AND l.c = en.code
       |  GROUP BY pr.qid, en.id),
       |sc AS (SELECT qid, nid,
       |    (${terms(m)(i => s"ips[$i]")}) AS ip,
       |    (${terms(m)(i => s"n2s[$i]")}) AS n2 FROM pair),
       |fin AS (SELECT sc.qid AS query_id, sc.nid AS neighbor_id,
       |    ROUND(CASE WHEN sc.n2 <= 0 OR qn.qn2 = 0 THEN 0.0
       |      ELSE sc.ip / SQRT(sc.n2 * qn.qn2) END, 6) + 0.0 AS pq_sim
       |  FROM sc JOIN qn USING (qid) WHERE sc.nid <> sc.qid)
       |${rankSelect(k)}""".stripMargin
  }

  /** q92: residual IVF-PQ. Books are re-derived over `x − c(cell)`;
    * scoring mirrors `searchIvfPq`'s residual reconstruction exactly:
    * `ip = (q·c + Σ_s lut)` and `n2 = (|c|² + Σ_s (2·cross + n2s))`,
    * both as the same left-assoc chains the Scala loop produces.
    */
  def q92Sql(m: Int, ksub: Int, d: Int, iters: Int, nCells: Int,
      nProbe: Int, k: Int, qPred: String, fitLimit: Int): String = {
    val dsub = d / m
    val (bookCtes, books) = kmeansCtes("rk", "rfpts", ksub, dsub, iters)
    s"""WITH ${preamble(m, dsub, d, qPred, fitLimit)},
       |${coarseCtes(d, nCells, iters, nProbe)},
       |r AS MATERIALIZED (SELECT cl.vec_id,
       |    list_transform(range(1, ${d + 1}), j -> e.v[j] - ct.cv[j]) AS rv
       |  FROM e JOIN cells cl USING (vec_id) JOIN coarse ct ON ct.c = cl.cell),
       |rpts AS MATERIALIZED (SELECT vec_id AS id, ss.s AS s,
       |    list_slice(rv, ss.s*$dsub + 1, ss.s*$dsub + $dsub) AS p
       |  FROM r CROSS JOIN (SELECT unnest(range(0, $m)) AS s) ss),
       |rfpts AS MATERIALIZED (SELECT * FROM rpts
       |  WHERE id IN (SELECT vec_id FROM fe)),
       |$bookCtes,
       |${encCte("enc", "rpts", books, dsub)},
       |${lutCte(books, dsub)},
       |crossT AS MATERIALIZED (SELECT ct.c AS cell, b.s, b.c AS bc,
       |    (${terms(dsub)(j => s"ct.cv[b.s*$dsub+$j]*b.cv[$j]")}) AS cr
       |  FROM coarse ct CROSS JOIN $books b),
       |qdotc AS MATERIALIZED (SELECT q.qid, ct.c AS cell,
       |    (${terms(d)(j => s"q.qv[$j]*ct.cv[$j]")}) AS ip
       |  FROM q CROSS JOIN coarse ct),
       |cnorm AS MATERIALIZED (SELECT c AS cell, (${dot("cv", "cv", d)}) AS cn2 FROM coarse),
       |pair AS MATERIALIZED (SELECT pr.qid, en.id AS nid, cl.cell,
       |    list(l.ip ORDER BY en.s) AS ips,
       |    list(2.0*x.cr + l.n2 ORDER BY en.s) AS n2t
       |  FROM enc en JOIN cells cl ON cl.vec_id = en.id
       |  JOIN probe pr ON pr.cell = cl.cell
       |  JOIN lut l ON l.qid = pr.qid AND l.s = en.s AND l.c = en.code
       |  JOIN crossT x ON x.cell = cl.cell AND x.s = en.s AND x.bc = en.code
       |  GROUP BY pr.qid, en.id, cl.cell),
       |sc AS (SELECT pair.qid, pair.nid,
       |    (qc.ip + ${terms(m)(i => s"ips[$i]")}) AS ip,
       |    (cn.cn2 + ${terms(m)(i => s"(n2t[$i])")}) AS n2
       |  FROM pair JOIN qdotc qc ON qc.qid = pair.qid AND qc.cell = pair.cell
       |  JOIN cnorm cn ON cn.cell = pair.cell),
       |fin AS (SELECT sc.qid AS query_id, sc.nid AS neighbor_id,
       |    ROUND(CASE WHEN sc.n2 <= 0 OR qn.qn2 = 0 THEN 0.0
       |      ELSE sc.ip / SQRT(sc.n2 * qn.qn2) END, 6) + 0.0 AS pq_sim
       |  FROM sc JOIN qn USING (qid) WHERE sc.nid <> sc.qid)
       |${rankSelect(k)}""".stripMargin
  }
}
