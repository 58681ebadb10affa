package graft.oracle

/** DuckDB oracle-SQL generator for q49
  * (`graft.ml.SeasonalRegression.fitPredictMirrorable`).
  *
  * The Spark side pins every cross-engine-fragile step (period-scaled
  * trend, 6-dp-rounded sin/cos, exact-decimal X'X / X'y sums, a no-pivot
  * Gaussian elimination with a fixed IEEE op order — see that method's
  * scaladoc). This generator replays the SAME computation in SQL:
  *
  *   - the normal equations are per-key aggregates under the dsum
  *     discipline (`CAST(SUM(CAST(ROUND(term, 6) AS DECIMAL(28,6))) AS
  *     DOUBLE)`), order-independent on both engines;
  *   - each elimination step k is one CTE whose every updated cell reads
  *     ONLY previous-CTE columns — exactly the Scala loop, which reads
  *     the pre-step row r and pivot row k (`f = a(r)(k)/a(k)(k)` is
  *     re-derived per cell; IEEE division of identical operands is
  *     deterministic, so recomputation ≡ Scala's hoisted `f`);
  *   - back-substitution is a CTE chain x{p-1}→x0 with left-assoc
  *     subtraction chains matching the Scala `s -= a(i)(j)*x(j)` order;
  *   - `ROUND(..., 6) + 0.0` on every emitted float kills DuckDB's −0.0
  *     (the q15 class; Spark round never emits −0.0).
  *
  * Nothing here pins dataset literals, so the oracle holds at any scale
  * factor, and the `ABS(pivot) > 1e-12` guards mirror the Scala
  * degenerate-pivot behavior exactly.
  */
object SeasonalOracle {

  def q49Sql(period: Double, harmonics: Int): String = {
    val p = 2 + 2 * harmonics
    // feature expressions as seen from CTE f (f0 is the literal 1.0)
    val feat: IndexedSeq[String] = IndexedSeq("1.0", "td") ++
      (1 to harmonics).flatMap(k => Seq(s"fs$k", s"fc$k"))
    val harmCols = (1 to harmonics).flatMap { k =>
      val w = 2.0 * math.Pi * k
      Seq(s"ROUND(SIN($w * td), 6) + 0.0 AS fs$k",
          s"ROUND(COS($w * td), 6) + 0.0 AS fc$k")
    }.mkString(",\n    ")
    // NOT `ROUND(term, 6)` / not a bare DECIMAL cast / not VARCHAR: the
    // X'X/X'y terms are products of exact-6dp decimals, so their
    // shortest string reprs are often EXACT halfway ties at the 7th
    // decimal, where DuckDB ROUND, DuckDB's native double→DECIMAL cast
    // (value-incorrect near boundaries — 2.6k mismatches on a 40k
    // adversarial sweep) and Java's legacy shortest-repr each resolve
    // differently. Instead both engines quantize the EXACT binary
    // value, where a scale-6 halfway tie is impossible (it would need
    // 5⁶ to divide an odd mantissa): Scala via `new BigDecimal(x)`,
    // DuckDB via correctly-rounded fixed-point `printf('%.25f', x)` —
    // 25 fraction digits always reach the deciding digit for |x|≤1e6
    // (0 mismatches on the same sweep).
    def dsum(term: String, as: String) =
      s"CAST(SUM(CAST(printf('%.25f', $term) AS DECIMAL(38,6))) AS DOUBLE) AS $as"
    val ataAggs = (for (i <- 0 until p; j <- i until p)
      yield dsum(s"${feat(i)} * ${feat(j)}", s"a${i}_$j")).mkString(",\n    ")
    val atbAggs = (0 until p).map(i => dsum(s"${feat(i)} * y", s"b$i"))
      .mkString(",\n    ")
    // e0: mirror the symmetric upper triangle into a full matrix
    val fullMatrix = (for (r <- 0 until p; c <- 0 until p)
      yield if (r <= c) s"a${r}_$c" else s"a${c}_$r AS a${r}_$c")
      .mkString(", ")
    val bCols = (0 until p).map(i => s"b$i").mkString(", ")
    // elimination step k: update rows r > k from the previous CTE
    def step(k: Int): String = {
      val g = s"ABS(a${k}_$k) > 1e-12"
      val m = for (r <- 0 until p; c <- 0 until p) yield {
        val nm = s"a${r}_$c"
        if (r > k && c >= k)
          s"CASE WHEN $g THEN $nm - (a${r}_$k / a${k}_$k) * a${k}_$c ELSE $nm END AS $nm"
        else nm
      }
      val bs = (0 until p).map { r =>
        if (r > k) s"CASE WHEN $g THEN b$r - (a${r}_$k / a${k}_$k) * b$k ELSE b$r END AS b$r"
        else s"b$r"
      }
      (Seq("user_id", "n", "bm") ++ m ++ bs).mkString(",\n    ")
    }
    val elimCtes = (0 until p - 1).map { k =>
      val src = if (k == 0) "e0" else s"e$k"
      s"e${k + 1} AS MATERIALIZED (SELECT\n    ${step(k)}\n  FROM $src)"
    }.mkString(",\n")
    // back-substitution chain: x{p-1} down to x0
    val backCtes = (p - 1 to 0 by -1).map { i =>
      val src = if (i == p - 1) s"e${p - 1}" else s"xc${i + 1}"
      val s = (s"b$i" +: (i + 1 until p).map(j => s"a${i}_$j * x$j")).mkString(" - ")
      s"xc$i AS MATERIALIZED (SELECT *, CASE WHEN ABS(a${i}_$i) > 1e-12" +
        s" THEN ($s) / a${i}_$i ELSE 0.0 END AS x$i FROM $src)"
    }.mkString(",\n")
    val dot = feat.zipWithIndex.map { case (f, i) =>
      val fe = if (i == 0) "1.0" else s"f.$f"
      s"$fe * x.x$i"
    }.mkString(" + ")
    s"""WITH base AS MATERIALIZED (
       |  SELECT event_id, user_id, epoch_us(ts) / 1000000.0 AS t, value AS y
       |  FROM events),
       |f AS MATERIALIZED (
       |  SELECT event_id, user_id, y, td,
       |    $harmCols
       |  FROM (SELECT event_id, user_id, y,
       |          (t - MIN(t) OVER (PARTITION BY user_id)) / $period AS td
       |        FROM base)),
       |g AS MATERIALIZED (
       |  SELECT user_id, COUNT(*) AS n,
       |    $ataAggs,
       |    $atbAggs
       |  FROM f GROUP BY user_id),
       |e0 AS MATERIALIZED (
       |  SELECT user_id, n, b0 AS bm, $fullMatrix, $bCols FROM g),
       |$elimCtes,
       |$backCtes,
       |pred AS MATERIALIZED (
       |  SELECT f.event_id, f.user_id, f.y,
       |    CASE WHEN x.n < ${p + 1} THEN x.bm / CAST(x.n AS DOUBLE)
       |         ELSE $dot END AS fit
       |  FROM f JOIN xc0 x ON f.user_id = x.user_id)
       |SELECT event_id, user_id,
       |  ROUND(fit, 6) + 0.0 AS fitted,
       |  ROUND(y - fit, 6) + 0.0 AS resid
       |FROM pred""".stripMargin
  }
}
