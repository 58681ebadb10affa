package graft.oracle

/** DuckDB oracle-SQL generator for the mirrorable ARIMA fit
  * (`graft.ml.Arima.fitOne` — Hannan–Rissanen two-stage least squares,
  * CSS σ²/AIC, h-step forecast) and the AIC order search.
  *
  * Same contract as [[SeasonalOracle]]: every cross-engine-fragile step
  * of the Scala kernel is replayed term-for-term —
  *   - per-series values as DuckDB lists (`list(value ORDER BY rn)`,
  *     the q96 collect pattern), d-fold differencing as one
  *     `list_transform` CTE per level;
  *   - X'X / X'y per stage under the dsum discipline
  *     (`CAST(SUM(CAST(printf('%.25f', term) AS DECIMAL(38,6))) AS
  *     DOUBLE)` — exact 6-dp quanta, order-independent);
  *   - the no-pivot elimination + back-substitution CTE chains
  *     (generalized from [[SeasonalOracle]]'s fixed-size emitter), one
  *     chain per stage, every updated cell reading only previous-CTE
  *     columns;
  *   - stage-1 residuals `ROUND(z_t − dot, 6) + 0.0` as a list (0.0
  *     below index L — the forecast recursion's zero-innovation
  *     convention);
  *   - CSS rss via dsum of r², σ² = rss/n_eff,
  *     aic = ROUND(n_eff·(ROUND(LN(GREATEST(σ²,1e-12)),6)+0.0) +
  *     2·dim₂, 6);
  *   - the forecast recursion unrolled j = 1..h — future-innovation
  *     terms emitted as literal `x_k * 0.0` so the IEEE op sequence
  *     matches the Scala accumulation exactly — then d integration
  *     levels as left-assoc running sums;
  *   - the degenerate guard (`n_eff < dim₂+1` or a non-finite solve)
  *     mirrored as a CASE emitting the reference's 1e6 AIC penalty
  *     (`app/arima_optimizer.py:21`) and the naive last-value forecast.
  *
  * Nothing pins dataset literals, so the oracle holds at any scale
  * factor.
  */
object ArimaOracle {

  private def dsum(term: String, as: String) =
    s"CAST(SUM(CAST(printf('%.25f', $term) AS DECIMAL(38,6))) AS DOUBLE) AS $as"

  /** Elimination + back-substitution chain for one `dim`-sized system.
    * `src` must expose the full matrix `${pref}a{r}_{c}`, rhs
    * `${pref}b{r}`, and `user_id`. Returns (cteText, finalCteName); the
    * final CTE accumulates solution columns `${pref}x0..x{dim-1}`. */
  private def elimChain(pref: String, dim: Int, src: String): (String, String) = {
    def a(r: Int, c: Int) = s"${pref}a${r}_$c"
    def b(r: Int) = s"${pref}b$r"
    def step(k: Int): String = {
      val g = s"ABS(${a(k, k)}) > 1e-12"
      val m = for (r <- 0 until dim; c <- 0 until dim) yield {
        val nm = a(r, c)
        if (r > k && c >= k)
          s"CASE WHEN $g THEN $nm - (${a(r, k)} / ${a(k, k)}) * ${a(k, c)} ELSE $nm END AS $nm"
        else nm
      }
      val bs = (0 until dim).map { r =>
        if (r > k) s"CASE WHEN $g THEN ${b(r)} - (${a(r, k)} / ${a(k, k)}) * ${b(k)} ELSE ${b(r)} END AS ${b(r)}"
        else b(r)
      }
      (Seq("user_id") ++ m ++ bs).mkString(",\n    ")
    }
    val elim = (0 until dim - 1).map { k =>
      val from = if (k == 0) src else s"${pref}e$k"
      s"${pref}e${k + 1} AS MATERIALIZED (SELECT\n    ${step(k)}\n  FROM $from)"
    }
    val lastE = if (dim == 1) src else s"${pref}e${dim - 1}"
    val back = (dim - 1 to 0 by -1).map { i =>
      val from = if (i == dim - 1) lastE else s"${pref}xc${i + 1}"
      val s = (b(i) +: (i + 1 until dim).map(j => s"${a(i, j)} * ${pref}x$j"))
        .mkString(" - ")
      s"${pref}xc$i AS MATERIALIZED (SELECT *, CASE WHEN ABS(${a(i, i)}) > 1e-12" +
        s" THEN ($s) / ${a(i, i)} ELSE 0.0 END AS ${pref}x$i FROM $from)"
    }
    ((elim ++ back).mkString(",\n"), s"${pref}xc0")
  }

  /** One OLS stage: design rows `t ∈ [t0, m)` unnested from `srcCte`
    * (which must expose `user_id`, `m`, `z`, and any lists in
    * `extraLists`), upper-triangle dsum aggregates mirrored to the full
    * matrix, then the elimination chain. Returns (cteText,
    * solutionCteName); the stage's row CTE is `${pref}s`. */
  private def olsStage(pref: String, dim: Int, t0: String, srcCte: String,
      feat: IndexedSeq[String], extraLists: Seq[String]): (String, String) = {
    val lists = (Seq("z") ++ extraLists).mkString(", ")
    val ata = (for (i <- 0 until dim; j <- i until dim)
      yield dsum(s"${feat(i)} * ${feat(j)}", s"${pref}a${i}_$j")).mkString(",\n    ")
    val atb = (0 until dim)
      .map(i => dsum(s"${feat(i)} * z[t + 1]", s"${pref}b$i")).mkString(",\n    ")
    val full = (for (r <- 0 until dim; c <- 0 until dim)
      yield if (r <= c) s"${pref}a${r}_$c"
      else s"${pref}a${c}_$r AS ${pref}a${r}_$c").mkString(", ")
    val bCols = (0 until dim).map(i => s"${pref}b$i").mkString(", ")
    val (chain, xcte) = elimChain(pref, dim, s"${pref}f0")
    val text =
      s"""${pref}s AS MATERIALIZED (
         |  SELECT user_id, $lists, unnest(range($t0, m)) AS t FROM $srcCte),
         |${pref}g AS MATERIALIZED (
         |  SELECT user_id,
         |    $ata,
         |    $atb
         |  FROM ${pref}s GROUP BY user_id),
         |${pref}f0 AS MATERIALIZED (SELECT user_id, $full, $bCols FROM ${pref}g),
         |$chain""".stripMargin
    (text, xcte)
  }

  /** Scala accumulation order: `x0 * f0 + x1 * f1 + …` (left-assoc). */
  private def dot(xPref: String, feat: IndexedSeq[String]): String =
    feat.zipWithIndex.map { case (f, i) => s"${xPref}x$i * $f" }.mkString(" + ")

  /** Lag-i feature over 1-based lists at 0-based row index `t`:
    * z_(t−i) = z[t − i + 1]. */
  private def lagFeat(list: String, i: Int): String =
    if (i == 1) s"$list[t]" else s"$list[t - ${i - 1}]"

  private def nonFinite(xPref: String, dim: Int): String =
    (0 until dim).map(i => s"isnan(${xPref}x$i) OR isinf(${xPref}x$i)")
      .mkString("(", " OR ", ")")

  /** Shared preamble: per-user value list `lv0` (first `maxSteps` rows
    * by (epoch_us(ts), event_id) — the reference's `--max_steps` fit
    * cap) and difference levels `lv1..lvd`; the working series is
    * `z = lv$d`, `m = len(z)`. */
  private def seriesCtes(pref: String, d: Int, maxSteps: Int): String = {
    val diffs = (1 to d).map { k =>
      s"""${pref}v$k AS MATERIALIZED (SELECT *,
         |    list_transform(range(0, len(lv${k - 1}) - 1),
         |                   i -> lv${k - 1}[i + 2] - lv${k - 1}[i + 1]) AS lv$k
         |  FROM ${pref}v${k - 1})""".stripMargin
    }
    (Seq(
      s"""${pref}v0 AS MATERIALIZED (
         |  SELECT user_id, list(value ORDER BY rn) AS lv0
         |  FROM (SELECT user_id, value,
         |          ROW_NUMBER() OVER (PARTITION BY user_id
         |                             ORDER BY epoch_us(ts), event_id) AS rn
         |        FROM events)
         |  WHERE rn <= $maxSteps GROUP BY user_id)""".stripMargin) ++ diffs :+
      s"${pref}zc AS MATERIALIZED (SELECT *, lv$d AS z, len(lv$d) AS m FROM ${pref}v$d)")
      .mkString(",\n")
  }

  def fitSql(p: Int, d: Int, q: Int, h: Int, maxSteps: Int): String = {
    val (body, res) = build("", p, d, q, h, maxSteps, full = true)
    s"WITH $body\nSELECT * FROM $res"
  }

  /** Order search over `candidates` with the Scala tie-break
    * (aic, p+q, d, p) — one pipeline block per candidate, UNION ALL,
    * ROW_NUMBER argmin per series. */
  def orderSearchSql(candidates: Seq[(Int, Int, Int)], maxSteps: Int): String = {
    val blocks = candidates.zipWithIndex
      .map { case ((p, d, q), i) => build(s"c${i}_", p, d, q, 0, maxSteps, full = false)._1 }
      .mkString(",\n")
    val union = candidates.zipWithIndex.map { case ((p, d, q), i) =>
      s"SELECT user_id, $p AS p, $d AS d, $q AS q, aic FROM c${i}_res"
    }.mkString("\n  UNION ALL ")
    s"""WITH $blocks,
       |allc AS MATERIALIZED (
       |  $union),
       |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |         ORDER BY aic, p + q, d, p) AS rnk FROM allc)
       |SELECT user_id, CAST(p AS INT) AS best_p, CAST(d AS INT) AS best_d,
       |  CAST(q AS INT) AS best_q, ROUND(aic, 6) + 0.0 AS aic
       |FROM rk WHERE rnk = 1""".stripMargin
  }

  /** q101: ACF + Ljung–Box (`graft.ml.Arima.acfLjungBox`). The per-user
    * value list comes from the same capped collect as the fits; the
    * mean and both covariance sums replay the dsum discipline, ρ_k
    * rounds to 6 dp, and Q folds the ROUNDED ρ left-assoc with the
    * identical n>k and c₀=0 guards. */
  def acfSql(maxLag: Int, maxSteps: Int): String = {
    val rhoCtes = (1 to maxLag).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT user_id,
         |    ${dsum(s"(y[t + 1] - mean) * (y[t + 1 + $k] - mean)", "ck")}
         |  FROM (SELECT user_id, y, mean, unnest(range(0, n - $k)) AS t FROM mz)
         |  GROUP BY user_id)""".stripMargin
    }.mkString(",\n")
    val rhoJoin = (1 to maxLag)
      .map(k => s"LEFT JOIN r$k ON mz.user_id = r$k.user_id").mkString("\n  ")
    val rhoSel = (1 to maxLag).map { k =>
      s"""CASE WHEN c0 > 0.0 AND n > $k
         |    THEN ROUND(COALESCE(r$k.ck, 0.0) / c0, 6) + 0.0
         |    ELSE 0.0 END AS rho$k""".stripMargin
    }.mkString(",\n  ")
    val qTerms = (1 to maxLag)
      .map(k => s"(CASE WHEN n > $k THEN rho$k * rho$k / (n - $k) ELSE 0.0 END)")
      .mkString(" + ")
    // Durbin–Levinson on the rounded rho: one CTE pair per order k —
    // pk computes phi_{k,k} (g$k, guard |den| > 1e-12 as in Scala),
    // pku updates phi_{k,j} = phi_{k-1,j} − g_k·phi_{k-1,k-j}. Columns
    // f{k}_{j} carry the full-precision phi matrix; pacf rounds at
    // emission only.
    val dlCtes = new scala.collection.mutable.ArrayBuffer[String]
    if (maxLag >= 1) {
      dlCtes += "p1 AS MATERIALIZED (SELECT *, rho1 AS g1, rho1 AS f1_1 FROM rho)"
      for (k <- 2 to maxLag) {
        val prev = if (k == 2) "p1" else s"p${k - 1}u"
        val num = (s"rho$k" +:
          (1 until k).map(j => s"f${k - 1}_$j * rho${k - j}")).mkString(" - ")
        val den = ("1.0" +:
          (1 until k).map(j => s"f${k - 1}_$j * rho$j")).mkString(" - ")
        dlCtes +=
          s"""p$k AS MATERIALIZED (SELECT *,
             |  CASE WHEN ABS($den) > 1e-12 THEN ($num) / ($den)
             |       ELSE 0.0 END AS g$k FROM $prev)""".stripMargin
        val upd = (1 until k)
          .map(j => s"f${k - 1}_$j - g$k * f${k - 1}_${k - j} AS f${k}_$j") :+
          s"g$k AS f${k}_$k"
        dlCtes += s"p${k}u AS MATERIALIZED (SELECT *, ${upd.mkString(", ")} FROM p$k)"
      }
    }
    val dlText = dlCtes.mkString(",\n")
    val lastDl = if (maxLag == 1) "p1" else s"p${maxLag}u"
    val pacfSel = (1 to maxLag)
      .map(k => s"ROUND(g$k, 6) + 0.0 AS pacf$k").mkString(", ")
    s"""WITH v0 AS MATERIALIZED (
       |  SELECT user_id, list(value ORDER BY rn) AS y
       |  FROM (SELECT user_id, value,
       |          ROW_NUMBER() OVER (PARTITION BY user_id
       |                             ORDER BY epoch_us(ts), event_id) AS rn
       |        FROM events)
       |  WHERE rn <= $maxSteps GROUP BY user_id),
       |m0 AS MATERIALIZED (
       |  SELECT user_id,
       |    ${dsum("y[t + 1]", "sm")}
       |  FROM (SELECT user_id, y, unnest(range(0, len(y))) AS t FROM v0)
       |  GROUP BY user_id),
       |mz AS MATERIALIZED (
       |  SELECT v0.user_id, y, len(y) AS n,
       |    m0.sm / CAST(len(y) AS DOUBLE) AS mean
       |  FROM v0 JOIN m0 ON v0.user_id = m0.user_id),
       |c0c AS MATERIALIZED (
       |  SELECT user_id,
       |    ${dsum("(y[t + 1] - mean) * (y[t + 1] - mean)", "c0")}
       |  FROM (SELECT user_id, y, mean, unnest(range(0, n)) AS t FROM mz)
       |  GROUP BY user_id),
       |$rhoCtes,
       |rho AS MATERIALIZED (
       |  SELECT mz.user_id, mz.n, c0c.c0,
       |  $rhoSel
       |  FROM mz JOIN c0c ON mz.user_id = c0c.user_id
       |  $rhoJoin),
       |$dlText
       |SELECT user_id, CAST(n AS INT) AS n,
       |  ${(1 to maxLag).map(k => s"rho$k").mkString(", ")},
       |  $pacfSel,
       |  ROUND(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * ($qTerms), 6)
       |    + 0.0 AS q_stat
       |FROM $lastDl""".stripMargin
  }

  /** One candidate's pipeline as a WITH-body whose final CTE is
    * `${pref}res`. `full = false` emits only `(user_id, aic)` for the
    * order-search face. */
  private def build(pref: String, p: Int, d: Int, q: Int, h: Int,
      maxSteps: Int, full: Boolean): (String, String) = {
    val L = p + q + 1
    val dim2 = 1 + p + q
    val start2 = L + q
    val ctes = scala.collection.mutable.ArrayBuffer.empty[String]
    ctes += seriesCtes(pref, d, maxSteps)

    // ---- stage 1 (q > 0): long-AR solve, rounded residual list e ----
    val s2src: String = if (q > 0) {
      val feat1 = IndexedSeq("1.0") ++ (1 to L).map(i => lagFeat("z", i))
      val (s1Text, x1) =
        olsStage(s"${pref}s1", 1 + L, L.toString, s"${pref}zc", feat1, Nil)
      ctes += s1Text
      // dot over the lambda's 0-based index tt: z_(tt−i) = z[tt − i + 1]
      val lamFeat = IndexedSeq("1.0") ++ (1 to L).map(i => s"z[tt - ${i - 1}]")
      val lamDot = dot(s"${pref}s1", lamFeat)
      ctes +=
        s"""${pref}el AS MATERIALIZED (
           |  SELECT c.user_id, c.z, c.m,
           |    list_transform(range(0, m), tt -> CASE WHEN tt >= $L
           |      THEN ROUND(z[tt + 1] - ($lamDot), 6) + 0.0
           |      ELSE 0.0 END) AS e,
           |    ${nonFinite(s"${pref}s1", 1 + L)} AS bad1
           |  FROM ${pref}zc c JOIN $x1 USING (user_id))""".stripMargin
      s"${pref}el"
    } else s"${pref}zc"

    // ---- stage 2: (c, φ₁..φ_p, θ₁..θ_q) ----
    val feat2 = IndexedSeq("1.0") ++ (1 to p).map(i => lagFeat("z", i)) ++
      (1 to q).map(k => lagFeat("e", k))
    val (s2Text, x2) = olsStage(s"${pref}s2", dim2, start2.toString, s2src,
      feat2, if (q > 0) Seq("e") else Nil)
    ctes += s2Text

    // ---- CSS rss on the stage-2 rows ----
    val dot2 = dot(s"${pref}s2", feat2)
    ctes +=
      s"""${pref}rs AS MATERIALIZED (
         |  SELECT user_id,
         |    ${dsum(s"(z[t + 1] - ($dot2)) * (z[t + 1] - ($dot2))", "rss")}
         |  FROM ${pref}s2s JOIN $x2 USING (user_id)
         |  GROUP BY user_id)""".stripMargin

    // ---- assembly: σ², AIC, degenerate flags; LEFT JOINs keep
    //      too-short series alive for the fallback CASE ----
    val bad1Col = if (q > 0) s"COALESCE(${pref}el.bad1, FALSE)" else "FALSE"
    val eSel = if (q > 0) s", ${pref}el.e AS e" else ""
    val elJoin =
      if (q > 0) s"LEFT JOIN ${pref}el ON c.user_id = ${pref}el.user_id" else ""
    val xCols = (0 until dim2).map(i => s"${pref}s2x$i").mkString(", ")
    ctes +=
      s"""${pref}fit AS MATERIALIZED (
         |  SELECT c.user_id, c.lv0 AS y, c.z, c.m$eSel, $xCols,
         |    r.rss / CAST(c.m - $start2 AS DOUBLE) AS sigma2,
         |    $bad1Col OR COALESCE(${nonFinite(s"${pref}s2", dim2)}, FALSE)
         |      OR c.m - $start2 < ${dim2 + 1} AS bad
         |  FROM ${pref}zc c
         |  $elJoin
         |  LEFT JOIN $x2 ON c.user_id = $x2.user_id
         |  LEFT JOIN ${pref}rs r ON c.user_id = r.user_id)""".stripMargin
    ctes +=
      s"""${pref}ac AS MATERIALIZED (
         |  SELECT *,
         |    ROUND(CAST(m - $start2 AS DOUBLE) *
         |          (ROUND(LN(GREATEST(sigma2, 1e-12)), 6) + 0.0) +
         |          ${2.0 * dim2}, 6) + 0.0 AS aic_raw
         |  FROM ${pref}fit)""".stripMargin

    if (!full) {
      ctes +=
        s"""${pref}res AS MATERIALIZED (
           |  SELECT user_id, CASE WHEN bad THEN 1000000.0 ELSE aic_raw END AS aic
           |  FROM ${pref}ac)""".stripMargin
      return (ctes.mkString(",\n"), s"${pref}res")
    }

    // ---- forecast recursion, unrolled j = 1..h ----
    var prev = s"${pref}ac"
    for (j <- 1 to h) {
      val phiTerms = (1 to p).map { i =>
        val off = j - i // ≥ 1 → earlier forecast zf_{j−i}; else observed z
        if (off >= 1) s"${pref}s2x$i * zf$off"
        else if (off == 0) s"${pref}s2x$i * z[m]"
        else s"${pref}s2x$i * z[m - ${-off}]"
      }
      val thetaTerms = (1 to q).map { k =>
        val off = j - k // ≥ 1 → future innovation (literal 0.0 term)
        if (off >= 1) s"${pref}s2x${p + k} * 0.0"
        else if (off == 0) s"${pref}s2x${p + k} * e[m]"
        else s"${pref}s2x${p + k} * e[m - ${-off}]"
      }
      val expr = (s"${pref}s2x0" +: (phiTerms ++ thetaTerms)).mkString(" + ")
      ctes += s"${pref}zf$j AS MATERIALIZED (SELECT *, $expr AS zf$j FROM $prev)"
      prev = s"${pref}zf$j"
    }
    // integrate the d difference levels back: run_k_j = lasts_k +
    // run_{k+1}_j bottom-up (Scala's cur = lasts(k) + cur loop), lasts_k
    // threaded as the previous step's run column
    if (d > 0 && h > 0) {
      val lvLast = (0 until d)
        .map(k => s"lv$k[len(lv$k)] AS y0lv$k").mkString(", ")
      ctes +=
        s"""${pref}lvl AS MATERIALIZED (
           |  SELECT f.*, $lvLast
           |  FROM $prev f JOIN ${pref}zc zz ON f.user_id = zz.user_id)""".stripMargin
      prev = s"${pref}lvl"
      def lastsRef(k: Int, j: Int): String =
        if (j == 1) s"y0lv$k" else s"run${k}_${j - 1}"
      for (j <- 1 to h) {
        def runText(k: Int): String =
          if (k == d - 1) s"${lastsRef(k, j)} + zf$j"
          else s"${lastsRef(k, j)} + (${runText(k + 1)})"
        val cols = (0 until d).map(k => s"(${runText(k)}) AS run${k}_$j")
          .mkString(", ")
        ctes += s"${pref}it$j AS MATERIALIZED (SELECT *, $cols FROM $prev)"
        prev = s"${pref}it$j"
      }
    }
    def yfExpr(j: Int): String = if (d == 0) s"zf$j" else s"run0_$j"

    val coefOut = (s"${pref}s2x0" -> "c") +:
      ((1 to p).map(i => s"${pref}s2x$i" -> s"phi$i") ++
        (1 to q).map(k => s"${pref}s2x${p + k}" -> s"theta$k"))
    val coefSel = coefOut.map { case (x, nm) =>
      s"CASE WHEN bad THEN 0.0 ELSE ROUND($x, 6) + 0.0 END AS $nm"
    }
    val fcSel = (1 to h).map { j =>
      s"CASE WHEN bad THEN ROUND(y[len(y)], 6) + 0.0 ELSE ROUND(${yfExpr(j)}, 6) + 0.0 END AS fc$j"
    }
    val outCols = Seq(
      "user_id",
      "CAST(len(y) AS INT) AS n",
      s"CAST(GREATEST(m - $start2, 0) AS INT) AS n_eff") ++
      coefSel ++ Seq(
      "CASE WHEN bad THEN 0.0 ELSE ROUND(sigma2, 6) + 0.0 END AS sigma2",
      "CASE WHEN bad THEN 1000000.0 ELSE aic_raw END AS aic") ++ fcSel
    ctes +=
      s"""${pref}res AS MATERIALIZED (
         |  SELECT ${outCols.mkString(",\n    ")}
         |  FROM $prev)""".stripMargin
    (ctes.mkString(",\n"), s"${pref}res")
  }
}
