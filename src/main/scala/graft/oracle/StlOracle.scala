package graft.oracle

import graft.decomp.StlMirrorable

/** DuckDB oracle for the mirrorable STL (q44): replays
  * [[graft.decomp.StlMirrorable.decomposeM]]'s exact arithmetic as a
  * generated CTE chain.
  *
  * Cross-engine exactness contract (see StlMirrorable's scaladoc):
  *   - the tricube weight table is inlined as 12 dp DECIMAL literals —
  *     the SAME strings the Scala kernel uses, so weights are constants,
  *     not computations;
  *   - weighted sums multiply DECIMAL(13,12) weights by DECIMAL(18,6)
  *     stage values and narrow-cast integer x-terms, keeping every
  *     product exact and inside width 38; SUM over exact decimals is
  *     order-free, so DuckDB's aggregate order doesn't matter;
  *   - `ROUND(sum, 7)` rescales to scale 7 (half-away = Java HALF_UP);
  *     the scaled integer is then < 2^53, where DuckDB's decimal→double
  *     cast is exact-int / exact-power-of-10 = correctly rounded,
  *     matching BigDecimal.doubleValue bit-for-bit;
  *   - the normal-equation solve is straight-line double arithmetic in
  *     the kernel's op order; `ROUND(out, 6)` + DECIMAL(18,6) cast
  *     re-enters decimal space at each stage boundary (the proven
  *     q10/q16 contract), so nothing compounds.
  *
  * Row grain: one row per event; series = user_id ordered by
  * (ts, event_id); series shorter than 2×period short-circuit to
  * trend = round(value, 6), seasonal = resid = 0.
  */
object StlOracle {

  /** Inline `(dmax, k, w)` VALUES rows from [[StlMirrorable.weightTable]]
    * — emitted from the same BigDecimal constants the kernel sums.
    */
  private def weightValues(maxD: Int): String =
    (for (dmax <- 1 to maxD; k <- 0 to dmax)
      yield s"($dmax,$k,'${StlMirrorable.weightTable((dmax, k)).toPlainString}')")
      .grouped(6).map(_.mkString(",")).mkString(",\n      ")

  /** Mirrorable LOESS as CTEs: `out` has (part…, idx, len, val). `src`
    * must expose the same shape. Span s, window bounds and dmax are
    * integer arithmetic; sums decimal; solve double.
    */
  private def loessBlock(out: String, src: String, span: Int,
      part: Seq[String], idx: String, len: String): String = {
    val partList = part.mkString(", ")
    val pj = part.map(c => s"p.$c").mkString(", ")
    val pjoin = part.map(c => s"b.$c = p.$c").mkString(" AND ")
    s"""${out}_b AS (
       |  SELECT $partList, $idx, $len, s,
       |    GREATEST(0, LEAST($len - 1, GREATEST(0, $idx - s // 2) + s - 1) - s + 1) AS lo,
       |    LEAST($len - 1, GREATEST(0, $idx - s // 2) + s - 1) AS hi
       |  FROM (SELECT *, GREATEST(2, LEAST($span, $len)) AS s FROM $src)),
       |${out}_g AS MATERIALIZED (
       |  SELECT $pj, p.$idx, p.$len,
       |    ROUND(SUM(w.w), 7) AS d_w,
       |    ROUND(SUM(w.w * b.val), 7) AS d_wy,
       |    CAST(ROUND(SUM(w.w), 7) AS DOUBLE) AS s_w,
       |    CAST(ROUND(SUM(w.w * CAST(b.$idx - p.$idx AS DECIMAL(4,0))), 7) AS DOUBLE) AS s_wx,
       |    CAST(ROUND(SUM(w.w * b.val), 7) AS DOUBLE) AS s_wy,
       |    CAST(ROUND(SUM(w.w * CAST((b.$idx - p.$idx) * (b.$idx - p.$idx) AS DECIMAL(7,0))), 7) AS DOUBLE) AS s_wxx,
       |    CAST(ROUND(SUM(w.w * CAST(b.$idx - p.$idx AS DECIMAL(4,0)) * b.val), 7) AS DOUBLE) AS s_wxy
       |  FROM ${out}_b p
       |  JOIN $src b ON $pjoin AND b.$idx BETWEEN p.lo AND p.hi
       |  JOIN wtab w ON w.dmax = GREATEST(GREATEST(p.$idx - p.lo, p.hi - p.$idx), 1)
       |    AND w.k = ABS(b.$idx - p.$idx)
       |  GROUP BY $pj, p.$idx, p.$len),
       |$out AS MATERIALIZED (
       |  SELECT $partList, $idx, $len,
       |    CAST(CASE WHEN ABS(s_w * s_wxx - s_wx * s_wx) < 1e-12
       |      THEN ${decDiv7("d_wy", "d_w")}
       |      ELSE CAST(ROUND((s_wy - ((s_w * s_wxy - s_wx * s_wy) / (s_w * s_wxx - s_wx * s_wx)) * s_wx) / s_w,
       |        6) AS DECIMAL(18,6)) END AS DECIMAL(18,6)) AS val
       |  FROM ${out}_g)""".stripMargin
  }

  /** Kernel `BigDecimal.divide(…, 6, HALF_UP)` replayed as exact
    * integer arithmetic: num/den at 6 dp half-away =
    * sign · ((2·|num_scaled|·10^(6-numScale…)| + den) // (2·den)).
    * `num` is a decimal column of scale `numScale`, `den` a positive
    * integer (BIGINT/HUGEINT) expression. Result DECIMAL(18,6). Exact
    * — no double-space ROUND whose midpoint ties diverge across
    * engines.
    */
  private def decDiv(num: String, numScale: Int, den: String): String = {
    // numerator scaled to 6 dp target: num·10^numScale is the exact
    // int; multiply by 10^6 for the output scale, divide by den·10^numScale.
    // The pre-cast to DECIMAL(20,·) keeps the ·10^numScale product
    // inside width 38 (SUM yields DECIMAL(38,·), which cannot widen).
    val numInt =
      s"CAST(CAST($num AS DECIMAL(20,$numScale)) * ${"1" + "0" * numScale} AS HUGEINT)"
    val denInt = s"CAST($den AS HUGEINT)"
    s"""(CAST(CASE WHEN $num >= 0
       |      THEN (2 * $numInt * 1000000 + $denInt * ${"1" + "0" * numScale}) // (2 * $denInt * ${"1" + "0" * numScale})
       |      ELSE -((2 * -$numInt * 1000000 + $denInt * ${"1" + "0" * numScale}) // (2 * $denInt * ${"1" + "0" * numScale})) END
       |    AS DECIMAL(18,0)) * CAST('0.000001' AS DECIMAL(7,6)))""".stripMargin
  }

  /** 7 dp decimal / 7 dp decimal at 6 dp HALF_UP (the degenerate LOESS
    * branch): both scaled integers share the 10^7 factor, so it cancels.
    */
  private def decDiv7(num: String, den: String): String = {
    val a = s"CAST(CAST($num AS DECIMAL(20,7)) * 10000000 AS HUGEINT)"
    val b = s"CAST(CAST($den AS DECIMAL(20,7)) * 10000000 AS HUGEINT)"
    s"""CAST(CASE WHEN $num >= 0
       |      THEN (2 * $a * 1000000 + $b) // (2 * $b)
       |      ELSE -((2 * -$a * 1000000 + $b) // (2 * $b)) END
       |    AS DECIMAL(18,0)) * CAST('0.000001' AS DECIMAL(7,6))""".stripMargin
  }

  /** Mirrorable centered MA over a user-series rel (user_id, rn, n, val):
    * exact decimal sum, decimal-space division by the clamped count
    * (counts like 2 or 16 land the quotient exactly on 6 dp midpoints,
    * where double-space ROUND ties diverge across engines).
    */
  private def maBlock(out: String, src: String, p: Int): String = {
    val loOff = p / 2
    val hiOff = (p - 1) / 2
    s"""${out}_g AS (
       |  SELECT a.user_id, a.rn, a.n,
       |    SUM(b.val) AS s, COUNT(*) AS c
       |  FROM $src a JOIN $src b ON b.user_id = a.user_id
       |    AND b.rn BETWEEN GREATEST(0, a.rn - $loOff) AND LEAST(a.n - 1, a.rn + $hiOff)
       |  GROUP BY a.user_id, a.rn, a.n),
       |$out AS MATERIALIZED (
       |  SELECT user_id, rn, n, CAST(${decDiv("s", 6, "c")} AS DECIMAL(18,6)) AS val
       |  FROM ${out}_g)""".stripMargin
  }

  /** Cycle-subseries LOESS: regroup by (user, phase) with subseries
    * index k = rn // period and length m, smooth, map back to rn.
    */
  private def cycleBlock(out: String, src: String, period: Int, span: Int): String = {
    val c = s"${out}_c"
    s"""$c AS (
       |  SELECT user_id, n, rn % $period AS ph, rn // $period AS k,
       |    (n - 1 - (rn % $period)) // $period + 1 AS m, val
       |  FROM $src),
       |${loessBlock(s"${out}_l", c, span, Seq("user_id", "n", "ph"), "k", "m")},
       |$out AS MATERIALIZED (
       |  SELECT user_id, ph + $period * k AS rn, n, val FROM ${out}_l)""".stripMargin
  }

  /** a.val - b.val joined on (user_id, rn). */
  private def diffBlock(out: String, srcA: String, srcB: String): String =
    s"""$out AS MATERIALIZED (
       |  SELECT a.user_id, a.rn, a.n, a.val - b.val AS val
       |  FROM $srcA a JOIN $srcB b ON b.user_id = a.user_id AND b.rn = a.rn)""".stripMargin

  /** Full q44 oracle. */
  def q44Sql(period: Int = 24, seasonalSmoother: Int = 7, nInner: Int = 2): String = {
    val ts = StlMirrorable.trendSmoother(period, seasonalSmoother)
    val minLong = 2 * period
    val iters = (1 to nInner).map { it =>
      // detrend: iteration 1 subtracts the zero trend — skip the join
      val detr = if (it == 1) "longs" else s"detr$it"
      val detrCte = if (it == 1) Nil
        else Seq(diffBlock(s"detr$it", "longs", s"tr${it - 1}"))
      (detrCte ++ Seq(
        cycleBlock(s"sub$it", detr, period, seasonalSmoother),
        maBlock(s"ma${it}_1", s"sub$it", period),
        maBlock(s"ma${it}_2", s"ma${it}_1", period),
        maBlock(s"ma${it}_3", s"ma${it}_2", 3),
        loessBlock(s"low$it", s"ma${it}_3", ts, Seq("user_id"), "rn", "n"),
        diffBlock(s"seas$it", s"sub$it", s"low$it"),
        diffBlock(s"des$it", "longs", s"seas$it"),
        loessBlock(s"tr$it", s"des$it", ts, Seq("user_id"), "rn", "n")
      )).mkString(",\n")
    }.mkString(",\n")
    s"""WITH base0 AS (
       |  SELECT event_id, user_id, value,
       |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn,
       |    COUNT(*) OVER (PARTITION BY user_id) AS n
       |  FROM events),
       |base AS MATERIALIZED (
       |  SELECT event_id, user_id, rn, n,
       |    CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS val
       |  FROM base0),
       |longs AS MATERIALIZED (
       |  SELECT user_id, rn, n, val FROM base WHERE n >= $minLong),
       |wtab AS (
       |  SELECT dmax, k, CAST(w AS DECIMAL(13,12)) AS w
       |  FROM (VALUES
       |      ${weightValues(ts)}) AS t(dmax, k, w)),
       |$iters
       |SELECT b.event_id, b.user_id,
       |  CAST(t.val AS DOUBLE) AS trend,
       |  CAST(s.val AS DOUBLE) AS seasonal,
       |  CAST(b.val - t.val - s.val AS DOUBLE) AS resid
       |FROM base b
       |JOIN tr$nInner t ON t.user_id = b.user_id AND t.rn = b.rn
       |JOIN seas$nInner s ON s.user_id = b.user_id AND s.rn = b.rn
       |UNION ALL
       |SELECT event_id, user_id, CAST(val AS DOUBLE) AS trend,
       |  0.0 AS seasonal, 0.0 AS resid
       |FROM base WHERE n < $minLong""".stripMargin
  }
}
