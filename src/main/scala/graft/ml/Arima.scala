package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ARIMA(p,d,q) per-series fit + AIC order search (reference
  * `app/arima_optimizer.py:12-22` — statsmodels `ARIMA(series,
  * order=(p,d,q)).fit()` inside a DEAP GA minimizing AIC, with a
  * `--max_steps` cap on the fitted rows and a 1e6 penalty for failed
  * fits).
  *
  * Re-expression, not a port: statsmodels fits by iterative MLE (Kalman
  * filter + BFGS — single-machine, non-deterministic op order). The
  * Spark-first kernel is the Hannan–Rissanen two-stage least-squares
  * estimator (Hannan & Rissanen 1982, Biometrika 69(1):81-94):
  *
  *   1. difference the series `d` times;
  *   2. fit a LONG autoregression AR(L), L = p+q+1, by OLS; its
  *      residuals e_t proxy the unobserved innovations;
  *   3. regress z_t on [1, z_{t-1..t-p}, e_{t-1..t-q}] by OLS —
  *      the coefficients are (c, φ, θ);
  *
  * then conditional-sum-of-squares σ² on the stage-3 rows and
  * AIC = n_eff·ln(σ²) + 2(p+q+1) — the CSS analog of the AIC the
  * reference minimizes. Every step is finite linear algebra with a
  * fixed IEEE op order, so the whole fit is MIRRORABLE: X'X/X'y
  * accumulate as exact 6-dp decimal sums ([[SeasonalRegression.micro6]],
  * order-independent), the solve is [[SeasonalRegression.solveNoPivot]]
  * (X'X is SPSD), and `graft.oracle.ArimaOracle` replays the identical
  * computation in DuckDB SQL bit-for-bit (the q49 pattern).
  *
  * Physical shape (100 TB): ONE shuffle — a bounded per-series
  * `collect_list` of the first `maxSteps` points (the reference's
  * `--max_steps` fit-input contract; `WindowGroupLimit` prunes the tail
  * map-side) — then the kernel runs once per series row. Millions of
  * series parallelize across executors; nothing is ever proportional to
  * total corpus rows after the capped collect.
  */
object Arima {

  import SeasonalRegression.{micro6, round6, solveNoPivot}

  /** One fitted series: coefficient vector beta2 = [c, φ₁..φ_p, θ₁..θ_q]
    * (raw, un-rounded), CSS σ², AIC, and `h` un-differenced forecasts.
    * `fallback = true` marks the degenerate path (too-short series or a
    * non-finite solve): AIC pinned to the reference's 1e6 penalty and a
    * naive last-value forecast. */
  final case class Fit(nEff: Int, beta: Array[Double], sigma2: Double,
      aic: Double, forecast: Array[Double], fallback: Boolean)

  /** d-fold first difference; length shrinks by d. Series shorter than
    * d collapse to the empty array (never a negative tabulate), matching
    * the oracle's empty `range()` — the caller then takes the penalty
    * fallback. */
  private[ml] def difference(y: Array[Double], d: Int): Array[Double] = {
    var z = y
    var k = 0
    while (k < d && z.nonEmpty) {
      z = Array.tabulate(z.length - 1)(i => z(i + 1) - z(i))
      k += 1
    }
    if (k < d) Array.empty else z
  }

  /** OLS over rows [t0, m) under the mirrorable discipline: X'X and X'y
    * accumulate as exact 6-dp decimal sums of the raw IEEE products
    * (order-independent — partition arrival order cannot perturb a
    * bit), then a no-pivot elimination with a fixed op sequence. */
  private def olsMicro6(t0: Int, m: Int, dim: Int,
      feat: Int => Array[Double], target: Int => Double): Array[Double] = {
    val ata = Array.fill(dim, dim)(0L)
    val atb = Array.fill(dim)(0L)
    var t = t0
    while (t < m) {
      val f = feat(t)
      val y = target(t)
      var a = 0
      while (a < dim) {
        atb(a) = Math.addExact(atb(a), micro6(f(a) * y))
        var b = 0
        while (b < dim) {
          ata(a)(b) = Math.addExact(ata(a)(b), micro6(f(a) * f(b)))
          b += 1
        }
        a += 1
      }
      t += 1
    }
    solveNoPivot(
      Array.tabulate(dim, dim)((a, b) =>
        java.math.BigDecimal.valueOf(ata(a)(b), 6).doubleValue),
      Array.tabulate(dim)(a =>
        java.math.BigDecimal.valueOf(atb(a), 6).doubleValue))
  }

  /** Reference failed-fit penalty (`arima_optimizer.py:21`: `aic = 1e6`). */
  val PenaltyAic = 1e6

  private def fallbackFit(y: Array[Double], p: Int, q: Int, h: Int,
      nEff: Int): Fit = {
    val last = if (y.isEmpty) 0.0 else y(y.length - 1)
    Fit(math.max(nEff, 0), new Array[Double](1 + p + q), 0.0, PenaltyAic,
      Array.fill(h)(last), fallback = true)
  }

  /** Hannan–Rissanen ARIMA(p,d,q) on one bounded series; see object doc.
    * Forecasts recurse with future innovations = 0 and the stage-2
    * proxy residuals as past innovations, then integrate the d
    * difference levels back (left-assoc, the op order
    * `graft.oracle.ArimaOracle` unrolls). */
  private[ml] def fitOne(y: Array[Double], p: Int, d: Int, q: Int,
      h: Int): Fit = {
    require(p >= 0 && d >= 0 && q >= 0, s"negative ARIMA order ($p,$d,$q)")
    if (y.length <= d) return fallbackFit(y, p, q, h, nEff = 0)
    val z = difference(y, d)
    val m = z.length
    val L = p + q + 1
    val dim2 = 1 + p + q
    val start2 = L + q // stage-2 needs e-lags back to index L
    val nEff = m - start2
    if (nEff < dim2 + 1) return fallbackFit(y, p, q, h, nEff)

    // stage 1 (only when MA terms exist): long-AR residuals proxy the
    // innovations; rounded to 6 dp so both engines feed stage 2 the
    // same bits. e_t = 0 below index L (never read by stage 2; the
    // forecast recursion's "unknown innovation = 0" convention).
    val e = new Array[Double](m)
    if (q > 0) {
      val dim1 = 1 + L
      val f1 = new Array[Double](dim1)
      def feat1(t: Int): Array[Double] = {
        f1(0) = 1.0
        var i = 1
        while (i <= L) { f1(i) = z(t - i); i += 1 }
        f1
      }
      val beta1 = olsMicro6(L, m, dim1, feat1, z)
      if (beta1.exists(b => b.isNaN || b.isInfinite))
        return fallbackFit(y, p, q, h, nEff)
      var t = L
      while (t < m) {
        var s = beta1(0) * 1.0
        var i = 1
        while (i <= L) { s += beta1(i) * z(t - i); i += 1 }
        e(t) = round6(z(t) - s)
        t += 1
      }
    }

    val f2 = new Array[Double](dim2)
    def feat2(t: Int): Array[Double] = {
      f2(0) = 1.0
      var i = 1
      while (i <= p) { f2(i) = z(t - i); i += 1 }
      var k = 1
      while (k <= q) { f2(p + k) = e(t - k); k += 1 }
      f2
    }
    val beta2 = olsMicro6(start2, m, dim2, feat2, z)
    if (beta2.exists(b => b.isNaN || b.isInfinite))
      return fallbackFit(y, p, q, h, nEff)

    // conditional sum of squares on the stage-2 rows (same dsum quantum)
    var rss = 0L
    var t = start2
    while (t < m) {
      val f = feat2(t)
      var s = beta2(0) * f(0)
      var i = 1
      while (i < dim2) { s += beta2(i) * f(i); i += 1 }
      val r = z(t) - s
      rss = Math.addExact(rss, micro6(r * r))
      t += 1
    }
    val sigma2 = java.math.BigDecimal.valueOf(rss, 6).doubleValue / nEff
    // clamp: a perfect fit gives σ² = 0 and ln blows up; GREATEST in SQL
    val lnS = round6(math.log(math.max(sigma2, 1e-12)))
    val aic = round6(nEff * lnS + 2.0 * dim2)

    // forecast recursion in difference space (future e = 0)
    val zf = new Array[Double](h)
    var j = 1
    while (j <= h) {
      var s = beta2(0)
      var i = 1
      while (i <= p) {
        val idx = m + j - 1 - i
        s += beta2(i) * (if (idx >= m) zf(idx - m) else z(idx))
        i += 1
      }
      var k = 1
      while (k <= q) {
        val idx = m + j - 1 - k
        s += beta2(p + k) * (if (idx >= m) 0.0 else e(idx))
        k += 1
      }
      zf(j - 1) = s
      j += 1
    }
    // integrate d levels back: lasts(k) = final value of the k-fold
    // difference; each step folds bottom-up, left-assoc
    val lasts = new Array[Double](d)
    var lev = y
    var k = 0
    while (k < d) {
      lasts(k) = lev(lev.length - 1)
      lev = difference(lev, 1)
      k += 1
    }
    val yf = new Array[Double](h)
    j = 0
    while (j < h) {
      var cur = zf(j)
      k = d - 1
      while (k >= 0) {
        cur = lasts(k) + cur
        lasts(k) = cur
        k -= 1
      }
      yf(j) = cur
      j += 1
    }
    Fit(nEff, beta2, sigma2, aic, yf, fallback = false)
  }

  /** First `maxSteps` values of each series as one bounded array column
    * `__xs` (the reference's `--max_steps` fit cap,
    * `arima_optimizer.py:58-60`): one capped partial-agg shuffle, the
    * q96 collect pattern. */
  private def seriesArrays(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], valueCol: String, maxSteps: Int): DataFrame = {
    require(maxSteps >= 4, s"maxSteps must be >= 4, got $maxSteps")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxSteps)
      .groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col("__rn"), col(valueCol).cast("double").as("__v"))))
        .as("__sv"))
      .withColumn("__xs", transform(col("__sv"), x => x.getField("__v")))
      .drop("__sv")
  }

  /** Fit ARIMA(p,d,q) per series and forecast `horizon` steps ahead.
    *
    * Returns one row per series: `keyCols…, n (points fitted), n_eff
    * (stage-2 rows), c, phi1..phip, theta1..thetaq, sigma2, aic,
    * fc1..fch` — every double rounded to 6 dp (the repo's oracle
    * determinism contract). Hash-exact against
    * `graft.oracle.ArimaOracle.fitSql` (q98).
    */
  def fitForecast(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, p: Int, d: Int, q: Int, horizon: Int,
      maxSteps: Int): DataFrame = {
    val fitUdf = udf { xs: Seq[Double] =>
      val f = fitOne(xs.toArray, p, d, q, horizon)
      (xs.length, f.nEff, f.beta.map(round6), round6(f.sigma2),
        round6(f.aic), f.forecast.map(round6))
    }
    val withFit = seriesArrays(df, keyCols, orderCols, valueCol, maxSteps)
      .withColumn("__f", fitUdf(col("__xs")))
    val coefCols =
      col("__f._3").getItem(0).as("c") +:
        ((1 to p).map(i => col("__f._3").getItem(i).as(s"phi$i")) ++
          (1 to q).map(k => col("__f._3").getItem(p + k).as(s"theta$k")))
    val fcCols = (1 to horizon).map(j => col("__f._6").getItem(j - 1).as(s"fc$j"))
    withFit.select(keyCols.map(col) ++
      Seq(col("__f._1").as("n"), col("__f._2").as("n_eff")) ++
      coefCols ++ Seq(col("__f._4").as("sigma2"), col("__f._5").as("aic")) ++
      fcCols: _*)
  }

  /** AIC order search over an explicit candidate lattice — the honest
    * re-expression of the reference's GA (`arima_optimizer.py:64-120`):
    * its search space is the ≤ (p_max+1)(d_max+1)(q_max+1) integer
    * lattice, and at those cardinalities one exhaustive sweep inside the
    * SAME single per-series pass strictly dominates a generational loop
    * that refits candidates it has already seen (the GA face for large
    * lattices is [[orderSearchGa]]). All candidates are evaluated
    * series-locally on the one collected array — no extra scan or
    * shuffle per candidate.
    *
    * Returns `keyCols…, best_p, best_d, best_q, aic` with the
    * deterministic tie-break (aic, p+q, d, p) mirrored by
    * `graft.oracle.ArimaOracle.orderSearchSql` (q99).
    */
  def orderSearch(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, candidates: Seq[(Int, Int, Int)],
      maxSteps: Int): DataFrame = {
    require(candidates.nonEmpty, "empty ARIMA candidate lattice")
    val cands = candidates.toArray
    val bestUdf = udf { xs: Seq[Double] =>
      val y = xs.toArray
      val scored = cands.map { case (p, d, q) =>
        (p, d, q, round6(fitOne(y, p, d, q, 0).aic))
      }
      scored.minBy { case (p, d, q, aic) => (aic, p + q, d, p) }
    }
    seriesArrays(df, keyCols, orderCols, valueCol, maxSteps)
      .withColumn("__b", bestUdf(col("__xs")))
      .select(keyCols.map(col) ++ Seq(
        col("__b._1").as("best_p"), col("__b._2").as("best_d"),
        col("__b._3").as("best_q"), col("__b._4").as("aic")): _*)
  }

  /** Autocorrelation function + Ljung–Box portmanteau statistic per
    * series — the model-diagnostic companion of the ARIMA fit (what
    * statsmodels computes behind the reference's `ARIMA(...).fit()`
    * summary; Ljung & Box 1978): with sample mean x̄,
    * ρ_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² for k = 1..maxLag and
    * Q = n(n+2)·Σ ρ_k²/(n−k) — large Q rejects "residuals are white
    * noise". Mirrorable under the repo discipline: mean and both sums
    * accumulate as exact 6-dp decimal quanta ([[SeasonalRegression.micro6]],
    * order-independent), ρ rounds to 6 dp, Q folds the ROUNDED ρ
    * left-assoc — `graft.oracle.ArimaOracle.acfSql` replays it
    * bit-for-bit (q101). Same single capped-collect shape as
    * [[fitForecast]].
    *
    * Returns `keyCols…, n, rho1..rho{maxLag}, pacf1..pacf{maxLag},
    * q_stat` — the PACF via Durbin–Levinson on the rounded ρ (the
    * order-selection pair: AR(p) cuts off in pacf after lag p, MA(q)
    * in acf after lag q). Constant series: all zeros — the c₀ = 0
    * guard, mirrored in SQL. */
  def acfLjungBox(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, maxLag: Int, maxSteps: Int): DataFrame = {
    require(maxLag >= 1, s"acfLjungBox: maxLag must be >= 1, got $maxLag")
    val acfUdf = udf { xs: Seq[Double] =>
      val x = xs.toArray
      val n = x.length
      var sm = 0L
      var i = 0
      while (i < n) { sm = Math.addExact(sm, micro6(x(i))); i += 1 }
      val mean = java.math.BigDecimal.valueOf(sm, 6).doubleValue / n
      var c0m = 0L
      i = 0
      while (i < n) {
        val d = x(i) - mean
        c0m = Math.addExact(c0m, micro6(d * d))
        i += 1
      }
      val c0 = java.math.BigDecimal.valueOf(c0m, 6).doubleValue
      val rho = new Array[Double](maxLag)
      var k = 1
      while (k <= maxLag) {
        if (c0 > 0.0 && n > k) {
          var ckm = 0L
          var t = 0
          while (t < n - k) {
            ckm = Math.addExact(ckm,
              micro6((x(t) - mean) * (x(t + k) - mean)))
            t += 1
          }
          rho(k - 1) = round6(
            java.math.BigDecimal.valueOf(ckm, 6).doubleValue / c0)
        }
        k += 1
      }
      var s = 0.0
      k = 1
      while (k <= maxLag) {
        if (n > k) s += rho(k - 1) * rho(k - 1) / (n - k)
        k += 1
      }
      val q = round6(n.toDouble * (n.toDouble + 2.0) * s)
      // PACF by Durbin–Levinson on the ROUNDED rho (the order-selection
      // companion: an AR(p) cuts off after lag p in pacf, an MA(q)
      // after lag q in acf). phi matrix kept full-precision; only the
      // emitted pacf_k = phi_{k,k} rounds — all ops are deterministic
      // scalar arithmetic the oracle unrolls as a CTE chain.
      val pacf = new Array[Double](maxLag)
      val phi = new Array[Double](maxLag + 1) // phi(j) = phi_{k,j}
      if (maxLag >= 1) {
        phi(1) = rho(0)
        pacf(0) = round6(phi(1))
        k = 2
        while (k <= maxLag) {
          var num = rho(k - 1)
          var den = 1.0
          var j = 1
          while (j < k) {
            num -= phi(j) * rho(k - j - 1)
            den -= phi(j) * rho(j - 1)
            j += 1
          }
          val pkk = if (math.abs(den) > 1e-12) num / den else 0.0
          val prev = phi.clone()
          j = 1
          while (j < k) { phi(j) = prev(j) - pkk * prev(k - j); j += 1 }
          phi(k) = pkk
          pacf(k - 1) = round6(pkk)
          k += 1
        }
      }
      (n, rho, q, pacf)
    }
    val withAcf = seriesArrays(df, keyCols, orderCols, valueCol, maxSteps)
      .withColumn("__a", acfUdf(col("__xs")))
    withAcf.select(keyCols.map(col) ++
      (col("__a._1").as("n") +:
        (1 to maxLag).map(k => col("__a._2").getItem(k - 1).as(s"rho$k"))) ++
      (1 to maxLag).map(k => col("__a._4").getItem(k - 1).as(s"pacf$k")) :+
      col("__a._3").as("q_stat"): _*)
  }

  /** GA order search on one series — the reference CLI's exact shape
    * (single series, DEAP generational loop, AIC fitness, 1e6 failure
    * penalty), driven by the repo's [[GeneticSearch]]. Genomes decode
    * [0,1]³ → the (p,d,q) lattice. Deterministic under the config seed. */
  def orderSearchGa(y: Array[Double], pMax: Int, dMax: Int, qMax: Int,
      cfg: GeneticSearch.Config = GeneticSearch.Config()): (Int, Int, Int, Double) = {
    def decode(g: Vector[Double]): (Int, Int, Int) = {
      def lvl(x: Double, mx: Int): Int =
        math.min(mx, math.floor(x * (mx + 1)).toInt)
      (lvl(g(0), pMax), lvl(g(1), dMax), lvl(g(2), qMax))
    }
    val cache = scala.collection.mutable.Map.empty[(Int, Int, Int), Double]
    val res = GeneticSearch.optimize(3, g => {
      val o = decode(g)
      cache.getOrElseUpdate(o, fitOne(y, o._1, o._2, o._3, 0).aic)
    }, cfg)
    val (p, d, q) = decode(res.best)
    (p, d, q, res.bestFitness)
  }
}
