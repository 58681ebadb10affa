package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ArimaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Seeded ARMA(p,q) sampler (innovations ~ U(−1,1) scaled). */
  private def arma(n: Int, c: Double, phi: Seq[Double], theta: Seq[Double],
      seed: Long, sd: Double = 0.5): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    val e = Array.fill(n + 50)((rnd.nextDouble() * 2 - 1) * sd)
    val z = new Array[Double](n + 50)
    for (t <- z.indices) {
      var s = c + e(t)
      for ((p, i) <- phi.zipWithIndex if t - i - 1 >= 0) s += p * z(t - i - 1)
      for ((q, j) <- theta.zipWithIndex if t - j - 1 >= 0) s += q * e(t - j - 1)
      z(t) = s
    }
    z.drop(50) // burn-in
  }

  test("difference: d-fold first difference") {
    val y = Array(1.0, 3.0, 6.0, 10.0)
    assert(Arima.difference(y, 1).toSeq == Seq(2.0, 3.0, 4.0))
    assert(Arima.difference(y, 2).toSeq == Seq(1.0, 1.0))
    assert(Arima.difference(y, 0).toSeq == y.toSeq)
  }

  test("AR(2) recovery: Hannan-Rissanen OLS finds the generating phis") {
    val z = arma(4000, 1.0, Seq(0.6, -0.3), Nil, seed = 7)
    val f = Arima.fitOne(z, p = 2, d = 0, q = 0, h = 0)
    assert(!f.fallback)
    assert(math.abs(f.beta(1) - 0.6) < 0.05, s"phi1=${f.beta(1)}")
    assert(math.abs(f.beta(2) + 0.3) < 0.05, s"phi2=${f.beta(2)}")
  }

  test("ARMA(1,1) recovery: the MA coefficient is identified via stage-1 residuals") {
    val z = arma(8000, 0.0, Seq(0.5), Seq(0.4), seed = 11)
    val f = Arima.fitOne(z, p = 1, d = 0, q = 1, h = 0)
    assert(!f.fallback)
    assert(math.abs(f.beta(1) - 0.5) < 0.1, s"phi1=${f.beta(1)}")
    assert(math.abs(f.beta(2) - 0.4) < 0.1, s"theta1=${f.beta(2)}")
  }

  test("d=1 integrates forecasts back to the level of the series") {
    // pure trend: y_t = 5t → z constant 5 → every forecast continues the line
    val y = Array.tabulate(60)(t => 5.0 * t)
    val f = Arima.fitOne(y, p = 1, d = 1, q = 0, h = 3)
    assert(!f.fallback)
    for (j <- 1 to 3)
      assert(math.abs(f.forecast(j - 1) - 5.0 * (59 + j)) < 1e-3,
        s"fc$j=${f.forecast(j - 1)}")
  }

  test("AIC prefers the generating order on a synthetic ARMA series") {
    val z = arma(6000, 0.0, Seq(0.7), Nil, seed = 3, sd = 1.0)
    val ar1 = Arima.fitOne(z, 1, 0, 0, 0).aic
    val wn = Arima.fitOne(z, 0, 0, 1, 0).aic // misspecified: MA(1) only
    assert(ar1 < wn, s"AIC(AR1)=$ar1 should beat AIC(MA1)=$wn")
  }

  test("degenerate short series: reference 1e6 penalty + naive forecast") {
    val f = Arima.fitOne(Array(1.0, 2.0, 3.0), p = 2, d = 1, q = 1, h = 2)
    assert(f.fallback)
    assert(f.aic == Arima.PenaltyAic)
    assert(f.forecast.toSeq == Seq(3.0, 3.0))
    assert(f.beta.forall(_ == 0.0))
  }

  test("series shorter than d takes the penalty path, never a throw") {
    // y.length <= d used to reach difference() and blow up in
    // Array.tabulate(z.length - 1); now it must hit the documented
    // 1e6-penalty fallback like the DuckDB oracle's empty range() does
    val f1 = Arima.fitOne(Array(5.0), p = 1, d = 2, q = 1, h = 3)
    assert(f1.fallback && f1.aic == Arima.PenaltyAic)
    assert(f1.forecast.toSeq == Seq(5.0, 5.0, 5.0))
    val f0 = Arima.fitOne(Array.empty[Double], p = 0, d = 1, q = 0, h = 2)
    assert(f0.fallback && f0.forecast.toSeq == Seq(0.0, 0.0))
    val f2 = Arima.fitOne(Array(1.0, 4.0), p = 1, d = 5, q = 0, h = 1)
    assert(f2.fallback && f2.forecast.toSeq == Seq(4.0))
  }

  test("fitForecast: per-series rows with coefficient and forecast columns") {
    val df = Seq("a", "b").flatMap { k =>
      val off = if (k == "a") 0.0 else 100.0
      (0 until 50).map(t => (k, t.toLong, off + 2.0 * t))
    }.toDF("k", "t", "y")
    val out = Arima.fitForecast(df, Seq("k"), Seq("t"), "y",
      p = 1, d = 1, q = 0, horizon = 2, maxSteps = 64)
    assert(out.columns.toSeq ==
      Seq("k", "n", "n_eff", "c", "phi1", "sigma2", "aic", "fc1", "fc2"))
    val rows = out.orderBy("k").collect()
    assert(rows.length == 2)
    // linear series: next values continue the slope-2 line per series
    val a = rows(0)
    assert(math.abs(a.getAs[Double]("fc1") - 100.0) < 1e-3)
    val b = rows(1)
    assert(math.abs(b.getAs[Double]("fc1") - 200.0) < 1e-3)
  }

  test("fitForecast caps the fit input at maxSteps (the --max_steps contract)") {
    val df = (0 until 200).map(t => ("s", t.toLong, t.toDouble)).toDF("k", "t", "y")
    val out = Arima.fitForecast(df, Seq("k"), Seq("t"), "y", 1, 1, 0, 1, maxSteps = 32)
    assert(out.select("n").as[Int].head() == 32)
  }

  test("orderSearch picks the true order on clean synthetic series") {
    // trend + strong AR(1) in differences → (1,1,0) should win its lattice
    val rnd = new scala.util.Random(5)
    val z = arma(300, 0.1, Seq(0.8), Nil, seed = 19, sd = 0.3)
    val y = z.scanLeft(0.0)(_ + _).tail // integrate once → d=1 is needed
    val df = y.toSeq.zipWithIndex.map { case (v, t) => ("s", t.toLong, v) }.toDF("k", "t", "y")
    val out = Arima.orderSearch(df, Seq("k"), Seq("t"), "y",
      candidates = Seq((1, 0, 0), (1, 1, 0), (0, 1, 1)), maxSteps = 300)
    val r = out.head()
    assert((r.getAs[Int]("best_p"), r.getAs[Int]("best_d"), r.getAs[Int]("best_q")) == ((1, 1, 0)),
      s"got order (${r.getAs[Int]("best_p")},${r.getAs[Int]("best_d")},${r.getAs[Int]("best_q")})")
  }

  test("orderSearchGa finds the lattice optimum the exhaustive sweep finds") {
    val z = arma(1000, 0.0, Seq(0.7), Nil, seed = 23, sd = 0.5)
    val lattice = for (p <- 0 to 2; d <- 0 to 1; q <- 0 to 2) yield (p, d, q)
    val gridBest = lattice.map { case (p, d, q) =>
      ((p, d, q), Arima.fitOne(z, p, d, q, 0).aic)
    }.minBy { case ((p, d, q), aic) => (aic, p + q, d, p) }
    val (gp, gd, gq, gaAic) = Arima.orderSearchGa(z, 2, 1, 2,
      GeneticSearch.Config(populationSize = 24, generations = 8, seed = 1L))
    assert(gaAic <= gridBest._2 + 1e-9,
      s"GA aic=$gaAic vs grid ${gridBest._2} at ${gridBest._1}, GA order=($gp,$gd,$gq)")
    // deterministic under the seed
    val again = Arima.orderSearchGa(z, 2, 1, 2,
      GeneticSearch.Config(populationSize = 24, generations = 8, seed = 1L))
    assert(again == ((gp, gd, gq, gaAic)))
  }

  test("acfLjungBox: AR(1) shows geometric rho and a large Q; noise stays small") {
    val ar = arma(2000, 0.0, Seq(0.7), Nil, seed = 61, sd = 1.0)
    val rnd = new scala.util.Random(67)
    val wn = Array.fill(2000)(rnd.nextGaussian())
    val df = (ar.toSeq.zipWithIndex.map { case (v, t) => ("ar", t.toLong, v) } ++
      wn.toSeq.zipWithIndex.map { case (v, t) => ("wn", t.toLong, v) })
      .toDF("k", "t", "y")
    val out = Arima.acfLjungBox(df, Seq("k"), Seq("t"), "y",
      maxLag = 3, maxSteps = 2000).collect()
      .map(r => r.getString(0) -> r).toMap
    val arR = out("ar"); val wnR = out("wn")
    assert(math.abs(arR.getAs[Double]("rho1") - 0.7) < 0.1,
      s"rho1=${arR.getAs[Double]("rho1")}")
    assert(arR.getAs[Double]("rho2") > arR.getAs[Double]("rho3"),
      "AR(1) acf must decay")
    assert(math.abs(wnR.getAs[Double]("rho1")) < 0.1)
    assert(arR.getAs[Double]("q_stat") > 100.0 * wnR.getAs[Double]("q_stat"),
      s"Q(ar)=${arR.getAs[Double]("q_stat")} Q(wn)=${wnR.getAs[Double]("q_stat")}")
    // the AR(1) signature: pacf spikes at lag 1 then cuts off, while
    // the acf decays geometrically — the order-selection pair
    assert(math.abs(arR.getAs[Double]("pacf1") - 0.7) < 0.1)
    assert(math.abs(arR.getAs[Double]("pacf2")) < 0.08 &&
      math.abs(arR.getAs[Double]("pacf3")) < 0.08,
      s"pacf2=${arR.getAs[Double]("pacf2")} pacf3=${arR.getAs[Double]("pacf3")}")
  }

  test("acfLjungBox: constant series hits the zero-variance guard") {
    val df = (0 until 50).map(t => ("c", t.toLong, 5.0)).toDF("k", "t", "y")
    val r = Arima.acfLjungBox(df, Seq("k"), Seq("t"), "y", 2, 64).head()
    assert(r.getAs[Double]("rho1") == 0.0 && r.getAs[Double]("rho2") == 0.0)
    assert(r.getAs[Double]("q_stat") == 0.0)
  }

  test("fit is independent of input row order (mirrorable decimal sums)") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 80).map(t => ("s", t.toLong, 50.0 + rnd.nextDouble() * 10))
    val df1 = rows.toDF("k", "t", "y")
    val df2 = rnd.shuffle(rows).toDF("k", "t", "y").repartition(7)
    val a = Arima.fitForecast(df1, Seq("k"), Seq("t"), "y", 2, 1, 1, 3, 64).head()
    val b = Arima.fitForecast(df2, Seq("k"), Seq("t"), "y", 2, 1, 1, 3, 64).head()
    assert(a == b)
  }
}
