package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** M9 Prophet-analog: per-series trend + Fourier-seasonality regression,
  * fit independently per key (reference `predictor_plugin_prophet.py:84-225`
  * fits one Prophet per horizon on a ds/y frame).
  *
  * Model: y(t) = β₀ + β₁·t + Σ_k [a_k sin(2πkt/p) + b_k cos(2πkt/p)]
  *               + Σ_j γ_j·r_j(t),
  * solved in closed form (normal equations, Gaussian elimination) per
  * series. The r_j are optional EXTRA design columns covering both of the
  * reference plugin's add-ons: holiday one-hots
  * (`add_country_holidays`, :108,179 — build with [[holidayIndicator]])
  * and last-step regressors (`use_regressors`, :131-137: the reference
  * takes `x_train[:, -1, :]`, the window's last step — in this long
  * layout each row IS its own last step, so any feature column qualifies
  * directly). Physical pattern = the engine's per-series standard:
  * repartition by key → sortWithinPartitions → one streaming pass; each
  * fit touches only its own series, so 10⁶ series fit in parallel with
  * bounded memory.
  */
object SeasonalRegression {

  /** Solve A x = b in place (small dense system, partial pivoting). */
  private[ml] def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val tb = b(col); b(col) = b(piv); b(piv) = tb
      val d = a(col)(col)
      if (math.abs(d) > 1e-12) {
        r = col + 1
        while (r < n) {
          val f = a(r)(col) / d
          var c = col
          while (c < n) { a(r)(c) -= f * a(col)(c); c += 1 }
          b(r) -= f * b(col)
          r += 1
        }
      }
      col += 1
    }
    backSub(a, b)
  }

  /** No-pivot forward elimination + back-substitution — the MIRRORABLE
    * solve. Valid here because the normal-equation matrix X'X is
    * symmetric positive (semi-)definite, for which pivoting is not
    * needed; the payoff is a FIXED multiply/divide/subtract order that
    * `graft.oracle.SeasonalOracle` re-emits term-for-term in SQL, so
    * DuckDB reproduces every coefficient bit-for-bit. Mutates a/b.
    */
  private[ml] def solveNoPivot(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    var col = 0
    while (col < n) {
      val d = a(col)(col)
      if (math.abs(d) > 1e-12) {
        var r = col + 1
        while (r < n) {
          val f = a(r)(col) / d
          var c = col
          while (c < n) { a(r)(c) -= f * a(col)(c); c += 1 }
          b(r) -= f * b(col)
          r += 1
        }
      }
      col += 1
    }
    backSub(a, b)
  }

  private def backSub(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < n) { s -= a(i)(j) * x(j); j += 1 }
      x(i) = if (math.abs(a(i)(i)) > 1e-12) s / a(i)(i) else 0.0
      i -= 1
    }
    x
  }

  private[ml] def features(t: Double, period: Double, harmonics: Int,
      extras: Array[Double] = Array.emptyDoubleArray): Array[Double] = {
    val base = 2 + 2 * harmonics
    val f = new Array[Double](base + extras.length)
    f(0) = 1.0
    f(1) = t
    var k = 1
    while (k <= harmonics) {
      val a = 2.0 * math.Pi * k * t / period
      f(2 * k) = math.sin(a)
      f(2 * k + 1) = math.cos(a)
      k += 1
    }
    System.arraycopy(extras, 0, f, base, extras.length)
    f
  }

  /** Spark's `round(x, 6)` exactly (shortest-decimal BigDecimal, HALF_UP;
    * never −0.0) — the cross-engine transcendental contract (q10/q16).
    */
  private[ml] def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  /** Quantize the EXACT binary value of `x` to 6 dp — the dsum
    * discipline's per-term quantum. `new BigDecimal(x)` (exact binary
    * expansion), NOT `BigDecimal.valueOf(x)` (shortest string repr):
    * the X'X/X'y terms are products of 6-dp decimals whose shortest
    * reprs can be EXACT halfway ties ("….xxxxxx5"), and different
    * engines' shortest-repr algorithms legitimately disagree there. On
    * the exact binary value a scale-6 halfway tie is impossible (it
    * would need 5⁶ to divide an odd mantissa), so the quantum is unique
    * and engine-independent; DuckDB reaches the same digits via
    * `printf('%.25f', x)` (see `SeasonalOracle`).
    */
  private def dec6(x: Double): java.math.BigDecimal =
    new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)

  /** [[dec6]] as a count of 1e-6 quanta (Long), with a fast path: when
    * the fractional part of `x·1e6` computed in doubles is farther than
    * 1e-3 from the 0.5 decision boundary, the double arithmetic's worst
    * error (≤ ~1.2e-4 for |x·1e6| ≤ 1e12) provably cannot flip the
    * nearest-quantum choice, so `floor`+compare is exact. Only boundary
    * terms (~0.1%) pay the exact-BigDecimal expansion — this is what
    * keeps the mirrorable fit within ~1.3× of the plain one.
    */
  private[ml] def micro6(x: Double): Long = {
    val y = x * 1e6
    val f = math.floor(y)
    val frac = y - f
    if (math.abs(y) < 1e12 && math.abs(frac - 0.5) > 1e-3)
      (if (frac > 0.5) f + 1.0 else f).toLong
    else dec6(x).unscaledValue().longValueExact()
  }

  /** Mirror-mode design row: [1, td, round6(sin(2πk·td)), round6(cos(2πk·td))]
    * for td = (t − t₀)/period. The trend is PERIOD-SCALED so every
    * product stays O(10⁰–10⁵), far below the magnitude where the 1e-6
    * decimal quantum falls inside double-conversion noise.
    */
  private[ml] def mirrorFeatures(td: Double, harmonics: Int): Array[Double] = {
    val f = new Array[Double](2 + 2 * harmonics)
    f(0) = 1.0
    f(1) = td
    var k = 1
    while (k <= harmonics) {
      val w = 2.0 * math.Pi * k
      f(2 * k) = round6(math.sin(w * td))
      f(2 * k + 1) = round6(math.cos(w * td))
      k += 1
    }
    f
  }

  /** Holiday one-hot: 1.0 when the timestamp's date is in `isoDates`
    * (e.g. "2026-12-25") — the Prophet `holidays` frame as a design
    * column; pass one per holiday group via `regressorCols`.
    */
  def holidayIndicator(ts: org.apache.spark.sql.Column,
      isoDates: Seq[String]): org.apache.spark.sql.Column =
    if (isoDates.isEmpty) lit(0.0)
    else when(to_date(ts).cast("string").isin(isoDates: _*), 1.0).otherwise(0.0)

  private def num(r: Row, i: Int): Double = r.get(i) match {
    case d: java.lang.Double => d
    case l: java.lang.Long => l.toDouble
    case i2: java.lang.Integer => i2.toDouble
    case other => other.toString.toDouble
  }

  /** Shared physical pattern: repartition by key → sortWithinPartitions →
    * stream each series through `fit`, appending (fitted, resid).
    */
  private def perSeries(df: DataFrame, keyCols: Seq[String], orderCol: String)
      (fit: Seq[Row] => Array[(Double, Double)]): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("fitted", DoubleType), StructField("resid", DoubleType)))
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val enc = RowEncoder.encoderFor(outSchema)
    df.repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols :+ orderCol).map(col): _*)
      .mapPartitions { rows =>
        new Iterator[Row] {
          private val out = scala.collection.mutable.Queue.empty[Row]
          private var pendingRow: Row = null
          private def sameKey(x: Row, y: Row): Boolean =
            keyIdx.forall(i => x.get(i) == y.get(i))
          private def emit(series: Seq[Row]): Unit = {
            val fr = fit(series)
            series.zipWithIndex.foreach { case (r, i) =>
              out.enqueue(Row.fromSeq(r.toSeq ++ Seq(fr(i)._1, fr(i)._2)))
            }
          }
          private def fill(): Unit = {
            if (out.nonEmpty) return
            if (pendingRow == null && !rows.hasNext) return
            val series = scala.collection.mutable.ArrayBuffer.empty[Row]
            if (pendingRow != null) { series += pendingRow; pendingRow = null }
            var done = false
            while (!done && rows.hasNext) {
              val r = rows.next()
              if (series.isEmpty || sameKey(series.head, r)) series += r
              else { pendingRow = r; done = true }
            }
            if (series.nonEmpty) emit(series.toSeq)
          }
          override def hasNext: Boolean = { fill(); out.nonEmpty }
          override def next(): Row = { fill(); out.dequeue() }
        }
      }(enc)
  }

  /** Fit per key over (orderCol as t, valueCol as y); appends `fitted`
    * (in-sample prediction) and `resid`. Degenerate series (fewer rows
    * than parameters) get fitted = mean.
    */
  def fitPredict(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCol: String, period: Double, harmonics: Int = 2,
      regressorCols: Seq[String] = Nil): DataFrame = {
    val tIdx = df.schema.fieldIndex(orderCol)
    val vIdx = df.schema.fieldIndex(valueCol)
    val rIdx = regressorCols.map(df.schema.fieldIndex).toArray
    val p = 2 + 2 * harmonics + rIdx.length
    perSeries(df, keyCols, orderCol) { series =>
      val n = series.length
      val t0 = num(series.head, tIdx)
      val xs = series.map(r => num(r, tIdx) - t0).toArray
      val ys = series.map(r => num(r, vIdx)).toArray
      val ex = series.map(r => rIdx.map(num(r, _))).toArray
      val preds: Array[Double] =
        if (n < p + 1) Array.fill(n)(ys.sum / n)
        else {
          val ata = Array.fill(p, p)(0.0)
          val atb = new Array[Double](p)
          var i = 0
          while (i < n) {
            val f = features(xs(i), period, harmonics, ex(i))
            var a = 0
            while (a < p) {
              atb(a) += f(a) * ys(i)
              var b = 0
              while (b < p) { ata(a)(b) += f(a) * f(b); b += 1 }
              a += 1
            }
            i += 1
          }
          val beta = solve(ata, atb)
          xs.indices.map(i =>
            features(xs(i), period, harmonics, ex(i))
              .zip(beta).map(t => t._1 * t._2).sum).toArray
        }
      Array.tabulate(n)(i => (preds(i), ys(i) - preds(i)))
    }
  }

  /** [[fitPredict]] with every cross-engine-fragile step pinned so that
    * `graft.oracle.SeasonalOracle.q49Sql` reproduces the output
    * bit-for-bit in DuckDB — the model-fit analog of
    * `Similarity.kmeansMirrorable`:
    *   - design row = [[mirrorFeatures]] (period-scaled trend; sin/cos
    *     rounded to 6 dp — Java and C libm differ by ulps);
    *   - X'X / X'y accumulate as EXACT decimal sums of round6'd
    *     products — order-independent, so partition/tie order cannot
    *     perturb a bit;
    *   - the solve is [[solveNoPivot]]: a fixed straight-line IEEE op
    *     sequence the oracle replays literally (X'X is SPD, so dropping
    *     partial pivoting loses nothing);
    *   - degenerate series (n < p+1) fall back to the decimal-sum mean.
    * No extra regressors here: the oracle emits a fixed design. Same
    * one-pass-per-series physical shape (and cost) as [[fitPredict]].
    */
  def fitPredictMirrorable(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCol: String, period: Double, harmonics: Int = 2): DataFrame = {
    val tIdx = df.schema.fieldIndex(orderCol)
    val vIdx = df.schema.fieldIndex(valueCol)
    val p = 2 + 2 * harmonics
    perSeries(df, keyCols, orderCol) { series =>
      val n = series.length
      val t0 = num(series.head, tIdx)
      val ys = series.map(r => num(r, vIdx)).toArray
      val td = series.map(r => (num(r, tIdx) - t0) / period).toArray
      if (n < p + 1) {
        var s = 0L
        var i = 0
        while (i < n) { s = Math.addExact(s, micro6(ys(i))); i += 1 }
        val mean = java.math.BigDecimal.valueOf(s, 6).doubleValue / n
        Array.tabulate(n)(i => (mean, ys(i) - mean))
      } else {
        val ata = Array.fill(p, p)(0L)
        val atb = Array.fill(p)(0L)
        var i = 0
        while (i < n) {
          val f = mirrorFeatures(td(i), harmonics)
          var a = 0
          while (a < p) {
            atb(a) = Math.addExact(atb(a), micro6(f(a) * ys(i)))
            var b = 0
            while (b < p) {
              ata(a)(b) = Math.addExact(ata(a)(b), micro6(f(a) * f(b)))
              b += 1
            }
            a += 1
          }
          i += 1
        }
        val beta = solveNoPivot(
          Array.tabulate(p, p)((a, b) => java.math.BigDecimal.valueOf(ata(a)(b), 6).doubleValue),
          Array.tabulate(p)(a => java.math.BigDecimal.valueOf(atb(a), 6).doubleValue))
        Array.tabulate(n) { i =>
          val f = mirrorFeatures(td(i), harmonics)
          var sPred = f(0) * beta(0)
          var a = 1
          while (a < p) { sPred += f(a) * beta(a); a += 1 }
          (sPred, ys(i) - sPred)
        }
      }
    }
  }
}
