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

  /** Holiday one-hot: 1.0 when the timestamp's date is in `isoDates`
    * (e.g. "2026-12-25") — the Prophet `holidays` frame as a design
    * column; pass one per holiday group via `regressorCols`.
    */
  def holidayIndicator(ts: org.apache.spark.sql.Column,
      isoDates: Seq[String]): org.apache.spark.sql.Column =
    if (isoDates.isEmpty) lit(0.0)
    else when(to_date(ts).cast("string").isin(isoDates: _*), 1.0).otherwise(0.0)

  /** Fit per key over (orderCol as t, valueCol as y); appends `fitted`
    * (in-sample prediction) and `resid`. Degenerate series (fewer rows
    * than parameters) get fitted = mean.
    */
  def fitPredict(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCol: String, period: Double, harmonics: Int = 2,
      regressorCols: Seq[String] = Nil): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("fitted", DoubleType), StructField("resid", DoubleType)))
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val tIdx = df.schema.fieldIndex(orderCol)
    val vIdx = df.schema.fieldIndex(valueCol)
    val rIdx = regressorCols.map(df.schema.fieldIndex).toArray
    val p = 2 + 2 * harmonics + rIdx.length
    val enc = RowEncoder.encoderFor(outSchema)
    df.repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols :+ orderCol).map(col): _*)
      .mapPartitions { rows =>
        new Iterator[Row] {
          private val out = scala.collection.mutable.Queue.empty[Row]
          private var pendingRow: Row = null
          private def sameKey(x: Row, y: Row): Boolean =
            keyIdx.forall(i => x.get(i) == y.get(i))
          private def num(r: Row, i: Int): Double = r.get(i) match {
            case d: java.lang.Double => d
            case l: java.lang.Long => l.toDouble
            case i2: java.lang.Integer => i2.toDouble
            case other => other.toString.toDouble
          }
          private def fitSeries(series: Seq[Row]): Unit = {
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
            series.zipWithIndex.foreach { case (r, i) =>
              out.enqueue(Row.fromSeq(r.toSeq ++ Seq(preds(i), ys(i) - preds(i))))
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
            if (series.nonEmpty) fitSeries(series.toSeq)
          }
          override def hasNext: Boolean = { fill(); out.nonEmpty }
          override def next(): Row = { fill(); out.dequeue() }
        }
      }(enc)
  }
}
