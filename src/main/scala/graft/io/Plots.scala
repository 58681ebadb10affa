package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Plot sinks — the analog of the reference's matplotlib outputs
  * (`pipeline_plugins/stl_plots.py:16,30` loss/prediction plots,
  * `app/data_processor.py:649-654` predictions-with-uncertainty,
  * `stl_plots.py` decomposition panels), re-expressed for Spark:
  *
  *   - the 100 TB-relevant half is the PLOT-DATA pipeline — last-N
  *     slicing (the reference's `plot_points` contract, W15) and
  *     value-bucketed downsampling to ≤ `maxPoints` rows, computed as
  *     one min/max aggregate + one bucketed groupBy (no global sort, no
  *     window over a single partition — fully parallel at any scale);
  *   - the rendering half is a dependency-free deterministic SVG writer
  *     fed by the bounded downsampled points (≤ maxPoints·series values
  *     cross the driver — same order as the reference's matplotlib
  *     arrays). SVG instead of PNG: no image codec exists in the plain
  *     JDK/offline container, and SVG diffs/commits cleanly.
  *
  * Everything is deterministic: bucket means are rounded to 6 dp and
  * coordinates formatted with a fixed locale, so a plot file is
  * byte-stable across runs and partitionings up to the aggregate's
  * 6-dp rounding.
  */
object Plots {

  final case class Series(name: String, xs: Array[Double], ys: Array[Double])

  /** Distributed downsample of ordered series columns to ≤ `maxPoints`
    * buckets: bucket = position of x in [min(x), max(x)] (value
    * bucketing — dense time axes make this the reference's every-k-th
    * thinning without a global sort), per bucket the mean x and mean y
    * per series, 6-dp rounded. Output is sorted by x and bounded, ready
    * to collect.
    */
  def downsample(df: DataFrame, xCol: String, yCols: Seq[String],
      maxPoints: Int = 1500): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    val x = col(xCol).cast("double")
    val mm = df.agg(min(x).as("mn"), max(x).as("mx")).head()
    if (mm.isNullAt(0)) // empty input: an empty plot, not an NPE
      return df.select((xCol +: yCols).map(c => col(c).cast("double").as(c)): _*).limit(0)
    downsampleFixed(df, xCol, yCols, mm.getDouble(0), mm.getDouble(1), maxPoints)
      .orderBy(col(xCol))
  }

  /** Bucket index of x over the FIXED axis window [xMin, xMax]. */
  private[graft] def bucketExpr(x: Column, xMin: Double, xMax: Double,
      maxPoints: Int): Column = {
    val span = if (xMax > xMin) xMax - xMin else 1.0
    least(greatest(floor((x - lit(xMin)) / lit(span) * maxPoints), lit(0)),
      lit(maxPoints - 1)).cast("int")
  }

  /** Downsample over a caller-fixed axis window — the shared kernel of
    * the batch path (which derives the window from the data) and the
    * streaming face (`StreamOps.streamingDownsample` — a stream has no
    * global min/max, so the dashboard's axis IS the window). Unordered;
    * bucket means under the dsum discipline (exact decimal sum → double
    * → one division → 6-dp round). DECIMAL(30,6), not the usual (18,6):
    * a plot axis is often epoch MICROseconds (~1.7e15), and 12 integer
    * digits overflow on the very first row — 24 digits hold a full
    * 1e9-row bucket of epoch-micro values (found by the r9 plots
    * ScaleProbe, which feeds unix_micros as x). Order-independent, so
    * the output is
    * bitwise identical under any partitioning, batch ≡ streaming on the
    * same rows, AND matchable by the DuckDB oracle (q102 pins the plan).
    */
  def downsampleFixed(df: DataFrame, xCol: String, yCols: Seq[String],
      xMin: Double, xMax: Double, maxPoints: Int): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    val x = col(xCol).cast("double")
    def dAvg(c: Column) = round(
      sum(c.cast(org.apache.spark.sql.types.DecimalType(30, 6))).cast("double") /
        count(lit(1)), 6)
    df.groupBy(bucketExpr(x, xMin, xMax, maxPoints).as("__b"))
      .agg(dAvg(x).as(xCol), yCols.map(c => dAvg(col(c)).as(c)): _*)
      .drop("__b")
  }

  /** Rank-based downsample: bucket edges are the (1..K-1)/K approximate
    * quantiles of x, so every bucket holds ~1/K of the ROWS regardless
    * of how the axis values cluster — the fix for value-bucketing's
    * degeneracy on non-uniform x (a series with 95% of its timestamps
    * in one burst collapses `downsample`'s uniform grid into a few
    * buckets; here it still yields ~maxPoints plot points).
    *
    * Same scale shape as the default path: ONE extra aggregate
    * (approx_percentile over the K-1 quantile vector, a mergeable
    * sketch), edges collected (≤ maxPoints doubles) and re-broadcast as
    * a literal into the O(log K)/row [[graft.functions.BucketSearch]],
    * then the identical dsum-mean kernel — no global sort, partial
    * aggregation absorbs corpus growth. Kept OFF the q102 oracle path:
    * approx_percentile's sketch is not DuckDB-matchable, so the default
    * `downsample` stays the hash-exact contract and this is the
    * explicitly-chosen variant for skewed axes.
    *
    * NOT bitwise partition-independent, unlike `downsample`: the bucket
    * edges come from approx_percentile, whose sketch merge is
    * partition-order-sensitive, so re-running on a repartitioned input
    * can shift edge values in the last ulps and move boundary rows
    * between buckets. Fine for plots (the visual shape is stable);
    * do not use where downstream logic assumes deterministic bucket
    * membership — use `downsample` there.
    */
  def downsampleQuantile(df: DataFrame, xCol: String, yCols: Seq[String],
      maxPoints: Int = 1500, accuracy: Int = 10000): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    val x = col(xCol).cast("double")
    val ps = (1 until maxPoints).map(_.toDouble / maxPoints)
    val edgeRow = df.agg(
      approx_percentile(x, array(ps.map(lit): _*), lit(accuracy))).head()
    if (edgeRow.isNullAt(0)) // empty input: an empty plot, not an NPE
      return df.select((xCol +: yCols).map(c => col(c).cast("double").as(c)): _*).limit(0)
    val edges = edgeRow.getSeq[Double](0).toArray
    def dAvg(c: Column) = round(
      sum(c.cast(org.apache.spark.sql.types.DecimalType(30, 6))).cast("double") /
        count(lit(1)), 6)
    df.groupBy(graft.functions.BucketSearch(x,
        array(edges.toSeq.map(lit): _*)).as("__b"))
      .agg(dAvg(x).as(xCol), yCols.map(c => dAvg(col(c)).as(c)): _*)
      .drop("__b")
      .orderBy(col(xCol))
  }

  /** Last-N slice on the x order (the reference's `plot_points`
    * contract) without a global sort: one max(x) aggregate, then a
    * pushed-down range filter. `n` is approximate under duplicate x
    * values (ties all kept).
    */
  def lastN(df: DataFrame, xCol: String, n: Long): DataFrame = {
    val x = col(xCol).cast("double")
    val cnt = df.count()
    if (cnt <= n) df
    else {
      // threshold = the n-th largest x; approx_percentile keeps this one
      // aggregate scan instead of a full sort
      val p = math.max(0.0, 1.0 - n.toDouble / cnt)
      val thr = df.agg(approx_percentile(x, lit(p), lit(10000))).head().getDouble(0)
      df.filter(x >= thr)
    }
  }

  private def fmt(v: Double): String = {
    val s = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    s.underlying.stripTrailingZeros.toPlainString
  }

  /** Categorical palette (Okabe–Ito, colorblind-safe, public domain). */
  private val Palette = Array("#0072B2", "#D55E00", "#009E73", "#CC79A7",
    "#E69F00", "#56B4E9", "#F0E442", "#000000")

  /** One line panel as SVG group; `band` shades ±band around series 0
    * (the uncertainty envelope of `plot_predictions`). Pure function of
    * its inputs — no clock, no randomness.
    */
  private def panel(series: Seq[Series], band: Option[Series],
      x0: Int, y0: Int, w: Int, h: Int, title: String): String = {
    val allX = series.flatMap(_.xs)
    val allY = series.flatMap(_.ys) ++
      band.toSeq.flatMap(b => b.ys.indices.flatMap(i =>
        Seq(series.head.ys(i) - b.ys(i), series.head.ys(i) + b.ys(i))))
    if (allX.isEmpty) return s"""<text x="${x0 + 5}" y="${y0 + 15}">$title (empty)</text>"""
    val (xmn, xmx) = (allX.min, allX.max)
    val (ymn0, ymx0) = (allY.min, allY.max)
    val pad = math.max((ymx0 - ymn0) * 0.05, 1e-9)
    val (ymn, ymx) = (ymn0 - pad, ymx0 + pad)
    def px(v: Double) = x0 + (if (xmx > xmn) (v - xmn) / (xmx - xmn) else 0.5) * w
    def py(v: Double) = y0 + h - (v - ymn) / (ymx - ymn) * h
    val sb = new StringBuilder
    sb ++= s"""<rect x="$x0" y="$y0" width="$w" height="$h" fill="none" stroke="#ccc"/>"""
    sb ++= s"""<text x="${x0 + 5}" y="${y0 + 15}" font-size="12" font-family="sans-serif">$title</text>"""
    // y-axis ticks: min / mid / max
    Seq(ymn0, (ymn0 + ymx0) / 2, ymx0).foreach { v =>
      sb ++= s"""<text x="${x0 - 4}" y="${fmt(py(v) + 3)}" font-size="9" text-anchor="end" font-family="sans-serif">${fmt(v)}</text>"""
      sb ++= s"""<line x1="$x0" y1="${fmt(py(v))}" x2="${x0 + w}" y2="${fmt(py(v))}" stroke="#eee"/>"""
    }
    band.foreach { b =>
      val base = series.head
      val nPts = math.min(base.xs.length, b.ys.length)
      val up = (0 until nPts).map(i => s"${fmt(px(base.xs(i)))},${fmt(py(base.ys(i) + b.ys(i)))}")
      val dn = (nPts - 1 to 0 by -1).map(i => s"${fmt(px(base.xs(i)))},${fmt(py(base.ys(i) - b.ys(i)))}")
      sb ++= s"""<polygon points="${(up ++ dn).mkString(" ")}" fill="#0072B2" fill-opacity="0.15" stroke="none"/>"""
    }
    series.zipWithIndex.foreach { case (sr, i) =>
      val pts = sr.xs.indices.map(j => s"${fmt(px(sr.xs(j)))},${fmt(py(sr.ys(j)))}").mkString(" ")
      val color = Palette(i % Palette.length)
      sb ++= s"""<polyline points="$pts" fill="none" stroke="$color" stroke-width="1.2"/>"""
      sb ++= s"""<text x="${x0 + w - 5}" y="${y0 + 15 + 12 * i}" font-size="10" text-anchor="end" fill="$color" font-family="sans-serif">${sr.name}</text>"""
    }
    sb.toString
  }

  /** Render stacked line panels to a self-contained SVG string. Each
    * entry = (title, series, optional ±band around series 0).
    */
  def renderSvg(panels: Seq[(String, Seq[Series], Option[Series])],
      width: Int = 900, panelHeight: Int = 180): String = {
    val mL = 56; val mR = 10; val mT = 10; val gap = 24
    val height = mT + panels.length * (panelHeight + gap)
    val body = panels.zipWithIndex.map { case ((title, ss, band), i) =>
      panel(ss, band, mL, mT + i * (panelHeight + gap), width - mL - mR,
        panelHeight, title)
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">
       |<rect width="$width" height="$height" fill="white"/>
       |$body
       |</svg>""".stripMargin
  }

  private def collectSeries(down: DataFrame, xCol: String,
      yCols: Seq[String]): Seq[Series] = {
    val rows = down.select((xCol +: yCols).map(c => col(c).cast("double")): _*).collect()
    val xs = rows.map(_.getDouble(0))
    yCols.zipWithIndex.map { case (c, i) =>
      Series(c, xs, rows.map(_.getDouble(i + 1)))
    }
  }

  /** General line-plot sink: last-N slice → downsample → SVG file.
    * The `plot_and_save_loss` / generic series shape.
    */
  def linePlot(df: DataFrame, xCol: String, yCols: Seq[String], path: String,
      title: String = "", plotPoints: Long = 1575,
      maxPoints: Int = 1500): Unit = {
    val down = downsample(lastN(df, xCol, plotPoints), xCol, yCols, maxPoints)
    val svg = renderSvg(Seq((if (title.isEmpty) yCols.mkString(", ") else title,
      collectSeries(down, xCol, yCols), None)))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), svg)
  }

  /** `plot_predictions` (`stl_plots.py:30`, `data_processor.py:649-654`):
    * target vs prediction with the ±uncertainty envelope, last
    * `plotPoints` points (the reference's `plot_points` default 1575).
    */
  def predictionPlot(df: DataFrame, xCol: String, targetCol: String,
      predCol: String, uncCol: String, path: String,
      plotPoints: Long = 1575, maxPoints: Int = 1500): Unit = {
    val down = downsample(lastN(df, xCol, plotPoints), xCol,
      Seq(predCol, targetCol, uncCol), maxPoints)
    val all = collectSeries(down, xCol, Seq(predCol, targetCol, uncCol))
    val svg = renderSvg(Seq((s"$predCol vs $targetCol (±$uncCol)",
      all.take(2), Some(all(2)))))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), svg)
  }

  /** The `*_loss_plot.png` analog (`data_processor.py:383-391`:
    * per-training epoch-loss curves, legend per curve): named (epoch,
    * loss) curves from `Callbacks.History` rows. Training histories are
    * driver-side by construction (one point per epoch, recorded by the
    * sequential epoch-control loop), so this renders directly — no
    * DataFrame, no downsample pass.
    */
  def lossPlot(curves: Seq[(String, Seq[(Int, Double)])], path: String,
      title: String = "Model Loss"): Unit = {
    require(curves.nonEmpty && curves.forall(_._2.nonEmpty),
      "lossPlot needs at least one non-empty loss history")
    val series = curves.map { case (name, rows) =>
      Series(name, rows.map(_._1.toDouble).toArray, rows.map(_._2).toArray)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      renderSvg(Seq((title, series, None))))
  }

  /** Decomposition panels (`*_stl_decomposition_plot.png` shape): one
    * stacked panel per component column over the same x axis.
    */
  def decompositionPlot(df: DataFrame, xCol: String,
      componentCols: Seq[String], path: String,
      maxPoints: Int = 1500): Unit = {
    val down = downsample(df, xCol, componentCols, maxPoints)
    val all = collectSeries(down, xCol, componentCols)
    val svg = renderSvg(componentCols.zip(all).map { case (c, s) =>
      (c, Seq(s), Option.empty[Series])
    })
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), svg)
  }
}
