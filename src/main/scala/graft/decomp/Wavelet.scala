package graft.decomp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D5 wavelets (SURVEY §2.5): per-series Haar discrete wavelet transform.
  *
  * The reference carries wavelets as config flags only (`use_wavelets`,
  * `examples/config/phase_1/phase_1_cnn_6300_1h_config.json:57`;
  * `olap/etl_migrate_v2.py:101` persists the flag to the OLAP dims) — no
  * live kernel exists to match, so the semantics here are the standard
  * orthonormal Haar DWT (Mallat's pyramid algorithm): level l halves the
  * series with pairwise `(a+b)/√2` smooths and `(a−b)/√2` details; L
  * levels of a 2^L-point window yield 2^L coefficients that carry the
  * signal's energy exactly (Parseval).
  *
  * Spark-first shape: ONE shuffle total. The leading-window collect is a
  * bounded `collect_list` per series (n = 2^L elements, a fit-window
  * pattern like q45's FFT); every pyramid level after that is a narrow
  * per-row array `transform` — codegen'd, no per-level shuffle, nothing
  * proportional to series count anywhere but the one grouped collect. At
  * 100 TB the plan is a single partial-agg shuffle on the series key.
  */
object Wavelet {

  private val Sqrt2 = math.sqrt(2.0)

  /** levels = log2(n); requires n a power of two ≥ 2. */
  private def levelsOf(n: Int): Int = {
    require(n >= 2 && (n & (n - 1)) == 0,
      s"Haar window must be a power of two >= 2, got $n")
    Integer.numberOfTrailingZeros(n)
  }

  /** One pyramid level: pairwise smooth/detail of `prev` (length 2m). */
  private def smooth(prev: Column, m: Int): Column =
    transform(sequence(lit(0), lit(m - 1)),
      j => (element_at(prev, j * 2 + 1) + element_at(prev, j * 2 + 2)) / Sqrt2)
  private def detail(prev: Column, m: Int): Column =
    transform(sequence(lit(0), lit(m - 1)),
      j => (element_at(prev, j * 2 + 1) - element_at(prev, j * 2 + 2)) / Sqrt2)

  /** Full-depth Haar DWT of the FIRST `n` values of each series (series
    * shorter than `n` are dropped — the dyadic-window contract).
    *
    * Returns long format: one row per coefficient —
    * `seriesCols…, band ('d1'…'dL' details, 'aL' final smooth), idx
    * (0-based within band), coef` — with `coef` rounded to 6 dp (the
    * repo's oracle determinism discipline).
    */
  def haarDwt(df: DataFrame, valueCol: String, seriesCols: Seq[String],
      orderCols: Seq[String], n: Int): DataFrame = {
    val levels = levelsOf(n)
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val series = df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .groupBy(seriesCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col("__rn"), col(valueCol).as("__v"))))
        .as("__sv"))
      .filter(size(col("__sv")) === n)
      .withColumn("__xs", transform(col("__sv"), x => x.getField("__v")))
    // pyramid: one Generate barrier per level. Building the levels as
    // nested Column expressions would embed level l−1's whole tree TWICE
    // inside level l (once per element_at) — exponential codegen blowup
    // (the q63/q45 lesson). After `explode(array(struct(…)))` each
    // level's smooth/detail are bound ATTRIBUTES, so every later
    // reference is free and plan size stays linear in `levels`.
    var cur = series
    var prev = "__xs"
    var l = 1
    var len = n
    while (l <= levels) {
      len /= 2
      val keep = seriesCols.map(col) ++ (1 until l).map(i => col(s"__d$i"))
      cur = cur
        .select(keep :+ explode(array(struct(
          smooth(col(prev), len).as("a"),
          detail(col(prev), len).as("d")))).as("__p"): _*)
        .select(keep :+ col("__p.a").as(s"__a$l") :+ col("__p.d").as(s"__d$l"): _*)
      prev = s"__a$l"
      l += 1
    }
    val bands = (1 to levels).map { i =>
      transform(col(s"__d$i"), (x, j) =>
        struct(lit(s"d$i").as("band"), j.as("idx"), x.as("coef")))
    } :+ transform(col(s"__a$levels"), (x, j) =>
      struct(lit(s"a$levels").as("band"), j.as("idx"), x.as("coef")))
    cur
      .select(seriesCols.map(col) :+ explode(concat(bands: _*)).as("__c"): _*)
      .select(seriesCols.map(col) :+
        col("__c.band").as("band") :+
        col("__c.idx").as("idx") :+
        round(col("__c.coef"), 6).as("coef"): _*)
  }

  /** Per-band energy (exact-decimal sums of coef², SURVEY's `dsum`
    * discipline): the compact spectral-shape feature the flags in the
    * reference's OLAP schema describe. */
  def haarBandEnergy(df: DataFrame, valueCol: String, seriesCols: Seq[String],
      orderCols: Seq[String], n: Int): DataFrame =
    haarDwt(df, valueCol, seriesCols, orderCols, n)
      .groupBy((seriesCols.map(col) :+ col("band")): _*)
      .agg(sum(round(col("coef") * col("coef"), 6)
        .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .cast("double").as("energy"))

  /** Inverse of [[haarDwt]] on one coefficient array laid out
    * `[aL | dL | dL-1 … | d1]` (each band contiguous, idx-ordered):
    * returns the reconstructed n-point series. Array-expression only —
    * used by the round-trip property spec. */
  def inverseHaarColumn(coefs: Column, n: Int): Column = {
    val levels = levelsOf(n)
    // walk up: start with a = coefs[0..0], at level l merge with
    // d_l = coefs[len .. 2*len-1] (offset in the packed layout)
    var a: Column = slice(coefs, 1, 1)
    var len = 1
    var l = levels
    while (l >= 1) {
      val d = slice(coefs, len + 1, len)
      val m = len
      val merged = flatten(transform(sequence(lit(0), lit(m - 1)), j =>
        array(
          (element_at(a, j + 1) + element_at(d, j + 1)) / Sqrt2,
          (element_at(a, j + 1) - element_at(d, j + 1)) / Sqrt2)))
      a = merged
      len *= 2
      l -= 1
    }
    a
  }
}
