package graft.ts

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import org.apache.spark.sql.Column

/** Technical-analysis indicator family (the feature schema of the
  * reference's phase-3 experiments: `examples/data/phase_3/
  * phase_3_debug_out.json` lists RSI, MACD/MACD_Signal/MACD_Histogram,
  * EMA, Stochastic %K/%D, ADX, DI+/DI-, ATR, CCI, WilliamsR, Momentum,
  * ROC as input columns of `normalized_d*.csv`. The reference repo
  * consumes these precomputed — no indicator code is committed — so the
  * formulas here are the standard public definitions: Wilder 1978 for
  * RSI/ATR/ADX, Appel's 12-26-9 MACD, Lane's stochastic, Lambert's CCI.)
  *
  * Two execution shapes, chosen by the math:
  *
  *   - **Bounded-window indicators** (momentum, ROC, stochastic,
  *     WilliamsR, CCI, SMA-ATR): pure `Column` expressions over a
  *     ROWS-framed window — codegen'd, partition-parallel across
  *     series, no state. These scale exactly like every other window
  *     op in the engine.
  *   - **Recursive (IIR) indicators** (EMA, Wilder RSI/ATR/ADX, MACD):
  *     an exponential smoother's state at row t depends on ALL prior
  *     rows — inherently sequential within a series, O(1) state. These
  *     run as ONE streaming `mapPartitions` pass per series
  *     (repartition by series key + sortWithinPartitions, the same
  *     shape as [[graft.decomp.Stl]]), holding constant memory per
  *     series — 100 TB of series parallelize across executors; a
  *     single series streams through one task without materializing.
  *
  * Warm-up rows (fewer than `n` prior values) emit null, the standard
  * charting convention, so downstream finiteness guards (P5) drop them
  * explicitly rather than consuming seed artifacts.
  */
object TechIndicators {

  // ---------------------------------------------------------------- //
  // bounded-window family: Column expressions                        //
  // ---------------------------------------------------------------- //

  /** Momentum(n) = close − close_{t−n}; null during warm-up. */
  def momentum(c: Column, w: WindowSpec, n: Int): Column =
    c - lag(c, n).over(w)

  /** Rate of change: 100·(close/close_{t−n} − 1); null on warm-up or a
    * zero base. */
  def roc(c: Column, w: WindowSpec, n: Int): Column = {
    val base = lag(c, n).over(w)
    when(base =!= 0.0, (c / base - 1.0) * 100.0)
  }

  /** Lane's %K(n) = 100·(C − LL_n)/(HH_n − LL_n) over the trailing n
    * rows; null while the window is short or flat (HH = LL). */
  def stochasticK(close: Column, high: Column, low: Column,
      w: WindowSpec, n: Int): Column = {
    val f = w.rowsBetween(-(n - 1), 0)
    val hh = max(high).over(f)
    val ll = min(low).over(f)
    when(count(close).over(f) >= n && hh =!= ll,
      (close - ll) / (hh - ll) * 100.0)
  }

  /** %D = SMA(3) of %K (computed on an already-materialized %K column). */
  def stochasticD(k: Column, w: WindowSpec, n: Int = 3): Column = {
    val f = w.rowsBetween(-(n - 1), 0)
    when(count(k).over(f) >= n, avg(k).over(f))
  }

  /** Williams %R(n) = −100·(HH_n − C)/(HH_n − LL_n). */
  def williamsR(close: Column, high: Column, low: Column,
      w: WindowSpec, n: Int): Column = {
    val f = w.rowsBetween(-(n - 1), 0)
    val hh = max(high).over(f)
    val ll = min(low).over(f)
    when(count(close).over(f) >= n && hh =!= ll,
      (hh - close) / (hh - ll) * -100.0)
  }

  /** True range: max(H−L, |H−C₋₁|, |L−C₋₁|); first row falls back to
    * H−L (no prior close). */
  def trueRange(high: Column, low: Column, close: Column,
      w: WindowSpec): Column = {
    val pc = lag(close, 1).over(w)
    when(pc.isNull, high - low)
      .otherwise(greatest(high - low, abs(high - pc), abs(low - pc)))
  }

  /** Simple-moving-average ATR(n) = SMA_n(TR) — the non-recursive ATR
    * variant (Wilder's smoothed form lives in the recursive kernel).
    * `tr` must be a MATERIALIZED [[trueRange]] column (trueRange itself
    * contains a lag window, and Spark rejects nested window functions
    * in one expression). */
  def atrSma(tr: Column, w: WindowSpec, n: Int): Column = {
    val f = w.rowsBetween(-(n - 1), 0)
    when(count(tr).over(f) >= n, avg(tr).over(f))
  }

  /** Lambert's CCI(n) = (TP − SMA_n(TP)) / (0.015·MD) with TP the
    * typical price and MD the mean absolute deviation of the window's
    * TPs about the window's OWN mean. MD couples every frame row to the
    * current row's mean, which a plain window aggregate cannot express;
    * the frame's TPs are gathered per row (`collect_list` over the
    * bounded frame) and folded with `aggregate` — and `sort_array`
    * canonicalizes the gathered order first, so the float sum is
    * bitwise partition-independent (the sum is permutation-invariant in
    * exact arithmetic but not in floats). Frame length n bounds the
    * per-row array: scale-safe.
    */
  def cci(high: Column, low: Column, close: Column,
      w: WindowSpec, n: Int): Column = {
    val tp = (high + low + close) / 3.0
    val f = w.rowsBetween(-(n - 1), 0)
    val tps = sort_array(collect_list(tp).over(f))
    val m = avg(tp).over(f)
    val md = aggregate(tps, lit(0.0), (acc, v) => acc + abs(v - m)) / n
    when(count(close).over(f) >= n && md =!= 0.0, (tp - m) / (lit(0.015) * md))
  }

  // ---------------------------------------------------------------- //
  // recursive (IIR) family: streaming per-series kernel              //
  // ---------------------------------------------------------------- //

  /** Parameters of the recursive pass. Defaults are the standard
    * published periods (RSI/ATR/ADX 14 — Wilder's; MACD 12-26-9 —
    * Appel's; EMA span matching the reference's single `EMA` column
    * default 14). */
  final case class RecursiveConfig(
      emaN: Int = 14, rsiN: Int = 14, atrN: Int = 14, adxN: Int = 14,
      macdFast: Int = 12, macdSlow: Int = 26, macdSignal: Int = 9)

  /** Output columns of [[withRecursiveIndicators]], in emit order. */
  val RecursiveCols: Seq[String] = Seq(
    "EMA", "RSI", "ATR", "ADX", "DI_plus", "DI_minus",
    "MACD", "MACD_Signal", "MACD_Histogram")

  /** O(1) exponential-smoother state: seeded with the SMA of the first
    * `n` inputs (the classic charting seed), then s ← s + α·(x − s),
    * α = 1/n (Wilder) or 2/(n+1) (EMA). `s` is NaN until seeded.
    * Immutable so it can live in a Structured Streaming `GroupState`. */
  final case class SmootherState(seedSum: Double = 0.0, seen: Int = 0,
      s: Double = Double.NaN)

  private def smooth(st: SmootherState, n: Int, wilder: Boolean,
      x: Double): SmootherState =
    if (st.seen < n) {
      val sum = st.seedSum + x
      val seen = st.seen + 1
      SmootherState(sum, seen, if (seen == n) sum / n else Double.NaN)
    } else {
      val alpha = if (wilder) 1.0 / n else 2.0 / (n + 1)
      st.copy(s = st.s + alpha * (x - st.s))
    }

  /** Full recursive-indicator state — ONE immutable value per series,
    * shared verbatim by the batch kernel and the streaming face, so
    * batch ≡ streaming holds value-for-value (the same differential
    * structure as `Backtest.stepBar`). */
  final case class RecState(
      ema: SmootherState = SmootherState(), emaFast: SmootherState = SmootherState(),
      emaSlow: SmootherState = SmootherState(), emaSig: SmootherState = SmootherState(),
      gain: SmootherState = SmootherState(), loss: SmootherState = SmootherState(),
      atr: SmootherState = SmootherState(), dmP: SmootherState = SmootherState(),
      dmM: SmootherState = SmootherState(), adx: SmootherState = SmootherState(),
      prevH: Double = Double.NaN, prevL: Double = Double.NaN,
      prevC: Double = Double.NaN)

  /** One bar through the recursive family: (next state, the 9
    * [[RecursiveCols]] values in order, NaN = undefined/warm-up). Pure —
    * the single step function both execution faces fold. */
  def recursiveStep(st: RecState, h: Double, l: Double, c: Double,
      conf: RecursiveConfig): (RecState, Array[Double]) = {
    val ema = smooth(st.ema, conf.emaN, wilder = false, c)
    val emaFast = smooth(st.emaFast, conf.macdFast, wilder = false, c)
    val emaSlow = smooth(st.emaSlow, conf.macdSlow, wilder = false, c)
    val macd = if (java.lang.Double.isFinite(emaFast.s) && java.lang.Double.isFinite(emaSlow.s))
      emaFast.s - emaSlow.s else Double.NaN
    // signal line smooths MACD from the first defined MACD value on
    val emaSig = if (java.lang.Double.isFinite(macd))
      smooth(st.emaSig, conf.macdSignal, wilder = false, macd) else st.emaSig
    val sig = if (java.lang.Double.isFinite(macd)) emaSig.s else Double.NaN
    val hist = macd - sig
    var gain = st.gain; var loss = st.loss; var atr = st.atr
    var dmP = st.dmP; var dmM = st.dmM; var adx = st.adx
    var rsi = Double.NaN; var atrV = Double.NaN
    var diP = Double.NaN; var diM = Double.NaN; var adxV = Double.NaN
    if (!st.prevC.isNaN) {
      val d = c - st.prevC
      gain = smooth(gain, conf.rsiN, wilder = true, math.max(d, 0.0))
      loss = smooth(loss, conf.rsiN, wilder = true, math.max(-d, 0.0))
      if (java.lang.Double.isFinite(gain.s))
        rsi = if (loss.s == 0.0) 100.0 else 100.0 - 100.0 / (1.0 + gain.s / loss.s)
      val tr = math.max(h - l, math.max(math.abs(h - st.prevC), math.abs(l - st.prevC)))
      atr = smooth(atr, conf.atrN, wilder = true, tr)
      atrV = atr.s
      val upM = h - st.prevH
      val dnM = st.prevL - l
      val pdm = if (upM > dnM && upM > 0) upM else 0.0
      val mdm = if (dnM > upM && dnM > 0) dnM else 0.0
      dmP = smooth(dmP, conf.adxN, wilder = true, pdm)
      dmM = smooth(dmM, conf.adxN, wilder = true, mdm)
      if (java.lang.Double.isFinite(dmP.s) && java.lang.Double.isFinite(atrV) && atrV != 0.0) {
        diP = 100.0 * dmP.s / atrV
        diM = 100.0 * dmM.s / atrV
        val dx = if (diP + diM == 0.0) 0.0
          else 100.0 * math.abs(diP - diM) / (diP + diM)
        adx = smooth(adx, conf.adxN, wilder = true, dx)
        adxV = adx.s
      }
    }
    val next = RecState(ema, emaFast, emaSlow, emaSig, gain, loss, atr,
      dmP, dmM, adx, h, l, c)
    (next, Array(ema.s, rsi, atrV, adxV, diP, diM, macd, sig, hist))
  }

  /** One streaming pass over an ORDERED series iterator, appending the
    * [[RecursiveCols]] values to each row. Constant state; never
    * materializes the series. Inputs must be non-null doubles (P5
    * finiteness-guard upstream). */
  private[ts] def recursivePass(rows: Iterator[Row], hi: Int, li: Int,
      ci: Int, conf: RecursiveConfig): Iterator[Row] = {
    var st = RecState()
    def orNull(v: Double): Any = if (java.lang.Double.isFinite(v)) v else null
    rows.map { r =>
      val (next, v) = recursiveStep(st, r.getDouble(hi), r.getDouble(li),
        r.getDouble(ci), conf)
      st = next
      Row.fromSeq(r.toSeq ++ v.map(orNull))
    }
  }

  /** Appends the recursive indicator columns to `df`: repartition by
    * `partCols` (each series = one task's stream; empty = one global
    * series in a single task — the parity pipelines' shape, documented
    * sequential like the reference's single-process pandas pass),
    * sortWithinPartitions on `orderCols`, one O(1)-state pass.
    */
  def withRecursiveIndicators(df: DataFrame, partCols: Seq[String],
      orderCols: Seq[String], high: String, low: String, close: String,
      conf: RecursiveConfig = RecursiveConfig()): DataFrame = {
    val outSchema = StructType(df.schema.fields ++
      RecursiveCols.map(c => StructField(c, DoubleType, nullable = true)))
    val part =
      if (partCols.nonEmpty) df.repartition(partCols.map(col): _*)
      else df.coalesce(1)
    val sorted = part.sortWithinPartitions((partCols ++ orderCols).map(col): _*)
    val hi = df.schema.fieldIndex(high)
    val li = df.schema.fieldIndex(low)
    val ci = df.schema.fieldIndex(close)
    val keyIdx = partCols.map(df.schema.fieldIndex)
    val enc = RowEncoder.encoderFor(outSchema)
    sorted.mapPartitions { it =>
      // a partition may interleave several series: state resets per key
      // run (rows of one key are contiguous after the sort)
      val grouped = new Iterator[Iterator[Row]] {
        val buf = it.buffered
        def hasNext: Boolean = buf.hasNext
        def next(): Iterator[Row] = {
          val key = keyIdx.map(buf.head.get)
          new Iterator[Row] {
            def hasNext: Boolean = buf.hasNext && keyIdx.map(buf.head.get) == key
            def next(): Row = buf.next()
          }
        }
      }
      grouped.flatMap(series => recursivePass(series, hi, li, ci, conf))
    }(enc)
  }
}
