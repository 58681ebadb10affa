package graft.decomp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** D5 multi-taper spectral estimation (SURVEY §2.5): sine-taper averaged
  * periodogram (Riedel & Sidorenko 1995's minimum-bias sine tapers —
  * public method; the reference carries `use_multi_tapper` as a config
  * flag only, so as with the Haar DWT the semantics are the standard
  * published estimator).
  *
  * Taper k of length n: `w_k[i] = √(2/(n+1)) · sin(π·k·(i+1)/(n+1))`.
  * The estimate at bin j averages `|DFT(x·w_k)(j)|²` over k — K
  * independent-ish periodograms, ~1/K the variance of a single one.
  *
  * Determinism contract: taper weights are pinned to 12 dp constants
  * (the `StlMirrorable` pattern) and inlined identically into the DuckDB
  * oracle, so no engine-specific `sin` enters the weights; the DFT
  * itself rides q45's proven exact-DFT oracle contract (trig + list ops,
  * 6 dp rounding on both sides).
  */
object Multitaper {

  /** Sine tapers, each weight rounded to 12 dp. */
  def sineTapers(n: Int, k: Int): Seq[Seq[Double]] = {
    require(n > 1 && k >= 1, s"bad taper shape n=$n k=$k")
    (1 to k).map { kk =>
      (0 until n).map { i =>
        val w = math.sqrt(2.0 / (n + 1)) *
          math.sin(math.Pi * kk * (i + 1) / (n + 1))
        BigDecimal(w).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
  }

  /** Column of the element-wise tapered window (1-based zip via
    * transform index; `win` must have length n). */
  def tapered(win: Column, taper: Seq[Double]): Column = {
    val lits = array(taper.map(lit): _*)
    zip_with(win, lits, (a, b) => a * b)
  }
}
