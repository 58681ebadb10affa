package graft.metrics

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregators for the similarity-style metrics the reference
  * computes as numpy kernels (SURVEY §2.6 A9, §2.9 M6).
  */
object Aggregators {

  /** M6 soft-DTW (`losses.py:207-273`): full O(n·m) DP with soft-min,
    * exposed as a series-similarity scalar. Driver for small pairs; as an
    * Aggregator it merges per-partition pair lists.
    */
  def softDtw(a: Array[Double], b: Array[Double], gamma: Double = 1.0): Double = {
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0) return 0.0
    val inf = Double.PositiveInfinity
    val dp = Array.fill(n + 1, m + 1)(inf)
    dp(0)(0) = 0.0
    def softMin(x: Double, y: Double, z: Double): Double = {
      val mn = math.min(x, math.min(y, z))
      if (mn.isInfinite) return mn
      val s = math.exp(-(x - mn) / gamma) + math.exp(-(y - mn) / gamma) +
        math.exp(-(z - mn) / gamma)
      -gamma * math.log(s) + mn
    }
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        val cost = (a(i - 1) - b(j - 1)) * (a(i - 1) - b(j - 1))
        dp(i)(j) = cost + softMin(dp(i - 1)(j), dp(i)(j - 1), dp(i - 1)(j - 1))
        j += 1
      }
      i += 1
    }
    dp(n)(m)
  }

  /** A9 MMD with Gaussian kernel (`losses.py:42-58`):
    * mean K(x,x') + mean K(y,y') − 2 mean K(x,y), K = exp(−(a−b)²/2σ²).
    * The reference subsamples 256 rows first; do that upstream
    * (deterministically — e.g. lowest-id rows) and feed the two samples
    * here. O(|x|·|y|) driver-side on the subsample, like the reference.
    */
  def mmdGaussian(x: Array[Double], y: Array[Double], sigma: Double): Double = {
    def meanK(u: Array[Double], v: Array[Double]): Double = {
      if (u.isEmpty || v.isEmpty) return 0.0
      var s = 0.0
      var i = 0
      while (i < u.length) {
        var j = 0
        while (j < v.length) {
          val d = u(i) - v(j)
          s += math.exp(-d * d / (2.0 * sigma * sigma))
          j += 1
        }
        i += 1
      }
      s / (u.length.toLong * v.length)
    }
    meanK(x, x) + meanK(y, y) - 2.0 * meanK(x, y)
  }

  /** Welford-style incremental mean/std as a typed Aggregator (A8) —
    * merging partial (count, mean, M2) across partitions, the same
    * update rule as `bayesian.py:104-122` but distributed.
    */
  case class WelfordBuf(n: Long, mean: Double, m2: Double)

  val welford: Aggregator[Double, WelfordBuf, (Double, Double)] =
    new Aggregator[Double, WelfordBuf, (Double, Double)] {
      def zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)
      def reduce(b: WelfordBuf, x: Double): WelfordBuf = {
        val n = b.n + 1
        val d = x - b.mean
        val mean = b.mean + d / n
        WelfordBuf(n, mean, b.m2 + d * (x - mean))
      }
      def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf = {
        if (a.n == 0) return b
        if (b.n == 0) return a
        val n = a.n + b.n
        val d = b.mean - a.mean
        WelfordBuf(n, a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
      def finish(b: WelfordBuf): (Double, Double) =
        if (b.n == 0) (0.0, 0.0) else (b.mean, math.sqrt(b.m2 / b.n))
      def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
      def outputEncoder: Encoder[(Double, Double)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    }

  /** M6 distributed wiring: soft-DTW between two aligned value columns,
    * one score per key — `groupBy(keys).collect_list` shuffles each
    * series to one reducer, `sort_array` orders it by the time column,
    * and the O(n·m) kernel runs executor-side. Memory is bounded by one
    * series per kernel call (the same contract as every per-series fit
    * here); 10⁶ series run in parallel. A per-SERIES UDF call, not
    * per-row — SerDe cost is once per group, which is not the hot path.
    */
  def softDtwByKey(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
      orderCol: String, aCol: String, bCol: String,
      gamma: Double = 1.0): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val kernel = udf((xs: Seq[org.apache.spark.sql.Row]) => {
      // gap mask: rows where either side is NULL are skipped, matching
      // the engine-wide "NULL rows fall out of every aggregate" contract
      // (and the reference's is_gap_mask) instead of NPE-ing the task
      val valid = xs.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      val a = new Array[Double](valid.length)
      val b = new Array[Double](valid.length)
      var i = 0
      valid.foreach { r => a(i) = r.getDouble(1); b(i) = r.getDouble(2); i += 1 }
      softDtw(a, b, gamma)
    })
    df.groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col(orderCol).cast("double"),
        col(aCol).cast("double"),
        col(bCol).cast("double")))).as("__xs"))
      .withColumn("soft_dtw", kernel(col("__xs")))
      .drop("__xs")
  }
}
