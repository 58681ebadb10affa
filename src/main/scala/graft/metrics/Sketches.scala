package graft.metrics

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequency sketches for the sketch-prune-verify pattern (same shape as
  * LSH→Jaccard and bloom→exact-join): a bounded-memory first pass
  * produces a small CANDIDATE set with a superset guarantee, a second
  * pass computes exact answers only for the candidates.
  *
  * Misra–Gries (k counters): after one pass, every item with true
  * frequency > n/(k+1) is among the tracked keys (Misra & Gries 1982;
  * merge validity per Agarwal et al., PODS'12 "Mergeable Summaries").
  * The buffer is O(k) regardless of input size and merges
  * associatively, so the shuffle carries k entries per partition instead
  * of one entry per distinct key — the point at 100 TB, where a full
  * groupBy on a high-cardinality key shuffles billions of rows to find
  * a handful of heavy keys.
  */
object Sketches {

  /** (tracked keys with residual counts, total items processed). */
  case class MGSummary(keys: Array[Long], residuals: Array[Long], n: Long)

  case class MGBuf(m: Map[Long, Long], n: Long)

  /** Misra–Gries over Long keys. Residual counts underestimate true
    * frequency by at most n/(k+1); any key with freq > n/(k+1) is
    * guaranteed present.
    */
  class MisraGriesAgg(k: Int) extends Aggregator[Long, MGBuf, MGSummary] {
    require(k > 0, s"k must be positive, got $k")

    override def zero: MGBuf = MGBuf(Map.empty, 0L)

    override def reduce(b: MGBuf, key: Long): MGBuf = {
      val m = b.m
      if (m.contains(key)) MGBuf(m.updated(key, m(key) + 1L), b.n + 1)
      else if (m.size < k) MGBuf(m.updated(key, 1L), b.n + 1)
      else {
        // decrement-all: amortized O(1) — each decrement round cancels
        // k+1 prior increments, so total rounds <= n/(k+1)
        val dec = m.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
        MGBuf(dec, b.n + 1)
      }
    }

    override def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val combined = b.m.foldLeft(a.m) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }
      val trimmed =
        if (combined.size <= k) combined
        else {
          // subtract the (k+1)-th largest count from everyone and keep
          // positives — the standard merge that preserves the n/(k+1)
          // error bound for the UNION of the two streams
          val kth = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
          combined.view.mapValues(_ - kth).filter(_._2 > 0L).toMap
        }
      MGBuf(trimmed, a.n + b.n)
    }

    override def finish(b: MGBuf): MGSummary = {
      val sorted = b.m.toArray.sortBy(_._1)
      MGSummary(sorted.map(_._1), sorted.map(_._2), b.n)
    }

    override def bufferEncoder: Encoder[MGBuf] = ExpressionEncoder[MGBuf]()
    override def outputEncoder: Encoder[MGSummary] = ExpressionEncoder[MGSummary]()
  }

  /** Exact heavy hitters via sketch-prune-verify: all `keyCol` values
    * with count·`denom` ≥ n, as (key, cnt) — NULL keys excluded; EXACTLY equal to
    * `GROUP BY key HAVING count(*)·denom >= n` provided `denom < k+1`
    * (the MG superset guarantee: freq ≥ n/denom > n/(k+1) ⇒ tracked).
    *
    * Two scans, neither shuffling the full key space: pass 1 aggregates
    * the O(k) sketch (map-side partials, k-entry buffers on the wire);
    * pass 2 exact-counts ONLY the ≤k candidate keys — the `isin` filter
    * is a pushable predicate, so a parquet scan prunes row groups by
    * min/max before any shuffle.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int, denom: Long): DataFrame = {
    require(denom > 0 && denom < k + 1,
      s"need 0 < denom < k+1 for the superset guarantee, got denom=$denom k=$k")
    // Integral keys only: pass 1 sketches over cast(key AS long), pass 2
    // groups on the original column. A lossy cast (string '1' vs '01',
    // decimals) would alias distinct keys in the sketch while the exact
    // pass keeps them apart — silently breaking both the GROUP BY/HAVING
    // equivalence and the superset guarantee. Fail loudly instead.
    require({
      import org.apache.spark.sql.types._
      df.schema(keyCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }, s"heavyHitters requires an integral key column; " +
      s"$keyCol is ${df.schema(keyCol).dataType.simpleString}")
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new MisraGriesAgg(k)
    // NULL keys are excluded up front (both passes see the same stream;
    // a null would NPE the primitive-Long encoder mid-aggregation)
    val keyed = df.filter(col(keyCol).isNotNull)
    // single-row fit-statistic pull: O(k) longs, never data-proportional
    val summary = keyed.select(col(keyCol).cast("long").as("__k"))
      .as[Long].select(agg.toColumn).head()
    val cands = summary.keys
    if (cands.isEmpty) // empty input: keep the non-empty path's schema
      return df.select(col(keyCol)).limit(0).withColumn("cnt", lit(0L))
    keyed.filter(col(keyCol).isin(cands: _*))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(denom) >= lit(summary.n))
  }
}
