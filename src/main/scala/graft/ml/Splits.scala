package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: a row's split
  * is a pure function of its key (md5-bucket), so the assignment is
  * stable across runs, engines, partitionings, and re-ingestions — the
  * property random `sample()` splits lack and the one that matters when
  * a 100 TB corpus is re-split incrementally.
  */
object Splits {

  /** Engine-agnostic hash bucket in [0, buckets): first 8 hex chars of
    * md5(key) as an integer, mod buckets. Reproducible in any engine
    * with md5 (DuckDB: `('0x' || substr(md5(k),1,8))::UBIGINT % b`).
    */
  def hashBucket(key: Column, buckets: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Assign train/validation/test by percentage bands over 100 hash
    * buckets, e.g. (80, 10) → train <80, validation <90, test rest.
    */
  def assignSplit(key: Column, trainPct: Int, valPct: Int): Column = {
    val b = hashBucket(key, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "validation")
      .otherwise("test")
  }

  /** Materialize the three split frames. */
  def split(df: DataFrame, keyCol: String, trainPct: Int, valPct: Int):
      Map[String, DataFrame] = {
    val tagged = df.withColumn("__split", assignSplit(col(keyCol), trainPct, valPct))
    Map(
      "train" -> tagged.filter(col("__split") === "train").drop("__split"),
      "validation" -> tagged.filter(col("__split") === "validation").drop("__split"),
      "test" -> tagged.filter(col("__split") === "test").drop("__split"))
  }

  /** Top-k buffer for [[HashTopKAgg]]: priorities ascending, the id
    * array parallel to it; both always ≤ k entries. */
  final case class TopKBuf(prios: Array[String], ids: Array[Long])

  /** Deterministic, MERGEABLE per-group k-sample: keep the k DISTINCT
    * ids with the lexicographically smallest md5-derived priority
    * ((priority, id) ties totally ordered; duplicate ids are one
    * candidate — set semantics). This is the fixed-COUNT sibling of
    * [[assignSplit]]'s fixed-RATE buckets and the curation samplers
    * (q79 mixture rate, q100 cluster cap) — "give me exactly k
    * reproducible exemplars per group" — with the same engine-agnostic
    * determinism: the sample is a pure function of the key SET, stable
    * across runs, partitionings, duplication, and engines (the oracle
    * recomputes it as a window QUALIFY over the distinct ids).
    *
    * Scale shape: as a typed Aggregator it partial-aggregates map-side
    * — each task ships at most k (priority, id) pairs per group —
    * where the equivalent `row_number` window would shuffle the FULL
    * corpus on the group key before discarding all but k rows per
    * group. Insertion into the sorted ≤k buffer is O(k) per row worst
    * case but O(1) amortized on random-hash input (most rows fail the
    * max-priority gate immediately).
    */
  class HashTopKAgg(k: Int)
    extends Aggregator[(String, Long), TopKBuf, Seq[Long]]
    with Serializable {
    require(k > 0, s"sample size must be positive, got $k")

    override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

    private def lt(p1: String, i1: Long, p2: String, i2: Long): Boolean = {
      val c = p1.compareTo(p2)
      c < 0 || (c == 0 && i1 < i2)
    }

    private def insert(b: TopKBuf, p: String, id: Long): TopKBuf = {
      val n = b.prios.length
      if (n == k && !lt(p, id, b.prios(n - 1), b.ids(n - 1))) return b
      // binary search for the insertion point in the sorted prefix
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (lt(b.prios(mid), b.ids(mid), p, id)) lo = mid + 1 else hi = mid
      }
      // SET semantics: an id already in the sample is a no-op, so the
      // sample is a pure function of the distinct id set — duplicate
      // rows cannot crowd the sample (a recurring-identity stream would
      // otherwise converge to k copies of the min-priority id), and the
      // streaming face is idempotent under at-least-once re-delivery
      if (lo < n && b.prios(lo) == p && b.ids(lo) == id) return b
      val m = math.min(n + 1, k)
      val ps = new Array[String](m); val is = new Array[Long](m)
      System.arraycopy(b.prios, 0, ps, 0, lo)
      System.arraycopy(b.ids, 0, is, 0, lo)
      ps(lo) = p; is(lo) = id
      val tail = m - lo - 1
      if (tail > 0) {
        System.arraycopy(b.prios, lo, ps, lo + 1, tail)
        System.arraycopy(b.ids, lo, is, lo + 1, tail)
      }
      TopKBuf(ps, is)
    }

    override def reduce(b: TopKBuf, row: (String, Long)): TopKBuf =
      insert(b, row._1, row._2)

    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      var out = a
      var i = 0
      while (i < b.prios.length) {
        out = insert(out, b.prios(i), b.ids(i))
        i += 1
      }
      out
    }

    /** Sample ids in priority order (rank 1 = smallest priority). */
    override def finish(b: TopKBuf): Seq[Long] = b.ids.toSeq

    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Per-group deterministic k-sample as a DataFrame: one row per kept
    * id with its rank (1 = smallest priority). Priority = md5 of the id
    * rendered as a string — reproducible in any engine with md5.
    *
    * NULL ids are dropped first (a null identity is not sampleable —
    * the `TDigest.grouped` null contract; md5(NULL) would otherwise NPE
    * inside the typed aggregator), so a group whose ids are all NULL
    * produces no sample rows. The generator outputs are internally
    * aliased, so group columns named `pos`/`col` are safe.
    */
  def hashSample(df: DataFrame, groupCols: Seq[String], idCol: String,
      k: Int): DataFrame = {
    require(!groupCols.contains(idCol), s"idCol $idCol is also a group column")
    val agg = udaf(new HashTopKAgg(k), Encoders.tuple(
      Encoders.STRING, Encoders.scalaLong))
    df.filter(col(idCol).isNotNull)
      .select(groupCols.map(col) :+
        md5(col(idCol).cast("string")).as("__prio") :+ col(idCol): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col("__prio"), col(idCol)).as("__sample"))
      .select(groupCols.map(col)
        :+ posexplode(col("__sample")).as(Seq("__pos", "__sid")): _*)
      .select(groupCols.map(col)
        :+ (col("__pos") + lit(1)).cast("long").as("sample_rank")
        :+ col("__sid").as(idCol): _*)
  }
}
