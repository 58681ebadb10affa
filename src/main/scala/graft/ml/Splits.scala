package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
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
}
