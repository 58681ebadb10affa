package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew & layout helpers for the 100 TB deployment shape (SURVEY §4 /
  * prompt's scale mandate). Small utilities, but they encode the physical
  * decisions: salt a skewed join key, bucket for co-located joins, size
  * shuffle partitions from bytes instead of folklore.
  */
object Scale {

  /** Salted inner equi-join for a skewed key: the large side gets a
    * deterministic per-row salt in [0, buckets), the small side is
    * replicated once per salt, and the join runs on (key, salt) —
    * splitting a hot key across `buckets` reducers. Result set is
    * identical to `large.join(small, key)`.
    *
    * (AQE's skew-join handles sort-merge skew automatically; this is for
    * the cases AQE can't see — e.g. aggregations after the join keep the
    * skewed partitioning.)
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame =
    graft.joins.SkewJoin.saltedInner(large, small, Seq(key), buckets)

  /** Bucketed write for shuffle-free co-located joins on `key`: both
    * sides bucketed by the same key and count join without exchanging.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Event-time partitioned layout: write `df` hive-partitioned by the
    * date of `tsCol` so time-range predicates prune whole partitions at
    * the source (PartitionFilters, zero I/O for out-of-range days) — the
    * layout a 100 TB event store needs for W15/P4-style scans.
    */
  def writePartitionedByDate(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("p_date")
      .parquet(path)

  /** Shuffle-partition sizing: one partition per `targetBytes` of input
    * (default 128 MiB), clamped to [cores, 4×cores·32] — the knob the
    * prompt says to size instead of leaving at 200.
    */
  def suggestShufflePartitions(totalInputBytes: Long, cores: Int,
      targetBytes: Long = 128L << 20): Int = {
    val byBytes = math.ceil(totalInputBytes.toDouble / targetBytes).toInt
    math.min(math.max(byBytes, cores), cores * 128)
  }

  /** Shard-count planning for compacted output: target `targetBytes`
    * per file given the plan's size estimate (Catalyst stats when the
    * source is parquet; callers with better knowledge pass
    * `knownBytes`). Guards both failure modes of naive writes — the
    * 10k-tiny-files layout that drowns a namenode/listing, and the
    * one-giant-file layout that serializes every downstream scan.
    */
  def planShards(df: DataFrame, targetBytes: Long = 512L << 20,
      knownBytes: Long = -1L): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val bytes =
      if (knownBytes >= 0) BigInt(knownBytes)
      else df.queryExecution.optimizedPlan.stats.sizeInBytes
    // stay in BigInt: Catalyst estimates routinely approach Long.MaxValue
    // (defaultSizeInBytes, multiplied through joins) and a .toInt on the
    // quotient would wrap to an arbitrary/negative count — exactly the
    // one-giant-file layout this function exists to prevent. Unknown-size
    // estimates clamp to maxShards; callers with real knowledge pass
    // knownBytes.
    val n = (bytes + targetBytes - 1) / targetBytes
    n.max(1).min(maxShards).toInt
  }

  /** Upper bound on [[planShards]]' answer: past ~1M output files the
    * bottleneck is the metadata layer (driver commit protocol, listing),
    * not shard size — a clamped count signals "estimate unusable".
    */
  val maxShards: BigInt = BigInt(1) << 20

  /** Compacted parquet output: exactly `planShards` files of
    * ≈`targetBytes`, rows spread round-robin (`repartition(n)` — a full
    * shuffle, the price of even shard sizes). Sort-free by design: call
    * `writeBucketed`/`writePartitionedByDate` instead when downstream
    * wants co-location or pruning, this writer is for the "ship N
    * even training shards" endpoint.
    */
  def writeShards(df: DataFrame, path: String,
      targetBytes: Long = 512L << 20, knownBytes: Long = -1L): Int = {
    val n = planShards(df, targetBytes, knownBytes)
    df.repartition(n).write.mode("overwrite").parquet(path)
    n
  }
}
