package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the batch operators (SURVEY §2.10 —
  * an extension, not reference behavior: the reference is batch-only).
  *
  * Same DataFrame expressions as the batch path; only the source/sink
  * change. Featurization that needs exact trailing row counts (W1-W3)
  * stays in `foreachBatch` micro-batches, as streaming `rowsBetween`
  * is unsupported — per SURVEY §2.10.
  */
object StreamOps {

  /** Windowed event-time aggregation with a watermark for late data:
    * counts + sums per (window, event_type).
    */
  def windowedCounts(events: DataFrame, tsCol: String, window_ : String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Micro-batch featurization via foreachBatch (SURVEY §2.10: the
    * sliding-window ops need exact trailing row counts, which streaming
    * window frames can't express — so each micro-batch runs the BATCH
    * featurizer and appends to a sink). `featurize` is any batch
    * DataFrame→DataFrame transform (e.g. Windows.slidingCausal ∘
    * Targets.multiHorizon).
    */
  def featurizeMicroBatches(stream: DataFrame,
      featurize: DataFrame => DataFrame,
      sinkPath: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        featurize(batch.toDF()).write.mode("append").parquet(sinkPath)
      }
      .start()

  case class Tick(userId: Long, ts: Long, value: Double)
  case class Position(userId: Long, nTicks: Long, total: Double, lastValue: Double)

  /** Stateful per-key accumulator via flatMapGroupsWithState — the
    * streaming analog of the backtest's per-series position state:
    * arbitrary state survives across micro-batches, one state object per
    * key, emitting an updated Position per batch that touches the key.
    */
  def trackPositions(ticks: Dataset[Tick]): Dataset[Position] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.userId)
      .flatMapGroupsWithState[Position, Position](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Tick], state: GroupState[Position]) =>
          val prev = state.getOption.getOrElse(Position(userId, 0L, 0.0, 0.0))
          // deterministic in-batch order
          val batch = rows.toSeq.sortBy(t => (t.ts, t.value))
          if (batch.isEmpty) Iterator.empty
          else {
            val next = batch.foldLeft(prev) { (p, t) =>
              Position(userId, p.nTicks + 1, p.total + t.value, t.value)
            }
            state.update(next)
            Iterator.single(next)
          }
      }
  }
}
