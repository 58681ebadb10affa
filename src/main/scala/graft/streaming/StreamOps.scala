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

  /** Streaming exact dedup — the streaming face of `Dedup.exactDedup`:
    * drop rows whose key (e.g. a content digest) was already seen, with
    * state bounded by the watermark via `dropDuplicatesWithinWatermark`
    * (duplicates in a training-data firehose arrive close together —
    * re-crawls and mirror bursts — so a watermark-bounded horizon is the
    * 100 TB-viable contract; unbounded exact dedup belongs to the batch
    * compaction pass).
    */
  def streamingExactDedup(events: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  case class SessionEvent(userId: Long, ts: java.sql.Timestamp, value: Double)
  case class OpenSession(start: Long, end: Long, n: Long, sum: Double)
  case class ClosedSession(userId: Long, sessionStartUs: Long, sessionEndUs: Long,
      nEvents: Long, sumValue: Double)

  /** Streaming sessionization — the streaming analog of the batch
    * gap-session query (q58/`TS.sessionId`): per-user sessions close
    * `gap` after their last event, emitted exactly once via
    * `flatMapGroupsWithState` + EventTimeTimeout. The watermark both
    * bounds state (closed sessions are dropped) and drives the timeout
    * clock, so state size is O(open sessions), not O(history) — the
    * property that keeps this runnable forever on an unbounded stream.
    * Events later than `watermark` are dropped (standard streaming
    * semantics); in-batch events are sorted per key, so out-of-order
    * WITHIN the watermark is handled.
    */
  def sessionize(events: Dataset[SessionEvent], gap: java.time.Duration,
      watermark: String): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gap.toMillis
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          def close(s: OpenSession) =
            ClosedSession(userId, s.start, s.end, s.n, s.sum)
          if (rows.isEmpty && state.hasTimedOut) {
            // no event within `gap` of the session end → emit and clear
            val out = state.getOption.map(close).toList
            state.remove()
            out.iterator
          } else {
            val batch = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
            val closed = scala.collection.mutable.ListBuffer.empty[ClosedSession]
            var open = state.getOption
            batch.foreach { e =>
              val tMs = e.ts.getTime
              open = open match {
                case Some(s) if tMs - s.end / 1000 > gapMs =>
                  closed += close(s)
                  Some(OpenSession(tMs * 1000, tMs * 1000, 1, e.value))
                case Some(s) =>
                  Some(OpenSession(s.start, math.max(s.end, tMs * 1000),
                    s.n + 1, s.sum + e.value))
                case None =>
                  Some(OpenSession(tMs * 1000, tMs * 1000, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end / 1000 + gapMs)
            }
            closed.iterator
          }
      }
  }

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
