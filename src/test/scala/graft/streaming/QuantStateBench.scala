package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

/** Dev-only microbench for the streamingQuantiles group-step cycle
  * (diagnosing the SCALE-R15 10k-key anomaly): replays K keys × B
  * batches × T ticks/key through `quantilesGroupStep` with
  * TestGroupState — pure kernel + state encode cost, no Spark
  * machinery — to attribute per-batch wall time between the fold and
  * the streaming harness.
  */
object QuantStateBench {
  def main(args: Array[String]): Unit = {
    val keys = if (args.length > 0) args(0).toInt else 10000
    val batches = 4
    val ticksPerKeyPerBatch = if (args.length > 1) args(1).toInt else 50
    val agg = new graft.metrics.TDigest.QuantilesAgg(Seq(0.5, 0.99), 100.0, 256)
    val states = new Array[StreamOps.QuantState](keys)
    var tick = 0L
    (0 until batches).foreach { b =>
      val t0 = System.nanoTime()
      var k = 0
      while (k < keys) {
        val rows = (0 until ticksPerKeyPerBatch).map { i =>
          tick += 1
          StreamOps.QuantileTick("k" + k, tick,
            ((tick * 2654435761L) % 100000).toDouble)
        }
        val st = TestGroupState.create[StreamOps.QuantState](
          if (states(k) == null) Optional.empty() else Optional.of(states(k)),
          GroupStateTimeout.NoTimeout, 1000L, Optional.empty[Long],
          hasTimedOut = false)
        StreamOps.quantilesGroupStep("k" + k, rows.iterator, st, agg,
          StreamOps.NeverEvict).foreach(_ => ())
        states(k) = st.get
        k += 1
      }
      println(f"batch $b: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(centroids key0=${states(0).means.length})")
    }
  }
}
