package graft

import org.scalatest.funsuite.AnyFunSuite

/** Temp-fact lifecycle hygiene (r17, carried r15/r16 nit): q122/q123's
  * per-(session, dir) committed fact tables live under temp dirs that
  * `clearTradesCache` deletes — and, new, a JVM shutdown hook deletes
  * even when the host never calls the lifecycle API (interrupted
  * Bench, ad-hoc session).
  */
class TempFactHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("temp fact dirs are shutdown-hook-registered and deleted + evicted on cleanup") {
    val factPath = SparkEntry.q122Ingest(spark, "/root/testdata/sf0.001")
    assert(new java.io.File(factPath).exists)
    // the hook is live (remove returns true only for a registered
    // hook); re-register — this spec must not disarm the safety net
    assert(Runtime.getRuntime.removeShutdownHook(SparkEntry.tempFactCleanupHook),
      "temp-fact cleanup hook not registered")
    Runtime.getRuntime.addShutdownHook(SparkEntry.tempFactCleanupHook)
    SparkEntry.deleteTempFactDirs()
    assert(!new java.io.File(factPath).getParentFile.exists,
      "cleanup left the q122 temp fact on disk")
    // eviction is real: the next ingest rebuilds a fresh committed fact
    val again = SparkEntry.q122Ingest(spark, "/root/testdata/sf0.001")
    assert(again != factPath && new java.io.File(again).exists)
  }
}
