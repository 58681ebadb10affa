package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSparkExtensionsSpec extends AnyFunSuite {
  lazy val base = TestSpark.spark

  test("extensions session exposes native SQL functions and the as-of strategy") {
    // a derived session over the shared context with extensions applied
    // (builder-time extensions don't attach when a session already exists)
    val s = org.apache.spark.sql.GraftColumnBridge.sessionWithExtensions(
      base.sparkContext, new GraftSparkExtensions()(_))
    import s.implicits._
    val m = s.sql("SELECT fft_mag(array(1.0d, 0.0d, -1.0d, 0.0d), 2) AS m")
      .as[Seq[Double]].head()
    assert(m.length == 2 && math.abs(m(1) - 2.0) < 1e-12)
    val sig = s.sql(
      "SELECT minhash_shingle_sigs(array('a','b','c','d'), 2, 3) AS s")
      .as[Seq[String]].head()
    assert(sig.length == 3 && sig.forall(_.length == 32))
    val sh = s.sql("SELECT simhash64(array('x','y')) AS h").as[Long].head()
    assert(sh != 0L)
    assert(s.sessionState.planner.extraPlanningStrategies
      .exists(_.getClass.getName.contains("AsOfJoinStrategy")))
    // the shared base session is unaffected (no leakage between sessions)
    intercept[Exception] {
      base.sql("SELECT fft_mag_not_registered_here(array(1.0d), 1)").collect()
    }
  }
}
