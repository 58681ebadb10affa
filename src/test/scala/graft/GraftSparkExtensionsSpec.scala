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
    // word_shingles rides the shared registry — both paths stay in sync
    val ws = s.sql("SELECT word_shingles(array('a','b','c'), 2) AS w")
      .as[Seq[String]].head()
    assert(ws == Seq("a b", "b c"))
    // wrong arity → named error, not IndexOutOfBounds
    val err = intercept[Exception] { s.sql("SELECT fft_mag(array(1.0d))").collect() }
    assert(!err.isInstanceOf[IndexOutOfBoundsException])
    // the round-4 additions ride the same registry
    val q = s.sql("SELECT quality_score('the cat sat', array('the')) AS q")
      .as[Double].head()
    assert(q > 0.0 && q <= 1.0)
    val gs = s.sql("SELECT gopher_stats('the cat sat', array('the')).n_words AS n")
      .as[Int].head()
    assert(gs == 3)
    val lb = s.sql(
      "SELECT lsh_bucket(array(1.0d, 0.0d), array(array(1.0d, 0.0d), array(0.0d, 1.0d))) AS b")
      .as[Long].head()
    assert(lb >= 0L && lb < 4L)
  }
}
