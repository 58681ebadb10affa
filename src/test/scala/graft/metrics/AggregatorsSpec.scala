package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AggregatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("softDtw: zero for identical series, grows with misalignment") {
    val a = Array(0.0, 1.0, 2.0, 1.0, 0.0)
    val same = Aggregators.softDtw(a, a, gamma = 0.01)
    assert(same < 0.05) // soft-min leaks a little; near zero
    val shifted = Aggregators.softDtw(a, Array(0.0, 0.0, 1.0, 2.0, 1.0), gamma = 0.01)
    val far = Aggregators.softDtw(a, Array(5.0, 5.0, 5.0, 5.0, 5.0), gamma = 0.01)
    assert(same < shifted && shifted < far)
  }

  test("mmdGaussian: zero for identical samples, positive for shifted") {
    val x = Array.tabulate(64)(i => math.sin(i * 0.1))
    val y = x.map(_ + 3.0)
    assert(math.abs(Aggregators.mmdGaussian(x, x, 1.0)) < 1e-12)
    assert(Aggregators.mmdGaussian(x, y, 1.0) > 0.5)
  }

  test("softDtwByKey: distributed per-series scores match the scalar kernel") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val a = Array(0.0, 1.0, 2.0, 1.0, 0.0)
    val b = Array(0.0, 0.0, 1.0, 2.0, 1.0)
    // two series, shuffled row order, spread over partitions
    val rows = (for {
      (k, bs) <- Seq(("s1", a), ("s2", b))
      t <- a.indices
    } yield (k, t.toLong, a(t), bs(t)))
    val df = scala.util.Random.shuffle(rows).toDF("k", "t", "av", "bv").repartition(5)
    val out = Aggregators.softDtwByKey(df, Seq("k"), "t", "av", "bv", gamma = 0.01)
      .orderBy("k").select($"k", $"soft_dtw").as[(String, Double)].collect().toSeq
    assert(out.map(_._1) == Seq("s1", "s2"))
    assert(math.abs(out(0)._2 - Aggregators.softDtw(a, a, 0.01)) < 1e-12)
    assert(math.abs(out(1)._2 - Aggregators.softDtw(a, b, 0.01)) < 1e-12)
    // gap mask: NULL rows are skipped, not NPE'd — result equals the
    // kernel over only the valid rows
    val withNull = Seq(
      ("s", 0L, Some(1.0), Some(1.0)), ("s", 1L, None, Some(2.0)),
      ("s", 2L, Some(3.0), Some(3.0)))
      .toDF("k", "t", "av", "bv")
    val masked = Aggregators.softDtwByKey(withNull, Seq("k"), "t", "av", "bv", 0.01)
      .select($"soft_dtw").as[Double].head()
    assert(math.abs(masked -
      Aggregators.softDtw(Array(1.0, 3.0), Array(1.0, 3.0), 0.01)) < 1e-12)
  }

  test("welford aggregator matches direct mean/std across partitions") {
    val xs = (1 to 1000).map(_.toDouble)
    val ds = spark.createDataset(xs).repartition(7)
    val (mean, std) = ds.select(Aggregators.welford.toColumn).head()
    assert(math.abs(mean - 500.5) < 1e-9)
    val expectedStd = math.sqrt(xs.map(x => (x - 500.5) * (x - 500.5)).sum / 1000)
    assert(math.abs(std - expectedStd) < 1e-9)
  }
}
