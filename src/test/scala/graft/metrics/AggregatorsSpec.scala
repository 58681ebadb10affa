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

  test("welford aggregator matches direct mean/std across partitions") {
    val xs = (1 to 1000).map(_.toDouble)
    val ds = spark.createDataset(xs).repartition(7)
    val (mean, std) = ds.select(Aggregators.welford.toColumn).head()
    assert(math.abs(mean - 500.5) < 1e-9)
    val expectedStd = math.sqrt(xs.map(x => (x - 500.5) * (x - 500.5)).sum / 1000)
    assert(math.abs(std - expectedStd) < 1e-9)
  }
}
