package graft.metrics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.metrics.Sketches.MisraGriesAgg

/** Misra–Gries sketch laws and the exactness of the sketch-prune-verify
  * heavy-hitter query against the plain GROUP BY/HAVING it replaces.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def zipf(n: Int, seed: Int): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      // crude zipf-ish: heavy mass on small ids
      math.min(99L, math.floor(math.pow(1.0 / (rnd.nextDouble() + 1e-9), 0.7)).toLong)
    }
  }

  test("MG superset guarantee: every key with freq > n/(k+1) is tracked") {
    val data = zipf(20000, 3)
    val exact = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (k <- Seq(4, 16, 64)) {
      val agg = new MisraGriesAgg(k)
      val summary = data.toDF("v").repartition(7).as[Long].select(agg.toColumn).head()
      assert(summary.n === data.size.toLong)
      val mustHave = exact.filter(_._2 > data.size.toLong / (k + 1)).keySet
      assert(mustHave.subsetOf(summary.keys.toSet),
        s"k=$k missing ${mustHave.diff(summary.keys.toSet)}")
      assert(summary.keys.length <= k)
      // residuals never exceed true counts
      summary.keys.zip(summary.residuals).foreach { case (key, r) =>
        assert(r <= exact(key), s"k=$k key=$key residual $r > true ${exact(key)}")
      }
    }
  }

  test("heavyHitters == GROUP BY HAVING, skewed and near-uniform data") {
    val skewed = zipf(30000, 5).toDF("user").repartition(8)
    val uniform = (1 to 5000).map(i => (i % 97).toLong).toDF("user").repartition(8)
    for ((df, denom, k) <- Seq((skewed, 20L, 64), (skewed, 3L, 8),
        (uniform, 96L, 128), (uniform, 120L, 256))) {
      val n = df.count()
      val exact = df.groupBy("user").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * denom >= n)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val got = Sketches.heavyHitters(df, "user", k, denom)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === exact, s"denom=$denom k=$k")
    }
  }

  test("heavyHitters: empty input yields empty result with the schema") {
    val empty = Seq.empty[Long].toDF("user")
    val out = Sketches.heavyHitters(empty, "user", 8, 4L)
    assert(out.columns.toSeq === Seq("user", "cnt"))
    assert(out.count() === 0L)
  }

  test("heavyHitters rejects denom outside the guarantee") {
    val df = Seq(1L, 2L).toDF("user")
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(df, "user", 8, 9L) // denom >= k+1: no guarantee
    }
  }

  test("heavyHitters rejects non-integral keys (cast would alias '1' and '01')") {
    val strs = Seq("1", "01", "1").toDF("user")
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(strs, "user", 8, 2L)
    }
  }
}
