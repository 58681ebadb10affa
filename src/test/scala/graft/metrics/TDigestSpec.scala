package graft.metrics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TDigestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // heavily skewed data (log-normal-ish): exp(gaussian), two groups with
  // different scales — the shape where uniform-error sketches lose the tail
  private lazy val skewed = {
    val rnd = new scala.util.Random(13)
    val a = (0 until 20000).map(_ => ("a", math.exp(rnd.nextGaussian() * 1.5)))
    val b = (0 until 20000).map(_ => ("b", 100.0 * math.exp(rnd.nextGaussian() * 0.8)))
    (a ++ b).toDF("g", "v")
  }

  test("rank error vs the exact path stays sub-percent on skewed data") {
    val ps = Seq(0.5, 0.9, 0.99, 0.999)
    val est = TDigest.grouped(skewed, Seq("g"), "v", ps, compression = 100.0)
      .collect().map(r => r.getString(0) ->
        ps.map(p => r.getDouble(r.fieldIndex(Quantiles.label(p))))).toMap
    // rank of the estimate within the actual data = P(v <= est); compare to p
    Seq("a", "b").foreach { g =>
      val values = skewed.filter($"g" === g).select("v").as[Double].collect().sorted
      val n = values.length.toDouble
      ps.zip(est(g)).foreach { case (p, e) =>
        val rank = values.count(_ <= e) / n
        assert(math.abs(rank - p) <= 0.01,
          s"group $g p=$p est=$e achieved-rank=$rank (err ${math.abs(rank - p)})")
      }
    }
  }

  test("digest is mergeable: many partitions agree with one partition") {
    val ps = Seq(0.5, 0.99)
    val spread = TDigest.grouped(skewed.repartition(32), Seq("g"), "v", ps)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val values = skewed.filter($"g" === "a").select("v").as[Double].collect().sorted
    val n = values.length.toDouble
    // merged-from-32-partitions sketch still lands within the rank bound
    assert(math.abs(values.count(_ <= spread("a")._1) / n - 0.5) <= 0.01)
    assert(math.abs(values.count(_ <= spread("a")._2) / n - 0.99) <= 0.01)
  }

  test("compress bounds centroid count and keeps total weight") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(50000)(rnd.nextDouble() * 1000)
    val (m, w) = TDigest.compress(xs, Array.fill(xs.length)(1.0), 100.0)
    // one greedy pass over raw singletons packs within a small factor of
    // the ~2δ asymptote (tail capacities floor at weight 1); what matters
    // is O(compression), independent of the 50k inputs
    assert(m.length < 600, s"expected O(compression) centroids, got ${m.length}")
    assert(math.abs(w.sum - 50000.0) < 1e-6)
    // means stay sorted (quantile() relies on it)
    assert(m.toSeq == m.toSeq.sorted)
  }

  test("edge cases: empty, single value, constant column") {
    assert(TDigest.quantile(Array.empty, Array.empty, 0.5).isNaN)
    assert(TDigest.quantile(Array(42.0), Array(1.0), 0.99) == 42.0)
    val const = (0 until 1000).map(_ => ("c", 7.0)).toDF("g", "v")
    val out = TDigest.grouped(const, Seq("g"), "v", Seq(0.5, 0.99)).collect().head
    assert(out.getDouble(1) == 7.0 && out.getDouble(2) == 7.0)
  }

  test("all-NULL group survives with NULL quantiles (groupedApprox contract)") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", None), ("b", None))
      .toDF("g", "v")
    val out = TDigest.grouped(df, Seq("g"), "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out.keySet == Set("a", "b"), "group of only NULL values must not vanish")
    assert(out("b").isEmpty, "all-NULL group reports NULL quantiles")
    assert(out("a").contains(2.0))
    // identical shape from the approx face on the same frame
    val approx = Quantiles.groupedApprox(df, Seq("g"), "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(approx.keySet == out.keySet && approx("b").isEmpty)
  }

  test("sortedDigest (q113 face): deterministic, bounded, sorted, weight-complete") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(5000)(math.exp(rnd.nextGaussian())).sorted
    val (m1, w1) = TDigest.sortedDigest(xs, compression = 20.0)
    val (m2, w2) = TDigest.sortedDigest(xs, compression = 20.0)
    // bit-for-bit deterministic re-fold — the property the q113 oracle
    // replay rests on
    assert(java.util.Arrays.equals(m1, m2) && java.util.Arrays.equals(w1, w2))
    // the ascending construction keeps centroids sorted (quantile()'s
    // precondition) and conserves total weight
    assert(m1.zip(m1.tail).forall { case (a, b) => a <= b })
    assert(w1.sum == xs.length.toDouble)
    // bounded state: centroid count scales with compression, not n
    assert(m1.length < 200, s"centroids=${m1.length} for n=5000, c=20")
    val (m3, _) = TDigest.sortedDigest(xs, compression = 100.0)
    assert(m3.length > m1.length, "higher compression keeps more centroids")
  }

  test("sortedDigest quantiles stay rank-accurate against the exact path") {
    val rnd = new scala.util.Random(11)
    val xs = Array.fill(20000)(math.exp(rnd.nextGaussian() * 1.5)).sorted
    val (m, w) = TDigest.sortedDigest(xs, compression = 20.0)
    val n = xs.length.toDouble
    Seq(0.5, 0.9, 0.99).foreach { p =>
      val est = TDigest.quantile(m, w, p)
      val rank = xs.count(_ <= est) / n
      assert(math.abs(rank - p) < 0.02,
        s"p=$p: estimate $est has rank $rank (err ${math.abs(rank - p)})")
    }
    // single- and two-element folds hit quantile()'s clamp branches
    val (ms, ws) = TDigest.sortedDigest(Seq(42.0), 20.0)
    assert(TDigest.quantile(ms, ws, 0.99) == 42.0)
    val (m2, w2) = TDigest.sortedDigest(Seq(1.0, 3.0), 1e9) // force 2 centroids
    assert(TDigest.quantile(m2, w2, 0.0) == 1.0 && TDigest.quantile(m2, w2, 1.0) == 3.0)
  }

  test("digest columns survive a parquet round-trip bit-for-bit") {
    // the q117 warehouse pattern across QUERIES: per-grain digest
    // structs written to parquet and read back by a later session must
    // carry the IDENTICAL centroid lists (struct<array<double>,
    // array<double>> columns, no re-encode drift) — rollup equality
    // then follows from MergeInvarianceSpec's merge-tree pins, so the
    // round-trip is the only new variable this test isolates (comparing
    // rollups directly would re-test fold order, which is
    // merge-tree-specific by design for the t-digest)
    import org.apache.spark.sql.Encoders
    val withGrain = skewed.withColumn("grain",
      (monotonically_increasing_id() % 8).cast("long"))
    val mk = udaf(new TDigest.DigestAgg(100.0), Encoders.scalaDouble)
    // persist: the digests are merge-tree-specific, so the written copy
    // and the compared copy must come from ONE materialization
    val grains = withGrain.groupBy(col("g"), col("grain"))
      .agg(mk(col("v")).as("digest")).persist()
    val dir = java.nio.file.Files.createTempDirectory("td-rt")
    grains.write.mode("overwrite").parquet(dir.toString)
    def structs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("g"), col("grain"), col("digest.means"), col("digest.weights"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getSeq[Double](2).toList, r.getSeq[Double](3).toList))
      .sortBy(t => (t._1, t._2)).toSeq
    try {
      val live = structs(grains)
      val persisted = structs(spark.read.parquet(dir.toString))
      assert(live.nonEmpty && persisted == live)
    } finally {
      grains.unpersist()
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }
}
