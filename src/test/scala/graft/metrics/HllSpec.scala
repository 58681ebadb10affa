package graft.metrics

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The hand-rolled HLL's three load-bearing properties (see
  * `Hll`'s scaladoc): accuracy within the advertised rsd across
  * cardinality regimes (linear-counting AND raw-estimator), lossless /
  * idempotent register-max merge (bit-identical registers, not merely
  * close estimates), and Spark-aggregate equivalence to the driver
  * fold.
  */
class HllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val P = 12
  private val rsd = Hll.rsd(P)

  private def sketchOf(ids: Iterable[Long]): Array[Byte] = {
    val r = Hll.emptyRegs(P)
    ids.foreach(Hll.add(r, P, _))
    r
  }

  test("estimate accuracy across regimes: n = 10 … 200k within 6·rsd·n + 1") {
    // 200k at p=12 is ~50 values/register — deep in the raw-estimator
    // regime; 10 and 1000 sit in linear counting. One deterministic id
    // stream (the hash does the mixing).
    Seq(10, 1000, 20000, 200000).foreach { n =>
      val est = Hll.estimate(sketchOf((1L to n.toLong).map(_ * 2654435761L)))
      val bound = 6.0 * rsd * n + 1.0
      assert(math.abs(est - n) <= bound,
        s"n=$n est=$est err=${math.abs(est - n)} bound=$bound")
    }
  }

  test("tiny cardinalities are exact (linear counting, no collisions)") {
    (0 to 20).foreach { n =>
      val est = Hll.estimate(sketchOf((1L to n.toLong).map(_ + 7L)))
      assert(est == n, s"n=$n est=$est")
    }
  }

  test("merge is lossless, commutative, and idempotent on REGISTERS") {
    val a = sketchOf(1L to 5000L)
    val b = sketchOf(3000L to 9000L) // overlapping
    val direct = sketchOf((1L to 5000L) ++ (3000L to 9000L))
    val ab = Hll.merged(a, b)
    val ba = Hll.merged(b, a)
    assert(java.util.Arrays.equals(ab, direct), "merge(a,b) != sketch(a ∪ b)")
    assert(java.util.Arrays.equals(ba, direct), "merge not commutative")
    // idempotence: re-merging either input is a no-op
    assert(java.util.Arrays.equals(Hll.merged(ab, a), ab), "not idempotent")
    assert(java.util.Arrays.equals(Hll.merged(ab, ab), ab), "self-merge not a no-op")
  }

  test("add is duplicate-insensitive: the register array depends on the SET") {
    val once = sketchOf(1L to 1000L)
    val thrice = sketchOf((1L to 1000L) ++ (1L to 1000L) ++ (1000L to 1L by -1L))
    assert(java.util.Arrays.equals(once, thrice))
  }

  test("DistinctAgg over Spark == driver fold, at 4 and 1 partitions") {
    import spark.implicits._
    val ids = (1L to 30000L).map(i => (i % 7, i * 31L)) // 7 groups
    val expect = ids.groupBy(_._1).map { case (g, rows) =>
      g -> Hll.estimate(sketchOf(rows.map(_._2)))
    }
    Seq(4, 1).foreach { parts =>
      val agg = udaf(new Hll.DistinctAgg(P), Encoders.scalaLong)
      val got = spark.createDataset(ids).toDF("g", "id")
        .repartition(parts)
        .groupBy(col("g")).agg(agg(col("id")).as("est"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"parts=$parts")
    }
  }

  test("SketchAgg → MergeSketchesAgg rollup == one-level DistinctAgg, bit-path") {
    import spark.implicits._
    val rows = (1L to 20000L).map(i => (i % 5, i % 40, i * 131L)) // (key, grain, id)
    val df = spark.createDataset(rows).toDF("g", "grain", "id")
    val mk = udaf(new Hll.SketchAgg(P), Encoders.scalaLong)
    val roll = udaf(new Hll.MergeSketchesAgg(P), Encoders.product[Hll.Sketch])
    val rolled = df.groupBy(col("g"), col("grain")).agg(mk(col("id")).as("sk"))
      .groupBy(col("g")).agg(roll(col("sk.regs")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = udaf(new Hll.DistinctAgg(P), Encoders.scalaLong)
    val oneLevel = df.groupBy(col("g")).agg(direct(col("id")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rolled == oneLevel)
  }

  test("MergeSketchesAgg must not mutate a caller-retained input array") {
    val a = sketchOf(1L to 100L)
    val keep = java.util.Arrays.copyOf(a, a.length)
    val agg = new Hll.MergeSketchesAgg(P)
    var buf = agg.zero
    buf = agg.reduce(buf, Hll.Sketch(a))
    buf = agg.reduce(buf, Hll.Sketch(sketchOf(200L to 900L)))
    assert(java.util.Arrays.equals(a, keep), "input sketch mutated by rollup")
  }

  test("register width mismatch is rejected loudly") {
    intercept[IllegalArgumentException] {
      Hll.mergeInto(Hll.emptyRegs(12), Hll.emptyRegs(11))
    }
  }

  test("sketch columns survive a parquet round-trip: persisted rollup == live rollup") {
    // the warehouse pattern q119 demonstrates in-plan, across QUERIES:
    // ingest writes per-grain sketches to a parquet table; a later
    // session reads them back and rolls up — the estimate must equal
    // the one-level aggregate over raw values exactly (binary column,
    // lossless merge, no re-encode drift)
    import spark.implicits._
    val rows = (1L to 20000L).map(i => (i % 5, i % 40, i * 131L))
    val df = spark.createDataset(rows).toDF("g", "grain", "id")
    val mk = udaf(new Hll.SketchAgg(P), Encoders.scalaLong)
    val dir = java.nio.file.Files.createTempDirectory("hll-rt")
    try {
      df.groupBy(col("g"), col("grain")).agg(mk(col("id")).as("sk"))
        .write.mode("overwrite").parquet(dir.toString)
      val roll = udaf(new Hll.MergeSketchesAgg(P), Encoders.product[Hll.Sketch])
      val persisted = spark.read.parquet(dir.toString)
        .groupBy(col("g")).agg(roll(col("sk.regs")).as("est"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val direct = udaf(new Hll.DistinctAgg(P), Encoders.scalaLong)
      val live = df.groupBy(col("g")).agg(direct(col("id")).as("est"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(persisted == live)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }
}
