package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SkewJoin/RangeJoin contracts: both must return EXACTLY the rows of
  * the naive plans they replace (plain equi-join / nested-loop range
  * predicate) — the rewrite buys distribution, never semantics.
  */
class JoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("saltedInner == plain inner join, duplicates and hot key included") {
    val rnd = new scala.util.Random(7)
    // hot key 1 carries half the fact side, like a sentinel id would
    val left = (1 to 400).map { i =>
      val k = if (i % 2 == 0) 1L else rnd.nextInt(40).toLong
      (k, s"l$i")
    }.toDF("k", "lv").repartition(5)
    val right = (0L to 40L).flatMap(k => Seq((k, s"r${k}a"), (k, s"r${k}b")))
      .toDF("k", "rv").repartition(3)
    val plain = left.join(right, Seq("k"))
    val salted = SkewJoin.saltedInner(left, right, Seq("k"), salts = 8)
    assert(salted.columns.toSeq === plain.columns.toSeq)
    assert(sortedRows(salted) === sortedRows(plain))
  }

  test("byte-identical duplicate rows spread across salts") {
    // the motivating hot keys (empty-text digest, sentinel ids) often
    // come from IDENTICAL rows; a content-only salt collapses them onto
    // one reducer — the positional component must spread them
    val dupes = Seq.fill(512)((1L, "same")).toDF("k", "lv").repartition(4)
    val salts = dupes.select(SkewJoin.saltExpr(Seq(col("k"), col("lv")), 8))
      .distinct().count()
    assert(salts >= 6, s"identical rows landed on only $salts of 8 salts")
  }

  test("saltedInner: composite keys and salts=1 degenerate") {
    val left = Seq((1L, "x", 10.0), (1L, "y", 20.0), (2L, "x", 30.0))
      .toDF("a", "b", "v")
    val right = Seq((1L, "x", "m1"), (2L, "x", "m2"), (3L, "z", "m3"))
      .toDF("a", "b", "tag")
    val plain = left.join(right, Seq("a", "b"))
    assert(sortedRows(SkewJoin.saltedInner(left, right, Seq("a", "b"), 4)) ===
      sortedRows(plain))
    assert(sortedRows(SkewJoin.saltedInner(left, right, Seq("a", "b"), 1)) ===
      sortedRows(plain))
  }

  test("pointInInterval == nested-loop range join across bucket widths") {
    val rnd = new scala.util.Random(11)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextInt(200).toLong))
      .toDF("pid", "p").repartition(4)
    val ivs = (1 to 60).map { i =>
      val s = rnd.nextInt(190).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(25)) // non-empty [s, e)
    }.toDF("iid", "s", "e").repartition(3)
    val naive = points.join(ivs, col("p") >= col("s") && col("p") < col("e"))
      .select("pid", "iid")
    for (w <- Seq(1L, 4L, 16L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, ivs, "p", "s", "e", w)
        .select("pid", "iid")
      assert(sortedRows(got) === sortedRows(naive), s"bucketWidth=$w")
    }
  }

  test("pointInInterval: negative coordinates floor-divide correctly") {
    // fdiv must FLOOR (toward -inf), not truncate toward zero — a
    // truncating division puts p=-1 and p=+1 in the same bucket 0 and
    // breaks the exactly-one-bucket-per-point invariant
    val rnd = new scala.util.Random(17)
    val points = (1 to 200).map(i => (i.toLong, rnd.nextInt(200).toLong - 100))
      .toDF("pid", "p")
    val ivs = (1 to 50).map { i =>
      val s = rnd.nextInt(190).toLong - 95
      (i.toLong, s, s + 1 + rnd.nextInt(20))
    }.toDF("iid", "s", "e")
    val naive = points.join(ivs, col("p") >= col("s") && col("p") < col("e"))
      .select("pid", "iid")
    for (w <- Seq(3L, 7L)) {
      val got = RangeJoin.pointInInterval(points, ivs, "p", "s", "e", w)
        .select("pid", "iid")
      assert(sortedRows(got) === sortedRows(naive), s"bucketWidth=$w (negative coords)")
    }
  }

  test("AQE splits observable sort-merge skew (the boundary salting is NOT for)") {
    // SkewJoin's doc claims AQE handles skew it can see at a shuffle
    // boundary; verify that claim so the salted-join scope stays honest
    val prev = Map(
      "spark.sql.adaptive.enabled" -> spark.conf.getOption("spark.sql.adaptive.enabled"),
      "spark.sql.adaptive.skewJoin.enabled" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force sort-merge
      val hot = (1 to 30000).map(i => (1L, s"payload_$i")) ++ // one giant key
        (1 to 300).map(i => (i.toLong + 1, s"p$i"))
      val left = hot.toDF("k", "lv").repartition(5)
      val right = (1L to 301L).map(k => (k, s"r$k")).toDF("k", "rv")
      val joined = left.join(right, Seq("k"))
      // collect() drives THIS DataFrame's queryExecution, so its AQE
      // plan is final afterwards (count() would plan a separate query)
      assert(joined.collect().length === 30300)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed sort-merge join:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("pointInInterval: empty intervals match nothing; boundaries half-open") {
    val points = Seq((1L, 10L), (2L, 19L), (3L, 20L)).toDF("pid", "p")
    val ivs = Seq((1L, 10L, 20L), (2L, 15L, 15L), (3L, 30L, 20L))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, ivs, "p", "s", "e", 7L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // start inclusive (p=10), end exclusive (p=20 out); empty/inverted
    // intervals (iid 2, 3) match nothing
    assert(got.toSeq === Seq((1L, 1L), (2L, 1L)))
  }
}
