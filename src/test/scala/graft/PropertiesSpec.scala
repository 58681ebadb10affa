package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.feature.Windows
import graft.target.Targets
import graft.ts.TS

/** SURVEY §5(d) property tests: structural laws of the windowing kernel
  * checked over a seeded sweep of (n, ws, horizon) combos — including the
  * empty/exact-size edge cases the reference handles specially.
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val w = TS.seriesWindow(Seq("sid"), Seq("t"))
  private val rnd = new scala.util.Random(42)

  private def series(n: Int) =
    (0 until n).map(i => (1L, i.toLong, math.sin(i * 0.37) * 10 + i * 0.1))
      .toDF("sid", "t", "v")

  private def cases(k: Int)(gen: => Unit): Unit = (1 to k).foreach(_ => gen)

  test("property: causal count = max(0, n-ws); inclusive = max(0, n-ws+1)") {
    cases(15) {
      val n = rnd.nextInt(41)
      val ws = 2 + rnd.nextInt(11)
      assert(Windows.slidingCausal(series(n), Seq("v"), ws, w).count() ==
        math.max(0, n - ws).toLong)
      assert(Windows.slidingInclusive(series(n), Seq("v"), ws, w).count() ==
        math.max(0, n - ws + 1).toLong)
    }
  }

  test("property: target count = max(0, n - maxH); W3∘W6 composition count") {
    cases(12) {
      val n = rnd.nextInt(41)
      val maxH = 1 + rnd.nextInt(6)
      val ws = 2 + rnd.nextInt(9)
      val df = series(n)
      assert(Targets.multiHorizon(df, "v", 1 to maxH, w).count() ==
        math.max(0, n - maxH).toLong)
      val composed = Targets.multiHorizon(
        Windows.slidingCausal(df, Seq("v"), ws, w), "v", Seq(maxH), w).count()
      // causal windows exist at t = ws..n-1; the target trim then drops
      // the last maxH of those rows
      assert(composed == math.max(0, n - ws - maxH).toLong)
    }
  }

  test("property: overlapAdd ∘ slidingWindows ≈ identity everywhere") {
    cases(10) {
      val n = 5 + rnd.nextInt(36)
      val ws = 2 + rnd.nextInt(7)
      if (n >= ws) {
        val win = Windows.slidingInclusive(series(n), Seq("v"), ws, w)
          .select(($"t" - (ws - 1)).as("wid"), flatten($"window").as("win"))
        val rec = Windows.overlapAdd(win, "wid", "win")
          .orderBy("pos").select("value").as[Double].collect()
        val orig = series(n).orderBy("t").select("v").as[Double].collect()
        assert(rec.length == n)
        rec.zip(orig).foreach { case (r, o) => assert(math.abs(r - o) < 1e-9) }
      }
    }
  }

  test("property: denormalize ∘ normalize = id (z-score)") {
    cases(15) {
      val mean = rnd.nextDouble() * 100 - 50
      val std = 0.1 + rnd.nextDouble() * 20
      val xs = List.fill(10)(rnd.nextDouble() * 200 - 100)
      val err = xs.toDF("x").select(
        abs(TS.zDenorm(TS.zNorm($"x", mean, std), mean, std) - $"x").as("e"))
        .agg(max("e")).head().getDouble(0)
      assert(err < 1e-9 * (1 + math.abs(mean) + std))
    }
  }

  test("property: strided(k) keeps ceil(count/k) windows") {
    cases(12) {
      val n = 1 + rnd.nextInt(40)
      val stride = 1 + rnd.nextInt(5)
      val base = Windows.slidingInclusive(series(n), Seq("v"), 1, w)
      assert(Windows.strided(base, w, stride).count() ==
        ((n + stride - 1) / stride).toLong)
    }
  }

  test("property: slidingLong ≡ array form re-grouped, any (n, ws)") {
    cases(8) {
      val n = rnd.nextInt(30)
      val ws = 2 + rnd.nextInt(7)
      val df = series(n)
      val arr = Windows.slidingInclusive(df, Seq("v"), ws, w)
        .select($"t", flatten($"window")).as[(Long, Seq[Double])].collect().toMap
      val long = Windows.slidingLong(df, Seq("v"), ws, w)
        .groupBy("t").agg(sort_array(collect_list(struct($"step", $"v_w"))).as("xs"))
        .select($"t", expr("transform(xs, x -> x.v_w)"))
        .as[(Long, Seq[Double])].collect().toMap
      assert(long == arr, s"n=$n ws=$ws")
    }
  }

  test("property: as-of native ≡ composable under random NULL payloads and ties") {
    import graft.ts.AsOfJoin
    import graft.plans.AsOfJoinNative
    cases(6) {
      val nl = 5 + rnd.nextInt(20)
      val nr = 5 + rnd.nextInt(25)
      val left = (0 until nl).map(_ =>
        (rnd.nextInt(3).toLong, rnd.nextInt(30).toLong, rnd.nextInt(100)))
        .toDF("k", "ts", "tag")
      val right = (0 until nr).map(_ =>
        (rnd.nextInt(3).toLong, rnd.nextInt(30).toLong,
          if (rnd.nextBoolean()) Some(rnd.nextDouble()) else None))
        .toDF("k", "ts", "v")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select($"k", $"ts", $"tag", $"av")
          .as[(Long, Long, Int, Option[Double])].collect()
          .sortBy(r => (r._1, r._2, r._3, r._4.getOrElse(Double.NaN)))
      val native = rows(AsOfJoinNative.backward(left, right, "k", "ts", "v", "av"))
      val composed = rows(AsOfJoin.backward(left, right, Seq("k"), "ts", "v", "av"))
      assert(native.toSeq == composed.toSeq)
    }
  }

  test("property: json_deep_flatten leaf count = scalar+array leaves of nested maps") {
    graft.functions.GraftFunctions.register(spark)
    cases(8) {
      // random nested object: depth ≤3, ints/strings/arrays as leaves
      def gen(depth: Int): (String, Int) =
        if (depth == 0 || rnd.nextDouble() < 0.4) {
          rnd.nextInt(3) match {
            case 0 => (rnd.nextInt(1000).toString, 1)
            case 1 => ("\"s" + rnd.nextInt(100) + "\"", 1)
            case _ => ("[1," + rnd.nextInt(9) + "]", 1)
          }
        } else {
          val n = 1 + rnd.nextInt(4)
          val kids = (0 until n).map { i =>
            val (v, c) = gen(depth - 1)
            (s""""k$i":$v""", c)
          }
          ("{" + kids.map(_._1).mkString(",") + "}", kids.map(_._2).sum)
        }
      val (json, leaves) = gen(3)
      val got = Seq(Tuple1(json)).toDF("j")
        .select(size(graft.functions.GraftFunctions.json_deep_flatten($"j")).as("n"))
        .as[Int].head()
      val expected = if (json.startsWith("{")) leaves else 1
      assert(got == expected, s"json=$json")
    }
  }
}
