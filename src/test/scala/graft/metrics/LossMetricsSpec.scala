package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ts.TS

class LossMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("huberLoss: quadratic inside delta, linear outside") {
    val df = Seq((0.0, 0.5), (0.0, 3.0)).toDF("target", "pred") // errors .5, 3
    val got = df.agg(Metrics.huberLoss($"pred", $"target", 1.0)).head().getDouble(0)
    // (.5*.25 + 1*(3-.5)) / 2
    assert(math.abs(got - (0.125 + 2.5) / 2) < 1e-12)
  }

  test("pearsonStructural: 0 for perfect prediction, grows with decorrelation") {
    val perfect = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("target", "pred")
    val p = perfect.agg(Metrics.pearsonStructural($"pred", $"target", 0.5)).head().getDouble(0)
    assert(math.abs(p) < 1e-9)
    val anti = Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("target", "pred")
    val a = anti.agg(Metrics.pearsonStructural($"pred", $"target", 0.5)).head().getDouble(0)
    assert(a > 1.0) // MAE 4/3 + 0.5·(1−(−1)) = 4/3 + 1
  }

  test("trendSigmaLoss: direction flip ×2.5, variance collapse penalized") {
    import org.apache.spark.sql.functions._
    // s_ok: pred tracks target (same trend, same spread) → loss = huber only
    // s_dir: pred trend reversed → base ×2.5
    // s_flat: pred constant (variance collapse) → +λ·σ_true
    val target = Seq(0.0, 1.0, 2.0, 3.0)
    val rows =
      target.zipWithIndex.map { case (v, i) => ("s_ok", i.toLong, v, v + 0.1) } ++
      target.zipWithIndex.map { case (v, i) => ("s_dir", i.toLong, v, 3.0 - v) } ++
      target.zipWithIndex.map { case (v, i) => ("s_flat", i.toLong, v, 1.5) }
    val df = rows.toDF("k", "t", "target", "pred")
    val out = Metrics.trendSigmaLoss(df, Seq("k"), "t", "pred", "target",
      lambda = 0.1, delta = 1.0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("trend_sigma_loss")).toMap
    val sigTrue = math.sqrt(target.map(v => (v - 1.5) * (v - 1.5)).sum / 4)
    // s_ok: errors all 0.1 → huber 0.5·0.01; same direction; same σ
    assert(math.abs(out("s_ok") - 0.5 * 0.01) < 1e-12)
    // s_dir: errors |3-2v-v|: (3,1,1,3) → huber (2.5,0.5,0.5,2.5)/4 = 1.5; ×2.5
    assert(math.abs(out("s_dir") - 1.5 * 2.5) < 1e-12,  s"got ${out("s_dir")}")
    // s_flat: errors (1.5,0.5,0.5,1.5) → huber (1.0,0.125,0.125,1.0)/4;
    // dy_pred = 0 → sign differs → ×2.5; + 0.1·(σ_true − 0)
    assert(math.abs(out("s_flat") - (2.25 / 4 * 2.5 + 0.1 * sigTrue)) < 1e-12,
      s"got ${out("s_flat")}")
  }

  test("positionalEncoding: shape and PE(0) = [0,1,0,1,...]") {
    val pe = TS.positionalEncoding(spark, maxLen = 16, dModel = 8)
    assert(pe.count() == 16)
    val r0 = pe.filter($"pos" === 0L).select("encoding").as[Seq[Double]].head()
    assert(r0.length == 8)
    r0.zipWithIndex.foreach { case (v, j) =>
      assert(v == (if (j % 2 == 0) 0.0 else 1.0))
    }
  }

  test("M2 compositeIncentiveLoss: incentive regimes match losses.py:354-407") {
    // k=worse: pred error (0.6) > naive error (0.3)  → incentive 1
    // k=half : pred error exactly half of naive      → incentive 500.5
    // k=exact: pred ≡ target                         → incentive 1000
    val rows =
      Seq.tabulate(4)(i => ("worse", i, 0.3 * (if (i % 2 == 0) 1 else -1), 0.9 * (if (i % 2 == 0) 1 else -1))) ++
      Seq.tabulate(4)(i => ("half", i, 0.4 * (if (i % 2 == 0) 1 else -1), 0.6 * (if (i % 2 == 0) 1 else -1))) ++
      Seq.tabulate(4)(i => ("exact", i, 0.5, 0.5))
    val df = rows.toDF("k", "t", "target", "pred")
    val out = Metrics.compositeIncentiveLoss(df, Seq("k"), Seq("t"),
      "pred", "target")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("incentive"), r.getAs[Double]("huber_raw"),
          r.getAs[Double]("composite_loss"))).toMap
    assert(out("worse")._1 == 1.0)
    assert(math.abs(out("worse")._3 - out("worse")._2) < 1e-12) // composite = huber
    // ratio = 0.2/(0.4+1e-7) ≈ 0.5 → incentive ≈ 1000 − 999·0.5 = 500.5
    assert(math.abs(out("half")._1 - 500.5) < 1e-3, s"got ${out("half")._1}")
    assert(out("exact")._1 == 1000.0)
    assert(out("exact")._3 == 0.0)
  }

  test("M2 compositeIncentiveLoss: MMD term separates shifted distributions") {
    val rnd = new scala.util.Random(3)
    val aligned = Seq.tabulate(64)(i => ("same", i, rnd.nextGaussian(), rnd.nextGaussian()))
    val shifted = Seq.tabulate(64)(i => ("shift", i, rnd.nextGaussian(), rnd.nextGaussian() + 5.0))
    val df = (aligned ++ shifted).toDF("k", "t", "target", "pred")
    val out = Metrics.compositeIncentiveLoss(df, Seq("k"), Seq("t"),
      "pred", "target", mmdLambda = 1.0, sigma = 1.0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("mmd")).toMap
    assert(out("same") < 0.3, s"same-distribution MMD should be small: ${out("same")}")
    assert(out("shift") > 1.0, s"shifted MMD should be large: ${out("shift")}")
  }
}
