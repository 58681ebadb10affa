package graft.backtest

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ml.GeneticSearch
import graft.pipeline.StrategyOptGoldenRun

/** The `optimizer_ga.py` face: GA over backtest strategy parameters.
  * The heavy test re-runs the committed golden's exact seeded search and
  * diffs the champion against `golden/backtest/` — the artifact is
  * regenerable, not decorative.
  */
class StrategyOptimizerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import StrategyOptimizer._

  test("decode maps the unit cube onto the optimizer_ga.py bounds and derives Params") {
    val base = Backtest.Params()
    val lo = decode(Vector.fill(6)(0.0), base)
    val hi = decode(Vector.fill(6)(1.0), base)
    assert(lo.decoded("profit_threshold") == 1.0 && hi.decoded("profit_threshold") == 20.0)
    assert(lo.decoded("tp_multiplier") == 0.8 && hi.decoded("tp_multiplier") == 1.2)
    assert(lo.decoded("sl_multiplier") == 1.5 && hi.decoded("sl_multiplier") == 3.0)
    assert(lo.decoded("rel_volume") == 0.01 && hi.decoded("rel_volume") == 0.1)
    assert(lo.decoded("lower_rr") == 0.3 && hi.decoded("upper_rr") == 3.0)
    // derived state-machine params: threshold direct, tp/sl scaled
    assert(lo.params.threshold == 1.0 && lo.params.tp == 0.8 * base.tp &&
      hi.params.sl == 3.0 * base.sl)
    // out-of-range genes clip, wrong arity is rejected
    assert(decode(Vector(2.0, -1, 0, 0, 0, 0), base).decoded("profit_threshold") == 20.0)
    intercept[IllegalArgumentException] { decode(Vector(0.5), base) }
  }

  test("orderSize replays compute_size: RR interpolation with the cash cap") {
    val base = Backtest.Params()
    def strat(tpM: Double, slM: Double, relV: Double) =
      decode(Vector(0.0,
        (tpM - 0.8) / 0.4, (slM - 1.5) / 1.5,
        (relV - 0.01) / 0.09, 0.0, 0.0), base) // lower_rr=0.3, upper_rr=1.5
    // rr = tp/sl = (1.2*5)/(1.5*3) = 4/3, inside (0.3, 1.5) → interpolated
    val mid = strat(1.2, 1.5, 0.1)
    val expected = 10000.0 + (4.0 / 3 - 0.3) / (1.5 - 0.3) * (1000000.0 - 10000.0)
    assert(math.abs(orderSize(mid) - expected) < 1e-6)
    // rr = (0.8*5)/(3*3) = 4/9 ≈ 0.44 → still interpolated, near the floor
    assert(orderSize(strat(0.8, 3.0, 0.1)) < orderSize(mid))
    // cash cap binds: rel_volume 0.01 caps at 10000 * 0.01 * 1000 = 100k
    assert(orderSize(strat(1.2, 1.5, 0.01)) == 100000.0)
    // rr below lower threshold → min volume (never cash-capped at these genes)
    val floorS = decode(Vector(0.0, 0.0, 1.0, 1.0, 1.0, 1.0), base) // rr=4/9 < lower_rr=1.0
    assert(orderSize(floorS) == 10000.0)
  }

  test("evaluate: cash profit = order size × exact-decimal price profit") {
    import spark.implicits._
    val base = Backtest.Params()
    // genes: threshold=1, tp_mult=1, sl_mult=1 → tp=5, sl=3
    val s = decode(Vector(0.0, 0.5, 1.0 / 3, 0.5, 0.0, 0.0), base)
    val bars = Seq(
      Backtest.Bar("s", 1, 100.0, 100.0, 100.0, 100.0, 103.0), // open long @100
      Backtest.Bar("s", 2, 101.0, 106.0, 101.0, 101.0, 101.0)  // TP at 105
    ).toDS()
    val e = evaluate(bars, s)
    assert(e.nTrades == 1 && e.priceProfit == 5.0)
    assert(e.cashProfit == orderSize(s) * 5.0)
    // empty feed: zero trades, zero profit (NULL decimal sum guarded)
    val none = evaluate(spark.emptyDataset[Backtest.Bar], s)
    assert(none.nTrades == 0 && none.cashProfit == 0.0)
  }

  // ONE shared seeded re-run of the committed golden's search (the
  // expensive piece — every assertion below reads it)
  private lazy val rerun: Result = StrategyOptimizer.optimize(
    StrategyOptGoldenRun.fixtureBars(spark),
    base = Backtest.Params(), cfg = StrategyOptGoldenRun.GaConfig)

  test("optimize: seeded search is deterministic, memoized, and profit-monotone under elitism") {
    val r = rerun
    // elite carry-over + deterministic fitness → the running max never falls
    val maxes = r.stats.map(_.maxProfit)
    assert(maxes.zip(maxes.tail).forall { case (a, b) => b >= a },
      s"per-generation max profit regressed: $maxes")
    assert(r.bestEval.cashProfit == maxes.max,
      "champion must be the global best under elitism")
    // memoization: elites are re-scored each generation without re-firing jobs
    assert(r.uniqueEvaluations < r.evaluations,
      s"expected memo hits (${r.uniqueEvaluations} unique of ${r.evaluations})")
    // the search found something better than the default strategy
    val default = evaluate(StrategyOptGoldenRun.fixtureBars(spark),
      decode(Vector.fill(6)(0.5), Backtest.Params()))
    assert(r.bestEval.cashProfit > default.cashProfit,
      s"champion ${r.bestEval.cashProfit} did not beat mid-cube ${default.cashProfit}")
  }

  test("committed golden artifacts replay exactly from the seeded search") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val params = mapper.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get("golden/backtest/graft_backtest_ga_optimization_parameters.json")))
    val champ = championParams(rerun)
    assert(params.size() == champ.size, "parameter key set drifted")
    champ.foreach { case (k, v) =>
      assert(params.has(k), s"committed parameters missing $k")
      assert(params.get(k).asDouble() == v,
        s"$k drifted: committed ${params.get(k).asDouble()} vs re-run $v")
    }
    val stats = mapper.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get("golden/backtest/graft_backtest_ga_optimization_stats.json")))
    assert(stats.get("optimizer_type").asText() == "ga_backtest")
    assert(stats.get("champion_profit").asDouble() == rerun.bestEval.cashProfit)
    assert(stats.get("champion_n_trades").asLong() == rerun.bestEval.nTrades)
    assert(stats.get("unique_candidates_evaluated").asInt() == rerun.uniqueEvaluations)
    val hist = stats.get("history")
    assert(hist.size() == rerun.stats.size)
    rerun.stats.zipWithIndex.foreach { case (g, i) =>
      assert(hist.get(i).get("max_profit").asDouble() == g.maxProfit &&
        hist.get(i).get("avg_profit").asDouble() == g.avgProfit)
    }
  }

  // ONE shared seeded walk-forward run (the committed walk-forward
  // golden's exact config — both tests below read it)
  private lazy val wfRun: Seq[FoldResult] = walkForward(
    StrategyOptGoldenRun.fixtureBars(spark),
    cfg = StrategyOptGoldenRun.WfConfig, folds = StrategyOptGoldenRun.WfFolds)

  test("walkForward: expanding train windows, disjoint test slices, out-of-sample verdict") {
    val bars = StrategyOptGoldenRun.fixtureBars(spark) // 3 symbols × 1200 bars
    val cfg = StrategyOptGoldenRun.WfConfig
    val fr = wfRun
    assert(fr.map(_.fold) == Seq(1, 2, 3))
    // expanding train (300/600/900 bars per symbol), equal disjoint test
    // slices covering the rest of the feed
    assert(fr.map(_.trainBars) == Seq(900L, 1800L, 2700L), fr.map(_.trainBars))
    assert(fr.map(_.testBars) == Seq(900L, 900L, 900L), fr.map(_.testBars))
    fr.foreach { f =>
      // the champion was selected WITHOUT seeing the test slice; its
      // out-of-sample eval ran on that slice alone (trade count bounded
      // by what 900 bars can produce, never the training window's)
      assert(f.inSample.nTrades >= 0 && f.outOfSample.nTrades <= 900,
        s"fold ${f.fold}: ${f.outOfSample.nTrades} trades from 900 test bars")
      Space.zip(Vector.fill(6)(0.0)).foreach { case ((k, (lo, hi)), _) =>
        val v = f.champion.decoded(k)
        assert(v >= lo && v <= hi, s"fold ${f.fold}: $k=$v outside [$lo,$hi]")
      }
    }
    // deterministic: the same seeded walk reproduces fold champions
    val fr2 = walkForward(bars, cfg = cfg, folds = 3)
    assert(fr.map(_.champion.decoded) == fr2.map(_.champion.decoded))
    assert(fr.map(_.outOfSample) == fr2.map(_.outOfSample))
    // degenerate folds rejected
    intercept[IllegalArgumentException] { walkForward(bars, folds = 0) }
  }

  test("champion persists through fact_strategy_params and flattens back out") {
    val factPath = java.nio.file.Files.createTempDirectory("fact_strategy").toString
    val json = graft.ml.OptimizerStats.parametersJson(championParams(rerun))
    val fact = graft.olap.OlapEtl.loadFactStrategyParams(spark,
      experimentKey = "ga_backtest_golden", strategyName = "heuristic_tp_sl",
      freq = "1h", paramsJson = json, factPath = factPath)
    assert(fact.count() == 1)
    val kv = graft.olap.OlapEtl.configKv(fact, "experiment_key", "params")
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(kv.keySet == championParams(rerun).keySet)
    assert(kv("threshold").toDouble == rerun.best.params.threshold)
    // upsert grain: re-loading the same (experiment, strategy) stays 1 row
    val again = graft.olap.OlapEtl.loadFactStrategyParams(spark,
      "ga_backtest_golden", "heuristic_tp_sl", "1h", json, factPath)
    assert(again.count() == 1)
  }

  test("committed walk-forward golden replays; fold champions round-trip through fact_strategy_params") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val stats = mapper.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get("golden/backtest/graft_backtest_ga_walkforward_stats.json")))
    assert(stats.get("optimizer_type").asText() == "ga_backtest_walkforward")
    val folds = stats.get("folds")
    assert(folds.size() == wfRun.size)
    wfRun.zipWithIndex.foreach { case (f, i) =>
      val j = folds.get(i)
      assert(j.get("fold").asInt() == f.fold)
      assert(j.get("train_bars").asLong() == f.trainBars &&
        j.get("test_bars").asLong() == f.testBars)
      assert(j.get("in_sample").get("cash_profit").asDouble() == f.inSample.cashProfit,
        s"fold ${f.fold} in-sample profit drifted")
      assert(j.get("out_of_sample").get("cash_profit").asDouble() == f.outOfSample.cashProfit &&
        j.get("out_of_sample").get("n_trades").asLong() == f.outOfSample.nTrades,
        s"fold ${f.fold} out-of-sample verdict drifted")
      val champ = championParams(f.champion, f.sizing)
      assert(j.get("champion").size() == champ.size)
      champ.foreach { case (k, v) =>
        assert(j.get("champion").get(k).asDouble() == v,
          s"fold ${f.fold} champion $k drifted")
      }
    }
    // end-to-end loader leg: fold champions → ONE SnapshotStore-committed
    // upsert into fact_strategy_params, payload flattens back exactly
    val factPath = java.nio.file.Files.createTempDirectory("wf_fact").toString
    val fact = graft.olap.OlapEtl.loadFactStrategyParamsRows(spark,
      StrategyOptimizer.walkForwardFactRows(spark, "exp_wf", "1h", wfRun),
      factPath)
    assert(fact.count() == wfRun.size)
    val kv = graft.olap.OlapEtl.configKv(fact, "strategy_name", "params")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    wfRun.foreach { f =>
      val champ = championParams(f.champion, f.sizing)
      champ.foreach { case (k, v) =>
        assert(kv((s"wf_fold_${f.fold}_champion", k)).toDouble == v,
          s"fact payload drifted for fold ${f.fold} / $k")
      }
    }
    // upsert grain: a re-load of the same fold champions stays 3 rows
    val again = graft.olap.OlapEtl.loadFactStrategyParamsRows(spark,
      StrategyOptimizer.walkForwardFactRows(spark, "exp_wf", "1h", wfRun),
      factPath)
    assert(again.count() == wfRun.size)
  }
}
