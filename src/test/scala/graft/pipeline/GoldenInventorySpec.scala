package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Anti-rot inventory gate (r10 verdict, "What's wrong" #1/#2
  * generalized): round 10 ended with a red gate because a spec landed
  * whose fixture was still generating, and with generated-but-unspec'd
  * artifacts sitting half-landed next to committed ones. This spec pins
  * the EXACT committed `golden/` inventory to the grids the parity and
  * golden specs read:
  *
  *   - a fixture committed without a spec reading it fails here (rot:
  *     its generating code drifts and nothing notices);
  *   - a spec'd fixture that goes missing fails here (and in its
  *     reading spec) — evidence and spec must land in the same commit;
  *   - Spark staging junk (`_temporary`, `results_*` dirs) under
  *     `golden/` fails here by not being in the inventory.
  *
  * Updating the inventory is deliberate: add the filename AND the spec
  * that reads it in the same gated commit.
  */
class GoldenInventorySpec extends AnyFunSuite {

  private def listAll(dir: String): Set[String] = {
    val root = new java.io.File(dir)
    assert(root.isDirectory, s"$dir missing")
    def walk(f: java.io.File): Seq[String] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else Seq(root.toPath.relativize(f.toPath).toString)
    walk(root).toSet
  }

  test("golden/phase_1_parity holds exactly the spec-read parity fixtures") {
    val annScales = Seq("1575", "3150", "6300", "12600", "12600ext", "25200")
    val zooHeads = Seq("cnn", "lstm", "transformer")
    val zooScales = Seq("1575", "3150", "6300", "12600", "25200")
    val expected: Set[String] =
      (annScales.map(s => s"graft_phase_1_ann_${s}_1h_results.csv") ++
        Seq("graft_phase_1_ann_12600_1h_earlystop_results.csv") ++
        (for (h <- zooHeads; s <- zooScales)
          yield s"graft_phase_1_${h}_${s}_1h_results.csv") ++
        Seq("graft_phase_1_tft_1575_1h_results.csv",
          "graft_phase_2_1_ann_25200_1h_results.csv") ++
        Seq("ann", "cnn", "lstm", "transformer")
          .map(h => s"graft_phase_3_1_${h}_25200_1h_results.csv") ++
        Seq("graft_phase_1_ann_neat_1575_1h_optimization_stats.json",
          "graft_phase_1_ann_neat_1575_1h_optimization_parameters.json")).toSet
    val onDisk = listAll("golden/phase_1_parity")
    assert(onDisk == expected,
      s"unexpected=${(onDisk -- expected).toSeq.sorted.take(5)} " +
        s"missing=${(expected -- onDisk).toSeq.sorted.take(5)}")
  }

  test("golden/phase_1 holds exactly the golden-run artifact set") {
    val expected = Set(
      "graft_phase_1_cnn_1h_loss_plot.svg",
      "graft_phase_1_cnn_1h_prediction.csv",
      "graft_phase_1_cnn_1h_predictions_plot.svg",
      "graft_phase_1_cnn_1h_results.csv",
      "graft_phase_1_cnn_1h_uncertainties.csv",
      "graft_phase_1_mlp_ga_optimization_parameters.json",
      "graft_phase_1_mlp_ga_optimization_stats.json",
      "graft_phase_1_mlp_neat_optimization_parameters.json",
      "graft_phase_1_mlp_neat_optimization_resume.json",
      "graft_phase_1_mlp_neat_optimization_stats.json")
    val onDisk = listAll("golden/phase_1")
    assert(onDisk == expected,
      s"unexpected=${(onDisk -- expected).toSeq.sorted.take(5)} " +
        s"missing=${(expected -- onDisk).toSeq.sorted.take(5)}")
  }

  test("golden/backtest holds exactly the strategy-GA artifact trio") {
    // read (and exactly replayed) by StrategyOptimizerSpec
    val expected = Set(
      "graft_backtest_ga_optimization_parameters.json",
      "graft_backtest_ga_optimization_stats.json",
      "graft_backtest_ga_walkforward_stats.json")
    val onDisk = listAll("golden/backtest")
    assert(onDisk == expected,
      s"unexpected=${(onDisk -- expected).toSeq.sorted.take(5)} " +
        s"missing=${(expected -- onDisk).toSeq.sorted.take(5)}")
  }
}
