package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The committed hourly optimizer-search artifact
  * (`golden/phase_1_parity/graft_phase_1_ann_neat_1575_1h_optimization_
  * stats.json`, produced by [[ParityOptimizationRun]]) — r9 verdict
  * task #5, with the assertion set the DATA supports.
  *
  * Why this spec does NOT assert champion fitness < 0 ("beats naive"):
  * on the committed hourly bars no configuration beats the random-walk
  * baseline, and the spec MACHINE-CHECKS that claim against the
  * reference's own committed files — its 1575 grid's validation MAE
  * (0.001094) sits ~48% above the naive MAE computable from its own
  * committed validation bars. A negative champion fitness here would
  * evidence a leak, not skill. What a correct optimizer does on
  * no-edge data is converge to the no-signal floor, and that is what
  * is asserted: the champion's val MAE lands within a few percent of
  * naive, strictly below both the default-regime committed ann
  * artifact and the reference's own committed 1575 validation MAE,
  * with the per-generation global champion non-increasing.
  */
class ParityOptimizationSpec extends AnyFunSuite {

  private val statsPath =
    "golden/phase_1_parity/graft_phase_1_ann_neat_1575_1h_optimization_stats.json"

  private lazy val json: String = {
    val p = java.nio.file.Paths.get(statsPath)
    assert(java.nio.file.Files.exists(p),
      s"missing $statsPath — run `runMain graft.pipeline.ParityOptimizationRun`")
    java.nio.file.Files.readString(p)
  }

  private def field(name: String): Double = {
    val m = s""""$name": (-?[0-9.eE+-]+)""".r.findFirstMatchIn(json)
    assert(m.nonEmpty, s"stats JSON lacks numeric field '$name'")
    m.get.group(1).toDouble
  }

  private def refGrid(name: String): Double = {
    val src = scala.io.Source.fromFile(
      "/root/reference/examples/results/phase_1/phase_1_ann_1575_1h_results.csv")
    val ls = try src.getLines().toVector finally src.close()
    ls.find(_.startsWith(name + ",")).map(_.split(",")(1).toDouble)
      .getOrElse(fail(s"reference grid lacks row $name"))
  }

  /** Naive (last-value) H1 MAE of the reference's committed validation
    * bars, price units. */
  private lazy val refValNaive: Double = {
    val src = scala.io.Source.fromFile(
      "/root/reference/examples/data/phase_1/base_d5.csv")
    val ls = try src.getLines().toVector finally src.close()
    val ci = ls.head.split(",").indexOf("CLOSE")
    val c = ls.tail.map(_.split(",")(ci).toDouble)
    c.sliding(2).map(p => math.abs(p(1) - p(0))).sum / (c.size - 1)
  }

  test("the hourly no-edge anchor: the reference's OWN committed 1575 run does not beat naive") {
    val refVal = refGrid("Validation MAE H1")
    assert(math.abs(refVal - 0.001094) < 1e-9, s"reference grid moved: $refVal")
    assert(math.abs(refValNaive - 0.000737) < 5e-7, s"naive recomputed as $refValNaive")
    assert(refVal > 1.3 * refValNaive,
      "the committed reference run now beats naive — the no-edge rationale has changed; " +
        "revisit whether champion fitness < 0 is assertable")
  }

  test("search artifact: shape, internal consistency, and the no-signal floor") {
    assert(json.contains(""""optimizer_type": "neat""""))
    assert(field("candidates_evaluated_so_far") >= 20)
    val fit = field("champion_fitness")
    val vMae = field("champion_validation_mae")
    val vNaive = field("champion_validation_naive_mae")
    assert(math.abs(fit - (vMae - vNaive)) < 1e-9, "fitness != valMae - valNaive")
    // the optimizer reached the no-signal floor: within a few percent
    // of naive (the default ann regime sits ~55% above it)
    assert(vMae / vNaive > 0.90 && vMae / vNaive < 1.12,
      s"champion val MAE ${vMae / vNaive}x naive — not at the floor")
    // strictly better than the default-regime committed artifact ...
    val src = scala.io.Source.fromFile(
      "golden/phase_1_parity/graft_phase_1_ann_1575_1h_results.csv")
    val ls = try src.getLines().toVector finally src.close()
    val defaultVal = ls.find(_.startsWith("Validation MAE H1,")).get.split(",")(1).toDouble
    assert(vMae < defaultVal, s"search did not improve on the default regime: $vMae vs $defaultVal")
    // ... and than the reference's own committed 1575 run
    assert(vMae < refGrid("Validation MAE H1"),
      "champion above the reference's committed validation MAE")
  }

  test("global champion fitness is non-increasing across generations") {
    val seq = """"champion_fitness_global": (-?[0-9.eE+-]+)""".r
      .findAllMatchIn(json).map(_.group(1).toDouble).toVector
    assert(seq.size >= 3, s"history too short: ${seq.size}")
    assert(seq.sliding(2).forall(p => p(1) <= p(0) + 1e-15), s"champion worsened: $seq")
  }
}
