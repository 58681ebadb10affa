package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5(b) golden-format parity gate: the committed
  * `golden/phase_1/` artifact (produced by `GoldenRun.main`) must match
  * the reference's golden output formats file-for-file —
  *
  *   - results: header `Metric,Average,Std Dev,Min,Max`
  *     (`examples/results/phase_1/phase_1_cnn_6300_1h_results.csv:1`),
  *     metric rows = the full `stl_metrics.py:166-167` grid
  *     {Train,Validation,Test} × {MAE,Naive MAE,R2,Uncertainty,SNR} ×
  *     H1..H6 in the reference's loop order, `%.6f` floats;
  *   - prediction: `DATE_TIME,test_CLOSE,Target_H{h},Prediction_H{h}…`;
  *   - uncertainties: `DATE_TIME,Uncertainty_H{h}…`.
  *
  * When the reference checkout is present (it is in the build container)
  * the headers are ALSO diffed against the reference goldens directly,
  * so format drift on either side fails loudly.
  */
class GoldenParitySpec extends AnyFunSuite {

  private val dir = "golden/phase_1"
  private val horizons = 1 to 6

  private def lines(f: String): Seq[String] = {
    val p = java.nio.file.Paths.get(s"$dir/$f")
    assert(java.nio.file.Files.exists(p), s"committed golden artifact missing: $p — run `runMain graft.pipeline.GoldenRun`")
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala.toSeq
  }

  test("results.csv: reference header, full metric grid, reference row order") {
    val ls = lines("graft_phase_1_cnn_1h_results.csv")
    assert(ls.head == "Metric,Average,Std Dev,Min,Max")
    val metricNames = ls.tail.map(_.split(",")(0))
    val expected = for {
      ds <- GoldenRun.DataSets
      mn <- GoldenRun.MetricNames
      h <- horizons
    } yield s"$ds $mn H$h"
    assert(metricNames == expected,
      s"metric rows diverge from the stl_metrics.py grid/order: ${metricNames.take(5)}...")
    // %.6f float format, reference float_format (stl_metrics.py:197)
    ls.tail.foreach { l =>
      val cells = l.split(",").drop(1)
      assert(cells.length == 4 && cells.forall(_.matches("-?\\d+\\.\\d{6}")), s"not %.6f formatted: $l")
    }
  }

  test("prediction.csv: reference header shape and date format") {
    val ls = lines("graft_phase_1_cnn_1h_prediction.csv")
    val expected = "DATE_TIME,test_CLOSE," +
      horizons.map(h => s"Target_H$h,Prediction_H$h").mkString(",")
    assert(ls.head == expected)
    assert(ls(1).matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},.*"""),
      s"DATE_TIME not in the reference's format: ${ls(1).take(30)}")
  }

  test("uncertainties.csv: reference header shape, non-negative values") {
    val ls = lines("graft_phase_1_cnn_1h_uncertainties.csv")
    assert(ls.head == "DATE_TIME," + horizons.map(h => s"Uncertainty_H$h").mkString(","))
    ls.tail.take(5).foreach { l =>
      l.split(",").drop(1).foreach(v => assert(v.toDouble >= 0.0, s"negative uncertainty: $l"))
    }
  }

  test("direct diff against the reference goldens when the checkout is present") {
    val ref = java.nio.file.Paths.get(
      "/root/reference/examples/results/phase_1/phase_1_cnn_6300_1h_results.csv")
    assume(java.nio.file.Files.exists(ref), "reference checkout absent")
    val refLines = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(ref)).asScala.toSeq
    assert(lines("graft_phase_1_cnn_1h_results.csv").head == refLines.head,
      "results header drifted from the reference golden")
    // the committed reference golden predates Naive MAE rows; every
    // metric name IT contains must appear in ours, same relative order
    val ours = lines("graft_phase_1_cnn_1h_results.csv").tail.map(_.split(",")(0))
    val theirs = refLines.tail.map(_.split(",")(0))
    assert(theirs.forall(ours.contains), {
      val missing = theirs.filterNot(ours.contains)
      s"reference metric rows missing from our golden: ${missing.take(5)}"
    })
    val oursFiltered = ours.filter(theirs.contains)
    assert(oursFiltered == theirs, "metric row ORDER diverges from the reference golden")

    val refPred = java.nio.file.Paths.get(
      "/root/reference/examples/results/phase_1/phase_1_cnn_6300_1h_prediction.csv")
    assume(java.nio.file.Files.exists(refPred), "reference prediction golden absent")
    val refPredHeader = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(refPred)).asScala.head
    assert(lines("graft_phase_1_cnn_1h_prediction.csv").head == refPredHeader,
      "prediction header drifted from the reference golden")

    // reference filename spells it "uncertanties" (stl_io.py's config
    // default); the format contract is the header, not the typo
    val refUnc = java.nio.file.Paths.get(
      "/root/reference/examples/results/phase_1/phase_1_cnn_6300_1h_uncertanties.csv")
    assume(java.nio.file.Files.exists(refUnc), "reference uncertainties golden absent")
    val refUncHeader = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(refUnc)).asScala.head
    assert(lines("graft_phase_1_cnn_1h_uncertainties.csv").head == refUncHeader,
      "uncertainties header drifted from the reference golden")
  }
}
