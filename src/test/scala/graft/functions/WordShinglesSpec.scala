package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.text.TextAnalysis

class WordShinglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native shingles ≡ composable spelling on varied texts") {
    val docs = Seq(
      "a b c d e", "one two", "single", "",
      "the quick brown fox jumps over the lazy dog",
      "x  y" // double space → empty token, both spellings must agree
    ).toDF("text")
    for (n <- Seq(2, 3, 5)) {
      val both = docs.select(
        TextAnalysis.shingles($"text", n).as("native"),
        TextAnalysis.shinglesComposable($"text", n).as("composable"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n mismatch: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
  }

  test("NULL text: both spellings yield the [\"\"] sentinel") {
    val nullDoc = Seq(Option.empty[String]).toDF("text")
    val r = nullDoc.select(
      TextAnalysis.shingles($"text", 3).as("native"),
      TextAnalysis.shinglesComposable($"text", 3).as("composable")).head()
    assert(r.getSeq[String](0) == Seq(""))
    assert(r.getSeq[String](0) == r.getSeq[String](1))
  }
}
