package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token count, avg len, punct ratio on a known string") {
    val df = Seq("ab cd, ef!").toDF("text") // tokens: [ab, cd,, ef!]
    val r = df.select(
      TextAnalysis.tokenCount($"text").as("n"),
      TextAnalysis.punctRatio($"text").as("p")).head()
    assert(r.getInt(0) == 3)
    assert(math.abs(r.getDouble(1) - 2.0 / 10.0) < 1e-12) // ','+'!' over 10 chars
  }

  test("stopword ratio") {
    val df = Seq("the cat and the dog").toDF("text")
    val r = df.select(TextAnalysis.stopwordRatio($"text").as("s")).as[Double].head()
    assert(math.abs(r - 3.0 / 5.0) < 1e-12)
  }

  test("langId picks the profile with most hits") {
    val en = Seq("the cat sat on the mat and it is happy").toDF("text")
    val es = Seq("el gato que vive en la casa de los vecinos").toDF("text")
    val und = Seq("zzz qqq xxx").toDF("text")
    assert(en.select(TextAnalysis.langId($"text")).as[String].head() == "en")
    assert(es.select(TextAnalysis.langId($"text")).as[String].head() == "es")
    assert(und.select(TextAnalysis.langId($"text")).as[String].head() == "und")
  }

  test("shingles: n-grams for long text, whole text when short") {
    val df = Seq("a b c d").toDF("text")
    val sh = df.select(TextAnalysis.shingles($"text", 3).as("s")).as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(TextAnalysis.shingles($"text", 3).as("s")).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  // Adversarial token shapes for the native-vs-composable contracts: empty
  // text, runs of spaces (empty fields kept by split limit -1), leading/
  // trailing spaces, punct-only, unicode multi-byte (CJK profile words +
  // chars whose UTF-8 bytes must not confuse the byte-level scan), tied
  // profile scores (es/fr share 'la de que' counts), and null.
  private val hardTexts: Seq[String] = Seq(
    "", " ", "  ", "a", " a", "a ", "a  b", "the", "the the the",
    "!!! ??? ... ;;; ::: !!!", ".,;:!?", "the cat, and a dog.",
    "el gato que vive en la casa", "le chat la de que", "la de que",
    "的 是 在 了 puntuación é ü", "的是在了", "zzz qqq xxx",
    "der die und das ist von den mit auf ein the and of to in is that it for with",
    "word " * 50 + "end", null)

  test("native quality_score is bit-identical to the composable spelling") {
    val df = hardTexts.toDF("text")
    val rows = df.select(
      TextAnalysis.qualityScore($"text").as("native"),
      TextAnalysis.qualityScoreComposable($"text").as("composable")).collect()
    rows.zip(hardTexts).foreach { case (r, t) =>
      val (n, c) = (if (r.isNullAt(0)) null else r.getDouble(0).asInstanceOf[Any],
                    if (r.isNullAt(1)) null else r.getDouble(1).asInstanceOf[Any])
      assert((n == null && c == null) ||
        java.lang.Double.doubleToRawLongBits(n.asInstanceOf[Double]) ==
          java.lang.Double.doubleToRawLongBits(c.asInstanceOf[Double]),
        s"quality mismatch on ${Option(t).map(s => s"'$s'").getOrElse("NULL")}: native=$n composable=$c")
    }
  }

  test("native lang_id_argmax matches the composable struct-argmax (incl. ties)") {
    val df = hardTexts.toDF("text")
    val rows = df.select(
      TextAnalysis.langId($"text").as("native"),
      TextAnalysis.langIdComposable($"text").as("composable")).collect()
    rows.zip(hardTexts).foreach { case (r, t) =>
      assert(r.getString(0) == r.getString(1),
        s"langId mismatch on ${Option(t).map(s => s"'$s'").getOrElse("NULL")}: " +
          s"native=${r.getString(0)} composable=${r.getString(1)}")
    }
  }

  test("chunkByTokens: overlapping windows, short tail, short docs, null") {
    val doc = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val df = Seq((1L, doc), (2L, "one two"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkByTokens(df, "text", "doc_id", chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx").collect()
    // doc 1: starts 0,3,6,9 → 4 chunks; doc 2: one short chunk; doc 3 (null): none
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(d1.map(_.getString(3)).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10"))
    assert(d1.map(_.getInt(2)).toSeq == Seq(4, 4, 4, 1))
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getString(3) == "one two" && d2.head.getInt(2) == 2)
    assert(!out.exists(_.getLong(0) == 3L))
  }

  test("packSequences: chunk-atomic budget cuts, per-shard sequences") {
    // shard A: token counts 300, 300, 100 → cum-before 0, 300, 600
    //   budget 512 → seq 0, 0, 1 (second chunk OVERFLOWS seq 0 to 600 —
    //   chunk-atomic by design); shard B independent numbering
    val chunks = Seq(
      ("A", 1L, 0, 300), ("A", 1L, 1, 300), ("A", 2L, 0, 100),
      ("B", 3L, 0, 600), ("B", 4L, 0, 10)
    ).toDF("shard", "doc_id", "chunk_idx", "n_tok")
    val packed = TextAnalysis.packSequences(
        chunks, Seq("shard"), Seq("doc_id", "chunk_idx"), "n_tok", 512)
      .orderBy("shard", "doc_id", "chunk_idx")
      .select("shard", "seq_id").as[(String, Long)].collect().toSeq
    assert(packed == Seq(("A", 0L), ("A", 0L), ("A", 1L), ("B", 0L), ("B", 1L)))
  }

  test("dedupSegments: first occurrence survives, order preserved, unique text untouched") {
    val docs = Seq(
      (1L, "buy now. great product. buy now. call today. great product"),
      (2L, "alpha. beta. gamma"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupSegments(docs, "text", "doc_id", ". ")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "buy now. great product. call today"),
      (2L, "alpha. beta. gamma"))) // null doc emits no row, like the oracle
  }

  test("quality score in [0,1], higher for natural text") {
    val good = Seq("the cat is on the mat and it is a good day for all of us").toDF("text")
    val bad = Seq("!!! ??? ... ;;; ::: !!!").toDF("text")
    val g = good.select(TextAnalysis.qualityScore($"text")).as[Double].head()
    val b = bad.select(TextAnalysis.qualityScore($"text")).as[Double].head()
    assert(g >= 0.0 && g <= 1.0 && b >= 0.0 && b <= 1.0 && g > b)
  }
}
