package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.dedup.Dedup
import graft.ml.Splits

/** Round-4 corpus-curation operators: TF-IDF, winnowing fingerprints,
  * Gopher repetition signals, mixture resampling, PII scrubbing,
  * benchmark decontamination.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tfidfTopTerms: scores, ranks, tie-break") {
    val docs = Seq((1L, "a a b"), (2L, "b c c"), (3L, "c d")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, "text", "doc_id", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._5)
    // df: a=1 b=2 c=2 d=1, N=3
    assert(d1.map(_._2).toSeq == Seq("a", "b"))
    assert(math.abs(d1(0)._4 - BigDecimal(2 * math.log(3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    val d3 = out.filter(_._1 == 3L).sortBy(_._5)
    // c and d in doc 3: d (df=1) outscores c (df=2)
    assert(d3.map(_._2).toSeq == Seq("d", "c"))
  }

  test("winnowing: shared run of w+k-1 tokens ⇒ shared fingerprint; sketch is compressed") {
    val k = 3; val w = 4
    val shared = "p q r s t u" // w+k-1 = 6 tokens
    val docs = Seq(
      (1L, s"a b c d $shared e f g h"),
      (2L, s"m n $shared o z y x w v u t"),
      (3L, "completely different words here nothing alike at all")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, "text", "doc_id", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val s1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val s2 = fps.filter(_._1 == 2L).map(_._2).toSet
    val s3 = fps.filter(_._1 == 3L).map(_._2).toSet
    assert((s1 & s2).nonEmpty, "documents sharing a 6-token run must share a fingerprint")
    assert((s1 & s3).isEmpty && (s2 & s3).isEmpty)
    // sketch strictly smaller than the k-gram count (15-3+1 = 13 grams for doc 1)
    assert(s1.size < 13)
  }

  test("winnowing: doc shorter than w grams emits exactly the global min") {
    val docs = Seq((7L, "a b c")).toDF("doc_id", "text") // k=2 -> 2 grams < w=4
    val out = TextAnalysis.winnowFingerprints(docs, "text", "doc_id", 2, 4)
      .collect().map(_.getLong(1))
    val hv = docs.select(explode(TextAnalysis.shingles($"text", 2)).as("g"))
      .select(conv(substring(md5($"g"), 1, 8), 16, 10).cast("long"))
      .as[Long].collect()
    assert(out.toSeq == Seq(hv.min))
  }

  test("repetitionStats: duplicate segments and dominant bigram flagged") {
    val docs = Seq(
      (1L, "x. x. y"),            // dup segs [x,x,y]; bigrams [x. x.],[x. y]
      (2L, "a b. c d. e f")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(math.abs(out(1L)._1 - (1.0 - 2.0 / 3.0)) < 1e-6)
    assert(math.abs(out(1L)._2 - 0.5) < 1e-12)
    assert(!out(1L)._3, "dominant bigram over threshold must drop")
    assert(out(2L)._1 == 0.0 && out(2L)._3, "clean doc keeps")
  }

  test("resampleMixture: deterministic, caps at 1, drops unknown groups") {
    val rows = (0 until 80).map(i => (i.toLong, "en")) ++
      (100 until 120).map(i => (i.toLong, "fr")) ++
      (200 until 210).map(i => (i.toLong, "xx"))
    val df = rows.toDF("doc_id", "lang")
    val out = TextAnalysis.resampleMixture(df, "lang", "doc_id",
      Map("en" -> 0.5, "fr" -> 0.5))
    val got = out.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(!got.exists(_._1 == "xx"), "groups without a share are dropped")
    assert(got.count(_._1 == "fr") == 20, "under-target group keeps everything")
    // en acceptance replays the md5 threshold exactly: total=110, share 0.5
    val thresh = math.floor(math.min(1.0, 0.5 * 110 / 80.0) * 10000).toLong
    val expectedEn = (0 until 80).filter { i =>
      val b = df.sparkSession.range(1).select(
        Splits.hashBucket(lit(i.toLong), 10000)).as[Long].head()
      b < thresh
    }.map(_.toLong).toSet
    assert(got.filter(_._1 == "en").map(_._2).toSet == expectedEn)
    // stability: second run identical
    val again = TextAnalysis.resampleMixture(df, "lang", "doc_id",
      Map("en" -> 0.5, "fr" -> 0.5)).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(again.toSet == got.toSet)
  }

  test("redactPii: emails then digit runs, counts exclude digits inside emails") {
    val df = Seq(
      "mail bob@x.com or call 1234567 now",
      "user a12345678@mail.example.com only",
      "no pii here").toDF("text")
    val out = df.select(
      TextAnalysis.redactPii($"text").as("r"),
      TextAnalysis.piiCounts($"text")._1.as("ne"),
      TextAnalysis.piiCounts($"text")._2.as("nn"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(out(0) == ("mail <EMAIL> or call <NUM> now", 1, 1))
    assert(out(1) == ("user <EMAIL> only", 1, 0))
    assert(out(2) == ("no pii here", 0, 0))
  }

  test("unigram perplexity: common text scores lower than rare text; unseen tokens drop") {
    val docs = Seq(
      (1L, "a a a a"),   // all high-prob tokens
      (2L, "a a b z")).toDF("doc_id", "text") // rarer tokens
    val lm = TextAnalysis.unigramLm(docs, "text")
    // MLE: p(a)=6/8, p(b)=p(z)=1/8; logp rounded to 6dp
    val probs = lm.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(probs("a") - BigDecimal(math.log(6.0 / 8)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    val out = TextAnalysis.perplexityScore(docs, "text", "doc_id", lm)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 == 4 && out(2L)._1 == 4)
    assert(out(1L)._2 < out(2L)._2, "fluent (high-prob) doc must score lower xent")
    // scoring a doc against an LM missing its tokens: unseen mass dropped
    val other = Seq((9L, "q q a")).toDF("doc_id", "text")
    val o = TextAnalysis.perplexityScore(other, "text", "doc_id", lm)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(o(9L) == 1, "only LM-known tokens are scored")
  }

  test("decontaminate: shared n-gram drops the training doc, near-miss survives") {
    val bench = Seq((100L, "p q r s t u v w"), (101L, "x y")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a b p q r s t u v w c d"),  // contains the full 8-gram -> dropped
      (2L, "a b p q r s t u v c d e"),  // only 7 shared tokens -> kept
      (3L, "x y"),                      // short doc, whole-text shingle matches
      (4L, "x y z")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, bench, "text", "doc_id", 8)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(2L, 4L))
  }

  test("gopherRules: stats hand-checked, verdict bounds, single scan in plan") {
    val docs = Seq(
      (1L, "the cat sat on a mat with it"),      // 8 words, stops: the,on,a,with,it
      (2L, "x1 y2"),                             // too short, no stopwords
      (3L, "the " + Seq.fill(30)("wordy").mkString(" "))) // 31 words, 1 stop hit
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "text", "doc_id",
        minWords = 5, maxWords = 100, minMeanLen = 2.0, maxMeanLen = 6.0,
        minStopHits = 2, minAlphaFrac = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[Int]("n_words") === 8)
    assert(d1.getAs[Double]("mean_word_len") === 21.0 / 8) // chars sans spaces
    assert(d1.getAs[Int]("stop_hits") === 5)
    assert(d1.getAs[Double]("alpha_frac") === 1.0)
    assert(d1.getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("keep")) // n_words=2 < 5, stop_hits=0
    assert(out(2L).getAs[Double]("alpha_frac") === 1.0) // x1, y2 both carry a-z
    assert(!out(3L).getAs[Boolean]("keep")) // only one stopword hit
    // the gopher_stats byte scan must appear exactly once in the plan
    val p = TextAnalysis.gopherRules(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert("gopher_stats".r.findAllIn(p).size == 1, s"gopher_stats cloned:\n$p")
  }

  test("dupNgramFraction: repeats weighted by occurrence, short docs zero") {
    val docs = Seq(
      (1L, "a b c a b c a b d"),  // 7 trigrams: "a b c"x2, rest once -> 2/7... recount below
      (2L, "x y"),                // shorter than n -> one whole-text gram, frac 0
      (3L, "p q r s t"))          // 3 distinct trigrams -> 0
      .toDF("doc_id", "text")
    val out = TextAnalysis.dupNgramFraction(docs, "text", "doc_id", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1 trigrams: [a b c, b c a, c a b, a b c, b c a, c a b, a b d]
    // -> three grams appear twice (6 occurrences) of 7 total
    assert(out(1L) === BigDecimal(6.0 / 7).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(2L) === 0.0)
    assert(out(3L) === 0.0)
  }

  test("dsirScores: target-like docs outscore off-target docs") {
    // two disjoint vocabularies; target = vocab-A docs only
    val a = (1L to 4L).map(i => (i, "alpha beta gamma delta alpha beta"))
    val b = (5L to 8L).map(i => (i, "uno dos tres cuatro uno dos"))
    val raw = (a ++ b).toDF("doc_id", "text")
    val target = a.toDF("doc_id", "text")
    val out = TextAnalysis.dsirScores(raw, target, "text", "doc_id", n = 2, buckets = 64)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Double]("dsir_score"))).toMap
    assert(out.size === 8)
    assert(out.values.forall(_._1 === 5L)) // 6 tokens -> 5 bigrams
    val aScore = out(1L)._2
    val bScore = out(5L)._2
    assert(aScore > bScore,
      s"vocab-A score $aScore must exceed vocab-B score $bScore")
    // identical docs get identical scores (pure function of text)
    assert((1L to 4L).forall(i => out(i)._2 === aScore))
  }
}
