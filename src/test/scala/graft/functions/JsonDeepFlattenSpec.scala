package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class JsonDeepFlattenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def flat(json: String): Seq[(String, String)] = {
    GraftFunctions.register(spark)
    Seq(Tuple1(json)).toDF("j")
      .select(explode(GraftFunctions.json_deep_flatten($"j")).as("kv"))
      .select($"kv.path", $"kv.value").as[(String, String)].collect().toSeq.sorted
  }

  test("nested objects flatten to dot paths; arrays are leaves") {
    val out = flat("""{"model":{"layers":3,"opt":{"lr":0.001,"sched":"cosine"}},"hs":[1,2,3],"name":"exp1"}""")
    assert(out == Seq(
      "hs" -> "[1,2,3]",
      "model.layers" -> "3",
      "model.opt.lr" -> "0.001",
      "model.opt.sched" -> "cosine",
      "name" -> "exp1"))
  }

  test("number tokens keep source text; booleans/null render as literals") {
    val out = flat("""{"a":1.50,"b":true,"c":null,"d":1e-4}""")
    assert(out == Seq("a" -> "1.50", "b" -> "true", "c" -> "null", "d" -> "1e-4"))
  }

  test("arrays of objects serialize compactly with escapes intact") {
    val out = flat("""{"xs":[{"k":"a\"b"},2],"s":"tab\there"}""")
    assert(out == Seq("s" -> "tab\there", "xs" -> """[{"k":"a\"b"},2]"""))
  }

  test("non-object top level → single empty-path row; malformed → NULL") {
    assert(flat("""[1,2]""") == Seq("" -> "[1,2]"))
    assert(flat(""""s"""") == Seq("" -> "s"))
    assert(flat("""{}""") == Seq.empty)
    GraftFunctions.register(spark)
    val bad = Seq(Tuple1("{nope")).toDF("j")
      .select(GraftFunctions.json_deep_flatten($"j").as("r"))
      .select($"r".isNull).as[Boolean].head()
    assert(bad)
    // trailing garbage after a valid value is malformed too (DuckDB
    // json() rejects it — the oracle contract)
    val trailing = Seq(Tuple1("""{"a":1} xyz"""), Tuple1("""[1,2] 3""")).toDF("j")
      .select(GraftFunctions.json_deep_flatten($"j").as("r"))
      .select($"r".isNull).as[Boolean].collect().toSeq
    assert(trailing == Seq(true, true))
  }

  test("usable from SQL; wrong arity fails analysis with the signature") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      """SELECT kv.path, kv.value
        |FROM (SELECT explode(json_deep_flatten('{"a":{"b":1}}')) AS kv)""".stripMargin)
      .collect()
    assert(n.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a.b", "1")))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT json_deep_flatten('{}', 1)").collect()
    }
    assert(err.getMessage.contains("json_deep_flatten"))
  }
}
