package graft.io

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpCsv(content: String): String = {
    val f = Files.createTempFile("graft", ".csv")
    Files.writeString(f, content)
    f.toString
  }

  test("loadCsv: DATE_TIME case-insensitive → ts, doubles, NaN→0") {
    val p = tmpCsv(
      """date_time,OPEN,CLOSE
        |2020-01-01 00:00:00,1.5,abc
        |2020-01-01 01:00:00,,2.5
        |""".stripMargin)
    val df = Sources.loadCsv(spark, p)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("OPEN").dataType == DoubleType)
    val rows = df.orderBy("ts").select("OPEN", "CLOSE").as[(Double, Double)].collect()
    assert(rows(0) == ((1.5, 0.0))) // unparseable → 0
    assert(rows(1) == ((0.0, 2.5))) // empty → 0
  }

  test("loadCsv headerless: synthetic col_i names") {
    val p = tmpCsv("1.0,2.0\n3.0,4.0\n")
    val df = Sources.loadCsv(spark, p, header = false)
    assert(df.columns.toSeq == Seq("col_0", "col_1"))
    assert(df.count() == 2)
  }

  test("loadCsv maxRows limits the scan") {
    val p = tmpCsv("A\n1\n2\n3\n4\n")
    assert(Sources.loadCsv(spark, p, maxRows = Some(2)).count() == 2)
  }

  test("loadSplitRoles: per-role caps and JSON path auto-recovery") {
    val csv = tmpCsv("DATE_TIME,CLOSE\n2020-01-01 00:00:00,1.0\n2020-01-01 01:00:00,2.0\n2020-01-01 02:00:00,3.0\n")
    // a role that points at a config JSON with the embedded real path
    val cfg = Files.createTempFile("cfg", ".json")
    Files.writeString(cfg, s"""{"x_train_file": "$csv"}""")
    val roles = Sources.loadSplitRoles(spark,
      Map("x_train_file" -> cfg.toString, "x_test_file" -> csv),
      maxSteps = Map("x_test_file" -> 2))
    assert(roles("x_train_file").count() == 3)   // recovered from JSON
    assert(roles("x_test_file").count() == 2)    // per-role cap
    intercept[IllegalArgumentException] {
      Sources.loadSplitRoles(spark, Map("x" -> "/tmp/nope.parquet"))
    }
  }

  test("writeCsv produces a deterministic ordered single file") {
    val out = Files.createTempDirectory("graftcsv").toString + "/out"
    val df = Seq((2L, "b"), (1L, "a"), (3L, "c")).toDF("t", "v")
    Sources.writeCsv(df, out, Seq("t"))
    val back = spark.read.option("header", "true").csv(out)
    assert(back.select("v").as[String].collect().toSeq == Seq("a", "b", "c"))
  }
}
