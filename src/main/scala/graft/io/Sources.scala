package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources & sinks (SURVEY §2.1).
  *
  * Reference semantics: `app/data_handler.py:12-77` (S1 `load_csv`),
  * `preprocessor_plugins/helpers.py:6-86` (S2), `app/data_handler.py:81-115`
  * (S6 `write_csv`). Re-expressed Spark-first: scans stay declarative so
  * Catalyst pushes limits/filters/pruning into the file source.
  */
object Sources {

  /** Parquet table of the driver testdata star schema ( TESTDATA.md ).
    *
    * Spark 4 rejects parquet TIMESTAMP(NANOS) (`events.ts`); we read nanos
    * as long (legacy conf) and rebuild a microsecond timestamp with exact
    * integer division — values in the testdata are µs-aligned.
    *
    * The testdata timestamps are NAIVE (isAdjustedToUTC=false), which
    * Spark 4 would infer as TIMESTAMP_NTZ — a type rejected by the
    * instant-arithmetic functions (`unix_micros` & co) every time-based
    * query uses for session-tz robustness. Disabling NTZ inference reads
    * the raw micros as TIMESTAMP (UTC instants), which is exactly the
    * naive wall-clock DuckDB sees, so the oracle compare stays bitwise.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => df
    }
  }

  /** S1 `load_csv`: CSV scan with optional header, case-insensitive
    * `DATE_TIME` detection → timestamp column `ts`, every other column cast
    * to double with NaN/unparseable → 0.0, optional row limit.
    *
    * Reference: `app/data_handler.py:39-64` — case-insensitive DATE_TIME
    * detection, `pd.to_numeric(errors='coerce').fillna(0)`, `nrows` pushdown.
    * The `limit` is applied before casts so Catalyst pushes it into the scan.
    */
  def loadCsv(
      spark: SparkSession,
      path: String,
      header: Boolean = true,
      maxRows: Option[Int] = None,
      tsColumn: String = "DATE_TIME"
  ): DataFrame = {
    var df = spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)
    if (!header) {
      // Headerless → synthetic col_{i} names (data_handler.py:59-60).
      df = df.toDF(df.columns.indices.map(i => s"col_$i"): _*)
    }
    maxRows.foreach(n => df = df.limit(n))
    // Case-insensitive DATE_TIME detection; keep FIRST occurrence only
    // (duplicate-column drop, data_handler.py:47-51). Locale.ROOT: a
    // cluster executor under a Turkish default locale folds "TIME" to
    // "tıme" (dotless ı) and the header match silently fails.
    val lowerTs = tsColumn.toLowerCase(java.util.Locale.ROOT)
    val tsMatches = df.columns.filter(_.toLowerCase(java.util.Locale.ROOT) == lowerTs)
    val keepTs = tsMatches.headOption
    val cols = df.columns.zipWithIndex.collect {
      case (c, i) if keepTs.contains(c) && df.columns.indexOf(c) == i =>
        try_to_timestamp(col(c)).as("ts")
      case (c, _) if !tsMatches.contains(c) =>
        // numeric coercion with null→0.0 fallback (data_handler.py:63-64);
        // try_cast: ANSI mode (Spark 4 default) would throw on 'abc'
        coalesce(col(c).try_cast(DoubleType), lit(0.0)).as(c)
    }
    val out = df.select(cols.toIndexedSeq: _*)
    out.na.fill(0.0, out.columns.filter(_ != "ts").toIndexedSeq)
  }

  /** S2 `load_normalized_csv`: multi-file scan for the dataset roles with
    * the reference's JSON auto-recovery — when a role's path points at a
    * config JSON instead of a CSV, read the embedded path for that role
    * from the JSON (`preprocessor_plugins/helpers.py:24-52`). Extension
    * whitelist `.csv/.tsv/.txt` enforced after recovery.
    */
  def loadSplitRoles(spark: SparkSession, roles: Map[String, String],
      maxSteps: Map[String, Int] = Map.empty): Map[String, DataFrame] =
    roles.map { case (role, path0) =>
      val path =
        if (path0.endsWith(".json")) {
          val row = spark.read.option("multiLine", "true").json(path0).head()
          val idx = row.schema.fieldNames.indexOf(role)
          require(idx >= 0, s"config JSON $path0 has no entry for role $role")
          row.get(idx) match {
            case s: String if s.nonEmpty => s
            case other => throw new IllegalArgumentException(
              s"config JSON $path0 entry for role $role is not a usable path: $other")
          }
        } else path0
      val ok = Seq(".csv", ".tsv", ".txt").exists(path.endsWith)
      require(ok, s"role $role resolves to unsupported extension: $path")
      role -> loadCsv(spark, path, maxRows = maxSteps.get(role))
    }

  /** S4: normalization-metadata JSON → Map(col -> (a, b)) where (a,b) is
    * (mean,std) or (min,max). Driver-side tiny read, broadcast by Catalyst
    * as literals once folded into expressions (`helpers.py:88-101`).
    */
  def loadNormStats(spark: SparkSession, path: String): Map[String, (Double, Double)] = {
    val df = spark.read.option("multiLine", "true").json(path)
    val schema = df.schema
    val row = df.head()
    schema.fields.map { f =>
      val struct = row.getStruct(schema.fieldIndex(f.name))
      val names = f.dataType.asInstanceOf[StructType].fieldNames.toSet
      val (a, b) =
        if (names.contains("mean")) ("mean", "std") else ("min", "max")
      def num(field: String): Double = {
        val i = struct.schema.fieldIndex(field)
        struct.get(i) match {
          case d: java.lang.Double => d.doubleValue
          case l: java.lang.Long   => l.doubleValue
          case s: String           => s.toDouble
          case other               => other.toString.toDouble
        }
      }
      f.name -> (num(a), num(b))
    }.toMap
  }

  /** P7 header sanitization (`etl_migrate_v2.py:467`): trim, collapse any
    * whitespace runs to underscores, and de-duplicate colliding names
    * (suffix _2, _3, …) so downstream SQL needs no quoting and never hits
    * ambiguous references.
    */
  def sanitizeHeaders(df: DataFrame): DataFrame = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val cleaned = df.columns.map { c =>
      val base = c.trim.replaceAll("\\s+", "_")
      val k = seen.getOrElse(base, 0)
      seen(base) = k + 1
      if (k == 0) base else s"${base}_${k + 1}"
    }
    df.toDF(cleaned.toIndexedSeq: _*)
  }

  /** S6 `write_csv`: deterministic single-file CSV sink — explicit
    * `orderBy` then coalesce(1) so golden files are reproducible
    * (`data_handler.py:81-115`; determinism per SURVEY §4).
    */
  def writeCsv(df: DataFrame, path: String, orderCols: Seq[String], header: Boolean = true): Unit = {
    val ordered =
      if (orderCols.nonEmpty) df.orderBy(orderCols.map(col).toIndexedSeq: _*) else df
    ordered
      .coalesce(1)
      .write
      .mode("overwrite")
      .option("header", header.toString)
      .csv(path)
  }
}
