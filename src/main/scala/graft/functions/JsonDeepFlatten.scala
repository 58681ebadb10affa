package graft.functions

import com.fasterxml.jackson.core.JsonFactory
import com.fasterxml.jackson.core.JsonToken

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `json_deep_flatten(json string)` → `array<struct<path string, value
  * string>>`: every LEAF of a nested JSON object as a dot-joined path +
  * text value (reference `olap/olap_metabase_helpers.sql:4-23`
  * `jsonb_deep_each` — the Metabase helper that recursively flattens an
  * experiment's `config` JSONB into `(path, value_text)` rows, and
  * `olap/etl_migrate_v2.py:292-397` which needs arbitrary nested config
  * reachable by path).
  *
  * Semantics match the Postgres helper: recursion descends OBJECTS only;
  * an array is a leaf emitted as its compact JSON text (`[1,2,3]`);
  * string leaves are unescaped; numbers keep their source token text
  * (no float re-rendering — `1.50` stays `1.50`); `null`/booleans render
  * as JSON literals. A non-object top-level value becomes one row with
  * the empty path. Malformed JSON → SQL NULL (the coerce-to-null
  * convention of F15, matching `try_*` semantics engine-wide).
  *
  * Implemented over Jackson's STREAMING parser (already on Spark's
  * classpath — no added dependency): one pass, no tree materialization,
  * so a 100 TB corpus scan flattening per-row configs stays
  * allocation-lean. Registered in `GraftFunctions.registry`; typically
  * used as `explode(json_deep_flatten(col))`.
  */
case class JsonDeepFlatten(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("value", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "json_deep_flatten"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"json_deep_flatten expects a string column, got ${t.simpleString(10)}")
  }

  @transient private lazy val factory = new JsonFactory()

  override def nullSafeEval(input: Any): Any = {
    val json = input.asInstanceOf[UTF8String].toString
    try {
      val parser = factory.createParser(json)
      try {
        val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        val path = scala.collection.mutable.ArrayBuffer.empty[String]

        def emit(value: String): Unit = {
          val p = path.mkString(".")
          rows += InternalRow(UTF8String.fromString(p), UTF8String.fromString(value))
        }

        // Serialize the subtree starting at the current token compactly
        // (arrays are leaves — reference recursion stops at non-objects).
        def rawSubtree(): String = {
          val sb = new StringBuilder
          var depth = 0
          var first = true
          var done = false
          while (!done) {
            val t = parser.currentToken()
            val needComma = !first &&
              t != JsonToken.END_ARRAY && t != JsonToken.END_OBJECT &&
              t != JsonToken.FIELD_NAME &&
              sb.nonEmpty && sb.last != '[' && sb.last != '{' && sb.last != ':'
            if (needComma) sb.append(',')
            t match {
              case JsonToken.START_ARRAY => sb.append('['); depth += 1
              case JsonToken.END_ARRAY => sb.append(']'); depth -= 1
              case JsonToken.START_OBJECT => sb.append('{'); depth += 1
              case JsonToken.END_OBJECT => sb.append('}'); depth -= 1
              case JsonToken.FIELD_NAME =>
                if (sb.nonEmpty && sb.last != '{') sb.append(',')
                sb.append('"').append(escape(parser.currentName())).append("\":")
              case JsonToken.VALUE_STRING =>
                sb.append('"').append(escape(parser.getText)).append('"')
              case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT =>
                sb.append(parser.getText)
              case JsonToken.VALUE_TRUE => sb.append("true")
              case JsonToken.VALUE_FALSE => sb.append("false")
              case JsonToken.VALUE_NULL => sb.append("null")
              case _ => done = true
            }
            first = false
            if (depth == 0) done = true
            else parser.nextToken()
          }
          sb.toString
        }

        def scalarText(t: JsonToken): String = t match {
          case JsonToken.VALUE_STRING => parser.getText
          case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT => parser.getText
          case JsonToken.VALUE_TRUE => "true"
          case JsonToken.VALUE_FALSE => "false"
          case _ => "null"
        }

        def walkObject(): Unit = {
          // currentToken == START_OBJECT
          var t = parser.nextToken()
          while (t != JsonToken.END_OBJECT && t != null) {
            val name = parser.currentName()
            t = parser.nextToken()
            path += name
            t match {
              case JsonToken.START_OBJECT => walkObject()
              case JsonToken.START_ARRAY => emit(rawSubtree())
              case other => emit(scalarText(other))
            }
            path.remove(path.size - 1)
            t = parser.nextToken()
          }
        }

        parser.nextToken() match {
          case null => return null
          case JsonToken.START_OBJECT => walkObject()
          case JsonToken.START_ARRAY => emit(rawSubtree())
          case other => emit(scalarText(other))
        }
        // trailing garbage after the top-level value ⇒ malformed: the
        // contract (and DuckDB's json()) rejects `{"a":1} xyz`
        if (parser.nextToken() != null) return null
        new GenericArrayData(rows.toArray[Any])
      } finally parser.close()
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException => null
    }
  }

  private def escape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
