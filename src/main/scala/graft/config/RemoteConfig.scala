package graft.config

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.jdk.CollectionConverters._

/** S5 remote half: config load/save/log over HTTP with basic auth
  * (reference `app/config_handler.py:19-88` — `compose_config` strips
  * values equal to global/plugin defaults, `remote_load_config` GETs
  * JSON, `remote_save_config`/`remote_log` POST form-encoded
  * `json_config`/`json_result`).
  *
  * Failure semantics mirror the reference: load → None, save/log →
  * false — never throws (the reference catches RequestException and
  * logs to stderr). Driver-side only: this is the pipeline's config
  * entry point, not a data-plane operator.
  */
object RemoteConfig {

  import ConfigMerger.Conf

  /** `compose_config` (config_handler.py:19-32): keep only entries that
    * differ from BOTH the global defaults and the active plugin's
    * declared params — the minimal diff that round-trips.
    */
  def composeConfig(config: Conf, defaults: Conf, pluginDefaults: Conf = Map.empty): Conf =
    config.filter { case (k, v) =>
      !defaults.get(k).contains(v) && !pluginDefaults.get(k).contains(v)
    }

  /** Minimal JSON writer for the flat config maps this pipeline uses
    * (numbers, booleans, strings, flat sequences).
    */
  def toJson(conf: Conf): String = {
    def value(v: Any): String = v match {
      case null => "null"
      case b: Boolean => b.toString
      case n @ (_: Int | _: Long | _: Double | _: Float | _: Short | _: Byte) => n.toString
      case s: scala.collection.Seq[_] => s.map(value).mkString("[", ",", "]")
      case other => "\"" + escape(other.toString) + "\""
    }
    conf.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + escape(k) + "\":" + value(v) }
      .mkString("{", ",", "}")
  }

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Flat JSON object → Conf (ints stay Int when exact, else Double —
    * `convert_type` semantics on the wire).
    */
  def fromJson(json: String): Option[Conf] =
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(json)
      if (!node.isObject) None
      else Some(node.properties().asScala.map { e =>
        val v = e.getValue
        val sv: Any =
          if (v.isIntegralNumber) v.asLong() match {
            case l if l.isValidInt => l.toInt
            case l => l
          }
          else if (v.isNumber) v.asDouble()
          else if (v.isBoolean) v.asBoolean()
          else if (v.isTextual) v.asText()
          else if (v.isArray) v.elements().asScala.map(x =>
            if (x.isIntegralNumber) x.asLong() match {
              case l if l.isValidInt => l.toInt
              case l => l
            }
            else if (x.isNumber) x.asDouble()
            else if (x.isBoolean) x.asBoolean()
            else x.asText(): Any).toSeq
          else v.toString
        e.getKey -> sv
      }.toMap)
    } catch { case _: Exception => None }

  // val, not def: HttpClient is thread-safe and meant to be shared; a
  // fresh client per call would leak a selector thread + pool each time
  // in the reference's per-epoch remote_log loop.
  private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10))
      .build()

  private def basicAuth(user: String, password: String): String =
    "Basic " + Base64.getEncoder.encodeToString(
      s"$user:$password".getBytes(StandardCharsets.UTF_8))

  /** `remote_load_config` (config_handler.py:59-70): GET, optional basic
    * auth, JSON body → Conf; any failure → None.
    */
  def remoteLoad(url: String, username: Option[String] = None,
      password: Option[String] = None): Option[Conf] =
    try {
      val b = HttpRequest.newBuilder(URI.create(url)).GET()
      (username, password) match {
        case (Some(u), Some(p)) => b.header("Authorization", basicAuth(u, p))
        case _ => ()
      }
      val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2) None else fromJson(resp.body())
    } catch { case _: Exception => None }

  private def postForm(url: String, username: String, password: String,
      fields: Seq[(String, String)]): Boolean =
    try {
      val body = fields.map { case (k, v) =>
        URLEncoder.encode(k, "UTF-8") + "=" + URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
      val req = HttpRequest.newBuilder(URI.create(url))
        .header("Authorization", basicAuth(username, password))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(body))
        .build()
      client.send(req, HttpResponse.BodyHandlers.ofString()).statusCode() / 100 == 2
    } catch { case _: Exception => false }

  /** `remote_save_config` (config_handler.py:45-57): POST the composed
    * config as form field `json_config`; true on 2xx.
    */
  def remoteSave(config: Conf, defaults: Conf, url: String,
      username: String, password: String, pluginDefaults: Conf = Map.empty): Boolean =
    postForm(url, username, password,
      Seq("json_config" -> toJson(composeConfig(config, defaults, pluginDefaults))))

  /** `remote_log` (config_handler.py:72-88): POST config + debug/result
    * payload as `json_config` + `json_result`.
    */
  def remoteLog(config: Conf, debugInfo: Conf, defaults: Conf, url: String,
      username: String, password: String, pluginDefaults: Conf = Map.empty): Boolean =
    postForm(url, username, password, Seq(
      "json_config" -> toJson(composeConfig(config, defaults, pluginDefaults)),
      "json_result" -> toJson(debugInfo)))
}
