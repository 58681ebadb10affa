package graft.config

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.Base64

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the S5 remote config entry point against an in-process HTTP
  * server (no network egress needed).
  */
class RemoteConfigSpec extends AnyFunSuite {

  private val user = "u1"
  private val pass = "s3cret"

  private def authOk(ex: HttpExchange): Boolean = {
    val expected = "Basic " + Base64.getEncoder.encodeToString(
      s"$user:$pass".getBytes(StandardCharsets.UTF_8))
    Option(ex.getRequestHeaders.getFirst("Authorization")).contains(expected)
  }

  private def withServer[A](f: (String, () => Option[String]) => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var lastPost: Option[String] = None
    server.createContext("/config", (ex: HttpExchange) => {
      val resp =
        if (!authOk(ex)) ("""{"error":"unauthorized"}""", 401)
        else ("""{"window_size":144,"learning_rate":0.001,"plugin":"tcn","hs":[1,2,3]}""", 200)
      val bytes = resp._1.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(resp._2, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.createContext("/save", (ex: HttpExchange) => {
      val buf = new ByteArrayOutputStream()
      ex.getRequestBody.transferTo(buf)
      val code = if (authOk(ex)) { lastPost = Some(buf.toString("UTF-8")); 200 } else 401
      ex.sendResponseHeaders(code, -1)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", () => lastPost)
    finally server.stop(0)
  }

  test("remoteLoad: JSON config with typed values; bad auth/URL → None") {
    withServer { (base, _) =>
      val conf = RemoteConfig.remoteLoad(s"$base/config", Some(user), Some(pass))
      assert(conf.contains(Map(
        "window_size" -> 144, "learning_rate" -> 0.001,
        "plugin" -> "tcn", "hs" -> Seq(1, 2, 3))))
      assert(RemoteConfig.remoteLoad(s"$base/config", Some(user), Some("wrong")).isEmpty)
      assert(RemoteConfig.remoteLoad(s"$base/nope", Some(user), Some(pass)).isEmpty)
      assert(RemoteConfig.remoteLoad("http://127.0.0.1:1/x").isEmpty) // refused
    }
  }

  test("remoteSave: posts composed (non-default) config as json_config form field") {
    withServer { (base, lastPost) =>
      val defaults = Map[String, Any]("window_size" -> 144, "epochs" -> 100)
      val plugin = Map[String, Any]("activation" -> "relu")
      val config = Map[String, Any](
        "window_size" -> 144,      // = global default → stripped
        "activation" -> "relu",    // = plugin default → stripped
        "epochs" -> 400,           // overridden → kept
        "plugin" -> "tcn")         // novel → kept
      assert(RemoteConfig.remoteSave(config, defaults, s"$base/save", user, pass, plugin))
      val body = java.net.URLDecoder.decode(lastPost().get, "UTF-8")
      assert(body == """json_config={"epochs":400,"plugin":"tcn"}""")
      assert(!RemoteConfig.remoteSave(config, defaults, s"$base/save", user, "no", plugin))
    }
  }

  test("remoteLog posts json_config and json_result") {
    withServer { (base, lastPost) =>
      assert(RemoteConfig.remoteLog(
        Map("a" -> 1), Map("fitness" -> -0.25, "ok" -> true),
        Map.empty, s"$base/save", user, pass))
      val body = java.net.URLDecoder.decode(lastPost().get, "UTF-8")
      assert(body == """json_config={"a":1}&json_result={"fitness":-0.25,"ok":true}""")
    }
  }

  test("toJson/fromJson round-trip the flat config shapes") {
    val conf = Map[String, Any]("i" -> 3, "d" -> 0.5, "s" -> "x\"y", "b" -> false,
      "xs" -> Seq(1, 2), "big" -> 5000000000L)
    assert(RemoteConfig.fromJson(RemoteConfig.toJson(conf)).contains(conf))
    assert(RemoteConfig.fromJson("[1,2]").isEmpty)
    assert(RemoteConfig.fromJson("{nope").isEmpty)
  }
}
