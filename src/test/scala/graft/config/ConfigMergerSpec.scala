package graft.config

import org.scalatest.funsuite.AnyFunSuite

class ConfigMergerSpec extends AnyFunSuite {

  test("convertType: int, float, string fallback") {
    assert(ConfigMerger.convertType("42") == 42)
    assert(ConfigMerger.convertType("3.5") == 3.5)
    assert(ConfigMerger.convertType("abc") == "abc")
  }

  test("merge precedence: plugins < defaults < file < CLI (compat quirk)") {
    val merged = ConfigMerger.merge(
      pluginParams = Map("window_size" -> 32, "plugin_only" -> 1),
      defaults = Map("window_size" -> 64, "batch" -> 128),
      fileConf = Map("batch" -> 256),
      cli = Map("epochs" -> 5))
    assert(merged("window_size") == 64) // quirk: defaults clobber plugin params
    assert(merged("batch") == 256)      // file beats defaults
    assert(merged("plugin_only") == 1 && merged("epochs") == 5)
  }

  test("compatQuirk=false gives plugin params precedence over defaults") {
    val merged = ConfigMerger.merge(
      Map("window_size" -> 32), Map("window_size" -> 64), Map(), Map(),
      compatQuirk = false)
    assert(merged("window_size") == 32)
  }

  test("parseCliArgs: typed values, bare flags become true") {
    val c = ConfigMerger.parseCliArgs(
      Seq("--window_size", "144", "--lr", "0.01", "--quiet", "--name", "exp1"))
    assert(c("window_size") == 144 && c("lr") == 0.01 &&
      c("quiet") == true && c("name") == "exp1")
  }
}
