package graft.config

/** Config assembly (SURVEY §3 step 2; reference `app/config.py:3-84`,
  * `app/config_merger.py:18-77`).
  *
  * Reference precedence: plugins < DEFAULT_VALUES < file < CLI — note the
  * quirk SURVEY flags: global defaults override plugin-declared params
  * (then file config overrides both). That behavior is preserved behind
  * `compatQuirk = true` (the default, matching the reference); with
  * `compatQuirk = false` plugin params beat bare defaults, the ordering a
  * plugin author would expect.
  */
object ConfigMerger {

  type Conf = Map[String, Any]

  /** `convert_type` (config_merger.py:9-16): int, else float, else the
    * raw string (F15 numeric coercion, driver-side form).
    */
  def convertType(s: String): Any =
    s.toIntOption.getOrElse(s.toDoubleOption.getOrElse(s): Any)

  def merge(pluginParams: Conf, defaults: Conf, fileConf: Conf, cli: Conf,
      compatQuirk: Boolean = true): Conf = {
    val base =
      if (compatQuirk) pluginParams ++ defaults // defaults clobber plugins (reference)
      else defaults ++ pluginParams
    base ++ fileConf ++ cli
  }

  /** CLI args `--key value` → typed Conf (unknown args pass through, like
    * `parse_args`'s (known, unknown) split).
    */
  def parseCliArgs(args: Seq[String]): Conf = {
    val out = scala.collection.mutable.Map.empty[String, Any]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--") && i + 1 < args.length && !args(i + 1).startsWith("--")) {
        out(a.stripPrefix("--")) = convertType(args(i + 1))
        i += 2
      } else if (a.startsWith("--")) {
        out(a.stripPrefix("--")) = true
        i += 1
      } else i += 1
    }
    out.toMap
  }
}
