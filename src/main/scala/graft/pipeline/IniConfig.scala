package graft.pipeline

/** Minimal ini parser covering the subset of Python `configparser` syntax
  * the reference's config files use (config.cfg.example, example/config.cfg):
  * `[section]` headers, `key = value` / `key: value` pairs, full-line
  * `#`/`;` comments, blank lines. Like configparser, keys are lowercased
  * and values are whitespace-trimmed (the example file has `mode=lc  `
  * with trailing spaces); section names keep their case
  * (`[Poisson_model]`). No interpolation, no line continuations — the
  * reference configs use neither.
  */
object IniConfig {

  type Config = Map[String, Map[String, String]]

  private val section = """\s*\[([^\]]+)\]\s*""".r
  private val pair = """\s*([^=:\s][^=:]*?)\s*[=:]\s*(.*?)\s*""".r

  def parse(text: String): Config = {
    var cur: Option[String] = None
    val out = collection.mutable.LinkedHashMap.empty[String, Map[String, String]]
    text.linesIterator.foreach {
      case l if l.trim.isEmpty || l.trim.startsWith("#") || l.trim.startsWith(";") =>
      case section(name) =>
        cur = Some(name)
        if (!out.contains(name)) out(name) = Map.empty
      case pair(k, v) if cur.isDefined =>
        out(cur.get) = out(cur.get) + (k.toLowerCase -> v)
      case other =>
        throw new IllegalArgumentException(s"unparseable config line: '$other'")
    }
    out.toMap
  }

  def parseFile(path: String): Config =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))
}
