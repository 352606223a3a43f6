package graft.bde

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/**
 * Layered key-value configuration — the semantics of the reference's
 * LINZ::Config stack as exercised by `t/linz_bde_uploader.t:232-314` and
 * documented in `bin/linz_bde_uploader.pl:385-410`:
 *
 *  - the BASE file is `-config-path` itself;
 *  - `-config-extension EXT` (`-x`) parses `<cfgpath>.EXT` over it;
 *  - a `<cfgpath>.test` file, when present, is ALWAYS parsed last and
 *    overrides everything (including the extension);
 *  - format: `key value` per line (value may be empty), `#` comments,
 *    heredoc blocks `key <<MARKER` … `MARKER` for multi-line values
 *    (e.g. `db_connect_sql <<EOT`, conf/linz_bde_uploader.conf:48-52);
 *  - `{other_key}` placeholders interpolate at lookup time, plus the
 *    special `{_configdir}` (the directory of the config file, used by
 *    `bde_tables_config {_configdir}/tables.conf`, conf:114); unknown
 *    placeholders stay verbatim.
 */
final class Config(
    val values: Map[String, String],
    configDir: String) {

  /** Interpolate `{key}` references (recursively, cycle-guarded). */
  private def expand(v: String, seen: Set[String]): String =
    "\\{([A-Za-z0-9_]+)\\}".r.replaceAllIn(v, m => {
      val k = m.group(1)
      val resolved =
        if (k == "_configdir") Some(configDir)
        else if (seen.contains(k)) None // cycle: leave verbatim
        else values.get(k).map(expand(_, seen + k))
      java.util.regex.Matcher.quoteReplacement(
        resolved.getOrElse(m.group(0)))
    })

  def get(key: String): Option[String] =
    values.get(key).map(expand(_, Set(key)))
  def apply(key: String): String = get(key).getOrElse(
    throw new NoSuchElementException(s"missing config item: $key"))
  def getOrElse(key: String, default: => String): String =
    get(key).getOrElse(default)
  def double(key: String, default: Double): Double =
    get(key).filter(_.nonEmpty).map(_.toDouble).getOrElse(default)
  def long(key: String, default: Long): Long =
    get(key).filter(_.nonEmpty).map(_.toLong).getOrElse(default)
  def boolean(key: String, default: Boolean): Boolean =
    get(key).filter(_.nonEmpty)
      .map(v => v == "1" || v.equalsIgnoreCase("true")).getOrElse(default)
  /** Newline-separated list value (the `<event>_event_hooks` shape,
    * BdeUpload.pm:415-417: split on newlines, trim, drop empties). */
  def list(key: String): Seq[String] =
    get(key).toSeq.flatMap(_.split("\n")).map(_.trim).filter(_.nonEmpty)
}

object Config {

  /** Parse one file's `key value` / heredoc lines into a map (later keys
    * override earlier ones within the file, as repeated assignment does). */
  def parse(lines: Iterator[String]): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    val Heredoc = """^(\S+)\s+<<(\S+)\s*$""".r
    val KeyVal = """^(\S+)(?:\s+(.*?))?\s*$""".r
    val it = lines.buffered
    while (it.hasNext) {
      val line = it.next()
      val trimmed = line.trim
      if (trimmed.nonEmpty && !trimmed.startsWith("#")) {
        trimmed match {
          case Heredoc(key, marker) =>
            val body = new StringBuilder
            var done = false
            while (!done && it.hasNext) {
              val l = it.next()
              if (l.trim == marker) done = true
              else body.append(l).append('\n')
            }
            out(key) = body.toString.stripSuffix("\n")
          case KeyVal(key, value) =>
            out(key) = Option(value).getOrElse("")
          case _ => // unreachable: KeyVal matches any non-empty line
        }
      }
    }
    out.toMap
  }

  private def parseFile(p: Path): Map[String, String] =
    parse(Files.readAllLines(p).asScala.iterator)

  /**
   * Load the full layer stack for `cfgPath`: base → `.extension` → `.test`.
   * The base and a REQUESTED extension must exist; the `.test` overlay is
   * optional by design.
   */
  def load(cfgPath: String, extension: Option[String] = None): Config = {
    val base = Paths.get(cfgPath)
    require(Files.exists(base), s"config file not found: $cfgPath")
    var merged = parseFile(base)
    extension.foreach { ext =>
      val p = Paths.get(s"$cfgPath.$ext")
      require(Files.exists(p), s"config extension not found: $cfgPath.$ext")
      merged = merged ++ parseFile(p)
    }
    val test = Paths.get(s"$cfgPath.test")
    if (Files.exists(test)) merged = merged ++ parseFile(test)
    val dir = Option(base.toAbsolutePath.getParent).map(_.toString).getOrElse(".")
    new Config(merged, dir)
  }
}
