package graft.bde

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, StringType, TimestampType}

/**
 * S4 — the row cleanser/normalizer (the reference's `bde_copy` C++ filter,
 * configured at /root/reference/conf/linz_bde_uploader.conf:349-1245),
 * re-expressed as a config-driven pipeline of codegen'd Column expressions:
 *
 *  - date-range repair: dates before `minimum_year` are replaced by the
 *    sentinel (`invalid_datetime_string 1800-01-01 00:00:00`,
 *    `invalid_date_string 01/01/1800` — conf:379-383);
 *  - spatial fields: prefix WKT with `SRID=4167;` and shift longitudes by
 *    `longitude_offset 160.0` (conf:390-391) so they land in [0, 360)
 *    across the antimeridian;
 *  - UTF-8 policy: control characters stripped (`utf8_replace_invalid
 *    delete`, conf:407-419);
 *  - character replacement map (conf:421-1242): an ordered list of
 *    from→to substitutions compiled into a chain of `translate`/`replace`
 *    expressions. The reference ships ~200 entries; the map here is config
 *    data, not code — callers pass their own, and the default carries a
 *    representative set.
 *
 * Everything is a pure `Column` transform — no UDFs, so the cleanser stays
 * inside whole-stage codegen and fuses with the file scan at any scale.
 */
object Clean {

  /** Cleansing rules (field names mirror the reference config keys). */
  final case class CleanConfig(
      minimumYear: Int = 1800,
      invalidDatetime: String = "1800-01-01 00:00:00",
      invalidDate: String = "1800-01-01",
      wktPrefix: String = "SRID=4167;",
      longitudeOffset: Double = 160.0,
      replaceMap: Seq[(String, String)] = DefaultReplaceMap,
      stripControlChars: Boolean = true,
      /** `utf8_replace_invalid` (conf:408): policy for undecodable bytes —
        * which surface as U+FFFD once Spark has decoded the string. Some("")
        * = the reference's `delete` mode, Some(r) = replace with r, None =
        * keep. Applied BEFORE the map (the reference validates at decode). */
      utf8ReplaceInvalid: Option[String] = None,
      /** `utf8_replace_unmapped` (conf:409): characters the map doesn't
        * allow (anything above U+017E in the LDS profile) become this.
        * Applied after the map. None = keep everything. */
      replaceUnmapped: Option[String] = None,
      /** Columns carrying POINT WKT that get the SRID prefix + longitude
        * shift (the reference applies spatial rules to geometry columns). */
      spatialColumns: Set[String] = Set.empty)

  /** Representative character substitutions (mechanism parity with
    * conf:421-547: typographic punctuation → ASCII). */
  val DefaultReplaceMap: Seq[(String, String)] = Seq(
    "–" -> "-",  // en dash
    "—" -> "-",  // em dash
    "‘" -> "'",  // left single quote
    "’" -> "'",  // right single quote
    "“" -> "\"", // left double quote
    "”" -> "\"", // right double quote
    "×" -> "x")  // multiplication sign

  /**
   * The reference's full LDS character-mapping profile
   * (conf/linz_bde_uploader.conf:349-1245), reconstructed from its RULES
   * rather than transcribed row-by-row: the format's own characters are
   * escaped (`|` and `\` → space, newline/CR → the two-character escapes),
   * every C0 control except tab/LF/CR and every C1 control (U+0080-U+009F)
   * is deleted, U+00A0-U+017E is the allowed range (identity, so its 224
   * keep-entries need no representation) with six punctuation
   * transliterations, and everything above the range is "unmapped" —
   * handled by [[CleanConfig.replaceUnmapped]] → '?'.
   */
  val LdsReplaceMap: Seq[(String, String)] =
    Seq("|" -> " ", "\\" -> " ", "\n" -> "\\n", "\r" -> "\\r") ++
      (0x01 to 0x1F).filterNot(Seq(0x09, 0x0A, 0x0D).contains)
        .map(c => c.toChar.toString -> "") ++
      (0x80 to 0x9F).map(c => c.toChar.toString -> "") ++
      Seq(" " -> " ",  // no-break space
          "¦" -> " ",  // broken bar
          "«" -> "\"", // left guillemet
          "»" -> "\"", // right guillemet
          "·" -> ".",  // middle dot
          "´" -> "'")  // acute accent

  /** The complete LDS cleansing profile: full map + both UTF-8 policies
    * (`utf8_replace_invalid delete`, `utf8_replace_unmapped ?`). */
  def ldsConfig: CleanConfig = CleanConfig(
    replaceMap = LdsReplaceMap,
    stripControlChars = false,     // the map itself deletes C0/C1
    utf8ReplaceInvalid = Some(""), // 'delete' mode
    replaceUnmapped = Some("?"))

  /** Timestamps before `minimum_year` → the invalid-datetime sentinel. */
  def repairTimestamp(c: Column, cfg: CleanConfig = CleanConfig()): Column =
    when(year(c) < cfg.minimumYear,
      to_timestamp(lit(cfg.invalidDatetime), "yyyy-MM-dd HH:mm:ss"))
      .otherwise(c)

  /** Dates before `minimum_year` → the invalid-date sentinel. */
  def repairDate(c: Column, cfg: CleanConfig = CleanConfig()): Column =
    when(year(c) < cfg.minimumYear, to_date(lit(cfg.invalidDate), "yyyy-MM-dd"))
      .otherwise(c)

  /** String cleansing: control-char strip + ordered replacement map.
    * Single-char→single-char pairs compile to ONE `translate`; the rest
    * chain `replace` calls in map order. */
  def cleanString(c: Column, cfg: CleanConfig = CleanConfig()): Column = {
    val stripped =
      if (cfg.stripControlChars)
        regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")
      else c
    val (oneToOne, general) = cfg.replaceMap.partition {
      case (f, t) => f.length == 1 && t.length == 1
    }
    val translated =
      if (oneToOne.nonEmpty)
        translate(stripped, oneToOne.map(_._1).mkString, oneToOne.map(_._2).mkString)
      else stripped
    general.foldLeft(translated) { case (acc, (f, t)) =>
      replace(acc, lit(f), lit(t))
    }
  }

  /**
   * Spatial cleanse for a `POINT(lon lat)` WKT string: shift the longitude
   * by `longitude_offset` and prepend the SRID prefix. Coordinates are
   * rendered at fixed precision so the output is engine-reproducible.
   */
  def shiftPointWkt(c: Column, cfg: CleanConfig = CleanConfig()): Column = {
    val lon = regexp_extract(c, "POINT\\(([-0-9.]+) ([-0-9.]+)\\)", 1).cast("double")
    val lat = regexp_extract(c, "POINT\\(([-0-9.]+) ([-0-9.]+)\\)", 2).cast("double")
    format_string(s"${cfg.wktPrefix}POINT(%.6f %.6f)",
      lon + lit(cfg.longitudeOffset), lat)
  }

  /**
   * The whole-row cleanser the load path applies to every BDE frame (the
   * reference pipes EVERY production file through bde_copy,
   * lib/LINZ/BdeUpload.pm:1146-1224): schema-driven — timestamps/dates get
   * the sentinel repair, strings the control-strip + replacement map, and
   * configured spatial columns the WKT prefix + longitude shift. Pure
   * column expressions; fuses with the file scan under whole-stage codegen.
   */
  def applyTo(df: DataFrame, cfg: CleanConfig = CleanConfig()): DataFrame = {
    val cleaned = df.schema.fields.map { f =>
      val c = col(f.name)
      (f.dataType match {
        case TimestampType => repairTimestamp(c, cfg)
        case DateType      => repairDate(c, cfg)
        case StringType if cfg.spatialColumns.contains(f.name.toLowerCase) =>
          shiftPointWkt(c, cfg)
        case StringType    => cleanString(c, cfg)
        case _             => c
      }).as(f.name)
    }
    df.select(cleaned.toIndexedSeq: _*)
  }
}

/** DuckDB renderings of [[Clean]] — same rules, same arithmetic, so the
  * correctness oracle evaluates the cleanser independently. */
object CleanSql {
  import Clean._

  def repairTimestamp(c: String, cfg: CleanConfig = CleanConfig()): String =
    s"(case when year($c) < ${cfg.minimumYear} " +
      s"then TIMESTAMP '${cfg.invalidDatetime}' else $c end)"

  def repairDate(c: String, cfg: CleanConfig = CleanConfig()): String =
    s"(case when year($c) < ${cfg.minimumYear} " +
      s"then DATE '${cfg.invalidDate}' else $c end)"

  def cleanString(c: String, cfg: CleanConfig = CleanConfig()): String = {
    val stripped =
      if (cfg.stripControlChars)
        s"regexp_replace($c, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')"
      else c
    cfg.replaceMap.foldLeft(stripped) { case (acc, (f, t)) =>
      val tq = t.replace("'", "''")
      val fq = f.replace("'", "''")
      s"replace($acc, '$fq', '$tq')"
    }
  }

  def shiftPointWkt(c: String, cfg: CleanConfig = CleanConfig()): String = {
    val pat = "'POINT\\(([-0-9.]+) ([-0-9.]+)\\)'"
    s"printf('${cfg.wktPrefix}POINT(%.6f %.6f)', " +
      s"regexp_extract($c, $pat, 1)::DOUBLE + ${cfg.longitudeOffset}, " +
      s"regexp_extract($c, $pat, 2)::DOUBLE)"
  }
}
