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
      /** `utf8_replace_unmapped` (conf:409): characters with NO map entry
        * and outside the allowed set (ASCII + [[CleanConfig.allowedExtra]])
        * become this — bde_copy's per-input-character rule, so it applies
        * BEFORE the map (map keys and identity-kept characters are never
        * "unmapped", whatever bytes their replacements contain). None =
        * keep everything. */
      replaceUnmapped: Option[String] = None,
      /** Identity-kept code-point ranges beyond ASCII — the conf rows of
        * the form `replace \uNNNN \uNNNN`, which exist purely to mark the
        * character ALLOWED for the unmapped rule. */
      allowedExtra: Seq[(Int, Int)] = Seq.empty,
      /** Columns carrying WKT geometry (any type) that get the SRID
        * prefix + all-longitudes shift (the reference applies spatial
        * rules to geometry columns). */
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
   * The reference's full LDS character-mapping profile, transcribed
   * entry-for-entry from conf/linz_bde_uploader.conf:415-1242 and PROVED
   * equivalent by `CleanLdsConfSpec`, which re-parses the conf at test
   * time and compares the compiled pipeline against the literal rules
   * over the whole BMP. The 71 non-identity rows: the format's own
   * characters are escaped (`|` and `\` → space, newline/CR → the
   * two-character escapes), every C0 control except tab/LF/CR and every
   * C1 control (U+0080-U+009F) is deleted, and seven Latin-1 punctuation
   * rows transliterate (NBSP/broken-bar → space, guillemets → '"',
   * middle dot → '.', acute accent → quote, soft hyphen → deleted).
   * The 224 identity rows live in [[LdsKeepRanges]]; everything else
   * above ASCII is "unmapped" → [[CleanConfig.replaceUnmapped]] → '?'.
   */
  val LdsReplaceMap: Seq[(String, String)] =
    Seq("|" -> " ", "\\" -> " ", "\n" -> "\\n", "\r" -> "\\r") ++
      (0x01 to 0x1F).filterNot(Seq(0x09, 0x0A, 0x0D).contains)
        .map(c => c.toChar.toString -> "") ++
      (0x80 to 0x9F).map(c => c.toChar.toString -> "") ++
      Seq("\u00A0" -> " ",  // no-break space
          "\u00A6" -> " ",  // broken bar
          "\u00AB" -> "\"", // left guillemet
          "\u00AD" -> "",   // soft hyphen -- the one A0-17F delete
          "\u00B4" -> "'",  // acute accent
          "\u00B7" -> ".",  // middle dot
          "\u00BB" -> "\"") // right guillemet

  /** The conf's identity-kept rows as code-point ranges: Latin-1 +
    * Latin-Extended-A up to U+017F minus the transliterated/deleted
    * entries, plus the "late addition triple width substitutions"
    * (conf:1216-1241) keeping the common typographic punctuation. */
  val LdsKeepRanges: Seq[(Int, Int)] = Seq(
    0xA1 -> 0xA5, 0xA7 -> 0xAA, 0xAC -> 0xAC, 0xAE -> 0xB3,
    0xB5 -> 0xB6, 0xB8 -> 0xBA, 0xBC -> 0x17F,
    0x2013 -> 0x2014, 0x2018 -> 0x2019, 0x201C -> 0x201D, 0x2022 -> 0x2022)

  /** The complete LDS cleansing profile: full map + keep ranges + both
    * UTF-8 policies (`utf8_replace_invalid delete`,
    * `utf8_replace_unmapped ?`). */
  def ldsConfig: CleanConfig = CleanConfig(
    replaceMap = LdsReplaceMap,
    stripControlChars = false,     // the map itself deletes C0/C1
    utf8ReplaceInvalid = Some(""), // 'delete' mode
    replaceUnmapped = Some("?"),
    allowedExtra = LdsKeepRanges)

  /** Timestamps before `minimum_year` → the invalid-datetime sentinel. */
  def repairTimestamp(c: Column, cfg: CleanConfig = CleanConfig()): Column =
    when(year(c) < cfg.minimumYear,
      to_timestamp(lit(cfg.invalidDatetime), "yyyy-MM-dd HH:mm:ss"))
      .otherwise(c)

  /** Dates before `minimum_year` → the invalid-date sentinel. */
  def repairDate(c: Column, cfg: CleanConfig = CleanConfig()): Column =
    when(year(c) < cfg.minimumYear, to_date(lit(cfg.invalidDate), "yyyy-MM-dd"))
      .otherwise(c)

  /** Regex character class matching every code point the profile does
    * NOT recognize: not ASCII, not a map key, not inside an allowed
    * identity range. Shared by the Spark (java.util.regex) and DuckDB
    * (RE2) renderings — both accept `\x{HHHH}` classes. */
  private[bde] def unmappedClass(cfg: CleanConfig): String = {
    def hex(cp: Int) = f"\\x{$cp%04X}"
    val keyCls = cfg.replaceMap.map(_._1)
      .filter(k => k.length == 1 && k.charAt(0) > 0x7F)
      .map(k => hex(k.charAt(0).toInt)).mkString
    val rangeCls = cfg.allowedExtra
      .map { case (a, b) => if (a == b) hex(a) else s"${hex(a)}-${hex(b)}" }
      .mkString
    s"[^\\x00-\\x7F$keyCls$rangeCls]"
  }

  /** String cleansing in bde_copy's order: decode-time invalid handling
    * (U+FFFD is what an undecodable byte became once Spark read the
    * string), then the PER-INPUT-CHARACTER unmapped rule — a character
    * with no map entry outside the allowed set becomes the unmapped
    * replacement BEFORE the map runs, so map outputs are never re-judged
    * — then control-char strip + the ordered replacement map.
    * Single-char→single-char pairs compile to ONE `translate`; the rest
    * chain `replace` calls in map order. */
  def cleanString(c: Column, cfg: CleanConfig = CleanConfig()): Column = {
    val invalidHandled = cfg.utf8ReplaceInvalid match {
      case Some(r) => replace(c, lit("�"), lit(r))
      case None    => c
    }
    val unmappedHandled = cfg.replaceUnmapped match {
      case Some(r) => regexp_replace(invalidHandled, unmappedClass(cfg),
        java.util.regex.Matcher.quoteReplacement(r))
      case None => invalidHandled
    }
    val stripped =
      if (cfg.stripControlChars)
        regexp_replace(unmappedHandled, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")
      else unmappedHandled
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

  /** WKT type keywords that mark a value as geometry (vs arbitrary text,
    * which a spatial cleanse must pass through unharmed). */
  private val WktGuardRe =
    "^\\s*(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|" +
      "MULTIPOLYGON|GEOMETRYCOLLECTION)"

  /** A delimiter-free token that is a coordinate group (`x y[ z]`). The
    * class admits sign/dot/exponent characters but the FIRST character
    * must be numeric-ish, so type keywords and `EMPTY` never match. */
  private val CoordGroupRe = "^\\s*[-+.0-9][-+.0-9eE ]*$"

  /**
   * Spatial cleanse for a WKT geometry of ANY type: the longitude offset
   * is added to ALL longitudes (the first number of every coordinate
   * group — conf:388-391 "longitude offset is added to all longitudes"),
   * leading digits and spaces are removed (conf:387), and the SRID
   * prefix is prepended. POINT / LINESTRING / POLYGON / MULTI* /
   * GEOMETRYCOLLECTION all rewrite; non-geometry text passes through
   * untouched, and a malformed coordinate group keeps its original text
   * rather than nulling the value.
   *
   * Mechanism: mark every structural delimiter `( ) ,`, walk the
   * segments between them — they alternate between delimiters/keywords
   * and whole coordinate groups — rewrite each group (first number
   * shifted, every number re-rendered at fixed 6 dp so output is
   * engine-reproducible), and join back. Runs as the compiled native
   * [[graft.plans.ShiftWktExpr]] (one pass per row inside whole-stage
   * codegen — the cleanser sits on every production file's scan);
   * [[shiftWktColumns]] is the same algorithm as pure higher-order
   * `Column` expressions (the executable reference, pinned equal in
   * ShiftWktExprSpec) and the shape the DuckDB oracle twin
   * ([[CleanSql.shiftWkt]]) replays under RE2. For the POINT(lon lat)
   * values the cleanser emitted before this generalization, the output
   * is byte-identical.
   */
  def shiftWkt(c: Column, cfg: CleanConfig = CleanConfig()): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.ShiftWktExpr(
      ColumnBridge.expression(c), cfg.longitudeOffset, cfg.wktPrefix))
  }

  /** The declarative (pure-`functions._`) form of [[shiftWkt]] — the
    * executable reference the native [[graft.plans.ShiftWktExpr]] is
    * pinned against (ShiftWktExprSpec), and the shape the DuckDB twin
    * [[CleanSql.shiftWkt]] restates. The HOF `transform`s make it
    * CodegenFallback, which is why the hot path compiles instead. */
  def shiftWktColumns(c: Column, cfg: CleanConfig = CleanConfig()): Column = {
    val stripped = regexp_replace(c, "^[0-9 ]+", "")
    val marked =
      regexp_replace(stripped, "([(),])", "\u0001$1\u0001")
    def rewriteGroup(g: Column): Column = {
      val nums = split(trim(g), "\\s+")
      // try_cast, not cast: under ANSI (the Spark 4 default) a malformed
      // coordinate inside an otherwise numeric-looking group must fall
      // back, never throw. The casts are null-GUARDED because Spark's
      // format_string renders a NULL argument as the literal "null"
      // (Java Formatter) instead of propagating — the guards restore
      // the DuckDB twin's NULL-propagating printf semantics: an
      // unparsable FIRST number falls the whole group back to its
      // original text, an unparsable TAIL number is skipped
      // (array_join ignores null elements, like array_to_string)
      val d1 = element_at(nums, 1).try_cast("double")
      coalesce(
        when(d1.isNotNull, concat(
          format_string("%.6f", d1 + lit(cfg.longitudeOffset)),
          array_join(
            transform(slice(nums, lit(2), size(nums)),
              n => {
                val d = n.try_cast("double")
                when(d.isNotNull,
                  concat(lit(" "), format_string("%.6f", d)))
              }),
            ""))),
        g)
    }
    val rebuilt = array_join(
      transform(split(marked, "\u0001"),
        t => when(t.rlike(CoordGroupRe), rewriteGroup(t)).otherwise(t)),
      "")
    when(stripped.rlike(WktGuardRe), concat(lit(cfg.wktPrefix), rebuilt))
      .otherwise(c)
  }

  /** Former POINT-only name, kept for source compatibility. */
  def shiftPointWkt(c: Column, cfg: CleanConfig = CleanConfig()): Column =
    shiftWkt(c, cfg)

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
          shiftWkt(c, cfg)
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
    def sq(s: String) = s.replace("'", "''")
    val invalidHandled = cfg.utf8ReplaceInvalid match {
      case Some(r) => s"replace($c, chr(65533), '${sq(r)}')"
      case None    => c
    }
    val unmappedHandled = cfg.replaceUnmapped match {
      case Some(r) =>
        s"regexp_replace($invalidHandled, " +
          s"'${Clean.unmappedClass(cfg)}', '${sq(r)}', 'g')"
      case None => invalidHandled
    }
    val stripped =
      if (cfg.stripControlChars)
        s"regexp_replace($unmappedHandled, " +
          "'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')"
      else unmappedHandled
    cfg.replaceMap.foldLeft(stripped) { case (acc, (f, t)) =>
      s"replace($acc, '${sq(f)}', '${sq(t)}')"
    }
  }

  /** DuckDB replay of [[Clean.shiftWkt]] — the identical mark-split-
    * rewrite-join algorithm under RE2 (no lookarounds needed): every
    * coordinate group's first number is shifted, every number re-rendered
    * at 6 dp, non-geometry text returned untouched, malformed groups kept
    * verbatim (TRY_CAST + coalesce mirror Spark's NULL-safe cast). */
  def shiftWkt(c: String, cfg: CleanConfig = CleanConfig()): String = {
    val strip = s"regexp_replace($c, '^[0-9 ]+', '')"
    val guard = "'^\\s*(POINT|LINESTRING|POLYGON|MULTIPOINT|" +
      "MULTILINESTRING|MULTIPOLYGON|GEOMETRYCOLLECTION)'"
    val marked =
      s"regexp_replace($strip, '([(),])', chr(1) || '\\1' || chr(1), 'g')"
    val groupRe = "'^\\s*[-+.0-9][-+.0-9eE ]*$'"
    val nums = "string_split_regex(trim(t), '\\s+')"
    val grp =
      s"coalesce(printf('%.6f', TRY_CAST($nums[1] AS DOUBLE) + " +
        s"${cfg.longitudeOffset}) || array_to_string(list_transform(" +
        s"$nums[2:], n -> ' ' || printf('%.6f', TRY_CAST(n AS DOUBLE))), " +
        "''), t)"
    val body =
      s"array_to_string(list_transform(string_split($marked, chr(1)), " +
        s"t -> CASE WHEN regexp_matches(t, $groupRe) THEN $grp " +
        "ELSE t END), '')"
    s"(CASE WHEN regexp_matches($strip, $guard) " +
      s"THEN '${cfg.wktPrefix}' || $body ELSE $c END)"
  }

  /** Former POINT-only name, kept for source compatibility. */
  def shiftPointWkt(c: String, cfg: CleanConfig = CleanConfig()): String =
    shiftWkt(c, cfg)

  /** Render a Scala string as a DuckDB expression producing EXACTLY the
    * same code points: printable runs as quoted literals, control and
    * supplementary characters through `chr(cp)` — so a cleansing fixture
    * authored once in Scala drives both engines bit-identically. */
  def sqlLit(s: String): String = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    val run = new StringBuilder
    def flush(): Unit = if (run.nonEmpty) {
      parts += "'" + run.toString.replace("'", "''") + "'"
      run.clear()
    }
    s.codePoints().forEach { cp =>
      if (cp < 0x20 || cp == 0x7F || cp > 0xFFFF) {
        flush(); parts += s"chr($cp)"
      } else run.appendAll(Character.toChars(cp))
    }
    flush()
    if (parts.isEmpty) "''" else parts.mkString(" || ")
  }
}
