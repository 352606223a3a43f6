package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * HTML → text extraction — the step BEFORE every text operator in a web
 * pipeline (the reference ingests pre-structured exports; a crawl corpus
 * starts as markup). Two tiers, one shared mechanism:
 *
 *  - [[htmlToText]]: structural cleanup — comments and
 *    script/style/noscript/template blocks removed, block-level tags
 *    become line breaks, remaining tags stripped, core entities decoded,
 *    whitespace normalized, empty lines dropped;
 *  - [[extractMainText]]: jusText/trafilatura-style boilerplate pruning on
 *    top — a block whose LINK DENSITY (anchor-text tokens / block tokens)
 *    exceeds `maxLinkDensity` is dropped (nav bars, footers, related-link
 *    boxes are mostly anchors; body prose is not). Density is measured in
 *    whitespace TOKENS, not characters, so the measure is agnostic to
 *    UTF-16 vs codepoint length semantics across engines.
 *
 * Scale shape: the whole extraction is ONE map-side projection — regex
 * rewrites + higher-order array functions (split → per-block transform →
 * filter → join), no explode, no shuffle, no per-row UDF. Spark's
 * higher-order functions run as interpreted expressions (CodegenFallback),
 * the documented cost of keeping block structure in-row; the operator
 * stays embarrassingly parallel and pipelines with any downstream gate.
 *
 * Contract notes: entity decoding covers the five XML entities + nbsp
 * (the long tail of named entities passes through verbatim); tag matching
 * is regex-level (a pathological unclosed `<script` swallows to the next
 * `</script>` or end of document — the standard tradeoff short of a full
 * parser); NULL html yields NULL text.
 */
object HtmlOps {

  private val BlockTags =
    "p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|section|article|" +
      "header|footer|blockquote|nav|pre|form"

  /** Comments and content-bearing non-text blocks out; block tags → '\n'. */
  private def preClean(h: Column): Column = {
    val noComments = regexp_replace(h, "(?s)<!--.*?-->", " ")
    val noBlocks = Seq("script", "style", "noscript", "template")
      .foldLeft(noComments)((c, t) =>
        regexp_replace(c, s"(?is)<$t[^>]*>.*?</$t>", " "))
    // the name must END at the match — without the boundary `li` eats
    // every `<link …>` and `p` every `<picture>`. Engine-side the
    // boundary is a one-char LOOKAHEAD (Java regex; measured ~15%
    // cheaper on the crawl pipeline than an alternation tail); the SQL
    // mirror's RE2 cannot look ahead and uses the equivalent
    // `(?:>|[\s/][^>]*>)` alternation — the `>` may sit IN the
    // lookahead class because `[^>]*>` still consumes it, but must not
    // join a consuming class (then `<p>` would swallow through the
    // next tag's close)
    regexp_replace(noBlocks, s"(?i)</?(?:$BlockTags)(?=[\\s/>])[^>]*>", "\n")
  }

  /** Strip inline tags, decode core entities (amp LAST — else '&amp;lt;'
    * would double-decode), collapse spaces, trim. */
  private def stripInline(b: Column): Column = {
    val noTags = regexp_replace(b, "<[^>]*>", " ")
    val ent = replace(replace(replace(replace(replace(
      noTags,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&nbsp;"), lit(" "))
    trim(regexp_replace(replace(ent, lit("&amp;"), lit("&")), "[ \\t\\r]+", " "))
  }

  /** Anchor-text token count of a raw block (anchors may carry inline
    * markup of their own — stripped before counting). */
  private def linkTokens(b: Column): Column =
    coalesce(
      aggregate(
        transform(
          regexp_extract_all(b, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)),
          a => size(TextOps.tokens(stripInline(a)))),
        lit(0), (acc, x) => acc + x),
      lit(0))

  /** Full structural extraction: every non-empty text block, one per line. */
  def htmlToText(html: Column): Column =
    array_join(
      filter(transform(split(preClean(html), "\n"), stripInline(_)),
        t => t =!= ""),
      "\n")

  /** [[htmlToText]] + link-density boilerplate pruning. */
  def mainText(html: Column, maxLinkDensity: Double): Column = {
    val enriched = transform(split(preClean(html), "\n"),
      b => struct(stripInline(b).as("t"), linkTokens(b).as("lt")))
    val kept = filter(enriched, c =>
      c.getField("t") =!= "" &&
        c.getField("lt").cast("double") <=
          lit(maxLinkDensity) * size(TextOps.tokens(c.getField("t"))).cast("double"))
    array_join(transform(kept, _.getField("t")), "\n")
  }

  /** Dataset form of [[htmlToText]]: (id, text). */
  def extract(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol), htmlToText(col(htmlCol)).as("text"))

  /** Dataset form of [[mainText]]: (id, text) with boilerplate pruned. */
  def extractMainText(
      df: DataFrame,
      idCol: String,
      htmlCol: String,
      maxLinkDensity: Double = 0.5): DataFrame =
    df.select(col(idCol), mainText(col(htmlCol), maxLinkDensity).as("text"))

  /** One row (idCol, link) per outgoing hyperlink: `href`s of anchor
    * tags after comment/script/style removal (commented-out markup
    * never links), entity-decoded, FRAGMENT-stripped, and resolved
    * against the page's own URL per RFC 3986 §5 — absolute http(s)
    * links pass through, protocol-relative (`//…`) take the base
    * scheme, query-relative (`?…`) take the base path (§5.3),
    * root-relative (`/…`) take the base origin, and other relative
    * paths merge onto the base directory (§5.2.3); both path-carrying
    * forms then run dot-segment removal (§5.2.4: `./` drops, `../`
    * pops one directory, clamped at the root). Non-fetchable schemes
    * like `mailto:` / `javascript:` / `data:` drop. Duplicates emit
    * as-is — edge collapsing belongs to the graph builder
    * ([[graft.operators.Graph]]). Pure map-side: regex extract-all +
    * explode + an array fold, no UDF, no shuffle. */
  def extractLinks(
      df: DataFrame, idCol: String, htmlCol: String,
      baseUrlCol: String): DataFrame = {
    val hrefs = regexp_extract_all(preClean(col(htmlCol)),
      lit(HrefPattern), lit(1))
    df.select(Seq(col(idCol), explode(hrefs).as("__href")) ++
        baseParts(col(baseUrlCol)): _*)
      .select(col(idCol), resolveHref(col("__href")).as("link"))
      .where(col("link").isNotNull)
  }

  /** [[extractLinks]] keeping each link's ANCHOR TEXT — the target-side
    * description signal (the linking pages' words describe the linked
    * page better than its own markup — classic web-IR anchor evidence).
    * One row (idCol, link, anchor) per href'd anchor element; the
    * anchor text is inline-stripped/entity-decoded like any text block
    * and may be empty (image links). Same resolution/drop rules and the
    * same map-side shape as [[extractLinks]]. */
  def extractAnchors(
      df: DataFrame, idCol: String, htmlCol: String,
      baseUrlCol: String): DataFrame =
    extractAnchorsRel(df, idCol, htmlCol, baseUrlCol).drop("nofollow")

  /** The `href` attribute of an anchor's OPEN tag. The `\s` boundary
    * before `href` (the tag name's end or a previous attribute's end)
    * keeps `data-href` / `xlink:href` from matching as a suffix. The
    * value class excludes both quote characters, so a mismatched-quote
    * attribute truncates at the first quote rather than swallowing the
    * rest of the tag. */
  private val AnchorOpen = "<a\\s(?:[^>]*?\\s)?"
  private val HrefPattern =
    s"(?is)${AnchorOpen}href\\s*=\\s*[\"']([^\"'>]*)[\"']"

  /** `<link>` tags whose `rel` is exactly `canonical` (quoted or
    * unquoted, either attribute order) — the canonical link element,
    * RFC 6596. Multi-token `rel` lists are out of the stated subset. */
  // the \s boundary anchors rel= at an ATTRIBUTE position (the
  // AnchorOpen rule): 'rel=canonical' inside an href VALUE must not
  // select the tag; the terminator admits '/' for self-closing tags
  private val CanonicalRelRe = "(?i)\\srel\\s*=\\s*[\"']?canonical[\"'\\s>/]"

  /**
   * The page's DECLARED canonical URL (`<link rel="canonical"
   * href=…>`, RFC 6596 — the mirror/variant-collapse signal every
   * production pipeline honors before content dedup): the FIRST such
   * element after comment/script/style removal (per-spec there is at
   * most one; duplicates take document order), its href resolved
   * against the page URL by the same RFC 3986 rules as
   * [[extractLinks]]. One row per input row: (idCol, canonical —
   * NULL when absent/non-fetchable). Map-side: tag extraction is one
   * `regexp_extract_all` + array ops, no shuffle.
   */
  def extractCanonical(
      df: DataFrame, idCol: String, htmlCol: String,
      baseUrlCol: String): DataFrame = {
    val tags = regexp_extract_all(preClean(col(htmlCol)),
      lit("(?is)<link\\b[^>]*>"), lit(0))
    // try_element_at: a page with no canonical declaration filters to
    // an empty array, which must yield NULL, not an index error
    val canonTag = try_element_at(
      filter(tags, t => t.rlike(CanonicalRelRe)), lit(1))
    val href = regexp_extract(canonTag,
      "(?is)\\bhref\\s*=\\s*[\"']([^\"'>]*)[\"']", 1)
    df.select(Seq(col(idCol),
        when(href === "" || href.isNull, lit(null)).otherwise(href)
          .as("__href")) ++
        baseParts(col(baseUrlCol)): _*)
      .select(col(idCol), resolveHref(col("__href")).as("canonical"))
  }

  /** A comma-separated directive list contains `tok` (case-insensitive,
    * whitespace-tolerant) — the robots-META content grammar. */
  private def directiveHas(content: Column, tok: String): Column =
    content.rlike(s"(?i)(^|,)\\s*$tok\\s*(,|$$)")

  /**
   * Page-level robots META directives — the HTML-side counterpart of
   * robots.txt (documented by every major engine; robots.txt gates the
   * FETCH, this gates what the fetched page may feed): `<meta
   * name="robots" content="…">` (either attribute order, quoted or
   * unquoted name), `noindex` / `nofollow` matched as tokens of the
   * comma-separated content list — `noindex` drops the page from the
   * text corpus/index, `nofollow` voids ALL its outgoing edges for the
   * link graph. Returns (idCol, noindex, nofollow); a page without the
   * tag is (false, false). Map-side, no shuffle.
   */
  def extractMetaRobots(
      df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val tags = regexp_extract_all(preClean(col(htmlCol)),
      lit("(?is)<meta\\b[^>]*>"), lit(0))
    // ALL robots metas combine (the documented engine behavior — a CMS
    // emits one tag, a plugin another); name anchored at an attribute
    // position, '/' admitted for self-closing tags
    val robots = filter(tags, t =>
      t.rlike("(?i)\\sname\\s*=\\s*[\"']?robots[\"'\\s>/]"))
    def anyHas(tok: String) = exists(robots, t => {
      val q = regexp_extract(t,
        "(?is)\\scontent\\s*=\\s*[\"']([^\"'>]*)[\"']", 1)
      val u = regexp_extract(t,
        "(?is)\\scontent\\s*=\\s*([^\\s\"'>]+)", 1)
      directiveHas(when(q =!= "", q).otherwise(u), tok)
    })
    df.select(col(idCol),
      coalesce(anyHas("noindex"), lit(false)).as("noindex"),
      coalesce(anyHas("nofollow"), lit(false)).as("nofollow"))
  }

  /**
   * [[extractLinks]] carrying each link's `rel="nofollow"` verdict —
   * the anchor-level edge annotation (the original Google 2005
   * semantic): a nofollow'd link still names a fetchable URL for the
   * frontier, but the link graph must not flow rank through it.
   * One row (idCol, link, nofollow) per href'd anchor; page-level META
   * `nofollow` ([[extractMetaRobots]]) composes by OR-ing over every
   * row of the page. Same per-element extraction shape as
   * [[extractAnchors]].
   */
  def extractLinksRel(
      df: DataFrame, idCol: String, htmlCol: String,
      baseUrlCol: String): DataFrame = {
    val elems = regexp_extract_all(preClean(col(htmlCol)),
      lit(s"(?is)$AnchorOpen[^>]*>.*?</a>"), lit(0))
    val open = regexp_extract(col("__a"), "(?is)^(<a[^>]*>)", 1)
    // \s-anchored like CanonicalRelRe: 'rel=nofollow' inside an href
    // VALUE (or a data-rel attribute) must not flag the link
    val rel = regexp_extract(open,
      "(?is)\\srel\\s*=\\s*[\"']([^\"'>]*)[\"']", 1)
    val relUnq = regexp_extract(open,
      "(?is)\\srel\\s*=\\s*([^\\s\"'>]+)", 1)
    val nofollow = directiveHas(
      when(rel =!= "", rel).otherwise(relUnq), "nofollow") ||
      // rel lists are SPACE-separated in HTML (the comma grammar is the
      // META content's); accept both
      when(rel =!= "", rel).otherwise(relUnq)
        .rlike("(?i)(^|\\s)nofollow(\\s|$)")
    df.select(Seq(col(idCol), explode(elems).as("__a")) ++
        baseParts(col(baseUrlCol)): _*)
      .select(col(idCol),
        resolveHref(regexp_extract(col("__a"), HrefPattern, 1)).as("link"),
        coalesce(nofollow, lit(false)).as("nofollow"))
      .where(col("link").isNotNull)
  }

  /** [[extractAnchors]] and [[extractLinksRel]] fused into ONE element
    * pass — (idCol, link, anchor, nofollow) — so a per-edge consumer
    * (the WAT sidecar) extracts anchors once instead of joining two
    * per-element extractions on a non-key. Same resolution, anchor
    * stripping, and rel grammar as the two single-signal operators. */
  def extractAnchorsRel(
      df: DataFrame, idCol: String, htmlCol: String,
      baseUrlCol: String): DataFrame = {
    val elems = regexp_extract_all(preClean(col(htmlCol)),
      lit(s"(?is)$AnchorOpen[^>]*>.*?</a>"), lit(0))
    val open = regexp_extract(col("__a"), "(?is)^(<a[^>]*>)", 1)
    val rel = regexp_extract(open,
      "(?is)\\srel\\s*=\\s*[\"']([^\"'>]*)[\"']", 1)
    val relUnq = regexp_extract(open,
      "(?is)\\srel\\s*=\\s*([^\\s\"'>]+)", 1)
    val nofollow = directiveHas(
      when(rel =!= "", rel).otherwise(relUnq), "nofollow") ||
      when(rel =!= "", rel).otherwise(relUnq)
        .rlike("(?i)(^|\\s)nofollow(\\s|$)")
    df.select(Seq(col(idCol), explode(elems).as("__a")) ++
        baseParts(col(baseUrlCol)): _*)
      .select(col(idCol),
        resolveHref(regexp_extract(col("__a"), HrefPattern, 1)).as("link"),
        stripInline(regexp_replace(col("__a"), "(?is)^<a[^>]*>|</a>$", " "))
          .as("anchor"),
        coalesce(nofollow, lit(false)).as("nofollow"))
      .where(col("link").isNotNull)
  }

  /** (scheme `__s`, origin `__o`, directory `__d`, path `__p`) of a
    * base URL — the four resolution anchors of [[resolveHref]]: `__d`
    * is the full directory URL (origin + path up to the last `/`) for
    * path-relative merges, `__p` the full base-path URL (base minus
    * query/fragment) for query-relative references (RFC 3986 §5.3). */
  private def baseParts(base: Column): Seq[Column] = {
    val noQ = regexp_replace(base, "[?#].*$", "")
    val scheme = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    val origin = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val dir = when(noQ === origin, concat(origin, lit("/")))
      .otherwise(regexp_replace(noQ, "/[^/]*$", "/"))
    Seq(scheme.as("__s"), origin.as("__o"), dir.as("__d"), noQ.as("__p"))
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over a root-anchored path
    * (`/…`): fold the segments after the root — `.` drops, `..` pops
    * one segment (clamped at the root, per the algorithm's empty-stack
    * case), anything else (empty segments included, so `a//b` is
    * preserved) appends. A path ending in a bare `.` or `..` segment
    * normalizes to a directory (trailing `/`). A pure array fold —
    * stays map-side. */
  private def removeDotSegments(path: Column): Column = {
    val segs = split(path, "/")
    val folded = aggregate(
      // drop the leading "" the root split produces
      slice(segs, lit(2), greatest(size(segs) - 1, lit(0))),
      array().cast("array<string>"),
      (acc, s) =>
        when(s === ".", acc)
          .when(s === "..", slice(acc, lit(1), greatest(size(acc) - 1, lit(0))))
          .otherwise(concat(acc, array(s))))
    val joined = concat(lit("/"), array_join(folded, "/"))
    when(path.rlike("(^|/)\\.\\.?$") && !joined.endsWith("/"),
      concat(joined, lit("/"))).otherwise(joined)
  }

  /** Entity-decode, fragment-strip, and resolve one raw href against
    * the `__s`/`__o`/`__d`/`__p` base parts per RFC 3986 §5; NULL =
    * drop (empty after the fragment strip, or a non-fetchable
    * scheme). */
  private def resolveHref(href: Column): Column = {
    val decoded = replace(replace(replace(replace(replace(
      href,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))
    val u = trim(regexp_replace(decoded, "#.*$", ""))
    // dot-segment removal runs on the PATH only (§5.2.4 operates on the
    // merged path; the reference's query survives untouched)
    val uPath = regexp_replace(u, "\\?.*$", "")
    val uQuery = regexp_extract(u, "(\\?.*)$", 1)
    def withPath(rootedPath: Column): Column =
      concat(col("__o"), removeDotSegments(rootedPath), uQuery)
    val baseDirPath = col("__d").substr(length(col("__o")) + 1, lit(1 << 24))
    when(u === "", lit(null))
      .when(u.rlike("(?i)^https?://"), u)
      .when(u.startsWith("//"), concat(col("__s"), lit(":"), u))
      .when(u.startsWith("?"), concat(col("__p"), u))
      .when(u.startsWith("/"), withPath(uPath))
      .when(u.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), lit(null))
      .otherwise(withPath(concat(baseDirPath, uPath)))
  }
}

/** DuckDB rendering of [[HtmlOps]] — the same regex pipeline (RE2 and Java
  * regex agree on this conservative subset: inline (?is) flags, non-greedy
  * spans, character classes), the same entity order, the same token-density
  * rule; every regexp_replace passes 'g' to match Spark's replace-all. */
object HtmlOpsSql {

  private val BlockTags =
    "p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|section|article|" +
      "header|footer|blockquote|nav|pre|form"

  /** The preClean → per-block strip pipeline as a SQL expression over
    * `htmlExpr`, yielding a LIST of (t, lt) structs named `bl`. */
  private def strip(e: String): String =
    s"""trim(regexp_replace(
       |  replace(replace(replace(replace(replace(replace(
       |    regexp_replace($e, '<[^>]*>', ' ', 'g'),
       |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
       |    '&nbsp;', ' '), '&amp;', '&'),
       |  '[ \\t\\r]+', ' ', 'g'))""".stripMargin

  private def toks(e: String): String =
    s"len(list_filter(string_split($e, ' '), x -> x <> ''))"

  private def pre(htmlExpr: String): String =
    s"""regexp_replace(
       |  regexp_replace(
       |    regexp_replace(
       |      regexp_replace(
       |        regexp_replace(
       |          regexp_replace($htmlExpr, '(?s)<!--.*?-->', ' ', 'g'),
       |          '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
       |        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
       |      '(?is)<noscript[^>]*>.*?</noscript>', ' ', 'g'),
       |    '(?is)<template[^>]*>.*?</template>', ' ', 'g'),
       |  '(?i)</?(?:$BlockTags)(?:>|[\\s/][^>]*>)', chr(10), 'g')""".stripMargin

  private def blockList(htmlExpr: String): String =
    s"""list_transform(string_split(${pre(htmlExpr)}, chr(10)), b -> struct_pack(
       |  t := ${strip("b")},
       |  lt := coalesce(list_sum(list_transform(
       |          regexp_extract_all(b, '(?is)<a[^>]*>(.*?)</a>', 1),
       |          a -> ${toks(strip("a"))})), 0)))""".stripMargin

  /** SELECT fragment: extracted full text of `htmlExpr`. */
  def htmlToText(htmlExpr: String): String =
    s"""array_to_string(list_transform(
       |  list_filter(${blockList(htmlExpr)}, c -> c.t <> ''),
       |  c -> c.t), chr(10))""".stripMargin

  /** SELECT fragment: main text of `htmlExpr` under the density rule. */
  def mainText(htmlExpr: String, maxLinkDensity: Double): String =
    s"""array_to_string(list_transform(
       |  list_filter(${blockList(htmlExpr)}, c -> c.t <> '' AND
       |    c.lt <= CAST($maxLinkDensity AS DOUBLE) * ${toks("c.t")}),
       |  c -> c.t), chr(10))""".stripMargin
}
