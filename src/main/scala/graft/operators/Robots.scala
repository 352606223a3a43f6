package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * robots.txt URL admission (RFC 9309, the Robots Exclusion Protocol) —
 * the politeness gate in front of a crawl frontier: before a URL is
 * fetched (or, curation-side, before a capture is admitted into a
 * corpus whose license posture excludes disallowed paths), the host's
 * robots rules decide it. Reference analogue: the per-table
 * include/exclude selection gating what the uploader touches
 * (`BdeUploadUtilities.pm` table selection), re-expressed for URLs.
 *
 * Semantics implemented (the RFC core):
 *  - a robots.txt is GROUPS: one or more `User-agent:` lines followed by
 *    `Allow:` / `Disallow:` rules — a rule belongs to every agent named
 *    by its group;
 *  - group selection: case-insensitive PRODUCT-TOKEN matching (RFC 9309
 *    §2.2.1 — "graftbot/1.2" selects `User-agent: graftbot` groups),
 *    `-`-boundary prefixes count with the longest matching token most
 *    specific (the Googlebot-News convention), and hosts with no
 *    matching group fall back to their `*` groups;
 *  - rule selection per URL: the LONGEST matching pattern wins (RFC
 *    §2.2.2 "most specific" = octet length of the pattern), and at
 *    equal length `Allow` beats `Disallow`; an empty `Disallow:`
 *    matches nothing; no matching rule → allowed;
 *  - `*`/`$` special characters (RFC §2.2.3): `*` matches any span,
 *    a trailing `$` anchors the pattern at the URL's end — wildcard
 *    rules translate to an anchored regex ON THE BROADCAST SIDE (a
 *    few `regexp_replace`s over the tiny rules frame); plain-prefix
 *    rules keep the cheap `startsWith` arm, so the common case never
 *    pays a regex.
 *
 * Scale shape: parsing is one per-(host,file) `flatMap` (the same
 * per-record imperative-parse family as the WARC/BDE readers — group
 * state is inherently sequential within ONE file, files parse in
 * parallel); the rules table is tiny next to the URL stream and
 * BROADCASTS, so the gate is a map-side join + one bounded per-URL
 * argmax aggregate — the URL stream never shuffles by host.
 */
object Robots {

  final case class RobotsRule(
      host: String, agent: String, allow: Boolean, prefix: String)

  /** Parse (host, robots.txt text) rows into one rule per row. Lines that
    * fit no production (comments, unknown directives, rules before any
    * `User-agent:`) are ignored, per the RFC's parse-what-you-can rule. */
  def parseRules(
      df: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(hostCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (host, txt) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[RobotsRule]
        var agents = List.empty[String]
        var inGroupHeader = false
        Option(txt).getOrElse("").linesIterator.foreach { raw =>
          val line = raw.takeWhile(_ != '#').trim
          val i = line.indexOf(':')
          if (i > 0) {
            val field = line.substring(0, i).trim.toLowerCase
            val value = line.substring(i + 1).trim
            field match {
              case "user-agent" =>
                // consecutive User-agent lines open ONE group for all of
                // them; a User-agent after rules starts a NEW group
                agents =
                  if (inGroupHeader) value.toLowerCase :: agents
                  else List(value.toLowerCase)
                inGroupHeader = true
              case "allow" | "disallow" if agents.nonEmpty =>
                inGroupHeader = false
                // empty Disallow = "matches nothing" (explicitly legal);
                // empty Allow likewise adds no information — drop both
                if (value.nonEmpty)
                  agents.foreach(a =>
                    out += RobotsRule(host, a, field == "allow", value))
              case _ => inGroupHeader = false
            }
          }
        }
        out
      }
      .toDF()
  }

  /** `Crawl-delay:` per GROUP of each robots.txt — one row per
    * (host, agent, delay_s) where `delay_s` is the group's delay (NULL
    * when the group declares none; the row still emits, because group
    * PRESENCE decides precedence — an agent whose own group has no
    * delay gets the caller's default, not the `*` group's delay, per
    * the RFC §2.2.1 selection rule that a matched group excludes all
    * others). Same state machine as [[parseRules]]: consecutive
    * `User-agent:` lines share a group, any other directive closes the
    * header, a later delay line in the same group wins (common-parser
    * behavior), non-numeric/negative values are ignored. */
  def crawlDelays(
      df: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(hostCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (host, txt) =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Option[Double])]
        var agents = List.empty[String]
        var delay: Option[Double] = None
        var inGroupHeader = false
        def flush(): Unit = agents.foreach(a => out += ((host, a, delay)))
        Option(txt).getOrElse("").linesIterator.foreach { raw =>
          val line = raw.takeWhile(_ != '#').trim
          val i = line.indexOf(':')
          if (i > 0) {
            val field = line.substring(0, i).trim.toLowerCase
            val value = line.substring(i + 1).trim
            field match {
              case "user-agent" =>
                if (!inGroupHeader) { flush(); agents = Nil; delay = None }
                agents = value.toLowerCase :: agents
                inGroupHeader = true
              case "crawl-delay" if agents.nonEmpty =>
                inGroupHeader = false
                value.toDoubleOption.filter(d => d >= 0 && d.isFinite)
                  .foreach(d => delay = Some(d))
              case _ => inGroupHeader = false
            }
          }
        }
        flush()
        out
      }
      .toDF("host", "agent", "delay_s")
  }

  /** The `Sitemap:` directives of each robots.txt (the discovery hook:
    * robots names the sitemaps, the sitemaps name the URLs). Group-
    * independent per RFC 9309 §2.3 — one row per (host, sitemap URL),
    * as pure column expressions (split / filter / extract, map-side). */
  def sitemapDirectives(
      df: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    val line = explode(split(col(txtCol), "\n")).as("__line")
    val noComment = regexp_replace(col("__line"), "#.*$", "")
    df.select(col(hostCol).as("host"), line)
      .select(col("host"),
        regexp_extract(noComment, "(?i)^\\s*sitemap\\s*:\\s*(\\S+)\\s*$", 1)
          .as("sitemap"))
      .where(col("sitemap") =!= "")
  }

  /**
   * Admit each URL its host's rules allow for `agent`. `urls` carries
   * (idCol, urlCol); returns (idCol, urlCol, allowed, rule_prefix) —
   * `rule_prefix` the deciding rule's prefix (null when no rule matched,
   * which admits). One broadcast join + one bounded per-URL argmax.
   */
  /** Host (lowercased authority) of a URL column. */
  private[graft] def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))

  /** Path+query of a URL column; empty path reads as "/" (the RFC match
    * target is the path-and-after portion). */
  private[graft] def urlPath(url: Column): Column = {
    val p = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    when(p === "", lit("/")).otherwise(p)
  }

  /**
   * The rules that apply to `agent`, one row per (host `__rh`, rule):
   * RFC group selection resolved per host (the agent's own groups if any
   * exist there, else the `*` groups), and wildcard rules (RFC §2.2.3)
   * pre-translated to an anchored regex `__rx` with column expressions —
   * strip a trailing `$` (the end anchor), escape regex metacharacters,
   * expand `*`; `__wild` marks rules that need the regex arm (plain
   * prefixes keep the `startsWith` fast path).
   */
  /** The PRODUCT TOKEN of a user-agent string (RFC 9309 §2.2.1):
    * its leading `[a-z0-9_-]` run, lowercased — "GraftBot-News/2.1
    * (+https://…)" → "graftbot-news". Matching is on tokens, never on
    * the full UA string. */
  private[graft] def productToken(agent: String): String = {
    val lower = agent.toLowerCase
    lower.takeWhile(c =>
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '-' || c == '_')
  }

  /** Rows of a per-(host, agent) frame restricted to the groups RFC
    * §2.2.1 selects for `agent`: case-insensitive PRODUCT-TOKEN
    * matching — a group's token matches when it equals the caller's
    * token or is a `-`-boundary prefix of it (the Googlebot-News
    * convention: "graftbot-news/2.1" matches `graftbot-news` and
    * `graftbot` groups, never `graft`); among matching groups the
    * LONGEST token is most specific and excludes the rest, and a host
    * with no matching group falls back to its `*` groups — the one
    * selection rule shared by rule gating and Crawl-delay resolution
    * ([[Frontier.hostDelays]]). */
  private[graft] def selectGroups(
      df: DataFrame, agent: String): DataFrame = {
    val tok = productToken(agent)
    // the stored agent values are lowercased at parse; extract each
    // group's own product token (a versioned group line like
    // "graftbot/2.0" still selects for "graftbot")
    val g = regexp_extract(col("agent"), "^([a-z0-9_-]+)", 1)
    // (tok + "-") startsWith (g + "-") covers equality AND the
    // '-'-boundary prefix in one comparison
    val m = g =!= "" &&
      lit(tok + "-").startsWith(concat(g, lit("-")))
    val perHost = df.groupBy(col("host"))
      .agg(max(when(m, length(g))).as("__best"))
    df.join(perHost, "host")
      .where(when(col("__best").isNotNull, m && length(g) === col("__best"))
        .otherwise(col("agent") === "*"))
      .drop("__best")
  }

  private[graft] def applicableRules(
      rules: DataFrame, agent: String): DataFrame = {
    val anchored = col("prefix").endsWith("$")
    val core = when(anchored,
      expr("substring(prefix, 1, length(prefix) - 1)")).otherwise(col("prefix"))
    val esc = regexp_replace(core, "[.^$+?()\\[\\]{}|\\\\]", "\\\\$0")
    val rx = concat(lit("^"), regexp_replace(esc, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
    selectGroups(rules, agent)
      .select(col("host").as("__rh"), col("allow"), col("prefix"),
        (col("prefix").contains("*") || anchored).as("__wild"), rx.as("__rx"))
  }

  /** The applicable rules collapsed to ONE row per host with the rules
    * as an array — the broadcast shape of the stateless per-row gate
    * ([[verdict]]; the streaming door's form, where the batch gate's
    * groupBy argmax would be a stateful streaming aggregation). */
  private[graft] def hostRuleSets(rules: DataFrame, agent: String): DataFrame =
    applicableRules(rules, agent)
      .groupBy(col("__rh"))
      .agg(collect_list(struct(col("allow"), col("prefix"),
        col("__wild").as("wild"), col("__rx").as("rx"))).as("__rules"))

  private val RuleStructDdl =
    "struct<allow:boolean,prefix:string,wild:boolean,rx:string>"

  /** (allowed, deciding prefix) of one path against its host's rule
    * array — pure per-row expressions: filter the matching rules, fold
    * to the RFC argmax (longest pattern, allow over disallow). A null
    * array (host without rules) admits. */
  private[graft] def verdict(path: Column, rulesArr: Column): (Column, Column) = {
    val hits = filter(
      coalesce(rulesArr, array().cast(s"array<$RuleStructDdl>")),
      r => when(r.getField("wild"), regexp_like(path, r.getField("rx")))
        .otherwise(path.startsWith(r.getField("prefix"))))
    def key(r: Column) = struct(length(r.getField("prefix")),
      r.getField("allow").cast("int"), r.getField("prefix"))
    val best = aggregate(hits, lit(null).cast(RuleStructDdl),
      (acc, r) => when(acc.isNull || key(r) > key(acc), r).otherwise(acc))
    (coalesce(best.getField("allow"), lit(true)), best.getField("prefix"))
  }

  def gate(
      urls: DataFrame, rules: DataFrame, agent: String,
      idCol: String, urlCol: String): DataFrame = {
    val applicable = applicableRules(rules, agent)
    val joined = urls
      .withColumn("__host", urlHost(col(urlCol)))
      .withColumn("__path", urlPath(col(urlCol)))
      .join(broadcast(applicable),
        col("__host") === col("__rh") &&
          when(col("__wild"), regexp_like(col("__path"), col("__rx")))
            .otherwise(col("__path").startsWith(col("prefix"))),
        "left")
    // longest prefix wins; ties break to allow — exactly max over the
    // (length, allow) pair; no match (null length) admits
    val verdict = joined.groupBy(col(idCol))
      .agg(first(col(urlCol)).as(urlCol),
        max_by(struct(length(col("prefix")).as("l"),
            col("allow").cast("int").as("a"), col("prefix").as("p")),
          // prefix itself is the last tiebreak so the REPORTED deciding
          // rule is deterministic when two equal-length same-verdict
          // rules both match
          struct(length(col("prefix")), col("allow").cast("int"),
            col("prefix")))
          .as("__best"))
    verdict.select(col(idCol), col(urlCol),
      coalesce(col("__best.a") === 1, lit(true)).as("allowed"),
      col("__best.p").as("rule_prefix"))
  }
}
