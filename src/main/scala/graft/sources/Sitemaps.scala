package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sitemap parsing (the sitemaps.org protocol — the URL-discovery half of
 * crawl admission; robots.txt names the sitemaps, the sitemaps name the
 * URLs, [[graft.operators.Robots]] gates them). Reference analogue: the
 * repository listing that names the datasets the uploader may load
 * (`LINZ::Bde::Repository`), re-expressed for crawl frontiers.
 *
 * Both document kinds parse: `<urlset>` (leaf — one `<url>` entry per
 * page with optional `<lastmod>`/`<changefreq>`/`<priority>`) and
 * `<sitemapindex>` (one `<sitemap>` entry per child sitemap). Parsing is
 * PURE column expressions — `regexp_extract_all` over the entry blocks,
 * one `explode`, per-field `regexp_extract`, XML entity unescape — so it
 * stays map-side inside whole-stage codegen: no UDF, no shuffle, no XML
 * library on the hot path (a sitemap is a 50k-entry flat list by spec —
 * a full XML DOM per document buys nothing but allocation).
 */
object Sitemaps {

  /** The five predefined XML entities, `&amp;` LAST (unescaping it first
    * would double-decode `&amp;lt;`). */
  private def unescapeXml(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
      "&amp;" -> "&")
      .foldLeft(c) { case (acc, (e, r)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(e), r)
      }

  private def field(block: Column, tag: String): Column = {
    val v = regexp_extract(block, s"(?s)<$tag>\\s*(.*?)\\s*</$tag>", 1)
    when(v === "", lit(null)).otherwise(unescapeXml(v))
  }

  /**
   * One row per sitemap entry: (idCol, kind, loc, lastmod, changefreq,
   * priority). `kind` is `index` for a `<sitemapindex>` document (its
   * `loc`s are child sitemaps to resolve and re-parse) and `urlset` for
   * a leaf (its `loc`s are page URLs for the frontier). Entries without
   * a `<loc>` are dropped, per the protocol's required-field rule.
   */
  def parse(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val xml = col(xmlCol)
    val kind = when(xml.contains("<sitemapindex"), lit("index"))
      .otherwise(lit("urlset"))
    val blocks = regexp_extract_all(xml,
      lit("(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"), lit(1))
    df.select(col(idCol), kind.as("kind"), explode(blocks).as("__b"))
      .select(col(idCol), col("kind"),
        field(col("__b"), "loc").as("loc"),
        field(col("__b"), "lastmod").as("lastmod"),
        field(col("__b"), "changefreq").as("changefreq"),
        field(col("__b"), "priority").cast("double").as("priority"))
      .where(col("loc").isNotNull)
  }
}
