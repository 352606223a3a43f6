package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SitemapsSpec extends SparkSuite {
  import spark.implicits._

  private def parse(xml: String) =
    Sitemaps.parse(Seq(("d1", xml)).toDF("id", "xml"), "id", "xml")
      .collect()
      .map(r => (r.getString(1), r.getString(2), Option(r.getString(3)),
        Option(r.getString(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toSeq

  test("urlset: loc/lastmod/changefreq/priority per entry; loc-less entries drop") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc> https://x.test/a </loc>
        |    <lastmod>2026-01-01</lastmod>
        |    <changefreq>daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc>https://x.test/b</loc></url>
        |  <url><lastmod>2026-01-02</lastmod></url>
        |</urlset>""".stripMargin
    val got = parse(xml)
    assert(got == Seq(
      ("urlset", "https://x.test/a", Some("2026-01-01"), Some("daily"),
        Some(0.8)),
      ("urlset", "https://x.test/b", None, None, None)))
  }

  test("sitemapindex: kind=index, child sitemap locs") {
    val xml =
      """<sitemapindex>
        |  <sitemap><loc>https://x.test/sm1.xml</loc>
        |    <lastmod>2026-02-01</lastmod></sitemap>
        |  <sitemap><loc>https://x.test/sm2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val got = parse(xml)
    assert(got.map(_._1).distinct == Seq("index"))
    assert(got.map(_._2) == Seq("https://x.test/sm1.xml",
      "https://x.test/sm2.xml"))
    assert(got.head._3.contains("2026-02-01"))
  }

  test("XML entities unescape, &amp; last (no double decode)") {
    val xml = "<urlset><url><loc>https://x.test/p?a=1&amp;b=2&amp;lt;</loc>" +
      "</url></urlset>"
    // &amp;lt; is the ESCAPED text "&lt;" — one decode, not two
    assert(parse(xml).map(_._2) == Seq("https://x.test/p?a=1&b=2&lt;"))
  }

  test("sitemapDirectives: case-insensitive field, comments stripped, group-independent") {
    val txt = "User-agent: a\nDisallow: /x\nSITEMAP: https://h/s1.xml\n" +
      "# Sitemap: https://h/commented.xml\n" +
      "sitemap: https://h/s2.xml # trailing\nNotASitemap: https://h/no.xml"
    val got = graft.operators.Robots.sitemapDirectives(
        Seq(("h", txt)).toDF("host", "txt"), "host", "txt")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(got == Seq(("h", "https://h/s1.xml"), ("h", "https://h/s2.xml")))
  }
}
