package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.UrlOps

class UrlOpsSpec extends SparkSuite {
  import spark.implicits._

  private val urls = Seq(
    "HTTPS://Example.COM/Path/?utm_source=x&q=1#frag",
    "http://site.org:80/a",
    "https://site.org:443/",
    "https://a.b/c?fbclid=123&gclid=9",
    "https://a.b/c?x=1&utm_medium=m&utm_term=t&y=2",
    "HTTP://WWW.Ex.com:80/?utm_campaign=a",
    "https://a.b/path",
    "ftp://Host.Com/File",
    "no-scheme/relative/",
    "https://h.io:8080/keep-nondefault-port")

  test("normalization is idempotent: a canonical URL maps to itself") {
    val once = urls.toDF("url")
      .select(UrlOps.normalizeUrl(col("url")).as("u"))
    val twice = once.select(UrlOps.normalizeUrl(col("u")).as("u"))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("non-default ports and case-sensitive paths survive") {
    val out = Seq("https://h.io:8080/A/B?Q=v").toDF("url")
      .select(UrlOps.normalizeUrl(col("url"))).head().getString(0)
    assert(out == "https://h.io:8080/A/B?Q=v", out)
  }

  test("adjacent tracking params strip cleanly") {
    val out = Seq("https://x.y/?utm_a=1&utm_b=2&k=3").toDF("url")
      .select(UrlOps.normalizeUrl(col("url"))).head().getString(0)
    assert(out == "https://x.y/?k=3", out)
  }

  test("urlDedup keeps lowest id per canonical key; plan has no window") {
    val pages = Seq(
      (3L, "https://d.e/p"), (1L, "https://D.e/p?utm_x=1"),
      (2L, "http://q.r:80")).toDF("doc_id", "url")
    val out = UrlOps.urlDedup(pages, "doc_id", "url")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L))
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("trapSignals: depth/dup/params/len on hand-built URLs") {
    import spark.implicits._
    val cases = Seq(
      (1L, "https://h.test"),                       // no path: depth 0
      (2L, "https://h.test/a/b/a/b?x=1&x=2#frag"),  // dup segs, frag cut
      (3L, "https://h.test/one/?q="))               // trailing slash
    val got = UrlOps.trapFilter(cases.toDF("id", "url"), "id", "url",
        maxDepth = 3, maxDupSegments = 1, maxParams = 1, maxLen = 100)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(6))).toMap
    assert(got(1L) == ((0L, 0L, 0L, false)))
    assert(got(2L) == ((4L, 2L, 2L, true))) // depth 4 > 3, dup 2, params 2
    assert(got(3L) == ((1L, 0L, 1L, false)))
  }

  test("trapFilter plan: pure projection, zero shuffle") {
    import spark.implicits._
    val p = UrlOps.trapFilter(
        Seq((1L, "https://h.test/a")).toDF("id", "url"), "id", "url")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"trap signals must not shuffle:\n$p")
  }
}
