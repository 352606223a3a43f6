package graft.operators

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.SparkSuite

class DomainsSpec extends SparkSuite {

  private def hostsOf(urls: (Long, String)*) = {
    import spark.implicits._
    urls.toSeq.toDF("id", "url")
  }

  test("hostOf extracts the lowercase host, dropping userinfo and port") {
    val got = hostsOf(
      (1L, "https://Ads.Example.COM/x?y#z"),
      (2L, "http://user:pw@a.b.c:8080/p"),
      (3L, "https://plain.org"),
      (4L, "not a url"))
      .select(col("id"), Domains.hostOf(col("url")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "ads.example.com")
    assert(got(2L) == "a.b.c")
    assert(got(3L) == "plain.org")
    assert(got(4L) == "")
  }

  test("hostSuffixes yields every dot-boundary suffix, longest first") {
    val got = hostsOf((1L, "x"))
      .select(Domains.hostSuffixes(lit("a.b.co.nz")).as("s"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("a.b.co.nz", "b.co.nz", "co.nz", "nz"))
  }

  test("blocklistFilter blocks exact hosts and subdomains, not lookalikes") {
    val pages = hostsOf(
      (1L, "https://example.com/a"),        // exact match -> blocked
      (2L, "https://ads.example.com/b"),    // subdomain -> blocked
      (3L, "https://notexample.com/c"),     // label boundary protects it
      (4L, "https://example.com.evil.io/d"),// blocked dom as LEFT part: kept
      (5L, "https://fine.org/e"))
    val kept = Domains.blocklistFilter(pages, "url", Seq("Example.COM"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 5L))
  }

  test("blocklistFilter is a pure map-side filter: zero Exchange") {
    val pages = hostsOf((1L, "https://a.b/x"))
    val plan = Domains.blocklistFilter(pages, "url", Seq("spam.net"))
      .queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty)
  }

  test("domainQualityPrune drops whole hosts below the mean-token bar") {
    import spark.implicits._
    // host A: docs of 10 and 20 tokens (mean 15); host B: 2 and 4 (mean 3)
    val docs = Seq(
      (1L, "https://a.com/1", 10),
      (2L, "https://a.com/2", 20),
      (3L, "https://b.com/1", 2),
      (4L, "https://b.com/2", 4)).toDF("id", "url", "ntok")
    val kept = Domains.domainQualityPrune(docs, "url", "ntok", 10.0)
    val ids = kept.select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L))
    val mean = kept.select("domain_mean_tokens").distinct().collect()
      .map(_.getDouble(0)).toSet
    assert(mean == Set(15.0))
  }
}
