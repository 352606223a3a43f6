package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSuite

/** RFC 9309 robots gate vs a naive sequential evaluator (filter + maxBy —
  * nothing shared with the broadcast-join/argmax plan). */
class RobotsSpec extends SparkSuite {
  import spark.implicits._

  private def parse(rows: Seq[(String, String)]): Seq[(String, String, Boolean, String)] =
    Robots.parseRules(rows.toDF("host", "txt"), "host", "txt")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2), r.getString(3)))
      .toSeq

  test("groups: consecutive User-agent lines share rules; a later group is separate") {
    val txt = "User-agent: A\nUser-agent: B\nDisallow: /x\n" +
      "User-agent: C\nAllow: /y\nDisallow: /z"
    val got = parse(Seq(("h", txt))).toSet
    assert(got == Set(
      ("h", "a", false, "/x"), ("h", "b", false, "/x"),
      ("h", "c", true, "/y"), ("h", "c", false, "/z")))
  }

  test("parse ignores comments, empty Disallow, unknown fields, orphan rules") {
    val txt = "Disallow: /orphan\n" + // before any User-agent → dropped
      "User-agent: Bot # trailing comment\n" +
      "Crawl-delay: 10\n" + // unknown directive ends the group header only
      "Disallow: /a # strip\n" +
      "Disallow:\n" + // empty = matches nothing → dropped
      "# full comment line\n" +
      "Allow: /a/b"
    val got = parse(Seq(("h", txt)))
    assert(got.toSet == Set(("h", "bot", false, "/a"), ("h", "bot", true, "/a/b")))
  }

  test("null text parses to no rules") {
    val got = Robots.parseRules(
      Seq(("h", null: String)).toDF("host", "txt"), "host", "txt").count()
    assert(got == 0L)
  }

  /** Independent wildcard match: split on '*', quote the literal parts,
    * prefix-anchor with find() (nothing shared with the gate's
    * regexp_replace translation chain). */
  private def patMatches(path: String, pat: String): Boolean = {
    val anchored = pat.endsWith("$")
    val core = if (anchored) pat.dropRight(1) else pat
    val rx = "^" + core.split("\\*", -1)
      .map(p => if (p.isEmpty) "" else java.util.regex.Pattern.quote(p))
      .mkString(".*") + (if (anchored) "$" else "")
    java.util.regex.Pattern.compile(rx).matcher(path).find()
  }

  private def naive(
      rules: Seq[(String, String, Boolean, String)],
      host: String, path: String, agent: String): (Boolean, Option[String]) = {
    val onHost = rules.filter(_._1 == host)
    val own = onHost.filter(_._2 == agent)
    val applicable = if (own.nonEmpty) own else onHost.filter(_._2 == "*")
    val hit = applicable.filter(r => patMatches(path, r._4))
    if (hit.isEmpty) (true, None)
    else {
      val best = hit.maxBy(r => (r._4.length, r._3, r._4))
      (best._3, Some(best._4))
    }
  }

  /** The stateless per-row form (the streaming door's match): host→rule
    * array broadcast + Robots.verdict fold. */
  private def runFold(
      rules: Seq[(String, String, Boolean, String)],
      urls: Seq[(Long, String)], agent: String): Map[Long, (Boolean, Option[String])] = {
    val hostRules = Robots.hostRuleSets(
      rules.toDF("host", "agent", "allow", "prefix"), agent)
    val joined = urls.toDF("id", "url")
      .withColumn("__host", Robots.urlHost(col("url")))
      .withColumn("__path", Robots.urlPath(col("url")))
      .join(broadcast(hostRules), col("__host") === col("__rh"), "left")
    val (allowed, rp) = Robots.verdict(col("__path"), col("__rules"))
    joined.select(col("id"), allowed.as("a"), rp.as("p"))
      .collect()
      .map(r => (r.getLong(0),
        (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getString(2)))))
      .toMap
  }

  private def runGate2(
      rules: Seq[(String, String, Boolean, String)],
      urls: Seq[(Long, String)], agent: String): Map[Long, (Boolean, Option[String])] =
    Robots.gate(
      urls.toDF("id", "url"),
      rules.toDF("host", "agent", "allow", "prefix"),
      agent, "id", "url")
      .collect()
      .map(r => (r.getLong(0),
        (r.getBoolean(2), if (r.isNullAt(3)) None else Some(r.getString(3)))))
      .toMap

  test("gate: longest prefix wins, allow breaks equal-length ties, no match admits") {
    val rules = Seq(
      ("h.test", "*", false, "/private"),
      ("h.test", "*", true, "/private/ok"),
      ("h.test", "*", false, "/privat"), // shorter → loses to /private
      ("h.test", "*", true, "/abcd"),
      ("h.test", "*", false, "/abcd")) // equal length → allow wins
    val urls = Seq(
      (1L, "https://h.test/private/x"),
      (2L, "https://h.test/private/ok/x"),
      (3L, "https://h.test/abcd/page"),
      (4L, "https://h.test/elsewhere"),
      (5L, "https://h.test"), // empty path → "/"
      (6L, "https://other.test/private/x")) // no rules for host → admit
    val got = runGate2(rules, urls, "anybot")
    assert(got(1L) == (false, Some("/private")))
    assert(got(2L) == (true, Some("/private/ok")))
    assert(got(3L) == (true, Some("/abcd")))
    assert(got(4L) == (true, None))
    assert(got(5L) == (true, None))
    assert(got(6L) == (true, None))
  }

  test("gate: a host with an own-agent group ignores the '*' group entirely") {
    val rules = Seq(
      ("h.test", "me", true, "/"),
      ("h.test", "*", false, "/"),
      ("i.test", "*", false, "/"))
    val got = runGate2(rules, Seq(
      (1L, "https://h.test/x"), (2L, "https://i.test/x")), "me")
    assert(got(1L) == (true, Some("/")))
    assert(got(2L) == (false, Some("/")))
  }

  test("group selection matches product tokens, longest token most specific") {
    // caller "GraftBot-News/2.1 (+url)" → token "graftbot-news"
    val agent = "GraftBot-News/2.1 (+https://graft.test/bot)"
    val rules = Seq(
      // h1: both tokens match; the longer one excludes the shorter
      ("h1.test", "graftbot-news", false, "/news"),
      ("h1.test", "graftbot", false, "/bot"),
      ("h1.test", "*", false, "/"),
      // h2: '-'-boundary prefix via a VERSIONED group line; "graft" is
      // not a token match and must not select
      ("h2.test", "graftbot/2.0", false, "/private"),
      ("h2.test", "graft", false, "/"),
      ("h2.test", "*", false, "/"),
      // h3: nothing matches → '*' fallback
      ("h3.test", "otherbot", false, "/"),
      ("h3.test", "*", false, "/data"))
    val got = runGate2(rules, Seq(
      (1L, "https://h1.test/news/x"), (2L, "https://h1.test/bot/x"),
      (3L, "https://h2.test/private/x"), (4L, "https://h2.test/open"),
      (5L, "https://h3.test/data/x"), (6L, "https://h3.test/open")),
      agent)
    assert(got(1L) == (false, Some("/news")))
    assert(got(2L) == (true, None)) // the graftbot group did NOT apply
    assert(got(3L) == (false, Some("/private")))
    assert(got(4L) == (true, None)) // "graft" never matched
    assert(got(5L) == (false, Some("/data")))
    assert(got(6L) == (true, None))
  }

  test("wildcards: '*' spans, trailing '$' anchors, regex metachars stay literal") {
    val rules = Seq(
      ("h.test", "*", false, "/*.pdf$"),
      ("h.test", "*", true, "/docs/*"),
      ("h.test", "*", false, "/docs"),
      ("h.test", "*", false, "/a+b"), // '+' must match literally
      ("h.test", "*", false, "/tmp/*/cache"))
    val urls = Seq(
      (1L, "https://h.test/files/x.pdf"), // anchored wildcard hits
      (2L, "https://h.test/files/x.pdfy"), // anchor rejects
      (3L, "https://h.test/docs/x.pdf"), // 7-octet tie → allow wins
      (4L, "https://h.test/a+b/c"), // literal '+'
      (5L, "https://h.test/aab/c"), // would match if '+' were regex
      (6L, "https://h.test/tmp/deep/er/cache"))
    val got = runGate2(rules, urls, "any")
    assert(got(1L) == (false, Some("/*.pdf$")))
    assert(got(2L) == (true, None))
    assert(got(3L) == (true, Some("/docs/*")))
    assert(got(4L) == (false, Some("/a+b")))
    assert(got(5L) == (true, None))
    assert(got(6L) == (false, Some("/tmp/*/cache")))
    urls.foreach { case (id, u) =>
      val path = u.stripPrefix("https://h.test")
      assert(got(id) == naive(rules, "h.test", path, "any"))
    }
  }

  test("property: any rule set, any URLs — equals the sequential evaluator") {
    val hosts = Seq("a.test", "b.test")
    val agents = Seq("me", "other", "*")
    val segs = Seq("/x", "/y", "/xy", "/x/1")
    val genPrefix = Gen.choose(1, 2)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(segs)).map(_.mkString))
      .flatMap(p => Gen.oneOf(p, p.replaceFirst("/([^/]+)$", "/*"),
        p + "$", "/*" + p.drop(2)))
    val genRule = for {
      h <- Gen.oneOf(hosts); a <- Gen.oneOf(agents)
      al <- Gen.oneOf(true, false); p <- genPrefix
    } yield (h, a, al, p)
    val genPath = Gen.choose(0, 3)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(segs)).map(_.mkString))
    val genUrl = for { h <- Gen.oneOf(hosts); p <- genPath }
      yield s"https://$h$p"
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25),
      Prop.forAllNoShrink(
        Gen.nonEmptyListOf(genRule).map(_.distinct),
        Gen.nonEmptyListOf(genUrl)) { (rules, urlList) =>
        val urls = urlList.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        val got = runGate2(rules, urls, "me")
        val fold = runFold(rules, urls, "me")
        val bad = urls.filterNot { case (id, u) =>
          val host = u.stripPrefix("https://").takeWhile(_ != '/')
          val rawPath = u.stripPrefix(s"https://$host")
          val path = if (rawPath.isEmpty) "/" else rawPath
          val want = naive(rules, host, path, "me")
          got(id) == want && fold(id) == want
        }
        bad.isEmpty :| s"mismatches=$bad got=$got fold=$fold rules=$rules"
      })
    assert(res.passed, res.status.toString)
  }
}
