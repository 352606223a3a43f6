package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Crawl-delay parsing, RFC group precedence, and politeness slotting. */
class FrontierSpec extends SparkSuite {
  import spark.implicits._

  private def delays(rows: Seq[(String, String)]): Set[(String, String, Option[Double])] =
    Robots.crawlDelays(rows.toDF("host", "txt"), "host", "txt")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet

  test("crawl-delay parses per group; delay-less groups still emit") {
    val txt = "User-agent: A\nUser-agent: B\nCrawl-delay: 3\nDisallow: /x\n" +
      "User-agent: C\nDisallow: /y\n" +
      "User-agent: *\nCrawl-delay: 0.5"
    assert(delays(Seq(("h", txt))) == Set(
      ("h", "a", Some(3.0)), ("h", "b", Some(3.0)),
      ("h", "c", None), ("h", "*", Some(0.5))))
  }

  test("later delay in a group wins; bad values ignored; null text empty") {
    val txt = "User-agent: A\nCrawl-delay: 1\nCrawl-delay: oops\n" +
      "Crawl-delay: -2\nCrawl-delay: 4"
    assert(delays(Seq(("h", txt))) == Set(("h", "a", Some(4.0))))
    assert(delays(Seq(("h", null: String))).isEmpty)
  }

  test("a User-agent line after rules starts a new group") {
    val txt = "User-agent: A\nDisallow: /x\nUser-agent: B\nCrawl-delay: 7"
    assert(delays(Seq(("h", txt))) == Set(
      ("h", "a", None), ("h", "b", Some(7.0))))
  }

  private def resolved(
      rows: Seq[(String, String, Option[Double])], agent: String): Map[String, Double] =
    Frontier.hostDelays(
      rows.toDF("host", "agent", "delay_s"), agent)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("hostDelays: own group wins; delay-less own group excludes '*' (§2.2.1)") {
    val rows = Seq(
      ("own", "bot", Some(2.0)), ("own", "*", Some(9.0)),
      ("trap", "bot", None), ("trap", "*", Some(9.0)),
      ("star", "*", Some(1.5)),
      ("multi", "bot", Some(1.0)), ("multi", "bot", Some(6.0)))
    assert(resolved(rows, "Bot") ==
      Map("own" -> 2.0, "star" -> 1.5, "multi" -> 6.0))
  }

  test("schedule: per-host slots by priority desc then url, horizon cut") {
    val urls = Seq(
      ("a1", "https://a.test/p1", 5.0),
      ("a2", "https://a.test/p2", 9.0),
      ("a3", "https://a.test/p3", 5.0), // ties with p1 → url breaks
      ("b1", "https://b.test/q1", 1.0),
      ("b2", "https://b.test/q2", 2.0),
      ("b3", "https://b.test/q3", 3.0)).toDF("id", "url", "prio")
    val d = Seq(("a.test", 2.0)).toDF("host", "delay_s")
    val got = Frontier.schedule(urls, d, "id", "url", "prio", 3.0, 6.0)
      .collect()
      .map(r => (r.getString(0), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toSet
    // a.test delay 2: slots 0,1,2 at 0/2/4 all < 6; b.test default 3:
    // slot 2 would fire at 6 — cut, so only b3 (prio 3) and b2 admit
    assert(got == Set(
      ("a2", 0L, 2.0, 0.0), ("a1", 1L, 2.0, 2.0), ("a3", 2L, 2.0, 4.0),
      ("b3", 0L, 3.0, 0.0), ("b2", 1L, 3.0, 3.0)))
  }

  test("schedule output per host is bounded by ceil(horizon/delay)") {
    val urls = (0 until 500)
      .map(i => (i.toString, f"https://big.test/p$i%03d", i.toDouble))
      .toDF("id", "url", "prio")
    val got = Frontier.schedule(
      urls, Seq.empty[(String, Double)].toDF("host", "delay_s"),
      "id", "url", "prio", 0.25, 10.0)
    assert(got.count() == 40L) // 10 / 0.25
    // the admitted rows are exactly the top-40 by priority
    assert(got.agg(min(col("priority"))).head.getDouble(0) == 460.0)
  }

  test("apportionBudget: exact sum, largest remainders take the leftover") {
    // scores 5, 3, 2 over budget 7: quotas 3.5/2.1/1.4 → bases 3/2/1,
    // leftover 1 goes to the largest remainder (a: .5)
    val got = Frontier.apportionBudget(
        Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("host", "mass"),
        "host", "mass", budget = 7L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    assert(got.values.sum == 7L)
    // remainder ties break on the key: scores 1,1 budget 3 → bases 1/1,
    // leftover 1 → equal remainders, 'a' wins
    val tie = Frontier.apportionBudget(
        Seq(("b", 1L), ("a", 1L)).toDF("host", "mass"),
        "host", "mass", budget = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tie == Map("a" -> 2L, "b" -> 1L))
  }

  test("apportionBudget fails loudly when total × budget would wrap") {
    val big = Seq(("a", Long.MaxValue / 10)).toDF("host", "mass")
    val ex = intercept[Exception] {
      Frontier.apportionBudget(big, "host", "mass", budget = 100L)
        .collect()
    }
    assert(ex.getMessage.contains("apportionBudget"), ex.getMessage)
  }

  test("revisitPriority matches the hand-computed Cho–GM estimator") {
    // u: captures at t=0,100,200,300 s with digests a,a,b,b →
    // n=3 intervals, x=1 change, ī=100 s; age(now=1000) = 700 s
    val base = 1704067200000000L // 2024-01-01T00:00:00Z in µs
    def ts(sec: Long) = new java.sql.Timestamp(base / 1000 + sec * 1000)
    val caps = Seq(
      ("u", ts(0), "a"), ("u", ts(100), "a"),
      ("u", ts(200), "b"), ("u", ts(300), "b"),
      ("once", ts(50), "z")).toDF("url", "t", "digest")
    val got = Frontier.revisitPriority(
        caps, "url", "t", "digest", "2024-01-01 00:16:40")
      .collect().map(r => r.getString(0) -> r).toMap
    val u = got("u")
    assert(u.getLong(1) == 3L && u.getLong(2) == 1L)
    assert(u.getDouble(3) == 100.0)
    val lam = -math.log((3 - 1 + 0.5) / 3.5) / 100.0
    assert(math.abs(u.getDouble(4) - lam) < 1e-15)
    assert(math.abs(u.getDouble(5) - (1 - math.exp(-lam * 700))) < 1e-15)
    // a single capture is no interval evidence: NULL, not a guess
    val once = got("once")
    assert(once.getLong(1) == 0L && once.isNullAt(4) && once.isNullAt(5))
  }

  test("revisitPriority: window and fold share ONE shuffle") {
    val caps = Seq(("u", new java.sql.Timestamp(0L), "a"))
      .toDF("url", "t", "digest")
    val p = Frontier.revisitPriority(caps, "url", "t", "digest",
      "2024-01-01 00:00:00").queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"the groupBy must reuse the window's url clustering:\n$p")
  }

  test("schedule: null priority slots last and surfaces NULL; null url drops") {
    // revisitPriority returns NULL for cold-start URLs by design — the
    // scheduler must slot them after every prioritized URL, not crash
    // in the typed aggregate's non-nullable encoder
    val urls = Seq(
      (1L, "https://h.test/a", Option(1.0)),
      (2L, "https://h.test/b", Option.empty[Double]),
      (3L, "https://h.test/c", Option(9.0)),
      (4L, null.asInstanceOf[String], Option(5.0)))
      .toDF("id", "url", "prio")
    val delays = Seq.empty[(String, Double)].toDF("host", "delay_s")
    val got = Frontier.schedule(urls, delays, "id", "url", "prio",
        defaultDelayS = 1.0, horizonS = 10.0)
      .orderBy(col("slot")).collect()
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("slot")),
        Option(r.get(r.fieldIndex("priority")))))
      .toSeq
    assert(got == Seq(
      (3L, 0L, Some(9.0)), (1L, 1L, Some(1.0)), (2L, 2L, None)))
  }

  test("conditionalFetchPlan: latest validators win; no history = unconditional") {
    val frontier = Seq("u1", "u2", "u3", "u4").toDF("url")
    val state = Seq(
      // u1: older fetch has both validators, latest has only an ETag —
      // the plan must NOT mix releases (IMS goes null with the ETag)
      ("u1", "e-old", "lm-old", 10L),
      ("u1", "e-new", null, 20L),
      // u2: only a Last-Modified ever
      ("u2", null, "lm-2", 5L),
      // u4: tie on fetch_time — deterministic lexically-greater pair
      ("u4", "e-a", "lm-a", 7L),
      ("u4", "e-b", "lm-b", 7L))
      .toDF("url", "etag", "last_modified", "fetch_time")
    val got = Frontier.conditionalFetchPlan(frontier, state)
      .orderBy(col("url"))
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        Option(r.getString(2)), r.getBoolean(3)))
      .toSeq
    assert(got == Seq(
      ("u1", Some("e-new"), None, true),
      ("u2", None, Some("lm-2"), true),
      ("u3", None, None, false),
      ("u4", Some("e-b"), Some("lm-b"), true)))
  }

  test("sitemapRefetchPlan: lastmod arbitration, boundary equality revalidates") {
    val state = Seq(
      ("u1", "e1", "lm1", 100L),
      ("u2", "e2", "lm2", 100L),
      ("u3", null, null, 100L))
      .toDF("url", "etag", "last_modified", "fetch_time")
    val entries = Seq(
      ("u1", Some(101L)), // newer than the fetch -> modified, no validators
      ("u2", Some(100L)), // EQUAL is not newer -> revalidate with validators
      ("u3", Some(101L)), // modified but the state had no validators anyway
      ("u3", None),       // duplicate entry, no lastmod -> revalidate
      ("u9", Some(1L)))   // never fetched -> new
      .toDF("url", "lastmod")
    val got = Frontier.sitemapRefetchPlan(entries, state)
      .orderBy(col("url"), col("lastmod"))
      .collect()
      .map(r => (r.getString(0), r.getString(r.fieldIndex("due")),
        Option(r.getString(r.fieldIndex("if_none_match"))),
        r.getBoolean(r.fieldIndex("conditional"))))
      .toSeq
    assert(got == Seq(
      ("u1", "modified", None, false),
      ("u2", "revalidate", Some("e2"), true),
      ("u3", "revalidate", None, false),
      ("u3", "modified", None, false),
      ("u9", "new", None, false)))
  }
}
