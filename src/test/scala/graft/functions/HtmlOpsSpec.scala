package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** HTML → text extraction against hand-written fixture expectations. */
class HtmlOpsSpec extends SparkSuite {

  import spark.implicits._

  private def run(html: String, main: Boolean = false): String = {
    val df = Seq((1L, html)).toDF("id", "html")
    val out = if (main) HtmlOps.extractMainText(df, "id", "html")
              else HtmlOps.extract(df, "id", "html")
    out.collect().head.getString(1)
  }

  test("scripts, styles and comments vanish with their contents") {
    assert(run("<p>keep</p><script>if (a<b) { x(); }</script>" +
      "<style>p>em{}</style><!-- <p>gone</p> --><p>also</p>") ==
      "keep\nalso")
  }

  test("block tags break lines; inline tags do not") {
    assert(run("<div>one <b>bold</b> word</div><p>two</p>three<br>four") ==
      "one bold word\ntwo\nthree\nfour")
  }

  test("core entities decode, amp last; unknown entities pass through") {
    assert(run("<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; &amp;lt; &copy;</p>") ==
      "a <b> \"c\" 'd' &lt; &copy;")
  }

  test("whitespace collapses inside a line; empty blocks drop") {
    assert(run("<p>  a   b\t c </p><p>   </p><p>d</p>") == "a b c\nd")
  }

  test("main text drops all-anchor blocks, keeps prose with inline links") {
    val html = "<p>real prose with <a href='/'>one link</a> in seven words</p>" +
      "<div><a href='/'>Home</a> <a href='/a'>About</a> <a href='/b'>More</a></div>" +
      "<p>plain text</p>"
    assert(run(html, main = true) ==
      "real prose with one link in seven words\nplain text")
    // density exactly at the 0.5 default keeps: 2 anchor tokens of 4
    assert(run("<p><a href='x'>two words</a> of four</p>", main = true) ==
      "two words of four")
    // just over drops: 2 of 3
    assert(run("<p><a href='x'>two words</a> three</p>", main = true) == "")
  }

  test("anchors with inline markup count their stripped tokens") {
    // anchor holds <em>big deal</em> -> 2 anchor tokens of 2 total: dropped
    assert(run("<div><a href='/'><em>big</em> deal</a></div>", main = true) == "")
  }

  test("null html yields null text") {
    val out = HtmlOps.extract(
      Seq((1L, Option.empty[String])).toDF("id", "html"), "id", "html")
    assert(out.collect().head.isNullAt(1))
  }

  private def links(html: String, base: String): Seq[String] =
    HtmlOps.extractLinks(
        Seq((1L, html, base)).toDF("id", "html", "base"),
        "id", "html", "base")
      .collect().map(_.getString(1)).toSeq

  test("links: every resolution form against a paged base URL") {
    val html = "<a href=\"https://a.test/x\">1</a>" +
      "<a href='//c.test/y'>2</a>" +
      "<a href=\"/r\">3</a>" +
      "<a rel=nofollow href=\"sub/p\">4</a>" +
      "<a href=\"HTTPS://UP.test/z\">5</a>"
    assert(links(html, "https://h.test/d/page.html?q=1") == Seq(
      "https://a.test/x", "https://c.test/y", "https://h.test/r",
      "https://h.test/d/sub/p", "HTTPS://UP.test/z"))
  }

  test("links: an origin-only base resolves relatives under '/'") {
    assert(links("<a href=\"p\">x</a>", "https://h.test") ==
      Seq("https://h.test/p"))
  }

  test("links: dot segments remove per RFC 3986 §5.2.4") {
    val html = "<a href=\"../up\">1</a>" +
      "<a href=\"./here\">2</a>" +
      "<a href=\"../../twice\">3</a>" +
      "<a href=\"a/../b/./c\">4</a>" +
      "<a href=\"/r/../s\">5</a>" +
      "<a href=\"..\">6</a>"
    assert(links(html, "https://h.test/d/e/page.html") == Seq(
      "https://h.test/d/up", "https://h.test/d/e/here",
      "https://h.test/twice", "https://h.test/d/e/b/c",
      "https://h.test/s", "https://h.test/d/"))
  }

  test("links: '..' past the root clamps at the root") {
    val html = "<a href=\"../../../deep\">1</a><a href=\"../..\">2</a>"
    assert(links(html, "https://h.test/d/page.html") == Seq(
      "https://h.test/deep", "https://h.test/"))
  }

  test("links: query-relative hrefs take the base path (§5.3)") {
    val html = "<a href=\"?page=2\">1</a><a href=\"../x?k=v\">2</a>"
    assert(links(html, "https://h.test/d/list.html?page=1") == Seq(
      "https://h.test/d/list.html?page=2", "https://h.test/x?k=v"))
  }

  test("links: fragments strip, non-fetchable schemes and comments drop") {
    val html = "<a href=\"/k#sec\">a</a><a href=\"#only\">b</a>" +
      "<a href=\"mailto:x@y\">c</a><a href=\"javascript:void(0)\">d</a>" +
      "<!-- <a href=\"/commented\">e</a> -->" +
      "<script>var s = '<a href=\"/scripted\">f</a>';</script>" +
      "<a href=\"/q?a=1&amp;b=2\">g</a>"
    assert(links(html, "https://h.test/") ==
      Seq("https://h.test/k", "https://h.test/q?a=1&b=2"))
  }

  test("links: data-href and xlink:href never match as an href suffix") {
    val html = "<a data-href=\"/wrong\" href=\"/right\">x</a>" +
      "<a xlink:href=\"/also-wrong\">y</a>"
    assert(links(html, "https://h.test/") == Seq("https://h.test/right"))
  }

  test("links: duplicates emit as-is; anchors without href emit nothing") {
    val html = "<a href=\"/p\">1</a><a name=\"n\">2</a><a href=\"/p\">3</a>"
    assert(links(html, "https://h.test/") ==
      Seq("https://h.test/p", "https://h.test/p"))
  }

  test("anchors: text strips inline markup; empty anchors keep their row") {
    val html = "<a href=\"/p\">guide <b>topic</b> 7</a>" +
      "<a href=\"/img\"><img src=\"x.png\"/></a>" +
      "<a href=\"mailto:x@y\">dropped with its text</a>"
    val got = HtmlOps.extractAnchors(
        Seq((1L, html, "https://h.test/")).toDF("id", "html", "base"),
        "id", "html", "base")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      ("https://h.test/p", "guide topic 7"),
      ("https://h.test/img", "")))
  }

  private def canonOf(html: String, base: String): Option[String] =
    Option(HtmlOps.extractCanonical(
        Seq((1L, html, base)).toDF("id", "html", "base"),
        "id", "html", "base")
      .collect()(0).getString(1))

  test("canonical: all four declaration shapes resolve; absent is NULL") {
    val base = "https://h.test/dir/page.html"
    assert(canonOf("<head><link rel=\"canonical\" " +
      "href=\"https://h.test/doc/0\"></head>", base) ==
      Some("https://h.test/doc/0"))
    // href before an UNQUOTED rel, relative href
    assert(canonOf("<head><link href=\"0\" rel=canonical></head>", base) ==
      Some("https://h.test/dir/0"))
    // single quotes, root-relative
    assert(canonOf("<head><link rel='canonical' href='/doc/0'></head>",
      base) == Some("https://h.test/doc/0"))
    // dot-segment resolution
    assert(canonOf("<head><link rel=\"canonical\" " +
      "href=\"../doc/0\"></head>", base) == Some("https://h.test/doc/0"))
    assert(canonOf("<head><title>t</title></head>", base) == None)
    // other rel values never match; stylesheet links are not canonical
    assert(canonOf("<head><link rel=\"stylesheet\" " +
      "href=\"/s.css\"></head>", base) == None)
    // first declaration wins (per-spec there is at most one)
    assert(canonOf("<link rel=\"canonical\" href=\"/a\">" +
      "<link rel=\"canonical\" href=\"/b\">", base) ==
      Some("https://h.test/a"))
    // non-fetchable scheme drops like any link
    assert(canonOf("<link rel=\"canonical\" href=\"mailto:x@y\">", base)
      == None)
    // 'rel=canonical' inside an href VALUE must not select the tag
    assert(canonOf("<link rel=\"alternate\" " +
      "href=\"/feed?rel=canonical\">", base) == None)
    // self-closing tag with unquoted rel as the last attribute
    assert(canonOf("<link href=\"/doc/0\" rel=canonical/>", base) ==
      Some("https://h.test/doc/0"))
  }

  test("block-tag boundary: <link>/<picture> are not li/p blocks") {
    val base = "https://h.test/"
    // the regression this pins: `li` must not eat `<link …>` (canonical
    // extraction reads it) and `<p>` must not swallow through the NEXT
    // tag's close
    assert(canonOf("<p>x <a href=\"/k\">a</a></p>" +
      "<link rel=\"canonical\" href=\"/c\">", base) ==
      Some("https://h.test/c"))
    assert(links("<p>x <a href=\"/k\">a</a></p>", base) ==
      Seq("https://h.test/k"))
    // <picture> is inline (not in BlockTags): its text joins the
    // surrounding block instead of splitting it
    val txt = Seq((1L, "<p>before <picture>img</picture> after</p>"))
      .toDF("id", "html")
      .select(HtmlOps.htmlToText(col("html"))).collect()(0).getString(0)
    assert(txt == "before img after", txt)
  }

  test("canonicalDedup: declared targets group; undeclared stand alone") {
    val rows = Seq(
      (1L, "https://h.test/a?utm_source=x", null.asInstanceOf[String]),
      (2L, "https://h.test/mirror/a", "https://h.test/a"),
      (3L, "https://h.test/b", null.asInstanceOf[String]),
      (4L, "https://h.test/a.amp", "https://h.test/a/"))
      .toDF("id", "url", "canonical")
    val got = UrlOps.canonicalDedup(rows, "id", "url", "canonical")
      .select(col("canonical_url"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // 1 (own url normalizes to /a), 2 and 4 (declared /a, trailing slash
    // normalized) all collapse; 3 stands alone
    assert(got == Set(("https://h.test/a", 1L), ("https://h.test/b", 3L)))
  }

  test("meta robots: token-level match, attribute order free, other metas inert") {
    def mr(html: String): (Boolean, Boolean) = {
      val r = HtmlOps.extractMetaRobots(
        Seq((1L, html)).toDF("id", "html"), "id", "html").collect()(0)
      (r.getBoolean(1), r.getBoolean(2))
    }
    assert(mr("<meta name=\"robots\" content=\"noindex, nofollow\">") ==
      (true, true))
    assert(mr("<meta content='nofollow' name=robots>") == (false, true))
    assert(mr("<meta name=\"robots\" content=\"index, follow\">") ==
      (false, false))
    assert(mr("<p>no meta</p>") == (false, false))
    // directives are TOKENS of the comma list, not substrings
    assert(mr("<meta name=\"robots\" content=\"noindexing\">") ==
      (false, false))
    // a non-robots meta never matches, whatever its content says
    assert(mr("<meta name=\"description\" content=\"noindex\">") ==
      (false, false))
    // whitespace-tolerant token split
    assert(mr("<meta name=\"robots\" content=\" noindex ,follow\">") ==
      (true, false))
    // MULTIPLE robots metas combine (CMS + plugin each emit one)
    assert(mr("<meta name=\"robots\" content=\"noindex\">" +
      "<meta name=\"robots\" content=\"nofollow\">") == (true, true))
    // unquoted content value is legal HTML
    assert(mr("<meta name=robots content=noindex,nofollow>") ==
      (true, true))
    // self-closing variant
    assert(mr("<meta content=\"noindex\" name=robots/>") == (true, false))
  }

  test("links rel: nofollow flags per anchor, space lists, unquoted; others false") {
    val html = "<a href=\"/a\">1</a>" +
      "<a rel=\"nofollow\" href=\"/b\">2</a>" +
      "<a rel='external nofollow' href='/c'>3</a>" +
      "<a href=\"/d\" rel=nofollow>4</a>" +
      "<a rel=\"noreferrer\" href=\"/e\">5</a>" +
      "<a rel=\"nofollowish\" href=\"/f\">6</a>" +
      "<a href=\"/g?rel=nofollow\">7</a>" + // rel INSIDE the href value
      "<a data-rel=\"nofollow\" href=\"/h\">8</a>" // not a rel attribute
    val got = HtmlOps.extractLinksRel(
        Seq((1L, html, "https://h.test/")).toDF("id", "html", "base"),
        "id", "html", "base")
      .collect().map(r => (r.getString(1), r.getBoolean(2))).toSeq
    assert(got == Seq(
      ("https://h.test/a", false), ("https://h.test/b", true),
      ("https://h.test/c", true), ("https://h.test/d", true),
      ("https://h.test/e", false), ("https://h.test/f", false),
      ("https://h.test/g?rel=nofollow", false),
      ("https://h.test/h", false)))
  }

  test("links plan: map-side projection + generate, zero shuffle") {
    val df = Seq((1L, "<a href=\"/p\">x</a>", "https://h.test/"))
      .toDF("id", "html", "base")
    val p = HtmlOps.extractLinks(df, "id", "html", "base")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"extraction must not shuffle:\n$p")
  }
}
