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
}
