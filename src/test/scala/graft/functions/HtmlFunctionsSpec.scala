package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the markup-extraction regexes on handcrafted pages: active
  * blocks vanish with their content (non-greedily — prose between two
  * scripts survives), tags separate rather than fuse words, and the
  * title/main-block/link signals extract exactly.
  */
class HtmlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(html: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any =
    Seq(html).toDF("h").select(c(col("h"))).head().get(0)

  test("script and style blocks are dropped WITH content, non-greedily") {
    val h = "<p>a</p><script>var x=1;</script><p>keep me</p><style>.c{}</style><p>b</p>"
    assert(run(h, HtmlFunctions.extractText(_)) == "a keep me b")
  }

  test("tags become spaces so adjacent words don't fuse") {
    assert(run("<p>end</p><p>start</p>", HtmlFunctions.extractText(_)) == "end start")
  }

  test("title and first-paragraph main block extract exactly") {
    val h = "<html><head><title>the title</title></head><body><p>main text</p><p>second</p></body></html>"
    assert(run(h, HtmlFunctions.title(_)) == "the title")
    assert(run(h, HtmlFunctions.mainBlock(_)) == "main text")
  }

  test("link count and anchor text length measure the nav density") {
    val h = """<a href="/">home</a><p>prose</p><a href="/x">about us</a>"""
    assert(run(h, HtmlFunctions.linkCount(_)) == 2L)
    assert(run(h, HtmlFunctions.linkTextLen(_)) == ("home" + "about us").length.toLong)
  }

  test("entity decoding: named, numeric dec/hex, single-pass double-escape") {
    assert(run("Tom &amp; Jerry", HtmlFunctions.decodeEntities(_)) ==
      "Tom & Jerry")
    assert(run("&lt;b&gt;not markup&lt;/b&gt;", HtmlFunctions.decodeEntities(_)) ==
      "<b>not markup</b>")
    assert(run("caf&#233; / caf&#xE9; / caf&#xe9;", HtmlFunctions.decodeEntities(_)) ==
      "café / café / café")
    assert(run("em&#8212;dash &mdash; again", HtmlFunctions.decodeEntities(_)) ==
      "em—dash — again")
    // astral-plane numeric reference: surrogate pair emitted
    assert(run("&#x1F600;", HtmlFunctions.decodeEntities(_)) ==
      new String(Character.toChars(0x1F600)))
    // single pass: double-escaped stays escaped by exactly one level
    assert(run("&amp;lt;", HtmlFunctions.decodeEntities(_)) == "&lt;")
    assert(run("&amp;amp;", HtmlFunctions.decodeEntities(_)) == "&amp;")
  }

  test("malformed references pass through verbatim, never throw") {
    for (s <- Seq(
      "&unknown;", "&amp", "5 &lt 6", "&;", "&#;", "&#x;",
      "&#xD800;", "&#0;", "&#1114112;", "&#99999999;", "& amp;",
      "a & b", "100% &&& done", "&" /* trailing lone ampersand */)) {
      assert(run(s, HtmlFunctions.decodeEntities(_)) == s, s"input: $s")
    }
    // mixed: the valid reference decodes, the broken ones stay
    assert(run("&amp; &bogus; &#xZZ;", HtmlFunctions.decodeEntities(_)) ==
      "& &bogus; &#xZZ;")
  }

  test("squeeze collapses ALL whitespace including the decoded nbsp") {
    val h = "<p>a\tb\r\nc&nbsp;d&#160;e</p>"
    assert(run(h, HtmlFunctions.extractText(_)) == "a b c d e")
  }

  test("extraction decodes entities AFTER stripping, so escaped markup stays text") {
    val h = "<p>use &lt;script&gt; tags &amp; enjoy</p>"
    assert(run(h, HtmlFunctions.extractText(_)) == "use <script> tags & enjoy")
  }

  test("page metadata: og/meta/canonical/JSON-LD extract across attr orders and quote styles") {
    val h = """<html><head>
      |<meta property="og:title" content="OG Title">
      |<meta content='the description' name='description'>
      |<link href="HTTPS://Ex.com/a/?utm_source=x&ref=1" rel='canonical'>
      |<script type="application/ld+json">{"@type":"Article","headline":"HL"}</script>
      |</head><body></body></html>""".stripMargin
    assert(run(h, HtmlFunctions.metaProperty(_, "og:title")) == "OG Title")
    // content-first attribute order + single quotes
    assert(run(h, HtmlFunctions.metaNamed(_, "description")) ==
      "the description")
    // cross-quoted link with href first
    assert(run(h, HtmlFunctions.canonicalUrl(_)) ==
      "HTTPS://Ex.com/a/?utm_source=x&ref=1")
    assert(run(h, HtmlFunctions.jsonLd(_)) ==
      """{"@type":"Article","headline":"HL"}""")
    // absent fields are NULL, not ''
    assert(run(h, HtmlFunctions.metaProperty(_, "og:image")) == null)
    assert(run("<html></html>", HtmlFunctions.canonicalUrl(_)) == null)
    assert(run("<html></html>", HtmlFunctions.jsonLd(_)) == null)
  }

  test("page metadata: duplicates take the first match; malformed tags don't bleed") {
    val dup = """<meta property="og:title" content="first">
      |<meta property="og:title" content="second">""".stripMargin
    assert(run(dup, HtmlFunctions.metaProperty(_, "og:title")) == "first")
    // first-match-wins must hold ACROSS attribute orders: an earlier
    // content-first tag beats a later key-first tag (browsers take the
    // first tag, whatever its attribute order)
    val crossOrder = """<meta content="A" property="og:title">
      |<meta property="og:title" content="B">""".stripMargin
    assert(run(crossOrder, HtmlFunctions.metaProperty(_, "og:title")) == "A")
    val crossLink = """<link href="X" rel="canonical">
      |<link rel="canonical" href="Y">""".stripMargin
    assert(run(crossLink, HtmlFunctions.canonicalUrl(_)) == "X")
    // an unclosed/valueless tag must not satisfy the pattern
    assert(run("<meta property=\"og:title\" content=>",
      HtmlFunctions.metaProperty(_, "og:title")) == null)
    // a DIFFERENT property must not leak into the requested one
    // (Pattern.quote keeps ':' literal and the key anchored)
    assert(run("<meta property=\"og:title:x\" content=\"no\">",
      HtmlFunctions.metaProperty(_, "og:title")) == null)
    // JSON-LD is non-greedy across sibling scripts
    val two = "<script type=\"application/ld+json\">{\"a\":1}</script>" +
      "<script type=\"application/ld+json\">{\"b\":2}</script>"
    assert(run(two, HtmlFunctions.jsonLd(_)) == "{\"a\":1}")
  }

  test("pages without the elements degrade to empty, not error") {
    val h = "<div>no title no para no links</div>"
    assert(run(h, HtmlFunctions.title(_)) == "")
    assert(run(h, HtmlFunctions.mainBlock(_)) == "")
    assert(run(h, HtmlFunctions.linkCount(_)) == 0L)
    assert(run(h, HtmlFunctions.linkTextLen(_)) == 0L)
  }
}
