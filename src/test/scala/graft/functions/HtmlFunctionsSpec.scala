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

  test("pages without the elements degrade to empty, not error") {
    val h = "<div>no title no para no links</div>"
    assert(run(h, HtmlFunctions.title(_)) == "")
    assert(run(h, HtmlFunctions.mainBlock(_)) == "")
    assert(run(h, HtmlFunctions.linkCount(_)) == 0L)
    assert(run(h, HtmlFunctions.linkTextLen(_)) == 0L)
  }
}
