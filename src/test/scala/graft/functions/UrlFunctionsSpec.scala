package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins every canonicalization rule on handcrafted URLs, especially
  * the conditional ones: default ports drop only under their OWN
  * scheme, the root path survives slash-trimming, and param order is
  * preserved through utm removal.
  */
class UrlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(url: String): String =
    Seq(url).toDF("u").select(UrlFunctions.normalize(col("u"))).head().getString(0)

  test("scheme and host lowercase; www, fragment, default port drop") {
    assert(norm("HTTPS://WWW.Ex.COM:443/A#frag") == "https://ex.com/A")
    assert(norm("http://Ex.com:80/a") == "http://ex.com/a")
  }

  test("a default-looking port under the OTHER scheme is kept") {
    assert(norm("http://ex.com:443/a") == "http://ex.com:443/a")
    assert(norm("https://ex.com:80/a") == "https://ex.com:80/a")
    assert(norm("https://ex.com:8080/a") == "https://ex.com:8080/a")
  }

  test("trailing slashes trim but the root path survives as /") {
    assert(norm("https://ex.com/a/b/") == "https://ex.com/a/b")
    assert(norm("https://ex.com/") == "https://ex.com/")
    assert(norm("https://ex.com") == "https://ex.com/")
  }

  test("utm params drop, other params keep their order") {
    assert(norm("https://ex.com/a?utm_source=f&id=7&z=1&utm_campaign=x")
      == "https://ex.com/a?id=7&z=1")
    assert(norm("https://ex.com/a?utm_source=f") == "https://ex.com/a")
  }

  test("registered domain is the last two labels, www-stripped") {
    val d = Seq("https://WWW.Docs.Src9.COM/x").toDF("u")
      .select(UrlFunctions.registeredDomain(col("u"))).head().getString(0)
    assert(d == "src9.com")
  }

  test("case-variant duplicates collapse to one canonical form") {
    val variants = Seq(
      "https://www.ex.com:443/page/?utm_source=a#top",
      "HTTPS://EX.COM/page",
      "https://ex.com/page/?utm_campaign=b")
    assert(variants.map(norm).distinct == Seq("https://ex.com/page"))
  }
}
