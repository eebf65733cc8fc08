package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Routing rows the q253/q256 oracles can't isolate: the untyped-body
  * binary sniff (WHATWG binary-data bytes) that keeps a PNG served
  * without a Content-Type out of the html route.
  */
class ContentRouteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def routeOf(ct: String, body: Array[Byte]): (String, String) = {
    import spark.implicits._
    val df = Seq((ct, body)).toDF("ct", "body")
    val r = df.select(
      ContentRoute.route(col("ct"), col("body")).as("r"),
      ContentRoute.skipReason(col("ct"), col("body")).as("why"))
      .collect()(0)
    (r.getString(0), if (r.isNullAt(1)) null else r.getString(1))
  }

  test("untyped binary bodies route skip with 'binary-no-type'") {
    // PNG signature: 89 50 4E 47 0D 0A 1A 0A — 0x1A is a WHATWG
    // binary data byte
    val png = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    assert(routeOf(null, png) == ("skip", "binary-no-type"))
    assert(routeOf("", png) == ("skip", "binary-no-type"))
    // a control byte anywhere in the window is binary (zip local
    // header: PK 03 04)
    val zip = "PK".getBytes("US-ASCII") ++ Array(3.toByte, 4.toByte) ++
      "rest".getBytes("US-ASCII")
    assert(routeOf(null, zip) == ("skip", "binary-no-type"))
  }

  test("untyped TEXT bodies keep the browser-sniff html default") {
    assert(routeOf(null,
      "<html><p>hello</p></html>".getBytes("UTF-8"))._1 == "html")
    // tab/LF/CR/FF and ESC (ISO-2022-JP's shift byte!) are NOT binary
    // data bytes per WHATWG — a shifted Japanese page stays text
    val esc = 27.toChar
    val iso2022 = ("line1\tx\r\n" + 12.toChar + esc + "$B" + esc +
      "(Bline2").getBytes("ISO-8859-1")
    assert(routeOf(null, iso2022)._1 == "html")
    // high bytes (legacy 8-bit pages) are text, not binary
    val latin = Array(0x3c, 0x70, 0x3e, 0xE9, 0x93, 0xFF).map(_.toByte)
    assert(routeOf("", latin)._1 == "html")
    // a UTF-16 BOM short-circuits the binary-byte scan (UTF-16 ASCII
    // text is half NUL bytes — WHATWG checks the BOM first)
    val utf16le = Array(0xFF, 0xFE).map(_.toByte) ++
      "<html>".flatMap(c => Seq(c.toByte, 0.toByte))
    assert(routeOf(null, utf16le)._1 == "html")
    val utf8bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
      "<p>x</p>".getBytes("UTF-8")
    assert(routeOf(null, utf8bom)._1 == "html")
  }

  test("an explicit type always wins over the sniff") {
    val png = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    // typed binary skips WITH its essence as the reason
    assert(routeOf("image/png", png) == ("skip", "image/png"))
    // a lying text label on binary bytes is honored (the label is the
    // server's claim; q250's replacement counting degrades it instead)
    assert(routeOf("text/html", png)._1 == "html")
    // binary bytes past the 48-byte prescan window don't flip the route
    val longText = ("<html>" + "a" * 60).getBytes("UTF-8") ++ Array(0x00.toByte)
    assert(routeOf(null, longText)._1 == "html")
  }
}
