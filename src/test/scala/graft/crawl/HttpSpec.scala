package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class HttpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  test("response parse: status line, header fields, Content-Length trim") {
    val msg = ascii(
      "HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html; charset=utf-8\r\n" +
        "Server: test/1.0\r\n" +
        "Content-Length: 5\r\n" +
        "\r\n" +
        "hellojunk-after-declared-length")
    val r = Http.parseResponse(msg).get
    assert(r.statusCode == 200 && r.reason == "OK")
    assert(r.headers == Seq(
      "content-type" -> "text/html; charset=utf-8",
      "server" -> "test/1.0",
      "content-length" -> "5"))
    assert(new String(r.body, "US-ASCII") == "hello") // trimmed to CL
    // no reason phrase: legal per RFC 9112
    val r2 = Http.parseResponse(ascii("HTTP/1.1 404\r\n\r\nbody")).get
    assert(r2.statusCode == 404 && r2.reason == "" &&
      new String(r2.body, "US-ASCII") == "body")
  }

  test("truncated capture: declared Content-Length beyond stored bytes surfaces what's there") {
    // the WARC-Truncated case — ubiquitous in real crawls; the stored
    // prefix is data, not junk
    val msg = ascii("HTTP/1.1 200 OK\r\nContent-Length: 100000\r\n\r\npartial")
    val r = Http.parseResponse(msg).get
    assert(new String(r.body, "US-ASCII") == "partial")
  }

  test("chunked transfer coding: sizes in hex, extensions, trailers") {
    val msg = ascii(
      "HTTP/1.1 200 OK\r\n" +
        "Transfer-Encoding: chunked\r\n" +
        "\r\n" +
        "6;ext=1\r\nchunk1\r\n" +
        "A\r\n_chunk_two\r\n" +
        "0\r\n" +
        "X-Trailer: t\r\n" +
        "\r\n")
    val r = Http.parseResponse(msg).get
    assert(new String(r.body, "US-ASCII") == "chunk1_chunk_two")
  }

  test("malformed framing quarantines: bad chunk size, missing chunk CRLF, truncated headers, header bomb") {
    val head = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
    assert(Http.parseResponse(ascii(head + "ZZ\r\nxx\r\n0\r\n\r\n")).isEmpty)
    assert(Http.parseResponse(ascii(head + "3\r\nabcX0\r\n\r\n")).isEmpty)
    assert(Http.parseResponse(ascii(head + "5\r\nab")).isEmpty) // truncated chunk
    assert(Http.parseResponse(ascii("HTTP/1.1 200 OK\r\nNo-Terminator: x")).isEmpty)
    assert(Http.parseResponse(ascii("HTTP/1.1 2x0 OK\r\n\r\n")).isEmpty)
    assert(Http.parseResponse(ascii("ICY 200 OK\r\n\r\n")).isEmpty)
    assert(Http.parseResponse(null).isEmpty)
    val bomb = "HTTP/1.1 200 OK\r\n" + ("A: b\r\n" * 300) + "\r\nx"
    assert(Http.parseResponse(ascii(bomb)).isEmpty)
    // negative / non-numeric Content-Length
    assert(Http.parseResponse(ascii("HTTP/1.1 200 OK\r\nContent-Length: -1\r\n\r\n")).isEmpty)
    assert(Http.parseResponse(ascii("HTTP/1.1 200 OK\r\nContent-Length: ten\r\n\r\n")).isEmpty)
  }

  test("charset resolution order: BOM > Content-Type param > meta sniff > UTF-8 default") {
    // BOM wins even over a lying Content-Type label
    val bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "é-text".getBytes("UTF-8")
    val d1 = Http.decodeCharset(bom, "text/html; charset=windows-1252")
    assert(d1.text == "é-text" && d1.charset == "utf-8" && d1.nReplaced == 0)
    // UTF-16LE BOM
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ "hi".getBytes("UTF-16LE")
    assert(Http.decodeCharset(le, null).text == "hi")
    // Content-Type param, quoted and unquoted; latin-1 family -> 1252
    val cp = Array[Byte](0x93.toByte, 'a', 0x94.toByte) // curly quotes in 1252
    val d2 = Http.decodeCharset(cp, "text/html; charset=iso-8859-1")
    assert(d2.text == "“a”" && d2.charset == "windows-1252")
    val d3 = Http.decodeCharset(cp, "text/html; charset=\"windows-1252\"")
    assert(d3.text == "“a”")
    // meta sniff when the header has no charset
    val meta = ("<html><head><meta charset='windows-1252'></head>" +
      "<body>").getBytes("US-ASCII") ++ Array[Byte](0xE9.toByte)
    val d4 = Http.decodeCharset(meta, "text/html")
    assert(d4.text.endsWith("é") && d4.charset == "windows-1252")
    // default: UTF-8
    val d5 = Http.decodeCharset("plain".getBytes("UTF-8"), null)
    assert(d5.text == "plain" && d5.charset == "utf-8")
  }

  test("lying or unknown labels degrade measurably, never throw") {
    // declared UTF-8, actually 1252 high bytes: replacement counted
    val lying = Array[Byte]('a', 0x93.toByte, 'b', 0xE9.toByte)
    val d = Http.decodeCharset(lying, "text/html; charset=utf-8")
    assert(d.nReplaced == 2 && d.text == "a�b�")
    // unknown label: falls through to the meta sniff, then UTF-8
    val d2 = Http.decodeCharset("ok".getBytes("UTF-8"),
      "text/html; charset=klingon-8")
    assert(d2.text == "ok" && d2.charset == "utf-8")
    assert(Http.decodeCharset(null, "text/html").text == "")
    assert(Http.decodeCharset(Array.empty[Byte], null).text == "")
  }

  test("review pins: huge Content-Length, meta-shadowing text, duplicate headers") {
    // CL past Int.MaxValue = a truncated >2GiB capture, not junk:
    // surface the stored bytes
    val big = Http.parseResponse(ascii(
      "HTTP/1.1 200 OK\r\nContent-Length: 3000000000\r\n\r\nstored-prefix")).get
    assert(new String(big.body, "US-ASCII") == "stored-prefix")
    // the word 'charset' in page text before the real meta tag must
    // not shadow it
    val shadowed = ("<title>charset test page</title>" +
      "<meta charset=\"windows-1252\"><body>").getBytes("US-ASCII") ++
      Array[Byte](0xE9.toByte)
    val d = Http.decodeCharset(shadowed, "text/html")
    assert(d.charset == "windows-1252" && d.text.endsWith("é"))
    // duplicate header names: LAST occurrence wins in the map surface
    graft.plans.GraftExtensions.register(spark)
    val dup = ("HTTP/1.1 200 OK\r\nX-H: first\r\nX-H: second\r\n" +
      "Content-Length: 2\r\n\r\nok").getBytes("US-ASCII")
    val row = spark.createDataFrame(Seq(Tuple1(dup))).toDF("m")
      .selectExpr("http_parts(m) AS h")
      .selectExpr("h.headers['x-h'] AS v", "size(h.headers) AS n")
      .collect().head
    assert(row.getString(0) == "second" && row.getInt(1) == 2)
  }

  test("SQL surface: http_parts + decode_charset inside a WARC chain") {
    graft.plans.GraftExtensions.register(spark)
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      "charset=windows-1252\r\nContent-Length: 3\r\n\r\n"
    val payload = http.getBytes("US-ASCII") ++
      Array[Byte]('a', 0x93.toByte, 'z')
    val warc = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <r1>\r\nContent-Length: " + payload.length +
      "\r\n\r\n").getBytes("US-ASCII") ++ payload ++ "\r\n\r\n".getBytes
    val df = spark.createDataFrame(Seq(Tuple1(Warc.gzip(warc)))).toDF("media")
      .selectExpr("inline(warc_records(gunzip_all(media)))")
      .selectExpr("http_parts(content) AS h")
      .selectExpr("h.status", "h.headers['content-type'] AS ct",
        "decode_charset(h.body, h.headers['content-type']) AS d")
      .selectExpr("status", "ct", "d.text", "d.charset", "d.n_replaced")
    val row = df.collect().head
    assert(row.getInt(0) == 200)
    assert(row.getString(2) == "a“z")
    assert(row.getString(3) == "windows-1252")
    assert(row.getInt(4) == 0)
  }
}
