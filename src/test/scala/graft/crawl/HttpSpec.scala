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

  test("WHATWG label families: CJK/Cyrillic/Greek/Thai labels decode real bytes") {
    // hard byte pins against the external encoding truth (not JDK
    // round-trips): a regression in label aliasing OR in the decoder
    // choice moves these
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val sjis = Http.decodeCharset(hx("93fa967b"), "text/html; charset=Shift_JIS")
    assert(sjis.text == "日本" && sjis.charset == "windows-31j" && sjis.nReplaced == 0)
    val euckr = Http.decodeCharset(hx("c7d1b1b9"), "text/html; charset=EUC-KR")
    assert(euckr.text == "한국" && euckr.charset == "x-windows-949")
    // WHATWG: gbk's decoder IS gb18030's decoder — all labels, one decoder
    for (label <- Seq("gbk", "GB2312", "gb18030", "csgb2312")) {
      val d = Http.decodeCharset(hx("d6d0cec4"), s"text/html; charset=$label")
      assert(d.text == "中文" && d.charset == "gb18030", label)
    }
    val big5 = Http.decodeCharset(hx("a4a4a4e5"), "text/html; charset=big5")
    assert(big5.text == "中文" && big5.charset == "big5-hkscs")
    val koi = Http.decodeCharset(hx("c4c1"), "text/plain; charset=koi8-r")
    assert(koi.text == "да" && koi.charset == "koi8-r")
    val i5 = Http.decodeCharset(hx("d4d0"), "text/html; charset=ISO-8859-5")
    assert(i5.text == "да" && i5.charset == "iso-8859-5")
    val w1251 = Http.decodeCharset(hx("e4e0"), "text/html; charset=windows-1251")
    assert(w1251.text == "да" && w1251.charset == "windows-1251")
    // WHATWG re-aliasing: iso-8859-9 decodes as windows-1254,
    // tis-620/iso-8859-11 as windows-874
    val tr = Http.decodeCharset(hx("f0"), "text/html; charset=iso-8859-9")
    assert(tr.text == "ğ" && tr.charset == "windows-1254")
    val th = Http.decodeCharset(hx("a1"), "text/html; charset=tis-620")
    assert(th.text == "ก" && th.charset == "x-windows-874")
    val el = Http.decodeCharset(hx("e1"), "text/html; charset=greek")
    assert(el.text == "α" && el.charset == "iso-8859-7")
    val dos = Http.decodeCharset(hx("80"), "text/plain; charset=ibm866")
    assert(dos.text == "А" && dos.charset == "ibm866")
    // label-alias round-trips through the JDK decoder for the rest of
    // the families (verifies resolution, not byte tables)
    for ((label, sample) <- Seq(
        "euc-jp" -> "日本語", "iso-2022-jp" -> "日本", "koi8-u" -> "ґанок",
        "iso-8859-2" -> "český", "windows-1250" -> "zażółć",
        "iso-8859-7" -> "ελλάδα", "windows-1253" -> "ελλάδα",
        "windows-1255" -> "שלום", "windows-1256" -> "مرحبا",
        "windows-1257" -> "ąčęė", "iso-8859-15" -> "€uro",
        "windows-874" -> "ไทย", "iso-8859-13" -> "ņķ")) {
      val cs = Http.resolveLabel(label).get
      val d = Http.decodeCharset(sample.getBytes(cs), s"text/html; charset=$label")
      assert(d.text == sample && d.nReplaced == 0, s"$label: ${d.text}")
    }
    // case/whitespace-insensitive labels
    assert(Http.resolveLabel("  SHIFT_JIS ").get.name == "windows-31j")
  }

  test("meta charset prescan applies only to HTML (or unknown) content types") {
    // a text/plain body that merely MENTIONS a charset label must not
    // be decoded under it — the prescan is an HTML mechanism
    val body = ("this plain file documents charset=utf-16le markers " +
      "and nothing else").getBytes("US-ASCII")
    val plain = Http.decodeCharset(body, "text/plain")
    assert(plain.charset == "utf-8" && plain.text.startsWith("this plain"))
    val json = Http.decodeCharset(
      """{"note":"charset=utf-16le"}""".getBytes("US-ASCII"), "application/json")
    assert(json.charset == "utf-8")
    // the same bytes under text/html DO sniff (here: a real meta tag)
    val html = ("<meta charset='windows-1251'><body>").getBytes("US-ASCII") ++
      Array[Byte](0xE4.toByte)
    assert(Http.decodeCharset(html, "text/html").charset == "windows-1251")
    assert(Http.decodeCharset(html, "application/xhtml+xml").charset == "windows-1251")
    // absent content type: the body may well be HTML — still sniffs
    assert(Http.decodeCharset(html, null).charset == "windows-1251")
    // non-HTML with an HONEST charset param still honors the param
    val param = Http.decodeCharset(Array[Byte](0xC4.toByte, 0xC1.toByte),
      "text/plain; charset=koi8-r")
    assert(param.text == "да")
  }

  test("content sniff: unlabeled non-UTF-8 falls back to windows-1252; labels still win") {
    // the unlabeled legacy page: before the sniff this dissolved into
    // counted-but-lost U+FFFD
    val legacy = "legacy page ".getBytes("US-ASCII") ++
      Array[Byte](0x93.toByte)
    val d = Http.decodeCharset(legacy, "text/html")
    assert(d.charset == "windows-1252" && d.text.endsWith("“") &&
      d.nReplaced == 0)
    assert(Http.decodeCharset(legacy, null).charset == "windows-1252")
    // valid UTF-8 (incl. pure ASCII) stays utf-8
    assert(Http.decodeCharset("é-ok".getBytes("UTF-8"), "text/html")
      .charset == "utf-8")
    // an explicit label — even a LYING one — still beats the sniff
    val lying = Http.decodeCharset(legacy, "text/html; charset=utf-8")
    assert(lying.charset == "utf-8" && lying.nReplaced == 1)
    // overlong sequences are invalid UTF-8 under the strict validator
    assert(Http.decodeCharset(Array[Byte](0xC0.toByte, 0xAF.toByte), null)
      .charset == "windows-1252")
  }

  test("ISO-2022-JP: stateful escape-shift decode through the label table") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // ESC $ B  (shift to JIS X 0208), 日本 as 467C 4B5C, ESC ( B back
    val jp = "jp: ".getBytes("US-ASCII") ++ hx("1B2442467C4B5C1B2842")
    val d = Http.decodeCharset(jp, "text/plain; charset=iso-2022-jp")
    assert(d.text == "jp: 日本" && d.charset == "iso-2022-jp" &&
      d.nReplaced == 0)
    // a truncated shift sequence degrades measurably, never throws
    for (i <- 0 until jp.length)
      Http.decodeCharset(jp.take(i), "text/plain; charset=iso-2022-jp")
  }

  test("conflicting duplicate Content-Length quarantines; identical repeats recover") {
    // RFC 9110 §8.6: differing duplicate CLs are malformed (smuggling
    // surface) — last-one-wins would yield a different body than the
    // upstream toolchain that rejects the capture
    val conflict = ascii(
      "HTTP/1.1 200 OK\r\nContent-Length: 5\r\nContent-Length: 7\r\n\r\nhello67")
    assert(Http.parseResponse(conflict).isEmpty)
    val same = ascii(
      "HTTP/1.1 200 OK\r\nContent-Length: 5\r\nContent-Length: 5\r\n\r\nhello67")
    assert(new String(Http.parseResponse(same).get.body, "US-ASCII") == "hello")
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

  // ---- Content-Encoding (representation layer) ----

  private def withEncoding(enc: String, body: Array[Byte],
      extra: String = ""): Array[Byte] =
    ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      (if (enc == null) "" else s"Content-Encoding: $enc\r\n") + extra +
      s"Content-Length: ${body.length}\r\n\r\n") ++ body

  private def decoded(msg: Array[Byte]): Http.BodyDecoded = {
    val r = Http.parseResponse(msg).get
    Http.decodeContentEncoding(r.headers, r.body)
  }

  test("content-encoding: gzip and x-gzip bodies inflate; identity/absent are no-ops") {
    val text = "inflated page body — survives the representation layer"
    val gz = Warc.gzip(text.getBytes("UTF-8"))
    for (label <- Seq("gzip", "x-gzip", "GZIP")) {
      val d = decoded(withEncoding(label, gz))
      assert(new String(d.body, "UTF-8") == text, label)
      assert(d.encoding.contains(label) && d.quarantine.isEmpty)
    }
    val plain = decoded(withEncoding(null, text.getBytes("UTF-8")))
    assert(new String(plain.body, "UTF-8") == text &&
      plain.encoding.isEmpty && plain.quarantine.isEmpty)
    val ident = decoded(withEncoding("identity", text.getBytes("UTF-8")))
    assert(new String(ident.body, "UTF-8") == text &&
      ident.quarantine.isEmpty)
  }

  test("content-encoding: deflate accepts BOTH zlib-wrapped and headerless-raw streams") {
    val text = "deflate has two real-world shapes and browsers accept both"
    val data = text.getBytes("UTF-8")
    def deflate(raw: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    for (raw <- Seq(false, true)) {
      val dd = decoded(withEncoding("deflate", deflate(raw)))
      assert(new String(dd.body, "UTF-8") == text, s"raw=$raw")
      assert(dd.quarantine.isEmpty)
    }
  }

  test("content-encoding: zstd inflates via the classpath codec") {
    val text = "zstd content-coding per RFC 8878"
    val z = Codecs.zstd(text.getBytes("UTF-8"))
    val d = decoded(withEncoding("zstd", z))
    assert(new String(d.body, "UTF-8") == text && d.quarantine.isEmpty)
  }

  test("content-encoding: multi-coding chains undo right-to-left; split headers combine") {
    val text = "chained codings apply in list order, undo in reverse"
    val chained = Warc.gzip(Codecs.zstd(text.getBytes("UTF-8")))
    val d = decoded(withEncoding("zstd, gzip", chained))
    assert(new String(d.body, "UTF-8") == text && d.quarantine.isEmpty)
    assert(d.encoding.contains("zstd, gzip"))
    // the same chain split across two header LINES is one list (§5.2)
    val split = decoded(withEncoding("zstd", chained,
      extra = "Content-Encoding: gzip\r\n"))
    assert(new String(split.body, "UTF-8") == text && split.quarantine.isEmpty)
  }

  test("content-encoding: br and unknown codings quarantine with the stored bytes intact") {
    val stored = "not actually brotli".getBytes("UTF-8")
    val d = decoded(withEncoding("br", stored))
    assert(d.body.toSeq == stored.toSeq)
    assert(d.quarantine.contains("unsupported-coding: br"))
    val u = decoded(withEncoding("compress", stored))
    assert(u.quarantine.contains("unsupported-coding: compress"))
  }

  test("content-encoding: corrupt and truncated encoded bodies quarantine, never throw") {
    val text = "corrupt encodings are rejects-table rows"
    val gz = Warc.gzip(text.getBytes("UTF-8"))
    // truncated gzip (mid-stream AND at the trailer boundary)
    for (cut <- Seq(gz.length - 4, gz.length / 2)) {
      val d = decoded(withEncoding("gzip",
        java.util.Arrays.copyOfRange(gz, 0, cut)))
      assert(d.quarantine.contains("corrupt-gzip-body"), s"cut=$cut")
    }
    // not-gzip bytes under a gzip label
    val ng = decoded(withEncoding("gzip", text.getBytes("UTF-8")))
    assert(ng.quarantine.contains("corrupt-gzip-body"))
    assert(new String(ng.body, "UTF-8") == text) // stored bytes surfaced
    // deflate stream with trailing junk is corrupt, not silently trimmed
    val dfl = {
      val d = new java.util.zip.Deflater()
      d.setInput(text.getBytes("UTF-8")); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val junk = decoded(withEncoding("deflate", dfl ++ Array[Byte](1, 2, 3)))
    assert(junk.quarantine.contains("corrupt-deflate-body"))
  }

  test("SQL surface: http_parts undoes content-encoding and surfaces quarantine") {
    graft.plans.GraftExtensions.register(spark)
    val text = "gzip body through the full SQL chain"
    val good = withEncoding("gzip", Warc.gzip(text.getBytes("UTF-8")))
    val bad = withEncoding("br", "xx".getBytes("UTF-8"))
    val df = spark.createDataFrame(Seq(Tuple1(good), Tuple1(bad))).toDF("msg")
      .selectExpr("http_parts(msg) AS h")
      .selectExpr("decode(h.body, 'utf-8') AS body",
        "h.content_encoding AS ce", "h.quarantine AS q")
      .orderBy("ce")
    val rows = df.collect()
    assert(rows(0).getString(0) == "xx" && rows(0).getString(1) == "br" &&
      rows(0).getString(2) == "unsupported-coding: br")
    assert(rows(1).getString(0) == text && rows(1).getString(1) == "gzip" &&
      rows(1).isNullAt(2))
  }
}
