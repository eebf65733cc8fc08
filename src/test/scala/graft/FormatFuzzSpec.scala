package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.crawl.{Codecs, Tar, Warc}
import graft.multimodal.MediaContainers

/** The quarantine contract, fuzzed: every byte-format parser in the
  * engine must return None/empty/NULL on arbitrary garbage and on
  * mutations of VALID artifacts — never throw. At 100 TB some
  * payloads WILL be corrupt; an exception is a task kill and a job
  * retry storm, a quiet quarantine is a row in the rejects table.
  * Seeded RNG: failures reproduce.
  */
class FormatFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def parseAllFormats(b: Array[Byte]): Unit = {
    MediaContainers.parse(b)
    MediaContainers.parseAv(b)
    MediaContainers.parseWebm(b)
    MediaContainers.decodePixels(b)
    Warc.records(b).foreach(_ => ())
    Tar.entries(b).foreach(_ => ())
    Warc.gunzipAll(b)
    Codecs.unzstdAll(b)
    graft.crawl.Http.parseResponse(b)
    graft.crawl.Http.decodeCharset(b, "text/html; charset=utf-8")
    graft.crawl.Http.decodeCharset(b, null)
    graft.crawl.Http.inflateDeflate(b)
    for (enc <- Seq("gzip", "deflate", "zstd", "br", "gzip, deflate"))
      graft.crawl.Http.decodeContentEncoding(
        Seq("content-encoding" -> enc), b)
  }

  test("random garbage: every parser quarantines, none throws") {
    val rnd = new scala.util.Random(20260816L)
    for (_ <- 0 until 400) {
      val n = rnd.nextInt(2048)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      parseAllFormats(b)
    }
  }

  test("mutated valid artifacts: single-byte flips and truncations never throw") {
    val rnd = new scala.util.Random(42L)
    val valid: Seq[Array[Byte]] = Seq(
      MediaContainers.webmBytes("webm", 1000000L, 60000.0, 640, 360,
        48000.0, 2),
      MediaContainers.mp4Bytes(600, 3600, 320, 240),
      MediaContainers.webpBytes("VP8 ", 640, 480),
      MediaContainers.webpBytes("VP8L", 320, 240),
      MediaContainers.webpBytes("VP8X", 4000, 3000),
      MediaContainers.avifBytes(1920, 1080),
      MediaContainers.flacBytes(44100, 2, 16, 1000L),
      MediaContainers.oggOpusBytes(2, 48000),
      Tar.tarBytes(Seq("a.txt" -> ("x" * 700).getBytes("UTF-8"),
        "b.bin" -> Array.tabulate(64)(_.toByte))),
      ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <a>\r\n" +
        "Content-Length: 5\r\n\r\nhello\r\n\r\n").getBytes("UTF-8"),
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n6\r\nchunk1\r\n0\r\n\r\n")
        .getBytes("UTF-8"),
      Warc.gzip(("payload " * 100).getBytes("UTF-8")),
      Codecs.zstd(("payload " * 100).getBytes("UTF-8")))
    for (base <- valid; _ <- 0 until 60) {
      val b = base.clone()
      rnd.nextInt(3) match {
        case 0 => // flip 1-4 bytes
          for (_ <- 0 to rnd.nextInt(4))
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          parseAllFormats(b)
        case 1 => // truncate
          parseAllFormats(b.take(rnd.nextInt(b.length + 1)))
        case 2 => // garbage tail
          val tail = new Array[Byte](rnd.nextInt(64))
          rnd.nextBytes(tail)
          parseAllFormats(b ++ tail)
      }
    }
  }

  test("charset surface: label forms, truncated multi-byte prefixes, BOM-vs-label conflicts never throw") {
    import graft.crawl.Http
    val rnd = new scala.util.Random(20260816L)
    // 1) label fuzzing: casing, whitespace, quotes, junk parameters —
    //    decode must never throw whatever the label string looks like
    val labels = Seq("utf-8", "Shift_JIS", "EUC-KR", "gb2312", "big5",
      "koi8-r", "iso-8859-7", "windows-1251", "tis-620", "ibm866",
      "unknown-enc", "", ";;;", "charset", "\"gbk\"", "'sjis'")
    val body = "plain ascii body with some text".getBytes("US-ASCII")
    for (l <- labels; form <- Seq(
        s"text/html; charset=$l", s"TEXT/HTML;CHARSET=$l",
        s"text/html ; charset = $l ", s"text/html; charset=$l; foo=bar",
        s"text/html; charset=\"$l\"", s"text/html; charset=")) {
      val d = Http.decodeCharset(body, form)
      assert(d.text.nonEmpty) // ASCII decodes under every resolution
    }
    // 2) truncated multi-byte sequences at EVERY prefix of real
    //    multi-byte payloads, under the matching label and under a
    //    lying one — replacement-counted, never thrown
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val multis = Seq(
      ("93FA967B", "shift_jis"), ("C7D1B1B9", "euc-kr"),
      ("D6D0CEC4", "gb18030"), ("A4A4A4E5", "big5"),
      ("E697A5E69CAC", "utf-8"), ("81308130", "gb18030") /* 4-byte gb */)
    for ((hex, label) <- multis; cut <- 0 to hex.length / 2) {
      val payload = "ascii-lead ".getBytes("US-ASCII") ++ hx(hex).take(cut)
      Http.decodeCharset(payload, s"text/html; charset=$label")
      Http.decodeCharset(payload, "text/html; charset=utf-8") // lying
      Http.decodeCharset(payload, null)
    }
    // 3) BOM-vs-label conflicts: every BOM under every label — the BOM
    //    must win and nothing throws, even when the BOM itself is then
    //    truncated mid-sequence
    val boms = Seq(hx("EFBBBF"), hx("FFFE"), hx("FEFF"))
    for (bom <- boms; l <- Seq("utf-8", "shift_jis", "utf-16be", "gbk")) {
      val d = Http.decodeCharset(bom ++ "after".getBytes("US-ASCII"),
        s"text/html; charset=$l")
      assert(d.charset == "utf-8" || d.charset.startsWith("utf-16"))
      Http.decodeCharset(bom.take(1), s"text/html; charset=$l")
      Http.decodeCharset(bom, s"text/html; charset=$l") // BOM only
    }
    // 4) random high-byte soup under every shipped label family
    for (_ <- 0 until 50) {
      val n = rnd.nextInt(256)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      for (l <- Seq("shift_jis", "euc-jp", "euc-kr", "gbk", "big5",
          "koi8-r", "iso-8859-5", "windows-1256", "iso-2022-jp")) {
        val d = Http.decodeCharset(b, s"text/plain; charset=$l")
        assert(d.nReplaced >= 0)
      }
    }
  }

  test("content-encoding surface: fuzzed bodies under every coding label quarantine or decode, never throw") {
    val rnd = new scala.util.Random(20260817L)
    val codings = Seq("gzip", "x-gzip", "deflate", "zstd", "br",
      "identity", "compress", "gzip, deflate", "zstd, gzip", ", ,", "")
    for (i <- 0 until 200) {
      val n = rnd.nextInt(1024)
      val body = new Array[Byte](n)
      rnd.nextBytes(body)
      // raw garbage under every label
      for (enc <- codings) {
        val d = graft.crawl.Http.decodeContentEncoding(
          Seq("content-encoding" -> enc), body)
        assert(d.body != null)
      }
      // mutated VALID encodings: flip one byte / truncate a real
      // gzip/deflate/zstd stream — must quarantine or decode, not throw
      if (n > 0) {
        for (valid <- Seq(
          "gzip" -> Warc.gzip(body),
          "zstd" -> Codecs.zstd(body))) {
          val (enc, bytes) = valid
          val m = bytes.clone()
          m(rnd.nextInt(m.length)) = (m(rnd.nextInt(m.length)) ^ (1 << rnd.nextInt(8))).toByte
          graft.crawl.Http.decodeContentEncoding(
            Seq("content-encoding" -> enc), m)
          graft.crawl.Http.decodeContentEncoding(
            Seq("content-encoding" -> enc),
            java.util.Arrays.copyOfRange(bytes, 0, rnd.nextInt(bytes.length)))
        }
      }
    }
  }

  test("codegen path: the SQL expressions survive a fuzz column without task failure") {
    graft.plans.GraftExtensions.register(spark)
    val rnd = new scala.util.Random(7L)
    val payloads = (0 until 64).map { i =>
      if (i % 4 == 0) {
        val b = new Array[Byte](rnd.nextInt(512)); rnd.nextBytes(b); b
      } else {
        val base = MediaContainers.webmBytes("webm", 1000000L, 1.0, 8, 8)
        base.take(rnd.nextInt(base.length + 1))
      }
    }
    val df = spark.createDataFrame(payloads.map(Tuple1(_))).toDF("media")
      .selectExpr(
        "media_meta(media) AS a", "av_meta(media) AS b",
        "size(warc_records(media)) AS c", "size(tar_entries(media)) AS d",
        "gunzip_all(media) IS NULL AS e", "unzstd_all(media) IS NULL AS f")
    assert(df.count() == 64) // completes without a task failure
  }
}
