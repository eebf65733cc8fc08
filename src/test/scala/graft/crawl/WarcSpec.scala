package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Crlf = "\r\n"

  private def record(warcType: String, id: String, payload: String,
      extra: Seq[(String, String)] = Nil): String = {
    val bytes = payload.getBytes("UTF-8")
    val headers = Seq("WARC-Type" -> warcType, "WARC-Record-ID" -> id) ++
      extra ++ Seq("Content-Length" -> bytes.length.toString)
    "WARC/1.0" + Crlf +
      headers.map { case (k, v) => s"$k: $v" }.mkString(Crlf) + Crlf +
      Crlf + payload + Crlf + Crlf
  }

  test("records: two-record walk, length-delimited payloads, header map") {
    val r1 = record("response", "<urn:uuid:1>",
      "hello WARC/1.0 world", // a payload CONTAINING the magic
      Seq("WARC-Target-URI" -> "https://x.test/a",
        "WARC-Date" -> "2026-08-16T00:00:00Z",
        "Content-Type" -> "text/plain"))
    val r2 = record("metadata", "<urn:uuid:2>", "lang=en")
    val all = Warc.records((r1 + r2).getBytes("UTF-8")).toSeq
    assert(all.map(_.warcType) == Seq("response", "metadata"))
    assert(all.head.targetUri.contains("https://x.test/a"))
    assert(all.head.date.contains("2026-08-16T00:00:00Z"))
    assert(all.head.contentType.contains("text/plain"))
    assert(new String(all.head.content, "UTF-8") == "hello WARC/1.0 world")
    assert(all.head.contentLength == all.head.content.length)
    assert(all(1).targetUri.isEmpty && all(1).contentType.isEmpty)
    assert(new String(all(1).content, "UTF-8") == "lang=en")
  }

  test("records: truncation at every prefix is throw-free, keeps parsed head") {
    val bytes = (record("response", "<a>", "x" * 50) +
      record("metadata", "<b>", "y" * 30)).getBytes("UTF-8")
    for (n <- 0 to bytes.length) {
      val got = Warc.records(bytes.take(n)).toSeq // must not throw
      assert(got.size <= 2)
    }
    // a cut inside record 2 keeps the complete record 1
    assert(Warc.records(bytes.take(bytes.length - 5)).size == 1)
    // malformed: negative/garbled Content-Length, missing mandatory headers
    val bad = "WARC/1.0\r\nContent-Length: -4\r\n\r\n"
    assert(Warc.records(bad.getBytes).isEmpty)
    val noLen = "WARC/1.0\r\nWARC-Type: x\r\nWARC-Record-ID: <i>\r\n\r\npay"
    assert(Warc.records(noLen.getBytes).isEmpty)
    assert(Warc.records("HTTP/1.1 200 OK\r\n\r\n".getBytes).isEmpty)
    assert(Warc.records(Array.empty[Byte]).isEmpty)
    assert(Warc.records(null).isEmpty)
  }

  test("gzip member framing: per-record members concatenate and inflate back") {
    val r1 = record("response", "<a>", "alpha " * 200)
    val r2 = record("metadata", "<b>", "beta")
    val plain = (r1 + r2).getBytes("UTF-8")
    val gz = Warc.gzip(r1.getBytes("UTF-8")) ++ Warc.gzip(r2.getBytes("UTF-8"))
    val back = Warc.gunzipAll(gz).get
    assert(back.sameElements(plain))
    assert(Warc.records(back).map(_.warcType).toSeq ==
      Seq("response", "metadata"))
    // corrupt bytes quarantine
    assert(Warc.gunzipAll("not gzip at all".getBytes).isEmpty)
    assert(Warc.gunzipAll(gz.take(gz.length / 2)).isEmpty)
    // truncation AT a member boundary — the shape the JDK's
    // GZIPInputStream silently treats as EOF (returning the prefix as
    // if complete): the explicit member walk quarantines it
    val m1 = Warc.gzip(r1.getBytes("UTF-8"))
    for (cut <- Seq(m1.length + 1, m1.length + 5, m1.length + 9))
      assert(Warc.gunzipAll(gz.take(cut)).isEmpty,
        s"cut inside member 2's header at +${cut - m1.length}")
    // ...while the exact member boundary is a COMPLETE archive
    assert(Warc.gunzipAll(m1).get.sameElements(r1.getBytes("UTF-8")))
    // a corrupted trailer CRC is quarantine, not data
    val badCrc = gz.clone()
    badCrc(m1.length - 5) = (badCrc(m1.length - 5) ^ 0x55).toByte
    assert(Warc.gunzipAll(badCrc).isEmpty)
    // garbage BETWEEN members is quarantine (every byte is framed)
    assert(Warc.gunzipAll(m1 ++ "gap".getBytes ++
      Warc.gzip(r2.getBytes("UTF-8"))).isEmpty)
    // FNAME'd member (gzip -N writes the original filename): parses
    val named = {
      val out = new java.io.ByteArrayOutputStream()
      val base = Warc.gzip("payload".getBytes("UTF-8"))
      out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 8)) // FLG.FNAME
      out.write(base, 4, 6)                           // mtime/xfl/os
      out.write("orig.warc".getBytes("US-ASCII")); out.write(0)
      out.write(base, 10, base.length - 10)
      out.toByteArray
    }
    assert(Warc.gunzipAll(named).get.sameElements("payload".getBytes))
    // decompression-bomb guard: 64 MiB of zeros compresses to ~64 KiB;
    // the cap must fire DURING inflation, long before 64 MiB commits
    val bomb = Warc.gzip(new Array[Byte](64 << 20))
    assert(bomb.length < (1 << 17))
    assert(Warc.gunzipAll(bomb, maxOut = 1 << 20).isEmpty)
    assert(Warc.gunzipAll(bomb, maxOut = (64 << 20) + 1).isDefined)
  }

  test("file posture: .warc.gz files on disk via binaryFile + the SQL chain") {
    graft.plans.GraftExtensions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-warc").toFile
    try {
      // 3 archive files, 4 records each, one gzip member per record —
      // the exact layout a crawl dump ships in
      for (f <- 0 until 3) {
        val out = new java.io.FileOutputStream(new java.io.File(dir, f"shard-$f%05d.warc.gz"))
        for (r <- 0 until 4) {
          val rec = record("response", s"<urn:uuid:$f-$r>",
            s"payload $f/$r " + ("x" * (100 * r)),
            Seq("WARC-Target-URI" -> s"https://x.test/$f/$r"))
          out.write(Warc.gzip(rec.getBytes("UTF-8")))
        }
        out.close()
      }
      val rows = spark.read.format("binaryFile")
        .load(dir.getAbsolutePath + "/*.warc.gz")
        .selectExpr("path", "inline(warc_records(gunzip_all(content)))")
        .selectExpr("path", "record_id", "target_uri",
          "decode(content, 'utf-8') AS body")
        .collect()
      assert(rows.length == 12)
      assert(rows.map(_.getAs[String]("record_id")).distinct.length == 12)
      val r21 = rows.find(_.getAs[String]("record_id") == "<urn:uuid:2-1>").get
      assert(r21.getAs[String]("target_uri") == "https://x.test/2/1")
      assert(r21.getAs[String]("body") == "payload 2/1 " + ("x" * 100))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("SQL surface: warc_records / gzip_bytes / gunzip_all registered and codegen-clean") {
    graft.plans.GraftExtensions.register(spark)
    val r1 = record("response", "<urn:uuid:9>", "payload-9",
      Seq("WARC-Target-URI" -> "https://x.test/9"))
    val df = spark.sql(
      s"SELECT inline(warc_records(gunzip_all(gzip_bytes(encode('${r1.replace("\r\n", "' || chr(13) || chr(10) || '")}', 'utf-8')))))")
    val row = df.collect().head
    assert(row.getAs[String]("warc_type") == "response")
    assert(row.getAs[String]("target_uri") == "https://x.test/9")
    assert(row.getAs[Long]("content_length") == 9L)
    assert(new String(row.getAs[Array[Byte]]("content"), "UTF-8") == "payload-9")
    // NULL quarantine surfaces as SQL NULL, not an exception
    assert(spark.sql("SELECT gunzip_all(encode('junk', 'utf-8')) IS NULL")
      .collect().head.getBoolean(0))
  }
}
