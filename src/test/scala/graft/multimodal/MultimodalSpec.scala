package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media = Seq(
    MultimodalOps.MediaRecord(1L, MediaContainers.bmpBytes(17, 9), "image"),
    MultimodalOps.MediaRecord(2L, MediaContainers.wavBytes(2, 8000, 120), "audio"),
    MultimodalOps.MediaRecord(3L, MediaContainers.ppmBytes(5, 7), "image"),
    MultimodalOps.MediaRecord(4L, Array[Byte](1, 2, 3, 4), "unknown"))

  test("header parsers read real containers: BMP, PPM variants, WAV chunk walk") {
    import MediaContainers._
    assert(parseBmp(bmpBytes(17, 9)).contains(ImageMeta(17, 9)))
    assert(parsePpm(ppmBytes(5, 7)).contains(ImageMeta(5, 7)))
    // PPM comment + arbitrary whitespace handling per the Netpbm spec
    assert(parsePpm("P6 # a comment\n 12\t34 # another\n255\n".getBytes("US-ASCII"))
      .contains(ImageMeta(12, 34)))
    // legacy BITMAPCOREHEADER: u16 dims at the same offsets
    val core = {
      val out = new java.io.ByteArrayOutputStream()
      out.write('B'); out.write('M')
      out.write(Array[Byte](26, 0, 0, 0, 0, 0, 0, 0, 26, 0, 0, 0)) // size, resv, offset
      out.write(Array[Byte](12, 0, 0, 0)) // dib size 12
      out.write(Array[Byte](40, 1, 30, 0, 1, 0, 24, 0)) // w=296 h=30 planes bpp
      out.toByteArray
    }
    assert(parseBmp(core).contains(ImageMeta(296, 30)))
    val w = parseWav(wavBytes(2, 8000, 120)).get
    assert(w == WavMeta(2, 8000, 16, 120L))
    // chunk walk, not fixed offsets: a LIST chunk before fmt/data
    val shuffled = {
      val canon = wavBytes(1, 44100, 10)
      val out = new java.io.ByteArrayOutputStream()
      out.write(canon, 0, 12) // RIFF header
      out.write("LIST".getBytes("US-ASCII"))
      out.write(Array[Byte](4, 0, 0, 0)); out.write("INFO".getBytes("US-ASCII"))
      out.write(canon, 12, canon.length - 12) // fmt + data after
      out.toByteArray
    }
    assert(parseWav(shuffled).contains(WavMeta(1, 44100, 16, 10L)))
    // malformed inputs parse to None, never throw
    assert(parseBmp(Array[Byte]('B', 'M', 3)).isEmpty)
    assert(parseWav("RIFFxxxxWAVEdata".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, 127)).isEmpty)
    assert(parsePpm("P6\n-3 4\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(parse(null).format == "unknown")
  }

  test("decodeMetaColumns: real header parse through the native expression") {
    val df = media.toDS().toDF()
    val out = df.select((col("id") +: MultimodalOps.decodeMetaColumns(col("media"))): _*)
      .orderBy("id").collect()
    assert(out(0).getAs[String]("format") == "bmp")
    assert(out(0).getAs[Int]("width") == 17 && out(0).getAs[Int]("height") == 9)
    assert(out(0).getAs[Long]("n_frames") == 1L)
    assert(out(1).getAs[String]("format") == "wav")
    assert(out(1).isNullAt(out(1).fieldIndex("width")))
    assert(out(1).getAs[Long]("n_frames") == 120L)
    assert(out(2).getAs[String]("format") == "ppm")
    assert(out(2).getAs[Int]("width") == 5 && out(2).getAs[Int]("height") == 7)
    assert(out(3).getAs[String]("format") == "unknown")
    assert(out(3).isNullAt(out(3).fieldIndex("n_frames")))
    assert(out(3).getAs[Long]("byte_len") == 4L)
    assert(out(0).getAs[String]("checksum").length == 32)
  }

  test("decodeBatched: typed batched decode path matches the expression path") {
    val out = MultimodalOps.decodeBatched(media.toDS(), batchSize = 1)
      .collect().sortBy(_.id)
    assert(out.length == 4)
    assert(out(0).format == "bmp" && out(0).width.contains(17))
    assert(out(1).format == "wav" && out(1).width.isEmpty &&
      out(1).n_frames.contains(120L))
    assert(out(3).format == "unknown" && out(3).byte_len == 4L)
    assert(out(0).checksum == MultimodalOps.decodeBatched(media.toDS())
      .collect().sortBy(_.id).apply(0).checksum)
  }

  test("sampleFrames explodes every `every`-th frame index") {
    val df = Seq((1L, 10), (2L, 1)).toDF("id", "n_frames")
    val out = MultimodalOps.sampleFrames(df, "n_frames", every = 3)
      .groupBy("id").agg(collect_list("frame_idx").as("idx"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(out(1L) == Seq(0, 3, 6, 9))
    assert(out(2L) == Seq(0))
  }

  test("pixel decode round-trips the encoders byte-exactly (BMP + PPM + PGM)") {
    import MediaContainers._
    import MultimodalOps.synthBitmap
    // BMP: encode top-down RGB → bottom-up padded BGR file → decode back
    val rgb = synthBitmap(11L, 17, 9) // odd width => nonzero row padding
    val viaBmp = decodeBmpPixels(bmpBytesRgb(17, 9, rgb)).get
    assert(viaBmp.width == 17 && viaBmp.height == 9)
    assert(viaBmp.rgb.sameElements(rgb))
    // PPM: raster is verbatim
    val viaPpm = decodePpmPixels(ppmBytesRgb(17, 9, rgb)).get
    assert(viaPpm.rgb.sameElements(rgb))
    // sniffing union picks the right decoder
    assert(decodePixels(bmpBytesRgb(17, 9, rgb)).get.rgb.sameElements(rgb))
    assert(decodePixels(ppmBytesRgb(17, 9, rgb)).get.rgb.sameElements(rgb))
    // PGM gray replicates to RGB
    val pgm = ("P5\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](7, 9))
    assert(decodePpmPixels(pgm).get.rgb.toSeq == Seq[Byte](7, 7, 7, 9, 9, 9))
    // top-down BMP (negative height) decodes to the same top-down raster
    val td = bmpBytesRgb(4, 3, synthBitmap(5L, 4, 3))
    // flip stored rows to top-down and negate the height field
    val rowSize = ((3 * 4 + 3) / 4) * 4
    val flipped = td.clone()
    for (y <- 0 until 3; i <- 0 until rowSize)
      flipped(54 + y * rowSize + i) = td(54 + (2 - y) * rowSize + i)
    val negH = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-3).array()
    System.arraycopy(negH, 0, flipped, 22, 4)
    assert(decodeBmpPixels(flipped).get.rgb
      .sameElements(synthBitmap(5L, 4, 3)))
    // undecodable: WAV, compressed flag, 8-bit BMP, truncated raster, junk
    assert(decodePixels(wavBytes(1, 8000, 4)).isEmpty)
    val comp = bmpBytesRgb(4, 3, synthBitmap(5L, 4, 3)).clone()
    comp(30) = 1 // BI_RLE8
    assert(decodeBmpPixels(comp).isEmpty)
    assert(decodePpmPixels("P6\n4 4\n255\nxx".getBytes("US-ASCII")).isEmpty)
    assert(decodePpmPixels("P6\n2 2\n65535\n".getBytes("US-ASCII") ++
      new Array[Byte](24)).isEmpty, "2-byte samples are out of scope")
    assert(decodePixels(Array[Byte](1, 2, 3)).isEmpty)
    assert(decodePixels(null).isEmpty)
  }

  test("decodeImages: encoded-in → raw-out pipeline drops undecodables, keeps pixels") {
    import MultimodalOps._
    val rgbA = synthBitmap(1L, 6, 4)
    val rgbB = synthBitmap(2L, 5, 3)
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, MediaContainers.bmpBytesRgb(6, 4, rgbA), "image"),
      MediaRecord(2L, MediaContainers.ppmBytesRgb(5, 3, rgbB), "image"),
      MediaRecord(3L, MediaContainers.wavBytes(1, 8000, 4), "audio"),
      MediaRecord(4L, Array[Byte](9, 9), "unknown")))(
      org.apache.spark.sql.Encoders.product[MediaRecord])
    val out = decodeImages(ds, batchSize = 2).collect().sortBy(_.id)
    assert(out.map(_.id).toSeq == Seq(1L, 2L))
    assert(out(0).width == 6 && out(0).pixels.sameElements(rgbA))
    assert(out(1).height == 3 && out(1).pixels.sameElements(rgbB))
    // end to end: encoded → decode → resize → stats equals the raw path
    val resized = resizeRawRgb(decodeImages(ds), 3, 2).collect()
      .find(_.id == 1L).get
    assert(resized.pixels.sameElements(
      resizeNearestKernel(rgbA, 6, 4, 3, 2)))
  }

  test("resizeNearestKernel: identity at same dims; floor-mapped picks at 2x down") {
    import graft.multimodal.MultimodalOps._
    val src = synthBitmap(7L, 4, 4)
    assert(resizeNearestKernel(src, 4, 4, 4, 4).sameElements(src))
    val half = resizeNearestKernel(src, 4, 4, 2, 2)
    assert(half.length == 2 * 2 * 3)
    // NN with floor mapping: target (x,y) reads source (2x,2y)
    for (y <- 0 until 2; x <- 0 until 2; c <- 0 until 3) {
      val s = ((2 * y) * 4 + 2 * x) * 3 + c
      val t = (y * 2 + x) * 3 + c
      assert(half(t) == src(s), s"pixel ($x,$y,$c)")
    }
  }

  test("audioFeatures decodes 16-bit LE PCM and computes hand-checked features") {
    import graft.multimodal.MultimodalOps._
    import spark.implicits._
    // samples 100, -50, 0, 25, -75: crossings at (100,-50) and (25,-75)
    // only — a zero sample never SIGNED-crosses; sumSq = 18750, peak 100
    val samples = Seq(100, -50, 0, 25, -75)
    val pcm = samples.flatMap(s =>
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    val f = audioFeatures(spark.createDataset(Seq(RawAudio(1L, pcm))))
      .collect().head
    assert(f.n_samples == 5 && f.peak == 100L && f.zero_crossings == 2L)
    assert(f.mean_square == 18750.0 / 5)
    // distributed == local determinism over the synthetic clips
    val many = audioFeatures(spark.createDataset(
      (0L until 40L).map(i => RawAudio(i, synthPcm(i, 256)))).repartition(8))
      .collect().map(a => a.id -> a).toMap
    val one = audioFeatures(spark.createDataset(
      Seq(RawAudio(7L, synthPcm(7L, 256))))).collect().head
    assert(many(7L) == one)
  }

  test("resamplePcmLinear: identity at equal rates; hand-checked midpoints; bounds") {
    import MultimodalOps._
    import spark.implicits._
    def pcm(samples: Seq[Int]) = samples.flatMap(s =>
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    def decode(b: Array[Byte]) = (0 until b.length / 2).map(i =>
      ((((b(i * 2 + 1) & 0xff) << 8) | (b(i * 2) & 0xff)).toShort).toInt)
    val src = Seq(0, 100, -100, 50)
    // same rate: bit-identical passthrough
    val same = resamplePcmLinear(
      spark.createDataset(Seq(RawAudio(1L, pcm(src)))), 8000, 8000)
      .collect().head
    assert(decode(same.pcm) == src)
    // 2x upsample: odd outputs are exact midpoints (floor in u-domain)
    val up = resamplePcmLinear(
      spark.createDataset(Seq(RawAudio(1L, pcm(src)))), 4000, 8000)
      .collect().head
    val ud = decode(up.pcm)
    assert(ud.length == 7) // (4-1)*8000/4000 + 1
    assert(ud(0) == 0 && ud(2) == 100 && ud(4) == -100 && ud(6) == 50)
    assert(ud(1) == 50 && ud(3) == 0 && ud(5) == -25)
    // downsample keeps endpoints and stays within source min/max
    val down = resamplePcmLinear(
      spark.createDataset(Seq(RawAudio(1L, synthPcm(1L, 256)))), 8000, 6000)
      .collect().head
    val dd = decode(down.pcm)
    assert(dd.length == 192)
    val sd = decode(synthPcm(1L, 256))
    assert(dd.head == sd.head)
    assert(dd.forall(v => v >= sd.min && v <= sd.max))
    // degenerate clips: empty stays empty, single sample copies
    assert(resamplePcmLinear(spark.createDataset(
      Seq(RawAudio(2L, Array[Byte]()))), 8000, 6000)
      .collect().head.pcm.isEmpty)
    assert(decode(resamplePcmLinear(spark.createDataset(
      Seq(RawAudio(3L, pcm(Seq(42))))), 8000, 6000)
      .collect().head.pcm) == Seq(42))
  }

  test("resizeRawRgb + channelStats run distributed over raw bitmaps") {
    import graft.multimodal.MultimodalOps._
    import spark.implicits._
    val imgs = spark.createDataset(
      (0L until 50L).map(i => RawImage(i, 16, 12, synthBitmap(i, 16, 12))))
      .repartition(8)
    val resized = resizeRawRgb(imgs, 8, 6).collect()
    assert(resized.length == 50)
    assert(resized.forall(r => r.pixels.length == 8 * 6 * 3))
    // per-image parity with the local kernel (distributed == local)
    val local = resizeNearestKernel(synthBitmap(3L, 16, 12), 16, 12, 8, 6)
    assert(resized.find(_.id == 3L).get.pixels.sameElements(local))
    // constant image: means survive resize exactly
    val const = RawImage(99L, 10, 10, Array.fill(10 * 10 * 3)(0x40.toByte))
    val cs = channelStats(spark.createDataset(Seq(const))).collect().head
    assert(cs.mean_r == 64.0 && cs.mean_g == 64.0 && cs.mean_b == 64.0)
    val csResized = channelStats(spark.createDataset(
      resizeRawRgb(spark.createDataset(Seq(const)), 5, 5).collect().toSeq
        .map(r => RawImage(r.id, r.width, r.height, r.pixels))))
      .collect().head
    assert(csResized.mean_r == 64.0)
  }

  test("PNG: header parse, byte-exact codec round-trip, decodePixels routing") {
    import MediaContainers._
    val rgb = MultimodalOps.synthBitmap(7L, 16, 12)
    val png = pngBytesRgb(16, 12, rgb)
    // real PNG container: signature + IHDR dims via the byte-walk parser
    assert(parsePng(png).contains(ImageMeta(16, 12)))
    assert(parse(png) == MediaMeta("png", Some(16), Some(12), Some(1L)))
    // lossless: encode -> ImageIO decode reproduces the raster EXACTLY
    val back = decodeImageIoPixels(png).get
    assert(back.width == 16 && back.height == 12)
    assert(back.rgb.sameElements(rgb))
    // the sniff-gated union path routes PNG through the codec
    assert(decodePixels(png).get.rgb.sameElements(rgb))
    // and non-image payloads never reach the codec
    assert(decodeImageIoPixels(wavBytes(1, 8000, 10)).isEmpty)
    assert(decodeImageIoPixels(Array[Byte](1, 2, 3, 4)).isEmpty)
    // a truncated PNG is a quarantine None, not an exception
    assert(decodeImageIoPixels(png.take(30)).isEmpty)
  }

  test("codec quarantine: crafted huge dims rejected pre-allocation; corrupt body is None") {
    import MediaContainers._
    val rgb = MultimodalOps.synthBitmap(9L, 16, 12)
    val png = pngBytesRgb(16, 12, rgb)
    // patch IHDR to claim 50000x50000 (7.5 GB raster): the sniffed-dims
    // guard must reject BEFORE ImageIO.read allocates anything — an OOM
    // here would be the executor-killer the guard exists for
    val huge = png.clone()
    def putBe32(at: Int, v: Int): Unit = {
      huge(at) = (v >>> 24).toByte; huge(at + 1) = (v >>> 16).toByte
      huge(at + 2) = (v >>> 8).toByte; huge(at + 3) = v.toByte
    }
    putBe32(16, 50000); putBe32(20, 50000)
    assert(parsePng(huge).contains(ImageMeta(50000, 50000)), "sniff still sees the header")
    assert(decodeImageIoPixels(huge).isEmpty)
    // corrupt the compressed body but keep the sniffable header: the
    // codec throws (IOException OR RuntimeException depending on the
    // reader) — both are quarantine None, never a task kill
    val corrupt = png.clone()
    var i = 40
    while (i < corrupt.length - 12) { corrupt(i) = (corrupt(i) ^ 0x5a).toByte; i += 1 }
    assert(parsePng(corrupt).contains(ImageMeta(16, 12)))
    assert(decodeImageIoPixels(corrupt).isEmpty)
  }

  test("JPEG: header parse and lossy decode with perceptual-hash stability") {
    import MediaContainers._
    // a structured image (smooth gradient), not noise: dHash compares
    // neighboring gray gradients, and DCT quantization preserves
    // consistent gradients while pure per-pixel noise — which carries
    // no structure a perceptual hash could hold onto — is the one
    // input class where "perceptual stability" is undefined
    val rgb = new Array[Byte](16 * 12 * 3)
    for (y <- 0 until 12; x <- 0 until 16) {
      val t = (y * 16 + x) * 3
      rgb(t) = (x * 14).toByte
      rgb(t + 1) = (y * 18).toByte
      rgb(t + 2) = ((x + y) * 7).toByte
    }
    val jpg = jpegBytesRgb(16, 12, rgb)
    // SOF marker walk finds the frame dimensions
    assert(parseJpeg(jpg).contains(ImageMeta(16, 12)))
    assert(parse(jpg) == MediaMeta("jpeg", Some(16), Some(12), Some(1L)))
    val back = decodePixels(jpg).get
    assert(back.width == 16 && back.height == 12)
    // lossy: bytes differ, but the perceptual hash must be STABLE —
    // dHash compares neighboring gray gradients, which DCT quantization
    // perturbs only slightly on any real image
    assert(!back.rgb.sameElements(rgb)) // it IS lossy (sanity)
    val (h1a, h2a) = PerceptualHash.dHashKernel(rgb, 16, 12)
    val (h1b, h2b) = PerceptualHash.dHashKernel(back.rgb, 16, 12)
    val hamming = java.lang.Long.bitCount(h1a ^ h1b) +
      java.lang.Long.bitCount(h2a ^ h2b)
    assert(hamming <= 8, s"JPEG round-trip moved dHash by $hamming bits")
  }

  test("GIF: header parse (both signatures), bad input quarantined") {
    import MediaContainers._
    def gif(sig: String, w: Int, h: Int): Array[Byte] =
      sig.getBytes("US-ASCII") ++ Array[Byte](
        (w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
        (h & 0xff).toByte, ((h >> 8) & 0xff).toByte, 0, 0, 0)
    assert(parseGif(gif("GIF89a", 300, 70)).contains(ImageMeta(300, 70)))
    assert(parseGif(gif("GIF87a", 2, 1)).contains(ImageMeta(2, 1)))
    assert(parse(gif("GIF89a", 300, 70)) ==
      MediaMeta("gif", Some(300), Some(70), Some(1L)))
    assert(parseGif(gif("GIF99a", 3, 3)).isEmpty) // bad version
    assert(parseGif(gif("GIF89a", 0, 5)).isEmpty) // zero dim
    assert(parseGif("GIF89a".getBytes("US-ASCII")).isEmpty) // truncated
    // real GIF codec round trip through ImageIO: a grayscale gradient
    // has ≤256 distinct colors, so the palette quantization is exact
    val gray = new Array[Byte](16 * 12 * 3)
    for (i <- 0 until 16 * 12) {
      val g = ((i * 255) / (16 * 12 - 1)).toByte
      gray(i * 3) = g; gray(i * 3 + 1) = g; gray(i * 3 + 2) = g
    }
    val enc = gifBytesRgb(16, 12, gray)
    assert(parseGif(enc).contains(ImageMeta(16, 12)))
    val back = decodePixels(enc).get
    assert(back.width == 16 && back.height == 12)
    assert(back.rgb.sameElements(gray))
  }

  test("WebP: VP8/VP8L/VP8X dims via the RIFF walk; malformed quarantined") {
    import MediaContainers._
    // VP8 lossy keyframe: 14-bit LE dims behind the 9D 01 2A sync
    val lossy = webpBytes("VP8 ", 640, 480)
    assert(parseWebp(lossy).contains(ImageMeta(640, 480)))
    assert(parse(lossy) == MediaMeta("webp", Some(640), Some(480), Some(1L)))
    // VP8L lossless: 14+14-bit packed minus-one dims, both extremes
    assert(parseWebp(webpBytes("VP8L", 1, 1)).contains(ImageMeta(1, 1)))
    assert(parseWebp(webpBytes("VP8L", 16384, 16384))
      .contains(ImageMeta(16384, 16384)))
    // VP8X extended: 24-bit LE canvas dims, minus-one coded
    assert(parseWebp(webpBytes("VP8X", 4000, 3000))
      .contains(ImageMeta(4000, 3000)))
    // a leading foreign chunk is SKIPPED (chunk walk, not fixed offsets)
    val base = webpBytes("VP8L", 33, 44)
    val iccp = "ICCP".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4)
    val spliced = base.take(12) ++ iccp ++ base.drop(12)
    assert(parseWebp(spliced).contains(ImageMeta(33, 44)))
    // malformed: WAV is RIFF but not WEBP; bad sync; bad VP8L
    // signature; truncation at every prefix quarantines, never throws
    assert(parseWebp(wavBytes(1, 8000, 16)).isEmpty)
    val badSync = lossy.clone(); badSync(23) = 0 // payload sync byte
    assert(parseWebp(badSync).isEmpty)
    val badSig = webpBytes("VP8L", 9, 9); badSig(20) = 0 // 0x2F gone
    assert(parseWebp(badSig).isEmpty)
    for (i <- 0 until lossy.length) parseWebp(lossy.take(i))
    assert(parseWebp(lossy.take(25)).isEmpty)
  }

  test("AVIF: ftyp brand gate + meta/iprp/ipco/ispe walk; malformed quarantined") {
    import MediaContainers._
    val av = avifBytes(1920, 1080)
    assert(parseAvif(av).contains(ImageMeta(1920, 1080)))
    assert(parse(av) == MediaMeta("avif", Some(1920), Some(1080), Some(1L)))
    // the two ISO-BMFF sniffs never cross-claim: an AVIF has no moov,
    // an MP4 has no avif brand
    assert(parseMp4(av).isEmpty)
    assert(parseAvif(mp4Bytes(600, 3600, 64, 48)).isEmpty)
    // brand in the COMPATIBLE list (major mif1) still accepted
    val compatOnly = av.clone()
    System.arraycopy("mif1".getBytes("US-ASCII"), 0, compatOnly, 8, 4)
    System.arraycopy("avif".getBytes("US-ASCII"), 0, compatOnly, 16, 4)
    assert(parseAvif(compatOnly).contains(ImageMeta(1920, 1080)))
    // zero dims, truncation at every prefix: quarantined, never thrown
    assert(parseAvif(avifBytes(0, 10)).isEmpty)
    for (i <- 0 until av.length) parseAvif(av.take(i))
    assert(parseAvif(av.take(40)).isEmpty)
  }

  test("MP4: box walk reads mvhd duration and tkhd dims; truncation quarantined") {
    import MediaContainers._
    // video movie: dims from the trak, duration from mvhd
    val vid = mp4Bytes(timescale = 600, durationTicks = 3600, w = 640, h = 360)
    assert(parseMp4(vid).contains(Mp4Meta(600, 3600L, Some(640), Some(360))))
    assert(parse(vid) == MediaMeta("mp4", Some(640), Some(360), None))
    // audio-only movie (no trak): duration only
    val aud = mp4Bytes(timescale = 48000, durationTicks = 96000)
    assert(parseMp4(aud).contains(Mp4Meta(48000, 96000L, None, None)))
    // version-1 mvhd (64-bit times): hand-patch the synthesized v0 box —
    // v1 payload is 12 bytes longer (8-byte creation/modification/duration)
    val v1 = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(vid, 0, 16)                    // ftyp
      val moovPayload = new java.io.ByteArrayOutputStream()
      moovPayload.write(Array[Byte](0, 0, 0, 120) ++ "mvhd".getBytes) // 8+112
      moovPayload.write(Array[Byte](1, 0, 0, 0))                     // v1
      moovPayload.write(new Array[Byte](16))   // creation, modification (64-bit)
      moovPayload.write(Array[Byte](0, 0, 2, 88))                    // timescale 600
      moovPayload.write(Array[Byte](0, 0, 0, 0, 0, 0, 14, 16))       // duration 3600
      moovPayload.write(new Array[Byte](112 - 4 - 16 - 4 - 8))       // rest
      val moov = moovPayload.toByteArray
      out.write(Array[Byte](0, 0, 0, (8 + moov.length).toByte))
      out.write("moov".getBytes); out.write(moov)
      out.toByteArray
    }
    assert(parseMp4(v1).contains(Mp4Meta(600, 3600L, None, None)))
    // truncated mid-moov, zero timescale, wrong leading box: all None
    assert(parseMp4(vid.take(40)).isEmpty)
    assert(parseMp4(mp4Bytes(0, 100)).isEmpty)
    assert(parseMp4("freeformatnotftyp".getBytes).isEmpty)
    assert(parseMp4(Array.empty[Byte]).isEmpty)
  }

  test("FLAC: STREAMINFO bit unpacking; zero total = unknown; malformed quarantined") {
    import MediaContainers._
    val f = flacBytes(44100, 2, 16, 1234567L)
    assert(parseFlac(f).contains(FlacMeta(44100, 2, 16, Some(1234567L))))
    assert(parse(f) == MediaMeta("flac", None, None, Some(1234567L)))
    // odd geometry exercises every bit boundary: 20-bit rate, 3-bit
    // channels, 5-bit bps, 36-bit total
    assert(parseFlac(flacBytes(192000, 8, 24, (1L << 35) + 7L))
      .contains(FlacMeta(192000, 8, 24, Some((1L << 35) + 7L))))
    // total samples 0 means "unknown" per spec
    assert(parseFlac(flacBytes(8000, 1, 8, 0L))
      .contains(FlacMeta(8000, 1, 8, None)))
    assert(parseFlac(f.take(20)).isEmpty)             // truncated
    val notFirst = f.clone(); notFirst(4) = 0x04      // first block not STREAMINFO
    assert(parseFlac(notFirst).isEmpty)
    assert(parseFlac("fLaCxxxx".getBytes).isEmpty)
  }

  test("MP3: frame header fields, ID3v2 skip, reserved combinations rejected") {
    import MediaContainers._
    // MPEG-1 Layer III, 128 kbps (idx 9), 44100 (idx 0), stereo
    val m = mp3Bytes(bitrateIdx = 9, rateIdx = 0, mono = false)
    assert(parseMp3(m).contains(Mp3Meta(1, 3, 128, 44100, 2)))
    assert(parse(m) == MediaMeta("mp3", None, None, None))
    assert(parseMp3(mp3Bytes(14, 2, mono = true))
      .contains(Mp3Meta(1, 3, 320, 32000, 1)))
    // ID3v2-prefixed stream: 10-byte tag header + syncsafe size
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 5) ++
      new Array[Byte](5) ++ m
    assert(parseMp3(id3).contains(Mp3Meta(1, 3, 128, 44100, 2)))
    // reserved version (0xE8 = sync + version bits 01), bad bitrate
    // index 15, bad rate index 3, free bitrate 0: all rejected
    assert(parseMp3(Array(0xff, 0xe8, 0x90, 0x00).map(_.toByte)).isEmpty)
    assert(parseMp3(Array(0xff, 0xfb, 0xf0, 0x00).map(_.toByte)).isEmpty)
    assert(parseMp3(Array(0xff, 0xfb, 0x9c, 0x00).map(_.toByte)).isEmpty)
    assert(parseMp3(Array(0xff, 0xfb, 0x00, 0x00).map(_.toByte)).isEmpty)
    assert(parseMp3(m.take(3)).isEmpty)
  }

  test("Ogg: BOS-page codec id headers (Opus + Vorbis); non-BOS quarantined") {
    import MediaContainers._
    val opus = oggOpusBytes(2, 48000)
    assert(parseOgg(opus).contains(OggMeta("opus", 2, 48000)))
    assert(parse(opus) == MediaMeta("ogg", None, None, None))
    val vorbis = oggVorbisBytes(6, 44100)
    assert(parseOgg(vorbis).contains(OggMeta("vorbis", 6, 44100)))
    // a BOS page with an unrecognized first packet IS Ogg, codec unknown
    val alien = opus.clone(); alien(28) = 'X'
    assert(parseOgg(alien).contains(OggMeta("unknown", 0, 0)))
    // continuation page (header type 0), truncated page: None
    val cont = opus.clone(); cont(5) = 0
    assert(parseOgg(cont).isEmpty)
    assert(parseOgg(opus.take(20)).isEmpty)
  }

  test("WebM/Matroska: EBML walk reads Info + Tracks; defaults and malformed pinned") {
    import MediaContainers._
    // A/V movie: dims from the video TrackEntry, stream params from
    // the audio TrackEntry, duration from Info (float64 in ticks)
    val av = webmBytes("webm", timestampScaleNs = 1000000L,
      durationTicks = 90000.0, w = 1280, h = 720,
      sampleRate = 48000.0, channels = 2)
    assert(parseWebm(av).contains(WebmMeta("webm", 1000000L,
      Some(90000L), Some(1280), Some(720), Some(48000), Some(2))))
    assert(parse(av) == MediaMeta("webm", Some(1280), Some(720), None))
    // matroska DocType surfaces as mkv in the sniff chains
    val mkv = webmBytes("matroska", timestampScaleNs = 500000L,
      durationTicks = 1500.0, w = 640, h = 480)
    assert(parseWebm(mkv).contains(WebmMeta("matroska", 500000L,
      Some(1500L), Some(640), Some(480), None, None)))
    assert(parse(mkv) == MediaMeta("mkv", Some(640), Some(480), None))
    // audio-only, SamplingFrequency omitted → spec defaults 8000 Hz;
    // Channels element carries the explicit value
    val aud = parseWebm(webmBytes("webm", channels = 6)).get
    assert(aud.sampleRate.contains(8000) && aud.channels.contains(6))
    assert(aud.durationTicks.isEmpty && aud.width.isEmpty)
    // no Duration element → None; default TimestampScale survives
    assert(parseWebm(webmBytes("webm", w = 16, h = 16)).get
      .timestampScaleNs == 1000000L)
    // non-Matroska EBML DocType is not this container
    assert(parseWebm(webmBytes("alien", w = 4, h = 4)).isEmpty)
    // EBML strings may be zero-padded to the declared size — a padded
    // DocType still identifies the container
    assert(parseWebm(webmBytes("webm" + "\u0000\u0000", w = 32, h = 16)).get
      .width.contains(32))
    // truncation at EVERY prefix length: never a throw, and a cut
    // inside the Segment yields whatever whole elements survived
    for (n <- 0 until av.length) parseWebm(av.take(n)) // must not throw
    assert(parseWebm(av.take(3)).isEmpty)   // magic cut short
    // EBML header alone (12 bytes): DocType readable, Segment absent —
    // the container is identified, every field honestly None
    assert(parseWebm(av.take(12)).contains(
      WebmMeta("webm", 1000000L, None, None, None, None, None)))
    assert(parseWebm("notwebmatall.....".getBytes).isEmpty)
    assert(parseWebm(Array.empty[Byte]).isEmpty)
  }

  test("av_meta expression: one sniff carries stream parameters for every format") {
    import MediaContainers._
    graft.plans.GraftExtensions.register(spark)
    val rows = Seq(
      ("mp4v", mp4Bytes(600, 3600, 640, 360)),
      ("flac", flacBytes(44100, 2, 16, 441000L)),
      ("mp3", mp3Bytes(9, 0, mono = false)),
      ("opus", oggOpusBytes(2, 48000)),
      ("wav", wavBytes(2, 8000, 16)),
      ("webm", webmBytes("webm", 250000L, 60000.0, 1920, 1080, 44100.0, 2)),
      ("mkv", webmBytes("matroska", 1000000L, 15000.0, 720, 576)),
      ("bmp", bmpBytes(7, 5)),
      ("junk", Array[Byte](1, 2, 3)))
    val df = spark.createDataFrame(rows.map { case (n, b) => (n, b) })
      .toDF("name", "media")
      .selectExpr("name", "av_meta(media) AS m")
      .selectExpr("name", "m.format", "m.width", "m.height", "m.n_frames",
        "m.sample_rate", "m.channels", "m.duration_ticks", "m.timescale")
    val got = df.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(got("mp4v") == Seq("mp4", 640, 360, null, null, null, 3600L, 600))
    assert(got("flac") == Seq("flac", null, null, 441000L, 44100, 2, null, null))
    assert(got("mp3") == Seq("mp3", null, null, null, 44100, 2, null, null))
    assert(got("opus") == Seq("ogg", null, null, null, 48000, 2, null, null))
    assert(got("wav") == Seq("wav", null, null, 16L, 8000, 2, null, null))
    // 250000 ns/tick → 4000 ticks/s; dims + audio params + duration
    assert(got("webm") == Seq("webm", 1920, 1080, null, 44100, 2, 60000L, 4000))
    assert(got("mkv") == Seq("mkv", 720, 576, null, null, null, 15000L, 1000))
    assert(got("bmp") == Seq("bmp", 7, 5, 1L, null, null, null, null))
    assert(got("junk") == Seq("unknown", null, null, null, null, null, null, null))
  }

  test("JPEG portability pin: dHash stable across re-encode quality levels") {
    import MediaContainers._
    // The JDK's JPEG writer picks quantization tables and chroma
    // subsampling from the quality factor — the implementation-
    // sensitive surface. Re-encoding the same structured image at two
    // explicit qualities must keep the perceptual hash within the same
    // radius the dedup queries use, so a JDK upgrade (or a quality
    // drift in a corpus) can't silently shift q239-adjacent behavior.
    val rgb = new Array[Byte](32 * 24 * 3)
    for (y <- 0 until 24; x <- 0 until 32) {
      val t = (y * 32 + x) * 3
      rgb(t) = (x * 7).toByte
      rgb(t + 1) = (y * 9).toByte
      rgb(t + 2) = ((x + y) * 4).toByte
    }
    val (h1, h2) = PerceptualHash.dHashKernel(rgb, 32, 24)
    for (q <- Seq(0.9f, 0.5f)) {
      val enc = jpegBytesRgbQ(32, 24, rgb, q)
      assert(parseJpeg(enc).contains(ImageMeta(32, 24)))
      val back = decodePixels(enc).get
      val (b1, b2) = PerceptualHash.dHashKernel(back.rgb, 32, 24)
      val hamming = java.lang.Long.bitCount(h1 ^ b1) +
        java.lang.Long.bitCount(h2 ^ b2)
      assert(hamming <= 8,
        s"quality $q moved dHash by $hamming bits (near-dup radius is 8)")
    }
  }

  test("decodeImages decodes PNG payloads end to end (the q239 chain)") {
    val encoded = spark.createDataset((0L until 20L).map { id =>
      MultimodalOps.MediaRecord(id,
        MediaContainers.pngBytesRgb(16, 12, MultimodalOps.synthBitmap(id, 16, 12)),
        "image")
    }).repartition(4)
    val raw = MultimodalOps.decodeImages(encoded).collect()
    assert(raw.length == 20)
    assert(raw.forall(r => r.pixels.sameElements(
      MultimodalOps.synthBitmap(r.id, 16, 12))))
  }
}
