package graft.multimodal

/** Dependency-free media-container parsing — REAL header parsing for the
  * three public formats whose containers need no codec library: BMP
  * (BITMAPINFOHEADER and the legacy BITMAPCOREHEADER), binary PPM/PGM
  * (P6/P5, with comment and whitespace handling per the Netpbm spec),
  * and WAV (RIFF chunk walk, not fixed offsets — handles non-canonical
  * chunk orders and word-aligned padding).
  *
  * `width`, `height` and `n_frames` come from the actual bytes, and the
  * UNCOMPRESSED image rasters (BMP 24-bit, binary Netpbm) decode to full
  * RGB888 pixel buffers — see the pixel-decode section. Only compressed
  * codecs (JPEG entropy decoding etc.) remain out of scope: they need a
  * codec library this container doesn't have; the raw-RGB888 / raw-PCM
  * kernels in [[MultimodalOps]] cover their post-decode compute path.
  *
  * All multi-byte integers are little-endian per both specs. Parsers
  * return None on anything malformed rather than throwing — at corpus
  * scale a truncated file is data, not an error.
  */
object MediaContainers {

  final case class ImageMeta(width: Int, height: Int)
  /** `nFrames` is sample frames (one sample per channel) — the WAV
    * spec's own unit: dataSize / blockAlign.
    */
  final case class WavMeta(
      channels: Int, sampleRate: Int, bitsPerSample: Int, nFrames: Long)

  /** Parsed container metadata, format-sniffed: width/height for images,
    * frame count for audio (1 for a still image), None when unknown.
    */
  final case class MediaMeta(
      format: String, width: Option[Int], height: Option[Int],
      nFrames: Option[Long])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** BMP: 14-byte file header ('BM', size, reserved, pixel offset) then
    * a DIB header whose leading u32 is its own size — 40+
    * (BITMAPINFOHEADER and successors: s32 width, s32 height, negative
    * height = top-down) or 12 (BITMAPCOREHEADER: u16 width, u16 height).
    */
  def parseBmp(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 26 || b(0) != 'B' || b(1) != 'M') return None
    val dibSize = le32(b, 14)
    if (dibSize >= 40 && b.length >= 14 + 12) {
      val w = le32(b, 18)
      val h = le32(b, 22)
      if (w <= 0 || h == 0 || h == Int.MinValue) None
      else Some(ImageMeta(w, math.abs(h)))
    } else if (dibSize == 12 && b.length >= 14 + 8) {
      val w = le16(b, 18)
      val h = le16(b, 20)
      if (w <= 0 || h <= 0) None else Some(ImageMeta(w, h))
    } else None
  }

  /** Full Netpbm header: color flag (P6 vs P5), dims, maxval, and the
    * raster's byte offset (the spec mandates exactly ONE whitespace
    * character between maxval and the raster).
    */
  private final case class PpmHeader(
      color: Boolean, width: Int, height: Int, maxval: Int, rasterPos: Int)

  private def parsePpmHeader(b: Array[Byte]): Option[PpmHeader] = {
    if (b.length < 2 || b(0) != 'P' || (b(1) != '5' && b(1) != '6')) return None
    val color = b(1) == '6'
    var pos = 2
    def skipSeparators(): Unit = {
      var moved = true
      while (moved && pos < b.length) {
        moved = false
        while (pos < b.length && Character.isWhitespace(b(pos).toChar)) {
          pos += 1; moved = true
        }
        if (pos < b.length && b(pos) == '#') {
          while (pos < b.length && b(pos) != '\n') pos += 1
          moved = true
        }
      }
    }
    def readInt(): Option[Int] = {
      skipSeparators()
      val start = pos
      var v = 0L
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (b(pos) - '0'); pos += 1
      }
      if (pos == start || v > Int.MaxValue) None else Some(v.toInt)
    }
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      if w > 0 && h > 0 && maxval > 0 && maxval < 65536
    } yield PpmHeader(color, w, h, maxval, pos + 1)
  }

  /** Binary Netpbm (P6 = PPM, P5 = PGM): ASCII magic, then
    * whitespace-separated decimal width, height, maxval; '#' starts a
    * comment running to end-of-line; a single whitespace then raster.
    */
  def parsePpm(b: Array[Byte]): Option[ImageMeta] =
    parsePpmHeader(b).map(h => ImageMeta(h.width, h.height))

  /** WAV: 'RIFF' <size> 'WAVE', then a chunk walk — each chunk is a
    * 4-byte id, u32 size, payload, and a pad byte when the size is odd.
    * Needs a complete 'fmt ' (PCM layout) and a 'data' chunk header;
    * frame count is dataSize / blockAlign.
    */
  def parseWav(b: Array[Byte]): Option[WavMeta] = {
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var pos = 12
    var channels, sampleRate, bitsPerSample, blockAlign = -1
    var dataSize = -1L
    while (pos + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val size = le32(b, pos + 4).toLong & 0xffffffffL
      val isFmt = b(pos) == 'f' && b(pos + 1) == 'm' && b(pos + 2) == 't' &&
        b(pos + 3) == ' '
      val isData = b(pos) == 'd' && b(pos + 1) == 'a' && b(pos + 2) == 't' &&
        b(pos + 3) == 'a'
      if (isFmt && size >= 16 && pos + 8 + 16 <= b.length) {
        channels = le16(b, pos + 10)
        sampleRate = le32(b, pos + 12)
        blockAlign = le16(b, pos + 20)
        bitsPerSample = le16(b, pos + 22)
      } else if (isData) {
        // a truncated data payload is fine (header declares the size);
        // the declared size is the authoritative frame count
        dataSize = size
      }
      // an over-declared size (malformed or truncated file) must stop
      // the walk, not overflow pos into a negative index
      if (size > b.length) pos = b.length
      else pos += 8 + size.toInt + (size % 2).toInt
    }
    if (channels <= 0 || sampleRate <= 0 || blockAlign <= 0 || dataSize < 0) None
    else Some(WavMeta(channels, sampleRate, bitsPerSample, dataSize / blockAlign))
  }

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def le24(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16)

  /** WebP — the format that (with AVIF) dominates 2026 crawl images:
    * 'RIFF' <size> 'WEBP', then the same chunk walk as [[parseWav]]
    * (RIFF is RIFF). Dimensions per variant chunk:
    *  - 'VP8 ' (lossy): 3-byte frame tag, the 9D 01 2A keyframe sync,
    *    then 14-bit little-endian width and height;
    *  - 'VP8L' (lossless): 0x2F signature byte, then one LE u32
    *    packing width-1 (bits 0-13) and height-1 (bits 14-27);
    *  - 'VP8X' (extended/animated): flags + reserved, then 24-bit LE
    *    canvas width-1 and height-1.
    */
  def parseWebp(b: Array[Byte]): Option[ImageMeta] = {
    if (b == null || b.length < 12 ||
      b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P') return None
    var pos = 12
    while (pos + 8 <= b.length) {
      val size = le32(b, pos + 4).toLong & 0xffffffffL
      val t = new String(b, pos, 4, "US-ASCII")
      val s = pos + 8
      t match {
        case "VP8 " if size >= 10 && s + 10 <= b.length =>
          // dims only live in a KEYFRAME (sync-coded) payload
          return if ((b(s + 3) & 0xff) == 0x9d && (b(s + 4) & 0xff) == 0x01 &&
            (b(s + 5) & 0xff) == 0x2a) {
            val w = le16(b, s + 6) & 0x3fff
            val h = le16(b, s + 8) & 0x3fff
            if (w > 0 && h > 0) Some(ImageMeta(w, h)) else None
          } else None
        case "VP8L" if size >= 5 && s + 5 <= b.length =>
          if ((b(s) & 0xff) != 0x2f) return None
          val v = le32(b, s + 1)
          return Some(ImageMeta((v & 0x3fff) + 1, ((v >>> 14) & 0x3fff) + 1))
        case "VP8X" if size >= 10 && s + 10 <= b.length =>
          val w = le24(b, s + 4) + 1
          val h = le24(b, s + 7) + 1
          return Some(ImageMeta(w, h))
        case _ => // ICCP/EXIF/ANIM etc. — skip to the next chunk
      }
      if (size > b.length) pos = b.length
      else pos += 8 + size.toInt + (size % 2).toInt
    }
    None
  }

  /** PNG header parse: the 8-byte signature, then the mandatory IHDR
    * chunk (always first — its 13-byte payload starts at offset 16
    * with big-endian width/height).
    */
  def parsePng(b: Array[Byte]): Option[ImageMeta] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (b.length < 24 || !b.take(8).sameElements(sig)) return None
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0) None else Some(ImageMeta(w, h))
  }

  /** JPEG header parse: SOI marker, then a marker walk to the first
    * frame header (SOF0-SOF15 minus the non-frame C4/C8/CC), whose
    * payload carries big-endian height (offset +5) and width (+7).
    */
  def parseJpeg(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    while (pos + 9 < b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      val marker = b(pos + 1) & 0xff
      if (marker == 0xff) { pos += 1 } // fill byte
      else if (marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        val h = ((b(pos + 5) & 0xff) << 8) | (b(pos + 6) & 0xff)
        val w = ((b(pos + 7) & 0xff) << 8) | (b(pos + 8) & 0xff)
        return if (w > 0 && h > 0) Some(ImageMeta(w, h)) else None
      } else {
        val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
        if (len < 2) return None
        pos += 2 + len
      }
    }
    None
  }

  /** GIF header parse: "GIF87a"/"GIF89a" signature, little-endian
    * logical-screen width/height at offsets 6/8. Header-only — the
    * LZW-compressed raster is out of scope (metadata tier).
    */
  def parseGif(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 10) return None
    val sig = new String(b.take(6), "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0) None else Some(ImageMeta(w, h))
  }

  // -------------------------------------------------------------------
  // Dominant crawl A/V containers — header-only walks, no codec: MP4
  // (ISO BMFF box walk: ftyp sniff, moov/mvhd timescale+duration,
  // trak/tkhd video dims), FLAC (fLaC STREAMINFO), MP3 (frame header
  // after an optional ID3v2 skip), Ogg (first-page BOS packet: Opus
  // "OpusHead" or Vorbis identification header). Same contract as the
  // image parsers: None on anything malformed, never an exception.
  // -------------------------------------------------------------------

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def be64(b: Array[Byte], off: Int): Long =
    ((be32(b, off).toLong & 0xffffffffL) << 32) |
      (be32(b, off + 4).toLong & 0xffffffffL)

  /** `durationTicks / timescale` = seconds; width/height are present
    * when the movie carries a visual track (tkhd 16.16 fixed-point,
    * truncated to pixels).
    */
  final case class Mp4Meta(timescale: Int, durationTicks: Long,
      width: Option[Int], height: Option[Int])

  final case class Mp3Meta(
      mpegVersion: Int, layer: Int, bitrateKbps: Int, sampleRate: Int,
      channels: Int)

  /** `totalSamples` is inter-channel sample frames (the STREAMINFO
    * field); 0 in the container means "unknown" and surfaces as None.
    */
  final case class FlacMeta(sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Option[Long])

  /** First-page identification header of the mapped codec. For Opus,
    * `sampleRate` is the id header's input sample rate (decode is
    * always 48k — the field records the original capture rate).
    */
  final case class OggMeta(codec: String, channels: Int, sampleRate: Int)

  private def boxType(b: Array[Byte], off: Int): String =
    new String(b, off + 4, 4, "US-ASCII")

  /** Walk sibling ISO-BMFF boxes in `[from, until)`, yielding
    * (type, payloadStart, payloadEnd). Stops at a malformed or
    * truncated size instead of overrunning — at corpus scale a
    * truncated tail is data.
    */
  private def boxes(b: Array[Byte], from: Int,
      until: Int): Iterator[(String, Int, Int)] = new Iterator[(String, Int, Int)] {
    private var pos = from
    private var nextBox: (String, Int, Int) = advance()
    private def advance(): (String, Int, Int) = {
      if (pos + 8 > until) return null
      val declared = be32(b, pos).toLong & 0xffffffffL
      val t = boxType(b, pos)
      val (size, header) =
        if (declared == 1L) {
          if (pos + 16 > until) return null
          (be64(b, pos + 8), 16)
        } else if (declared == 0L) ((until - pos).toLong, 8)
        else (declared, 8)
      if (size < header || pos + size > until) return null
      val res = (t, pos + header, pos + size.toInt)
      pos += size.toInt
      res
    }
    override def hasNext: Boolean = nextBox != null
    override def next(): (String, Int, Int) = {
      val r = nextBox; nextBox = advance(); r
    }
  }

  /** ISO BMFF (MP4/MOV/M4A): requires the `ftyp` box first (the sniff)
    * and a complete `moov`/`mvhd` for timescale + duration; video dims
    * come from the first `trak`/`tkhd` with a nonzero width. Handles
    * version-0 (32-bit) and version-1 (64-bit) mvhd/tkhd layouts.
    */
  def parseMp4(b: Array[Byte]): Option[Mp4Meta] = {
    if (b == null || b.length < 12 || boxType(b, 0) != "ftyp") return None
    var meta: Option[Mp4Meta] = None
    var dims: Option[(Int, Int)] = None
    boxes(b, 0, b.length).foreach { case (t, s, e) =>
      if (t == "moov") {
        boxes(b, s, e).foreach { case (ct, cs, ce) =>
          if (ct == "mvhd" && meta.isEmpty && ce - cs >= 24) {
            val version = b(cs) & 0xff
            if (version == 0 && ce - cs >= 20)
              meta = Some(Mp4Meta(be32(b, cs + 12),
                be32(b, cs + 16).toLong & 0xffffffffL, None, None))
            else if (version == 1 && ce - cs >= 32)
              meta = Some(Mp4Meta(be32(b, cs + 20), be64(b, cs + 24),
                None, None))
          } else if (ct == "trak" && dims.isEmpty) {
            boxes(b, cs, ce).foreach { case (gt, gs, ge) =>
              if (gt == "tkhd" && dims.isEmpty) {
                val version = b(gs) & 0xff
                val (wOff, need) = if (version == 1) (88, 96) else (76, 84)
                if (ge - gs >= need) {
                  val w = be32(b, gs + wOff) >>> 16
                  val h = be32(b, gs + wOff + 4) >>> 16
                  if (w > 0 && h > 0) dims = Some((w, h))
                }
              }
            }
          }
        }
      }
    }
    meta.filter(_.timescale > 0)
      .map(_.copy(width = dims.map(_._1), height = dims.map(_._2)))
  }

  /** AVIF — ISO-BMFF stills (the other format dominating 2026 crawl
    * images): `ftyp` whose major or compatible brands include
    * avif/avis, then the `meta` FullBox (4 version/flags bytes before
    * its children) → `iprp` → `ipco` → `ispe` image-spatial-extents
    * property (FullBox: version/flags, then be32 width and height).
    * Reuses [[parseMp4]]'s box walk; an AVIF has no `moov`, so the two
    * sniffs never both match.
    */
  def parseAvif(b: Array[Byte]): Option[ImageMeta] = {
    if (b == null || b.length < 16 || boxType(b, 0) != "ftyp") return None
    val isAvifBrand = boxes(b, 0, b.length).take(1).exists {
      case (t, s, e) =>
        t == "ftyp" && e - s >= 8 && {
          // major brand, then (skipping minor_version) compatibles
          val brands = new String(b, s, 4, "US-ASCII") +:
            (s + 8 until e - 3 by 4).map(new String(b, _, 4, "US-ASCII"))
          brands.exists(br => br == "avif" || br == "avis")
        }
      case _ => false
    }
    if (!isAvifBrand) return None
    var dims: Option[ImageMeta] = None
    boxes(b, 0, b.length).foreach { case (t, s, e) =>
      if (t == "meta" && e - s >= 4 && dims.isEmpty) {
        boxes(b, s + 4, e).foreach { case (pt, ps, pe) =>
          if (pt == "iprp") boxes(b, ps, pe).foreach { case (ct, cs, ce) =>
            if (ct == "ipco") boxes(b, cs, ce).foreach { case (it, is, ie) =>
              if (it == "ispe" && ie - is >= 12 && dims.isEmpty) {
                val w = be32(b, is + 4)
                val h = be32(b, is + 8)
                if (w > 0 && h > 0) dims = Some(ImageMeta(w, h))
              }
            }
          }
        }
      }
    }
    dims
  }

  /** FLAC: "fLaC" then the mandatory STREAMINFO metadata block
    * (type 0, 34-byte payload): sample rate (20 bits), channels-1 (3),
    * bits-per-sample-1 (5), total inter-channel samples (36).
    */
  def parseFlac(b: Array[Byte]): Option[FlacMeta] = {
    if (b == null || b.length < 4 + 4 + 34) return None
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return None
    if ((b(4) & 0x7f) != 0) return None // first block must be STREAMINFO
    val len = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    if (len < 34) return None
    val p = 8
    val sampleRate = ((b(p + 10) & 0xff) << 12) | ((b(p + 11) & 0xff) << 4) |
      ((b(p + 12) & 0xff) >>> 4)
    val channels = ((b(p + 12) >>> 1) & 0x7) + 1
    val bps = (((b(p + 12) & 0x1) << 4) | ((b(p + 13) & 0xff) >>> 4)) + 1
    val total = ((b(p + 13) & 0x0fL) << 32) |
      (be32(b, p + 14).toLong & 0xffffffffL)
    if (sampleRate <= 0) None
    else Some(FlacMeta(sampleRate, channels, bps,
      if (total == 0L) None else Some(total)))
  }

  private val Mp3Rates = Array(
    Array(11025, 12000, 8000),   // MPEG 2.5
    null,                        // reserved
    Array(22050, 24000, 16000),  // MPEG 2
    Array(44100, 48000, 32000))  // MPEG 1
  // kbps by [layer], columns = bitrate index 1..14 (0 = free, 15 = bad)
  private val Mp3BitratesV1 = Array[Array[Int]](
    null,
    Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320), // L3
    Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384), // L2
    Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)) // L1
  private val Mp3BitratesV2 = Array[Array[Int]](
    null,
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),  // L3
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),  // L2
    Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)) // L1

  /** MP3: optional ID3v2 tag skip (syncsafe size), then the first
    * frame header — 11-bit sync, MPEG version, layer, bitrate and
    * sample-rate indices, channel mode. A total duration needs the
    * whole file (VBR); the header-only tier reports the stream
    * parameters. The sync sniff is permissive by construction, so this
    * parser runs LAST in [[parse]]'s chain and rejects every reserved
    * index combination.
    */
  def parseMp3(b: Array[Byte]): Option[Mp3Meta] = {
    if (b == null || b.length < 4) return None
    var pos = 0
    if (b(0) == 'I' && b(1) == 'D' && b(2) == '3' && b.length >= 10) {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      pos = 10 + size
      if (pos < 0 || pos + 4 > b.length) return None
    }
    if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xe0) != 0xe0) return None
    val versionBits = (b(pos + 1) >>> 3) & 0x3 // 0=2.5, 2=2, 3=1
    val layerBits = (b(pos + 1) >>> 1) & 0x3   // 1=III, 2=II, 3=I
    val bitrateIdx = (b(pos + 2) >>> 4) & 0xf
    val rateIdx = (b(pos + 2) >>> 2) & 0x3
    if (versionBits == 1 || layerBits == 0 ||
      bitrateIdx == 0 || bitrateIdx == 15 || rateIdx == 3) return None
    val sampleRate = Mp3Rates(versionBits)(rateIdx)
    val kbps = (if (versionBits == 3) Mp3BitratesV1
      else Mp3BitratesV2)(layerBits)(bitrateIdx - 1)
    val channels = if (((b(pos + 3) >>> 6) & 0x3) == 3) 1 else 2
    val version = versionBits match {
      case 3 => 1
      case 2 => 2
      case _ => 25 // MPEG 2.5, encoded as 25 to stay integral
    }
    val layer = 4 - layerBits
    Some(Mp3Meta(version, layer, kbps, sampleRate, channels))
  }

  /** Ogg: first page must be a BOS page ("OggS", version 0, header
    * type bit 0x02) whose first packet is the mapped codec's
    * identification header — "OpusHead" (channels, input rate) or
    * Vorbis type-1 (channels, rate). Unknown mappings report
    * codec="unknown" with zeroed parameters rather than None: the
    * container IS Ogg, the codec just isn't one the metadata tier
    * knows.
    */
  def parseOgg(b: Array[Byte]): Option[OggMeta] = {
    if (b == null || b.length < 28 ||
      b(0) != 'O' || b(1) != 'g' || b(2) != 'g' || b(3) != 'S' ||
      b(4) != 0 || (b(5) & 0x02) == 0) return None
    val nSegs = b(26) & 0xff
    val packetStart = 27 + nSegs
    if (packetStart > b.length) return None
    val remain = b.length - packetStart
    def str(off: Int, n: Int): String =
      if (packetStart + off + n > b.length) ""
      else new String(b, packetStart + off, n, "US-ASCII")
    if (remain >= 19 && str(0, 8) == "OpusHead")
      Some(OggMeta("opus", b(packetStart + 9) & 0xff,
        le32(b, packetStart + 12)))
    else if (remain >= 30 && (b(packetStart) & 0xff) == 1 &&
      str(1, 6) == "vorbis")
      Some(OggMeta("vorbis", b(packetStart + 11) & 0xff,
        le32(b, packetStart + 12)))
    else Some(OggMeta("unknown", 0, 0))
  }

  // -------------------------------------------------------------------
  // Matroska / WebM — an EBML walk, the same header-only discipline as
  // the ISO-BMFF box walk above: element IDs and sizes are EBML
  // variable-length integers, Info carries TimestampScale + Duration,
  // the first video TrackEntry carries PixelWidth/PixelHeight, the
  // first audio TrackEntry carries SamplingFrequency/Channels. No
  // cluster (payload) bytes are ever touched.
  // -------------------------------------------------------------------

  /** Matroska/WebM header metadata. `docType` is the EBML DocType
    * ("webm" or "matroska"); `durationTicks` is Info/Duration (a float
    * in timestamp-scale units) rounded to whole ticks;
    * `timestampScaleNs` is nanoseconds per tick (Matroska default
    * 1,000,000 = millisecond ticks). Dims come from the first video
    * TrackEntry, stream parameters from the first audio TrackEntry
    * (with the spec defaults 8000 Hz / 1 channel when the elements are
    * omitted).
    */
  final case class WebmMeta(docType: String, timestampScaleNs: Long,
      durationTicks: Option[Long], width: Option[Int], height: Option[Int],
      sampleRate: Option[Int], channels: Option[Int])

  /** EBML variable-length SIZE at `pos`: (value, byteWidth), where
    * value −1 encodes the spec's "unknown size" (all value bits set —
    * legal on Segment, meaning "extends to the parent's end"). Null on
    * malformed or truncated bytes.
    */
  private def ebmlSize(b: Array[Byte], pos: Int): (Long, Int) = {
    if (pos >= b.length) return null
    val first = b(pos) & 0xff
    if (first == 0) return null // width > 8 — malformed
    val n = Integer.numberOfLeadingZeros(first) - 23 // 1..8
    if (pos + n > b.length) return null
    var v = (first & (0xff >>> n)).toLong
    var allOnes = v == (0xffL >>> n)
    var i = 1
    while (i < n) {
      val by = b(pos + i) & 0xff
      allOnes &&= by == 0xff
      v = (v << 8) | by
      i += 1
    }
    (if (allOnes) -1L else v, n)
  }

  /** EBML element ID at `pos` (marker bit KEPT, per spec IDs are
    * stored verbatim): (id, byteWidth 1..4). Null on malformed.
    */
  private def ebmlId(b: Array[Byte], pos: Int): (Long, Int) = {
    if (pos >= b.length) return null
    val first = b(pos) & 0xff
    if ((first & 0xf0) == 0) return null // ID wider than 4 bytes
    val n = Integer.numberOfLeadingZeros(first) - 23
    if (pos + n > b.length) return null
    var v = first.toLong
    var i = 1
    while (i < n) { v = (v << 8) | (b(pos + i) & 0xff); i += 1 }
    (v, n)
  }

  /** Walk sibling EBML elements in `[from, until)` yielding
    * (id, payloadStart, payloadEnd). An unknown-size element extends
    * to the parent's end. Stops at malformed or truncated bytes
    * instead of overrunning — at corpus scale a truncated tail is
    * data.
    */
  private def ebml(b: Array[Byte], from: Int,
      until: Int): Iterator[(Long, Int, Int)] = new Iterator[(Long, Int, Int)] {
    private var pos = from
    private var nextEl: (Long, Int, Int) = advance()
    private def advance(): (Long, Int, Int) = {
      if (pos >= until) return null
      val id = ebmlId(b, pos)
      if (id == null) return null
      val sz = ebmlSize(b, pos + id._2)
      if (sz == null) return null
      val payloadStart = pos + id._2 + sz._2
      val payloadEnd =
        if (sz._1 < 0) until // unknown size
        else payloadStart + sz._1
      if (payloadEnd > until || payloadEnd < payloadStart) return null
      val res = (id._1, payloadStart, payloadEnd.toInt)
      pos = payloadEnd.toInt
      res
    }
    override def hasNext: Boolean = nextEl != null
    override def next(): (Long, Int, Int) = {
      val r = nextEl; nextEl = advance(); r
    }
  }

  private def ebmlUint(b: Array[Byte], s: Int, e: Int): Long = {
    var v = 0L; var i = s
    while (i < e && i - s < 8) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  /** EBML float element: 4-byte (float32) or 8-byte (float64) big
    * endian; a zero-length payload is the value 0 per spec.
    */
  private def ebmlFloat(b: Array[Byte], s: Int, e: Int): Option[Double] =
    (e - s) match {
      case 4 => Some(java.lang.Float.intBitsToFloat(be32(b, s)).toDouble)
      case 8 => Some(java.lang.Double.longBitsToDouble(be64(b, s)))
      case 0 => Some(0.0)
      case _ => None
    }

  /** Matroska/WebM: requires the EBML magic (0x1A45DFA3) and a
    * DocType of "webm" or "matroska" — any other EBML document is not
    * this container and reports None. Segment commonly carries the
    * unknown-size VINT (streamed muxers can't know the size up
    * front); the walk treats it as extending to the end of the
    * buffer.
    */
  def parseWebm(b: Array[Byte]): Option[WebmMeta] = {
    if (b == null || b.length < 4 ||
      b(0) != 0x1a.toByte || b(1) != 0x45.toByte ||
      b(2) != 0xdf.toByte || b(3) != 0xa3.toByte) return None
    var docType: String = null
    var tsScale = 1000000L // spec default: 1ms ticks
    var duration: Option[Double] = None
    var dims: Option[(Int, Int)] = None
    var audio: Option[(Int, Int)] = None // (rate, channels)
    ebml(b, 0, b.length).foreach {
      case (0x1a45dfa3L, s, e) => // EBML header
        ebml(b, s, e).foreach {
          case (0x4282L, cs, ce) if docType == null =>
            // EBML string elements may be zero-padded to the declared
            // size — truncate at the first NUL before comparing
            var de = cs
            while (de < ce && b(de) != 0) de += 1
            docType = new String(b, cs, de - cs, "US-ASCII")
          case _ =>
        }
      case (0x18538067L, s, e) => // Segment
        ebml(b, s, e).foreach {
          case (0x1549a966L, is, ie) => // Info
            ebml(b, is, ie).foreach {
              case (0x2ad7b1L, cs, ce) => tsScale = ebmlUint(b, cs, ce)
              case (0x4489L, cs, ce) if duration.isEmpty =>
                duration = ebmlFloat(b, cs, ce).filter(_ > 0)
              case _ =>
            }
          case (0x1654ae6bL, trs, tre) => // Tracks
            ebml(b, trs, tre).foreach {
              case (0xaeL, es, ee) => // TrackEntry
                ebml(b, es, ee).foreach {
                  case (0xe0L, vs, ve) if dims.isEmpty => // Video
                    var w = 0; var h = 0
                    ebml(b, vs, ve).foreach {
                      case (0xb0L, cs, ce) => w = ebmlUint(b, cs, ce).toInt
                      case (0xbaL, cs, ce) => h = ebmlUint(b, cs, ce).toInt
                      case _ =>
                    }
                    if (w > 0 && h > 0) dims = Some((w, h))
                  case (0xe1L, us, ue) if audio.isEmpty => // Audio
                    var rate = 8000.0 // spec default SamplingFrequency
                    var ch = 1L       // spec default Channels
                    ebml(b, us, ue).foreach {
                      case (0xb5L, cs, ce) =>
                        ebmlFloat(b, cs, ce).filter(_ > 0).foreach(rate = _)
                      case (0x9fL, cs, ce) => ch = ebmlUint(b, cs, ce)
                      case _ =>
                    }
                    if (ch > 0) audio = Some((math.rint(rate).toInt, ch.toInt))
                  case _ =>
                }
              case _ =>
            }
          case _ =>
        }
      case _ =>
    }
    if (docType != "webm" && docType != "matroska") None
    else if (tsScale <= 0) None
    else Some(WebmMeta(docType, tsScale,
      duration.map(d => math.rint(d).toLong),
      dims.map(_._1), dims.map(_._2), audio.map(_._1), audio.map(_._2)))
  }

  /** The full audiovisual metadata surface over one sniff — what
    * [[MediaMeta]] can't carry for the A/V containers: stream
    * parameters (sample rate, channels), movie duration (ticks +
    * timescale). Field presence by format: images fill dims +
    * n_frames=1; wav/flac fill n_frames + sample_rate + channels; mp3
    * and ogg fill sample_rate + channels (no total without the whole
    * file); mp4 fills dims (when a video track exists) + duration;
    * webm/mkv fill dims (video track) + sample_rate/channels (audio
    * track) + duration.
    */
  final case class AvMeta(format: String,
      width: Option[Int], height: Option[Int], nFrames: Option[Long],
      sampleRate: Option[Int], channels: Option[Int],
      durationTicks: Option[Long], timescale: Option[Int])

  def parseAv(b: Array[Byte]): AvMeta = {
    val none = AvMeta("unknown", None, None, None, None, None, None, None)
    if (b == null) return none
    parseWav(b) match {
      case Some(w) => return AvMeta("wav", None, None, Some(w.nFrames),
        Some(w.sampleRate), Some(w.channels), None, None)
      case None =>
    }
    parseMp4(b) match {
      case Some(m) => return AvMeta("mp4", m.width, m.height, None,
        None, None, Some(m.durationTicks), Some(m.timescale))
      case None =>
    }
    parseWebm(b) match {
      case Some(w) =>
        // AvMeta's timescale is ticks-per-second; Matroska's
        // TimestampScale is ns-per-tick — exact when it divides 1e9
        // (every real muxer default does), absent otherwise rather
        // than rounded wrong.
        val tps =
          if (1000000000L % w.timestampScaleNs == 0)
            Some((1000000000L / w.timestampScaleNs).toInt)
          else None
        return AvMeta(if (w.docType == "webm") "webm" else "mkv",
          w.width, w.height, None, w.sampleRate, w.channels,
          w.durationTicks, tps)
      case None =>
    }
    parseFlac(b) match {
      case Some(f) => return AvMeta("flac", None, None, f.totalSamples,
        Some(f.sampleRate), Some(f.channels), None, None)
      case None =>
    }
    parseOgg(b) match {
      case Some(o) => return AvMeta("ogg", None, None, None,
        if (o.sampleRate > 0) Some(o.sampleRate) else None,
        if (o.channels > 0) Some(o.channels) else None, None, None)
      case None =>
    }
    val img = parse(b) // image chain (bmp/ppm/png/jpeg/gif) or mp3
    if (img.format == "mp3") {
      val m = parseMp3(b).get
      AvMeta("mp3", None, None, None, Some(m.sampleRate),
        Some(m.channels), None, None)
    } else if (img.width.isDefined)
      AvMeta(img.format, img.width, img.height, img.nFrames,
        None, None, None, None)
    else none
  }

  /** Sniff + parse: images report 1 frame; audio reports sample frames
    * and no dimensions; anything else is ("unknown", None, None, None).
    */
  def parse(b: Array[Byte]): MediaMeta =
    if (b == null) MediaMeta("unknown", None, None, None)
    else parseBmp(b) match {
      case Some(m) => MediaMeta("bmp", Some(m.width), Some(m.height), Some(1L))
      case None => parsePpm(b) match {
        case Some(m) => MediaMeta("ppm", Some(m.width), Some(m.height), Some(1L))
        case None => parsePng(b) match {
          case Some(m) =>
            MediaMeta("png", Some(m.width), Some(m.height), Some(1L))
          case None => parseJpeg(b) match {
            case Some(m) =>
              MediaMeta("jpeg", Some(m.width), Some(m.height), Some(1L))
            case None => parseGif(b) match {
              case Some(m) =>
                MediaMeta("gif", Some(m.width), Some(m.height), Some(1L))
              case None => parseWebp(b) match {
                case Some(m) =>
                  MediaMeta("webp", Some(m.width), Some(m.height), Some(1L))
                case None => parseAvif(b) match {
                  case Some(m) =>
                    MediaMeta("avif", Some(m.width), Some(m.height), Some(1L))
                  case None => parseWav(b) match {
                case Some(w) => MediaMeta("wav", None, None, Some(w.nFrames))
                case None => parseMp4(b) match {
                  case Some(m) => MediaMeta("mp4", m.width, m.height, None)
                  case None => parseWebm(b) match {
                    case Some(w) => MediaMeta(
                      if (w.docType == "webm") "webm" else "mkv",
                      w.width, w.height, None)
                    case None => parseFlac(b) match {
                    case Some(f) =>
                      MediaMeta("flac", None, None, f.totalSamples)
                    case None => parseOgg(b) match {
                      case Some(_) => MediaMeta("ogg", None, None, None)
                      // mp3 last: its 11-bit sync sniff is the most
                      // permissive of the chain
                      case None => parseMp3(b) match {
                        case Some(_) => MediaMeta("mp3", None, None, None)
                        case None => MediaMeta("unknown", None, None, None)
                      }
                    }
                  }
                  }
                }
              }
            }
          }
        }
      }
    }
      }
    }

  // -------------------------------------------------------------------
  // Pixel decode — BMP and binary Netpbm rasters are UNCOMPRESSED, so
  // full pixel extraction needs no codec library: the bytes after the
  // header the parsers above already read ARE the image. Output is
  // always row-major top-down RGB888, the exact input shape of
  // MultimodalOps.resizeRawRgb / channelStats. Compressed containers
  // (JPEG etc.) and non-24-bit BMPs return None — at corpus scale an
  // undecodable payload is data to quarantine, not an error.
  // -------------------------------------------------------------------

  /** Row-major top-down RGB888: `rgb.length == width * height * 3`. */
  final case class RawPixels(width: Int, height: Int, rgb: Array[Byte])

  /** 24-bit BI_RGB BMP pixel extraction: rows are 4-byte padded BGR,
    * stored bottom-up (positive height) or top-down (negative height);
    * both orientations and the padding are undone here. Any other bit
    * depth or a non-zero compression field → None.
    */
  def decodeBmpPixels(b: Array[Byte]): Option[RawPixels] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val pixelOff = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40) return None // CORE header: no compression field
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue ||
      bpp != 24 || compression != 0) return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    val rowSize = ((3L * w + 3) / 4) * 4
    if (w > (1 << 20) || h > (1 << 20) || 3L * w * h > Int.MaxValue - 8) return None
    if (pixelOff < 0 || pixelOff.toLong + rowSize * h > b.length) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val sy = if (topDown) y else h - 1 - y
      val src = pixelOff + (sy * rowSize).toInt
      var x = 0
      while (x < w) {
        val s = src + x * 3
        val t = (y * w + x) * 3
        out(t) = b(s + 2)     // R (BMP stores BGR)
        out(t + 1) = b(s + 1) // G
        out(t + 2) = b(s)     // B
        x += 1
      }
      y += 1
    }
    Some(RawPixels(w, h, out))
  }

  /** Binary Netpbm pixel extraction for 1-byte samples (maxval <= 255):
    * P6 rasters are already top-down RGB; P5 gray is replicated across
    * channels. 2-byte-sample files (maxval >= 256) → None.
    */
  def decodePpmPixels(b: Array[Byte]): Option[RawPixels] =
    parsePpmHeader(b).flatMap { hd =>
      if (hd.maxval > 255) return None
      val w = hd.width
      val h = hd.height
      if (3L * w * h > Int.MaxValue - 8) return None
      val samples = if (hd.color) 3L * w * h else w.toLong * h
      if (hd.rasterPos.toLong + samples > b.length) return None
      if (hd.color) {
        val out = new Array[Byte](w * h * 3)
        System.arraycopy(b, hd.rasterPos, out, 0, out.length)
        Some(RawPixels(w, h, out))
      } else {
        val out = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          val g = b(hd.rasterPos + i)
          out(i * 3) = g; out(i * 3 + 1) = g; out(i * 3 + 2) = g
          i += 1
        }
        Some(RawPixels(w, h, out))
      }
    }

  // -------------------------------------------------------------------
  // Compressed codecs — PNG (lossless DEFLATE) and JPEG (lossy DCT)
  // decode through the JDK's own javax.imageio readers: zero new
  // dependencies, and the PNG path is byte-exact (encode → decode
  // round-trips the raster bit-for-bit, pinned in MultimodalSpec and
  // q239's closed-form oracle), while JPEG is lossy by design — its
  // contract is perceptual-hash stability, not byte equality. The
  // signature sniff gates the call so arbitrary payloads (WAV,
  // truncated, garbage) never reach the codec.
  // -------------------------------------------------------------------

  // in-memory codec streams: without this ImageIO spills every
  // read/write through a temp FILE per call — disk churn in every
  // executor task for payloads that are already byte arrays
  javax.imageio.ImageIO.setUseCache(false)

  /** PNG/JPEG → RGB888 via the JDK ImageIO readers. Any decode failure
    * (truncated stream, exotic subformat) is a quarantine None, never
    * an exception — the same posture as the uncompressed parsers.
    */
  def decodeImageIoPixels(b: Array[Byte]): Option[RawPixels] = {
    if (b == null) return None
    // Bound the raster from the SNIFFED header BEFORE the codec runs:
    // ImageIO.read allocates the full decoded raster up front, so a
    // crafted header claiming huge dims would OOM the executor if the
    // guard only ran on the returned image.
    val sniffed = parsePng(b).orElse(parseJpeg(b)).orElse(parseGif(b))
    sniffed match {
      case None => return None
      case Some(m) =>
        if (m.width <= 0 || m.height <= 0 ||
          3L * m.width * m.height > Int.MaxValue - 8) return None
    }
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0 || 3L * w * h > Int.MaxValue - 8) return None
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val argb = img.getRGB(x, y)
          val t = (y * w + x) * 3
          out(t) = ((argb >> 16) & 0xff).toByte
          out(t + 1) = ((argb >> 8) & 0xff).toByte
          out(t + 2) = (argb & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some(RawPixels(w, h, out))
      // NonFatal, not just IOException: JDK ImageIO readers throw
      // RuntimeExceptions (IllegalArgumentException, ArrayIndexOutOf
      // Bounds, CMMException) on malformed payloads that pass the
      // header sniff — all of them are quarantine, never a task kill
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Sniff + pixel decode: the uncompressed paths first (pure byte
    * walks, no codec context), then the ImageIO codecs for PNG/JPEG.
    */
  def decodePixels(b: Array[Byte]): Option[RawPixels] =
    if (b == null) None
    else decodeBmpPixels(b).orElse(decodePpmPixels(b))
      .orElse(decodeImageIoPixels(b))

  // -------------------------------------------------------------------
  // Synthesis — real, openable files (zeroed raster/samples), used by
  // specs to prove the parsers read genuine containers.
  // -------------------------------------------------------------------

  private def w16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def w32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  /** 24-bit BITMAPINFOHEADER BMP encoding of a top-down RGB888 buffer:
    * rows written bottom-up as BGR with 4-byte padding, per spec — the
    * exact inverse of [[decodeBmpPixels]].
    */
  def bmpBytesRgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"expected ${w * h * 3} bytes, got ${rgb.length}")
    val rowSize = ((3 * w + 3) / 4) * 4
    val imgSize = rowSize * h
    val out = new java.io.ByteArrayOutputStream(54 + imgSize)
    out.write('B'); out.write('M')
    w32(out, 54 + imgSize); w32(out, 0); w32(out, 54)
    w32(out, 40); w32(out, w); w32(out, h)
    w16(out, 1); w16(out, 24)
    w32(out, 0); w32(out, imgSize); w32(out, 2835); w32(out, 2835)
    w32(out, 0); w32(out, 0)
    val row = new Array[Byte](rowSize)
    var y = h - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 3
        row(x * 3) = rgb(s + 2)     // B
        row(x * 3 + 1) = rgb(s + 1) // G
        row(x * 3 + 2) = rgb(s)     // R
        x += 1
      }
      out.write(row)
      y -= 1
    }
    out.toByteArray
  }

  /** 24-bit BITMAPINFOHEADER BMP with zeroed, 4-byte-padded rows. */
  def bmpBytes(w: Int, h: Int): Array[Byte] =
    bmpBytesRgb(w, h, new Array[Byte](w * h * 3))

  /** Binary P6 PPM of a top-down RGB888 buffer (raster is verbatim). */
  def ppmBytesRgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"expected ${w * h * 3} bytes, got ${rgb.length}")
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"P6\n$w $h\n255\n".getBytes("US-ASCII"))
    out.write(rgb)
    out.toByteArray
  }

  /** Binary P6 PPM with a zeroed raster. */
  def ppmBytes(w: Int, h: Int): Array[Byte] =
    ppmBytesRgb(w, h, new Array[Byte](3 * w * h))

  /** Canonical 44-byte-header PCM WAV with zeroed (silent) samples. */
  def wavBytes(channels: Int, sampleRate: Int, nFrames: Int): Array[Byte] = {
    val blockAlign = channels * 2
    val dataSize = nFrames * blockAlign
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    out.write("RIFF".getBytes("US-ASCII")); w32(out, 36 + dataSize)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(out, 16)
    w16(out, 1); w16(out, channels); w32(out, sampleRate)
    w32(out, sampleRate * blockAlign); w16(out, blockAlign); w16(out, 16)
    out.write("data".getBytes("US-ASCII")); w32(out, dataSize)
    out.write(new Array[Byte](dataSize))
    out.toByteArray
  }

  private def toBufferedImage(w: Int, h: Int,
      rgb: Array[Byte]): java.awt.image.BufferedImage = {
    require(rgb.length == w * h * 3, "raster length != w*h*3")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(s) & 0xff) << 16) |
          ((rgb(s + 1) & 0xff) << 8) | (rgb(s + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode an RGB888 raster as PNG (JDK ImageIO; lossless, so
    * encode → [[decodeImageIoPixels]] round-trips byte-for-byte).
    */
  def pngBytesRgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBufferedImage(w, h, rgb), "png", out)
    out.toByteArray
  }

  /** Encode an RGB888 raster as JPEG (JDK ImageIO, default quality;
    * lossy — downstream contracts are perceptual, never byte-exact).
    */
  def jpegBytesRgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBufferedImage(w, h, rgb), "jpg", out)
    out.toByteArray
  }

  /** [[jpegBytesRgb]] at an explicit quality factor (0..1) — the knob
    * that drives DCT quantization and (implementation-dependent)
    * chroma subsampling, i.e. the JDK-version-sensitive part of the
    * JPEG path. Specs re-encode at two qualities and pin perceptual-
    * hash stability so a JDK upgrade can't silently shift behavior.
    */
  def jpegBytesRgbQ(w: Int, h: Int, rgb: Array[Byte],
      quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(
        toBufferedImage(w, h, rgb), null, null), params)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Encode an RGB888 raster as GIF (JDK ImageIO; palette-indexed —
    * byte-exact round trip only for rasters with ≤256 distinct colors,
    * quantization-lossy otherwise; downstream contracts are perceptual).
    */
  def gifBytesRgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBufferedImage(w, h, rgb), "gif", out)
    out.toByteArray
  }

  private def wbe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }
  private def wbe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }
  private def zeros(out: java.io.ByteArrayOutputStream, n: Int): Unit =
    out.write(new Array[Byte](n))
  private def unityMatrix(out: java.io.ByteArrayOutputStream): Unit = {
    wbe32(out, 0x00010000); wbe32(out, 0); wbe32(out, 0)
    wbe32(out, 0); wbe32(out, 0x00010000); wbe32(out, 0)
    wbe32(out, 0); wbe32(out, 0); wbe32(out, 0x40000000)
  }

  /** Minimal valid ISO-BMFF header: `ftyp` (isom) + `moov` holding a
    * version-0 `mvhd` and — when `w > 0` — one `trak`/`tkhd` with
    * 16.16 fixed-point dims. Header-only (no mdat): exactly the bytes
    * the metadata tier reads.
    */
  def mp4Bytes(timescale: Int, durationTicks: Int, w: Int = 0,
      h: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    wbe32(out, 16); out.write("ftypisom".getBytes("US-ASCII"))
    wbe32(out, 0)
    val withTrak = w > 0
    wbe32(out, 8 + 108 + (if (withTrak) 100 else 0))
    out.write("moov".getBytes("US-ASCII"))
    wbe32(out, 108); out.write("mvhd".getBytes("US-ASCII"))
    wbe32(out, 0)                     // version 0 + flags
    wbe32(out, 0); wbe32(out, 0)      // creation, modification
    wbe32(out, timescale); wbe32(out, durationTicks)
    wbe32(out, 0x00010000); wbe16(out, 0x0100) // rate, volume
    zeros(out, 10)                    // reserved
    unityMatrix(out); zeros(out, 24)  // matrix, pre_defined
    wbe32(out, 2)                     // next_track_ID
    if (withTrak) {
      wbe32(out, 100); out.write("trak".getBytes("US-ASCII"))
      wbe32(out, 92); out.write("tkhd".getBytes("US-ASCII"))
      wbe32(out, 7)                   // version 0 + enabled/in-movie
      wbe32(out, 0); wbe32(out, 0)    // creation, modification
      wbe32(out, 1); wbe32(out, 0)    // track_ID, reserved
      wbe32(out, durationTicks); zeros(out, 8)
      wbe16(out, 0); wbe16(out, 0); wbe16(out, 0); wbe16(out, 0)
      unityMatrix(out)
      wbe32(out, w << 16); wbe32(out, h << 16)
    }
    out.toByteArray
  }

  /** Minimal WebP container per variant ("VP8 " lossy keyframe, "VP8L"
    * lossless, "VP8X" extended canvas) — exactly the bytes
    * [[parseWebp]] reads; staging/fuzz fixture.
    */
  def webpBytes(variant: String, w: Int, h: Int): Array[Byte] = {
    val payload: Array[Byte] = variant match {
      case "VP8 " => Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a,
        (w & 0xff).toByte, ((w >> 8) & 0x3f).toByte,
        (h & 0xff).toByte, ((h >> 8) & 0x3f).toByte)
      case "VP8L" =>
        val v = (w - 1) | ((h - 1) << 14)
        Array[Byte](0x2f, (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      case _ => Array[Byte](0, 0, 0, 0) ++ Array(
        ((w - 1) & 0xff).toByte, (((w - 1) >> 8) & 0xff).toByte,
        (((w - 1) >> 16) & 0xff).toByte,
        ((h - 1) & 0xff).toByte, (((h - 1) >> 8) & 0xff).toByte,
        (((h - 1) >> 16) & 0xff).toByte)
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val padded = payload.length + (payload.length % 2)
    w32(out, 4 + 8 + padded)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write(variant.getBytes("US-ASCII"))
    w32(out, payload.length)
    out.write(payload)
    if (payload.length % 2 == 1) out.write(0)
    out.toByteArray
  }

  /** Minimal AVIF: `ftyp` (avif + mif1 brands) and `meta`/`iprp`/
    * `ipco`/`ispe` — exactly the bytes [[parseAvif]] reads.
    */
  def avifBytes(w: Int, h: Int): Array[Byte] = {
    def box(t: String, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      wbe32(out, 8 + payload.length)
      out.write(t.getBytes("US-ASCII"))
      out.write(payload)
      out.toByteArray
    }
    def be(v: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(); wbe32(out, v)
      out.toByteArray
    }
    val ftyp = box("ftyp",
      "avif".getBytes("US-ASCII") ++ be(0) ++
        "avifmif1".getBytes("US-ASCII"))
    val ispe = box("ispe", be(0) ++ be(w) ++ be(h))
    val meta = box("meta", be(0) ++ box("iprp", box("ipco", ispe)))
    ftyp ++ meta
  }

  /** Minimal FLAC: "fLaC" + a last-flagged STREAMINFO block. */
  def flacBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    wbe16(out, 4096); wbe16(out, 4096) // min/max block size
    zeros(out, 6)                      // min/max frame size (unknown)
    // sr(20) | ch-1(3) | bps-1(5) | totalSamples(36), big-endian
    val packed = (sampleRate.toLong << 44) |
      ((channels - 1).toLong << 41) | ((bitsPerSample - 1).toLong << 36) |
      (totalSamples & 0xfffffffffL)
    wbe32(out, (packed >>> 32).toInt); wbe32(out, packed.toInt)
    zeros(out, 16)                     // MD5 of unencoded audio
    out.toByteArray
  }

  /** One MPEG-1 Layer III frame header (no payload) — the bytes
    * [[parseMp3]] reads. `bitrateIdx` 1-14, `rateIdx` 0-2, mono flag.
    */
  def mp3Bytes(bitrateIdx: Int, rateIdx: Int, mono: Boolean): Array[Byte] =
    Array(0xff.toByte, 0xfb.toByte,
      ((bitrateIdx << 4) | (rateIdx << 2)).toByte,
      (if (mono) 0xc0 else 0x00).toByte)

  /** Minimal Ogg BOS page carrying an OpusHead identification header. */
  def oggOpusBytes(channels: Int, inputSampleRate: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("OggS".getBytes("US-ASCII"))
    out.write(0); out.write(2)        // version, BOS
    zeros(out, 8 + 4 + 4 + 4)         // granule, serial, seq, crc
    out.write(1); out.write(19)       // one segment of 19 bytes
    out.write("OpusHead".getBytes("US-ASCII"))
    out.write(1); out.write(channels) // id version, channel count
    w16(out, 312)                     // pre-skip (LE)
    w32(out, inputSampleRate)         // input sample rate (LE)
    w16(out, 0); out.write(0)         // output gain, mapping family
    out.toByteArray
  }

  /** Minimal Matroska/WebM header: EBML header with the given
    * DocType, an unknown-size Segment (the streamed-muxer layout)
    * holding Info (TimestampScale + float64 Duration when > 0) and
    * Tracks with an optional video TrackEntry (PixelWidth/
    * PixelHeight, when w > 0) and an optional audio TrackEntry
    * (float32 SamplingFrequency when > 0 + Channels, when
    * channels > 0). Header-only, no Cluster — exactly the bytes
    * [[parseWebm]] reads.
    */
  def webmBytes(docType: String, timestampScaleNs: Long = 1000000L,
      durationTicks: Double = 0, w: Int = 0, h: Int = 0,
      sampleRate: Double = 0, channels: Int = 0): Array[Byte] = {
    def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 0x7f, "one-byte-size builder")
      id ++ Array((0x80 | payload.length).toByte) ++ payload
    }
    def id(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
    def uintN(v: Long, n: Int): Array[Byte] =
      ((n - 1) to 0 by -1).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    val info = el(id(0x15, 0x49, 0xa9, 0x66),
      el(id(0x2a, 0xd7, 0xb1), uintN(timestampScaleNs, 4)) ++
        (if (durationTicks > 0)
          el(id(0x44, 0x89),
            uintN(java.lang.Double.doubleToLongBits(durationTicks), 8))
        else Array.empty[Byte]))
    val video =
      if (w > 0)
        el(id(0xae), el(id(0x83), uintN(1, 1)) ++
          el(id(0xe0), el(id(0xb0), uintN(w, 2)) ++
            el(id(0xba), uintN(h, 2))))
      else Array.empty[Byte]
    val audio =
      if (channels > 0)
        el(id(0xae), el(id(0x83), uintN(2, 1)) ++
          el(id(0xe1),
            (if (sampleRate > 0)
              el(id(0xb5), uintN(
                (java.lang.Float.floatToIntBits(sampleRate.toFloat).toLong
                  & 0xffffffffL), 4))
            else Array.empty[Byte]) ++
              el(id(0x9f), uintN(channels, 1))))
      else Array.empty[Byte]
    val tracks =
      if (video.nonEmpty || audio.nonEmpty)
        el(id(0x16, 0x54, 0xae, 0x6b), video ++ audio)
      else Array.empty[Byte]
    el(id(0x1a, 0x45, 0xdf, 0xa3),
      el(id(0x42, 0x82), docType.getBytes("US-ASCII"))) ++
      id(0x18, 0x53, 0x80, 0x67) ++ // Segment, unknown-size VINT
      id(0x01, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff) ++
      info ++ tracks
  }

  /** Minimal Ogg BOS page carrying a Vorbis identification header. */
  def oggVorbisBytes(channels: Int, sampleRate: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("OggS".getBytes("US-ASCII"))
    out.write(0); out.write(2)
    zeros(out, 8 + 4 + 4 + 4)
    out.write(1); out.write(30)       // one segment of 30 bytes
    out.write(1); out.write("vorbis".getBytes("US-ASCII"))
    w32(out, 0)                       // vorbis version (LE)
    out.write(channels)
    w32(out, sampleRate)              // LE
    w32(out, 0); w32(out, 0); w32(out, 0) // bitrate max/nominal/min
    out.write(0xb8); out.write(1)     // blocksizes, framing bit
    out.toByteArray
  }
}
