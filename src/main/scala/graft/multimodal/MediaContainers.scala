package graft.multimodal

/** Dependency-free media-container parsing — REAL header parsing for the
  * three public formats whose containers need no codec library: BMP
  * (BITMAPINFOHEADER and the legacy BITMAPCOREHEADER), binary PPM/PGM
  * (P6/P5, with comment and whitespace handling per the Netpbm spec),
  * and WAV (RIFF chunk walk, not fixed offsets — handles non-canonical
  * chunk orders and word-aligned padding).
  *
  * These replace the previous hash-derived metadata STUB: `width`,
  * `height` and `n_frames` now come from the actual bytes. Pixel/sample
  * DECODE beyond the header (JPEG entropy decoding etc.) still needs a
  * codec and remains out of scope; the raw-RGB888 / raw-PCM kernels in
  * [[MultimodalOps]] cover the post-decode compute path.
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

  /** Binary Netpbm (P6 = PPM, P5 = PGM): ASCII magic, then
    * whitespace-separated decimal width, height, maxval; '#' starts a
    * comment running to end-of-line; a single whitespace then raster.
    */
  def parsePpm(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 2 || b(0) != 'P' || (b(1) != '5' && b(1) != '6')) return None
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
    } yield ImageMeta(w, h)
  }

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

  /** Sniff + parse: images report 1 frame; audio reports sample frames
    * and no dimensions; anything else is ("unknown", None, None, None).
    */
  def parse(b: Array[Byte]): MediaMeta =
    if (b == null) MediaMeta("unknown", None, None, None)
    else parseBmp(b) match {
      case Some(m) => MediaMeta("bmp", Some(m.width), Some(m.height), Some(1L))
      case None => parsePpm(b) match {
        case Some(m) => MediaMeta("ppm", Some(m.width), Some(m.height), Some(1L))
        case None => parseWav(b) match {
          case Some(w) => MediaMeta("wav", None, None, Some(w.nFrames))
          case None => MediaMeta("unknown", None, None, None)
        }
      }
    }

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

  /** 24-bit BITMAPINFOHEADER BMP with zeroed, 4-byte-padded rows. */
  def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val rowSize = ((3 * w + 3) / 4) * 4
    val imgSize = rowSize * h
    val out = new java.io.ByteArrayOutputStream(54 + imgSize)
    out.write('B'); out.write('M')
    w32(out, 54 + imgSize); w32(out, 0); w32(out, 54)
    w32(out, 40); w32(out, w); w32(out, h)
    w16(out, 1); w16(out, 24)
    w32(out, 0); w32(out, imgSize); w32(out, 2835); w32(out, 2835)
    w32(out, 0); w32(out, 0)
    out.write(new Array[Byte](imgSize))
    out.toByteArray
  }

  /** Binary P6 PPM with a zeroed raster. */
  def ppmBytes(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"P6\n$w $h\n255\n".getBytes("US-ASCII"))
    out.write(new Array[Byte](3 * w * h))
    out.toByteArray
  }

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
}
