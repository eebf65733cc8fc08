package graft.crawl

/** WARC (ISO 28500) record walk + the gzip member framing crawl
  * archives actually ship in — header-only parsing discipline matching
  * `multimodal/MediaContainers`: malformed or truncated bytes end the
  * walk (a truncated tail is data at corpus scale, never a task kill).
  *
  * A `.warc.gz` is a CONCATENATION of gzip members, one record per
  * member, so archives are seekable per record; [[gunzipAll]] inflates
  * the full member chain (the JDK's GZIPInputStream consumes
  * concatenated members natively) under an explicit output cap — a
  * decompression bomb yields None, not an executor OOM.
  *
  * Reference behavior studied from Yakashimaru/Parquet-combiner's data
  * model (no crawl ingestion exists there — this is the 100-TB-scale
  * surface a training-data pipeline needs on top of it).
  */
object Warc {

  /** One WARC record: the named headers every downstream query keys
    * on, the full header map for the long tail, and the raw payload
    * (`content.length == contentLength` by construction).
    */
  final case class WarcRecord(
      version: String,
      warcType: String,
      recordId: String,
      targetUri: Option[String],
      date: Option[String],
      contentType: Option[String],
      contentLength: Long,
      content: Array[Byte])

  private val MaxLineBytes = 8192 // spec headers are short; a longer "line" is junk

  /** Index of the next CRLF at/after `from`, or -1. Bounded by
    * [[MaxLineBytes]] so a binary blob that happens to start with
    * "WARC/" can't scan unboundedly.
    */
  private def eol(b: Array[Byte], from: Int): Int = {
    var i = from
    val limit = math.min(b.length - 1, from + MaxLineBytes)
    while (i < limit) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Parse one record at `pos`. Returns (record, nextPos) or null on
    * malformed/truncated bytes.
    */
  private def recordAt(b: Array[Byte], pos: Int): (WarcRecord, Int) = {
    // version line: "WARC/1.0" | "WARC/1.1"
    val vEnd = eol(b, pos)
    if (vEnd < 0 || vEnd - pos < 6) return null
    val version = new String(b, pos, vEnd - pos, "US-ASCII")
    if (!version.startsWith("WARC/")) return null
    // header lines until the empty line
    var p = vEnd + 2
    var warcType: String = null
    var recordId: String = null
    var targetUri: String = null
    var date: String = null
    var contentType: String = null
    var contentLength = -1L
    var guard = 0
    while (guard < 256) { // a record with >256 headers is junk
      guard += 1
      val e = eol(b, p)
      if (e < 0) return null
      if (e == p) { // empty line: headers done
        if (contentLength < 0) return null
        val payloadStart = p + 2
        val payloadEnd = payloadStart + contentLength
        if (payloadEnd < payloadStart || payloadEnd > b.length) return null
        val content = java.util.Arrays.copyOfRange(
          b, payloadStart, payloadEnd.toInt)
        // spec: two CRLFs close a record; tolerate any run of CRLFs
        // (some writers pad) by letting records() skip them
        if (warcType == null || recordId == null) return null
        return (WarcRecord(version, warcType, recordId,
          Option(targetUri), Option(date), Option(contentType),
          contentLength, content), payloadEnd.toInt)
      }
      val line = new String(b, p, e - p, "UTF-8")
      val colon = line.indexOf(':')
      if (colon <= 0) return null
      val name = line.substring(0, colon).trim.toLowerCase
      val value = line.substring(colon + 1).trim
      name match {
        case "warc-type" => warcType = value
        case "warc-record-id" => recordId = value
        case "warc-target-uri" => targetUri = value
        case "warc-date" => date = value
        case "content-type" => contentType = value
        case "content-length" =>
          contentLength =
            try value.toLong
            catch { case _: NumberFormatException => return null }
          if (contentLength < 0) return null
        case _ => // long-tail header: not surfaced, still consumed
      }
      p = e + 2
    }
    null
  }

  /** Walk every record in the (uncompressed) WARC bytes. Stops at the
    * first malformed record — everything parsed up to that point is
    * kept.
    */
  def records(b: Array[Byte]): Iterator[WarcRecord] =
    if (b == null) Iterator.empty
    else new Iterator[WarcRecord] {
      private var pos = 0
      private var nextRec: WarcRecord = advance()
      private def advance(): WarcRecord = {
        // skip the inter-record CRLF run
        while (pos + 1 < b.length && b(pos) == '\r' && b(pos + 1) == '\n')
          pos += 2
        if (pos >= b.length) return null
        val r = recordAt(b, pos)
        if (r == null) null
        else { pos = r._2; r._1 }
      }
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; nextRec = advance(); r
      }
    }

  /** Gzip-compress one buffer as a single member (the per-record
    * framing `.warc.gz` uses — concatenate members for an archive).
    */
  def gzip(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(b)
    gz.close()
    out.toByteArray
  }

  private def le32u(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Inflate a full chain of concatenated gzip members by walking the
    * member framing EXPLICITLY — header (with the optional
    * FEXTRA/FNAME/FCOMMENT/FHCRC fields), raw-deflate body, CRC32 +
    * ISIZE trailer, repeat until the input is exhausted. None on
    * corrupt bytes, a truncated tail (including truncation AT a
    * member boundary, which the JDK's GZIPInputStream silently treats
    * as EOF — the prefix would be returned as if complete), a CRC or
    * ISIZE mismatch, or output past `maxOut` (decompression-bomb
    * guard enforced DURING inflation). Inflater contexts are released
    * deterministically — expression kernels run once per row, so
    * leaving native state to finalizers accumulates unbounded
    * off-heap memory on an executor.
    */
  def gunzipAll(b: Array[Byte], maxOut: Int = 1 << 28): Option[Array[Byte]] = {
    if (b == null || b.length < 18) return None // one empty member = 18 bytes
    val out = new java.io.ByteArrayOutputStream(
      math.min(b.length.toLong * 4, 1L << 16).toInt)
    try {
      var pos = 0
      while (pos < b.length) {
        // ---- member header ----
        if (pos + 10 > b.length) return None
        if ((b(pos) & 0xff) != 0x1f || (b(pos + 1) & 0xff) != 0x8b ||
          b(pos + 2) != 8) return None // magic + CM=deflate
        val flg = b(pos + 3) & 0xff
        var p = pos + 10
        if ((flg & 4) != 0) { // FEXTRA
          if (p + 2 > b.length) return None
          p += 2 + (((b(p) & 0xff)) | ((b(p + 1) & 0xff) << 8))
          if (p > b.length) return None
        }
        var skipZ = (if ((flg & 8) != 0) 1 else 0) +
          (if ((flg & 16) != 0) 1 else 0) // FNAME, FCOMMENT
        while (skipZ > 0) {
          while (p < b.length && b(p) != 0) p += 1
          if (p >= b.length) return None
          p += 1
          skipZ -= 1
        }
        if ((flg & 2) != 0) { // FHCRC
          p += 2
          if (p > b.length) return None
        }
        // ---- raw-deflate body ----
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(b, p, b.length - p)
          val crc = new java.util.zip.CRC32
          val buf = new Array[Byte](8192)
          var memberOut = 0L
          while (!inf.finished()) {
            val n = inf.inflate(buf)
            if (n == 0 && !inf.finished()) return None // truncated/dict
            if (out.size().toLong + n > maxOut) return None
            out.write(buf, 0, n)
            crc.update(buf, 0, n)
            memberOut += n
          }
          p += inf.getBytesRead.toInt
          // ---- trailer: CRC32 + ISIZE (mod 2^32) ----
          if (p + 8 > b.length) return None
          if (le32u(b, p) != crc.getValue ||
            le32u(b, p + 4) != (memberOut & 0xffffffffL)) return None
          pos = p + 8
        } finally inf.end()
      }
      Some(out.toByteArray)
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }
}
