package graft.crawl

import java.nio.charset.{Charset, CodingErrorAction}

/** The HTTP message layer inside WARC `response` record payloads —
  * what a real crawl actually stores is `HTTP/1.1 200 OK\r\nheaders
  * \r\n\r\nbody`, not bare HTML, and ~15-20% of the web is not UTF-8.
  * Two kernels under the same quarantine contract as [[Warc]]:
  *
  *  - [[parseResponse]] — RFC 9112's simple subset: status line,
  *    header fields to the empty line, then the body, de-chunked when
  *    `Transfer-Encoding: chunked` and truncated to `Content-Length`
  *    when present. Malformed bytes → None, never a throw (a task
  *    kill at 100 TB is a retry storm; a None is a rejects-table row).
  *  - [[decodeCharset]] — the browser charset resolution order:
  *    BOM > Content-Type `charset=` parameter > `<meta charset>` /
  *    `<meta http-equiv>` sniff in the first 1024 bytes > UTF-8
  *    default. Decoding NEVER fails: unmappable bytes become U+FFFD
  *    and the replacement count is surfaced, so a lying charset label
  *    degrades measurably instead of silently mojibaking the corpus.
  *
  * Per WHATWG encoding rules, `iso-8859-1`/`latin1`/`us-ascii` labels
  * resolve to windows-1252 — the superset every browser actually
  * decodes them as (0x80-0x9F are typographic characters on the real
  * web, not C1 controls).
  */
object Http {

  final case class HttpResponse(
      statusCode: Int,
      reason: String,
      headers: Seq[(String, String)], // names lowercased, in order
      body: Array[Byte])

  final case class Decoded(text: String, charset: String, nReplaced: Int)

  /** A body with its `Content-Encoding` chain undone (or not):
    * `encoding` is the header value as sent (None when absent);
    * `quarantine` carries the reason the chain could NOT be undone —
    * and then `body` is the STORED bytes unchanged (rejects-table
    * posture: surface what the capture holds, never decode garbage
    * or drop data).
    */
  final case class BodyDecoded(
      body: Array[Byte],
      encoding: Option[String],
      quarantine: Option[String])

  private val MaxLineBytes = 8192
  private val MaxHeaders = 256

  /** Index of the next CRLF at/after `from` (bounded scan), or -1. */
  private def eol(b: Array[Byte], from: Int): Int = {
    var i = from
    val limit = math.min(b.length - 1, from + MaxLineBytes)
    while (i < limit) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Parse one HTTP response message. None on malformed/truncated
    * framing. The body is de-chunked / length-truncated as the
    * framing headers direct; `Content-Encoding` is the representation
    * layer, undone by [[decodeContentEncoding]] (which `http_parts`
    * applies).
    */
  def parseResponse(b: Array[Byte]): Option[HttpResponse] = {
    if (b == null || b.length < 12) return None
    // ---- status line: HTTP/D.D SP 3DIGIT [SP reason] CRLF ----
    val sEnd = eol(b, 0)
    if (sEnd < 0) return None
    val line = new String(b, 0, sEnd, "US-ASCII")
    if (!line.startsWith("HTTP/")) return None
    val sp1 = line.indexOf(' ')
    if (sp1 < 0 || sp1 + 4 > line.length) return None
    val codeStr = line.substring(sp1 + 1, sp1 + 4)
    if (!codeStr.forall(c => c >= '0' && c <= '9')) return None
    if (sp1 + 4 < line.length && line.charAt(sp1 + 4) != ' ') return None
    val status = codeStr.toInt
    val reason =
      if (sp1 + 5 <= line.length) line.substring(math.min(sp1 + 5, line.length))
      else ""
    // ---- header fields until the empty line ----
    var p = sEnd + 2
    val headers = Seq.newBuilder[(String, String)]
    var contentLength = -1L
    var chunked = false
    var guard = 0
    while (guard <= MaxHeaders) {
      guard += 1
      val e = eol(b, p)
      if (e < 0) return None
      if (e == p) { // empty line: headers done, body follows
        val bodyStart = p + 2
        val raw =
          if (chunked) dechunk(b, bodyStart).getOrElse(return None)
          else java.util.Arrays.copyOfRange(b, bodyStart, b.length)
        // Content-Length > available bytes = a truncated CAPTURE
        // (WARC-Truncated territory — ubiquitous in real crawls):
        // surface what was stored, don't quarantine data. CL shorter
        // than available trims trailing junk per the header.
        val body =
          if (chunked || contentLength < 0 || contentLength > raw.length) raw
          else java.util.Arrays.copyOfRange(raw, 0, contentLength.toInt)
        return Some(HttpResponse(status, reason, headers.result(), body))
      }
      val hline = new String(b, p, e - p, "UTF-8")
      val colon = hline.indexOf(':')
      if (colon <= 0) return None // includes obs-fold continuations
      val name = hline.substring(0, colon).trim.toLowerCase
      if (name.exists(c => c <= ' ')) return None
      val value = hline.substring(colon + 1).trim
      headers += name -> value
      name match {
        case "content-length" =>
          val cl =
            try value.toLong
            catch { case _: NumberFormatException => return None }
          // negative is malformed; a huge-but-valid length (>2 GiB
          // media) is NOT — it simply exceeds what was stored and the
          // truncated-capture rule below surfaces the stored bytes.
          // Repeated Content-Length with DIFFERING values is malformed
          // per RFC 9110 §8.6 (request-smuggling surface — upstream
          // crawl toolchains reject it, so last-one-wins here would
          // silently yield a different body than theirs); identical
          // repeats are the recoverable duplicate the RFC permits.
          if (cl < 0) return None
          if (contentLength >= 0 && contentLength != cl) return None
          contentLength = cl
        case "transfer-encoding" =>
          if (value.toLowerCase.split(",").map(_.trim).contains("chunked"))
            chunked = true
        case _ =>
      }
      p = e + 2
    }
    None // header count bomb
  }

  /** Decode chunked transfer coding from `from`: hex-size line (with
    * optional `;ext`), chunk bytes, CRLF, repeat; 0-size chunk then
    * trailer fields to the empty line end the body. None on malformed
    * sizes, truncation, or a >256 MiB reassembly (bomb guard).
    */
  private def dechunk(b: Array[Byte], from: Int): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(256)
    var p = from
    var guard = 0
    while (guard < (1 << 20)) {
      guard += 1
      val e = eol(b, p)
      if (e < 0) return None
      var sizeEnd = p
      while (sizeEnd < e && b(sizeEnd) != ';' && b(sizeEnd) != ' ')
        sizeEnd += 1
      if (sizeEnd == p || sizeEnd - p > 8) return None
      var size = 0L
      var i = p
      while (i < sizeEnd) {
        val d = Character.digit(b(i).toChar, 16)
        if (d < 0) return None
        size = size * 16 + d
        i += 1
      }
      if (out.size().toLong + size > (1L << 28)) return None // bomb
      if (size == 0) {
        // trailer section: consume fields until the empty line
        var q = e + 2
        var g2 = 0
        while (g2 <= MaxHeaders) {
          g2 += 1
          val te = eol(b, q)
          if (te < 0) return None
          if (te == q) return Some(out.toByteArray)
          q = te + 2
        }
        return None
      }
      val dataStart = e + 2
      val dataEnd = dataStart.toLong + size
      if (dataEnd + 2 > b.length) return None // chunk or its CRLF truncated
      out.write(b, dataStart, size.toInt)
      if (b(dataEnd.toInt) != '\r' || b(dataEnd.toInt + 1) != '\n') return None
      p = dataEnd.toInt + 2
    }
    None
  }

  /** Inflate one DEFLATE stream under `maxOut`. `raw` selects headerless
    * deflate vs zlib-wrapped (RFC 1950 header + adler32 trailer). None
    * on corrupt bytes, a truncated stream, trailing junk after the
    * stream, or output past the cap. The native context is released
    * deterministically (same discipline as [[Warc.gunzipAll]] — this
    * runs once per row inside expression kernels).
    */
  private def inflate(b: Array[Byte], raw: Boolean,
      maxOut: Int): Option[Array[Byte]] = {
    if (b == null || b.isEmpty) return None
    val inf = new java.util.zip.Inflater(raw)
    try {
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream(
        math.min(b.length.toLong * 4, 1L << 16).toInt)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (n == 0 && !inf.finished()) return None // truncated / needs dict
        if (out.size().toLong + n > maxOut) return None // bomb
        out.write(buf, 0, n)
      }
      if (inf.getRemaining > 0) return None // junk after the stream
      Some(out.toByteArray)
    } finally inf.end()
  }

  /** Undo one `deflate` content-coding. RFC 9110 says zlib-wrapped
    * (RFC 1950), but a long tail of real servers (the historical IIS
    * behavior every browser accommodates) send HEADERLESS deflate
    * under the same token — so zlib is tried first and raw second,
    * exactly the browser fallback. A raw stream cannot false-positive
    * as zlib: the zlib attempt validates the 2-byte header check
    * (CMF×256+FLG ≡ 0 mod 31) and the adler32 trailer.
    */
  def inflateDeflate(b: Array[Byte], maxOut: Int = 1 << 28): Option[Array[Byte]] =
    inflate(b, raw = false, maxOut).orElse(inflate(b, raw = true, maxOut))

  /** Undo the `Content-Encoding` chain on a parsed response's body —
    * the representation layer under the transfer framing
    * [[parseResponse]] already removed. A real WARC capture stores the
    * response bytes AS SENT, so a gzip-encoded page that skips this
    * step flows into charset decoding as compressed bytes: mojibake
    * soup the quality gate then scores.
    *
    * Codings (RFC 9110 §8.4.1, applied by the sender in list order, so
    * undone right-to-left): `gzip`/`x-gzip` ([[Warc.gunzipAll]] — full
    * member framing with CRC/ISIZE verification), `deflate`
    * ([[inflateDeflate]] — zlib first, headerless-raw fallback),
    * `zstd` (RFC 8878, [[Codecs.unzstdAll]]), `identity` (no-op).
    * `br` (brotli) and unknown tokens quarantine with
    * `unsupported-coding: <tok>` (no public decoder on the Spark
    * classpath — decoding garbage instead would silently poison the
    * corpus); corrupt/truncated/bomb bodies quarantine with
    * `corrupt-<tok>-body`. Quarantined responses surface the STORED
    * bytes unchanged plus the reason — a rejects-table row, never a
    * task kill, never silent data loss.
    *
    * Multiple `Content-Encoding` header lines combine in order per
    * RFC 9110 §5.2 (they are one comma-separated list split across
    * lines).
    */
  def decodeContentEncoding(headers: Seq[(String, String)],
      body: Array[Byte], maxOut: Int = 1 << 28): BodyDecoded = {
    val values = headers.collect { case ("content-encoding", v) => v }
    if (values.isEmpty) return BodyDecoded(body, None, None)
    val headerValue = values.mkString(", ")
    val chain = headerValue.split(",").map(_.trim.toLowerCase)
      .filter(v => v.nonEmpty && v != "identity")
    var cur = body
    var i = chain.length - 1
    while (i >= 0) {
      val tok = chain(i)
      val undone: Option[Array[Byte]] = tok match {
        case "gzip" | "x-gzip" => Warc.gunzipAll(cur, maxOut)
        case "deflate" => inflateDeflate(cur, maxOut)
        case "zstd" => Codecs.unzstdAll(cur, maxOut)
        case other => return BodyDecoded(body, Some(headerValue),
          Some(s"unsupported-coding: $other"))
      }
      undone match {
        case Some(next) => cur = next
        case None => return BodyDecoded(body, Some(headerValue),
          Some(s"corrupt-$tok-body"))
      }
      i -= 1
    }
    BodyDecoded(cur, Some(headerValue), None)
  }

  /** Resolve a charset LABEL to the Java charset actually used,
    * following the WHATWG Encoding label table for every encoding a
    * real crawl hits at volume — a label this table misses decodes as
    * UTF-8 and every non-ASCII byte becomes counted-but-LOST U+FFFD,
    * which at the first pipeline stage silently deletes that page's
    * training text. WHATWG aliasing is deliberate where it differs
    * from the IANA registry, because it is what the bytes on the web
    * were actually written for: the latin-1/ascii family decodes as
    * windows-1252 (0x80-0x9F are typographic characters on the real
    * web), shift_jis as windows-31j, euc-kr as windows-949, the
    * gbk/gb2312 family via the gb18030 decoder (WHATWG: "gbk's
    * decoder is gb18030's decoder"), big5 with the HKSCS extensions,
    * iso-8859-9 as windows-1254, and tis-620/iso-8859-11 as
    * windows-874. None for labels this engine doesn't ship (caller
    * falls back to UTF-8).
    */
  def resolveLabel(label: String): Option[Charset] = {
    val l = label.trim.toLowerCase.stripPrefix("\"").stripSuffix("\"")
    // a minimal runtime without jdk.charsets lacks the CJK charsets —
    // Charset.forName throwing there must degrade to the documented
    // None (caller falls back), not break the never-fails contract
    try resolveLabelUnsafe(l)
    catch { case _: java.nio.charset.UnsupportedCharsetException => None }
  }

  private def resolveLabelUnsafe(l: String): Option[Charset] = {
    l match {
      case "utf-8" | "utf8" | "unicode-1-1-utf-8" =>
        Some(java.nio.charset.StandardCharsets.UTF_8)
      case "iso-8859-1" | "iso8859-1" | "iso_8859-1" | "latin1" | "latin-1" |
           "l1" | "ascii" | "us-ascii" | "windows-1252" | "cp1252" |
           "x-cp1252" | "ansi_x3.4-1968" =>
        Some(Charset.forName("windows-1252"))
      case "utf-16" | "utf-16le" => Some(Charset.forName("UTF-16LE"))
      case "utf-16be" => Some(Charset.forName("UTF-16BE"))
      // ---- Japanese ----
      case "shift_jis" | "shift-jis" | "sjis" | "x-sjis" | "ms_kanji" |
           "csshiftjis" | "ms932" | "windows-31j" =>
        Some(Charset.forName("windows-31j"))
      case "euc-jp" | "x-euc-jp" | "cseucpkdfmtjapanese" =>
        Some(Charset.forName("EUC-JP"))
      case "iso-2022-jp" | "csiso2022jp" =>
        Some(Charset.forName("ISO-2022-JP"))
      // ---- Korean ----
      case "euc-kr" | "korean" | "ksc_5601" | "ksc5601" | "ks_c_5601-1987" |
           "ks_c_5601-1989" | "csksc56011987" | "iso-ir-149" |
           "windows-949" | "x-windows-949" =>
        Some(Charset.forName("x-windows-949"))
      // ---- Chinese (simplified): one decoder for the whole family ----
      case "gb18030" | "gbk" | "gb2312" | "gb_2312" | "gb_2312-80" |
           "chinese" | "csgb2312" | "csiso58gb231280" | "iso-ir-58" |
           "x-gbk" =>
        Some(Charset.forName("GB18030"))
      // ---- Chinese (traditional) ----
      case "big5" | "big5-hkscs" | "cn-big5" | "csbig5" | "x-x-big5" =>
        Some(Charset.forName("Big5-HKSCS"))
      // ---- Cyrillic ----
      case "koi8-r" | "koi8" | "koi" | "cskoi8r" | "koi8_r" =>
        Some(Charset.forName("KOI8-R"))
      case "koi8-u" | "koi8-ru" => Some(Charset.forName("KOI8-U"))
      case "windows-1251" | "cp1251" | "x-cp1251" =>
        Some(Charset.forName("windows-1251"))
      case "iso-8859-5" | "iso8859-5" | "iso_8859-5" | "cyrillic" |
           "csisolatincyrillic" | "iso-ir-144" =>
        Some(Charset.forName("ISO-8859-5"))
      case "ibm866" | "866" | "cp866" | "csibm866" =>
        Some(Charset.forName("IBM866"))
      // ---- the ISO-8859-x / windows-125x European families ----
      case "iso-8859-2" | "iso8859-2" | "iso_8859-2" | "latin2" | "l2" |
           "csisolatin2" | "iso-ir-101" =>
        Some(Charset.forName("ISO-8859-2"))
      case "iso-8859-3" | "iso8859-3" | "iso_8859-3" | "latin3" | "l3" =>
        Some(Charset.forName("ISO-8859-3"))
      case "iso-8859-4" | "iso8859-4" | "iso_8859-4" | "latin4" | "l4" =>
        Some(Charset.forName("ISO-8859-4"))
      case "iso-8859-6" | "iso8859-6" | "iso_8859-6" | "arabic" |
           "ecma-114" | "csisolatinarabic" =>
        Some(Charset.forName("ISO-8859-6"))
      case "iso-8859-7" | "iso8859-7" | "iso_8859-7" | "greek" | "greek8" |
           "ecma-118" | "elot_928" | "csisolatingreek" | "iso-ir-126" |
           "sun_eu_greek" =>
        Some(Charset.forName("ISO-8859-7"))
      case "iso-8859-8" | "iso8859-8" | "iso_8859-8" | "hebrew" |
           "iso-8859-8-i" | "csiso88598i" | "logical" | "visual" =>
        Some(Charset.forName("ISO-8859-8"))
      // WHATWG: the iso-8859-9/latin5 label decodes as windows-1254
      case "iso-8859-9" | "iso8859-9" | "iso_8859-9" | "latin5" | "l5" |
           "csisolatin5" | "iso-ir-148" | "windows-1254" | "cp1254" =>
        Some(Charset.forName("windows-1254"))
      case "iso-8859-13" | "iso8859-13" | "iso_8859-13" =>
        Some(Charset.forName("ISO-8859-13"))
      case "iso-8859-15" | "iso8859-15" | "iso_8859-15" | "latin9" | "l9" |
           "csisolatin9" =>
        Some(Charset.forName("ISO-8859-15"))
      case "iso-8859-16" | "iso8859-16" | "iso_8859-16" =>
        Some(Charset.forName("ISO-8859-16"))
      case "windows-1250" | "cp1250" | "x-cp1250" =>
        Some(Charset.forName("windows-1250"))
      case "windows-1253" | "cp1253" | "x-cp1253" =>
        Some(Charset.forName("windows-1253"))
      case "windows-1255" | "cp1255" | "x-cp1255" =>
        Some(Charset.forName("windows-1255"))
      case "windows-1256" | "cp1256" | "x-cp1256" =>
        Some(Charset.forName("windows-1256"))
      case "windows-1257" | "cp1257" | "x-cp1257" =>
        Some(Charset.forName("windows-1257"))
      case "windows-1258" | "cp1258" | "x-cp1258" =>
        Some(Charset.forName("windows-1258"))
      // ---- Thai: WHATWG decodes the whole family as windows-874 ----
      case "windows-874" | "dos-874" | "cp874" | "tis-620" |
           "iso-8859-11" | "iso8859-11" | "iso_8859-11" =>
        Some(Charset.forName("x-windows-874"))
      case _ => None
    }
  }

  /** Find `charset=LABEL` inside a Content-Type value. */
  private def charsetParam(contentType: String): Option[String] = {
    val lower = contentType.toLowerCase
    val i = lower.indexOf("charset")
    if (i < 0) return None
    var p = i + "charset".length
    while (p < contentType.length && contentType.charAt(p) == ' ') p += 1
    if (p >= contentType.length || contentType.charAt(p) != '=') return None
    p += 1
    while (p < contentType.length && contentType.charAt(p) == ' ') p += 1
    val quoted = p < contentType.length &&
      (contentType.charAt(p) == '"' || contentType.charAt(p) == '\'')
    val quote = if (quoted) contentType.charAt(p) else ' '
    if (quoted) p += 1
    val from = p
    while (p < contentType.length && {
      val c = contentType.charAt(p)
      if (quoted) c != quote else c != ';' && c != ' '
    }) p += 1
    if (p == from) None else Some(contentType.substring(from, p))
  }

  /** Sniff `<meta charset="...">` / `<meta http-equiv=... content=
    * "...charset=...">` in the first 1024 bytes (the prescan window
    * browsers use), reading bytes as ASCII — charset labels are.
    */
  private def metaCharset(body: Array[Byte]): Option[String] = {
    val n = math.min(body.length, 1024)
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) { // ASCII lowercase view; non-ASCII bytes -> '.'
      val c = body(i) & 0xff
      sb.append(if (c >= 128) '.' else Character.toLowerCase(c.toChar))
      i += 1
    }
    val s = sb.toString
    // try EVERY 'charset' occurrence in the window, keeping the first
    // whose label resolves to a shipped charset — a page whose text
    // happens to say the word "charset" before its real <meta charset>
    // tag must not shadow the tag (first-occurrence-only did)
    var ci = s.indexOf("charset")
    while (ci >= 0) {
      var p = ci + "charset".length
      while (p < s.length && (s.charAt(p) == ' ' || s.charAt(p) == '=')) p += 1
      if (p < s.length && (s.charAt(p) == '"' || s.charAt(p) == '\'')) p += 1
      val from = p
      while (p < s.length && (s.charAt(p).isLetterOrDigit ||
        s.charAt(p) == '-' || s.charAt(p) == '_' || s.charAt(p) == '.')) p += 1
      if (p > from && resolveLabel(s.substring(from, p)).isDefined)
        return Some(s.substring(from, p))
      ci = s.indexOf("charset", ci + 1)
    }
    None
  }

  /** Strict UTF-8 decode (overlongs, surrogates, truncated tails all
    * rejected) — the content-sniff test for unlabeled bodies. Returns
    * the decoded text on success so the sniff's validation pass IS the
    * decode (no second pass over the majority-case unlabeled-UTF-8
    * body).
    */
  private def strictUtf8(b: Array[Byte]): Option[String] =
    try Some(
      java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
        .decode(java.nio.ByteBuffer.wrap(b)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => None }

  /** Decode body bytes to text: BOM > Content-Type charset > meta
    * sniff > content sniff (valid UTF-8 → utf-8, else windows-1252).
    * Never fails — unmappable/malformed sequences decode to U+FFFD
    * and are counted. Surfaces the RESOLVED charset name (so
    * `iso-8859-1` reports as `windows-1252`).
    */
  def decodeCharset(body: Array[Byte], contentType: String): Decoded = {
    if (body == null) return Decoded("", "utf-8", 0)
    // ---- BOM wins over every label ----
    val (payload, bomCs): (Array[Byte], Option[Charset]) =
      if (body.length >= 3 && (body(0) & 0xff) == 0xEF &&
        (body(1) & 0xff) == 0xBB && (body(2) & 0xff) == 0xBF)
        (java.util.Arrays.copyOfRange(body, 3, body.length),
          Some(java.nio.charset.StandardCharsets.UTF_8))
      else if (body.length >= 2 && (body(0) & 0xff) == 0xFF &&
        (body(1) & 0xff) == 0xFE)
        (java.util.Arrays.copyOfRange(body, 2, body.length),
          Some(Charset.forName("UTF-16LE")))
      else if (body.length >= 2 && (body(0) & 0xff) == 0xFE &&
        (body(1) & 0xff) == 0xFF)
        (java.util.Arrays.copyOfRange(body, 2, body.length),
          Some(Charset.forName("UTF-16BE")))
      else (body, None)
    // the <meta> prescan is an HTML mechanism: browsers apply it only
    // to HTML documents, so a text/plain or JSON body that merely
    // MENTIONS 'charset=utf-16le' must not be decoded under that label.
    // An absent/empty Content-Type still sniffs (type unknown — the
    // body may well be HTML), matching what a browser's HTML sniffer
    // would reach.
    val ctLower = Option(contentType).map(_.toLowerCase.trim).getOrElse("")
    val htmlish = ctLower.isEmpty ||
      ctLower.startsWith("text/html") ||
      ctLower.startsWith("application/xhtml+xml")
    val labeled = bomCs
      .orElse(Option(contentType).flatMap(charsetParam).flatMap(resolveLabel))
      .orElse(if (htmlish) metaCharset(payload).flatMap(resolveLabel) else None)
    // content sniff, the browser fallback for the UNLABELED legacy
    // web: a body that is not valid UTF-8 under a strict decode is
    // decoded as windows-1252 (the dominant legacy encoding) instead
    // of dissolving into counted-but-lost U+FFFD. Valid-UTF-8 bodies
    // (which includes pure ASCII) stay UTF-8, and the validation pass
    // IS their decode — no second pass on the majority case.
    if (labeled.isEmpty) {
      strictUtf8(payload) match {
        case Some(t) => return Decoded(t, "utf-8", 0)
        case None =>
      }
    }
    val cs = labeled.getOrElse(Charset.forName("windows-1252"))
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val text =
      try dec.decode(java.nio.ByteBuffer.wrap(payload)).toString
      catch { case scala.util.control.NonFatal(_) =>
        new String(payload, java.nio.charset.StandardCharsets.UTF_8) }
    var nRep = 0
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) == 0xFFFD.toChar) nRep += 1
      i += 1
    }
    Decoded(text, cs.name().toLowerCase, nRep)
  }
}
