package graft.crawl

/** TAR archive walk — WebDataset's shard format (training samples
  * shipped as members of plain `.tar` shards, sequentially readable
  * and seekable by 512-byte block). Header-only discipline matching
  * [[Warc]]: 512-byte headers with octal ASCII fields, payloads
  * rounded up to block size, the archive terminated by a zero block.
  * Malformed or truncated bytes end the walk — everything parsed to
  * that point is kept; never an exception.
  *
  * Accepts pre-POSIX v7 headers, USTAR (magic "ustar", prefix field
  * honored: member name is `prefix + "/" + name`), GNU base-256
  * numeric fields (values past the 8 GiB octal ceiling), and the
  * long-name conventions real writers emit — PAX extended headers
  * (typeflag 'x', Python tarfile's default format: the `path` record
  * overrides the next member's name; 'g' globals are skipped) and GNU
  * 'L' longname / 'K' longlink members — all consumed as metadata,
  * never surfaced as data entries. The header checksum IS verified
  * (both the POSIX unsigned-byte sum and the historical signed-byte
  * convention are accepted) — a checksum-corrupt header with a
  * plausible size field is quarantined rather than parsed as a
  * member. A BLANK checksum field (all spaces/NULs — writers that
  * never fill it, including this repo's own closed-form SQL staging)
  * skips verification and surfaces 0.
  */
object Tar {

  /** One member: `content.length == size` by construction. */
  final case class TarEntry(name: String, size: Long, mtime: Long,
      typeFlag: Char, checksum: Long, content: Array[Byte])

  private val Block = 512

  /** Parse a numeric header field: NUL/space-terminated octal, or the
    * GNU base-256 form (first byte's top bit set — written for values
    * past the 8 GiB octal ceiling). None on any other byte (a blank
    * field — all spaces/NULs — is 0).
    */
  private def octal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    if ((b(off) & 0x80) != 0) { // GNU base-256: big-endian binary
      var v = (b(off) & 0x7fL)
      var i = off + 1
      while (i < off + len) {
        if (v > (Long.MaxValue >> 8)) return None // would overflow
        v = (v << 8) | (b(i) & 0xffL)
        i += 1
      }
      return Some(v)
    }
    var v = 0L
    var i = off
    val end = off + len
    // leading spaces/NULs
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    val digitsFrom = i
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = (v << 3) | (b(i) - '0')
      i += 1
    }
    if (i == digitsFrom && digitsFrom == end) return Some(0L) // blank
    // trailing terminators only
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    if (i == end) Some(v) else None
  }

  /** PAX extended-header payload: `"%d %s=%s\n"` records. Returns the
    * value for `key`, or None (malformed records are skipped — PAX
    * metadata is advisory here, never a walk-stopper). The record
    * length field counts UTF-8 BYTES, so the walk stays in byte space
    * end to end — decoding first and using char offsets would drift
    * the record boundaries as soon as a value holds a multibyte
    * character (a non-ASCII `path` is the common real-world case).
    */
  private def paxValue(payload: Array[Byte], key: String): Option[String] = {
    var pos = 0
    while (pos < payload.length) {
      var sp = pos // byte index of the space after the length digits
      while (sp < payload.length && payload(sp) != ' ') sp += 1
      if (sp >= payload.length || sp == pos) return None
      var recLen = 0L
      var i = pos
      while (i < sp) {
        val c = payload(i)
        if (c < '0' || c > '9') return None
        recLen = recLen * 10 + (c - '0')
        if (recLen > payload.length) return None
        i += 1
      }
      // a record shorter than its own "<len> " prefix is malformed —
      // without this check the value substring length goes negative
      // and throws, breaking the never-throw contract
      if (recLen <= 0 || pos + recLen > payload.length ||
        pos + recLen < sp + 1) return None
      val rec = new String(payload, sp + 1,
        pos + recLen.toInt - (sp + 1), "UTF-8")
      val eq = rec.indexOf('=')
      if (eq > 0 && rec.substring(0, eq) == key)
        return Some(rec.substring(eq + 1).stripSuffix("\n"))
      pos += recLen.toInt
    }
    None
  }

  /** POSIX header checksum: simple sum of the 512 header bytes with
    * the checksum field read as 8 spaces. The spec sums UNSIGNED
    * bytes; early implementations summed SIGNED chars, and readers
    * conventionally accept both (a header with any byte >= 0x80 —
    * base-256 fields, UTF-8 names — sums differently under the two).
    */
  private def checksumOk(b: Array[Byte], hdr: Int, stored: Long): Boolean = {
    var u = 0L
    var s = 0L
    var i = 0
    while (i < Block) {
      val raw: Byte = if (i >= 148 && i < 156) ' '.toByte else b(hdr + i)
      u += raw & 0xff
      s += raw
      i += 1
    }
    stored == u || stored == s
  }

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && b(end) != 0) end += 1
    new String(b, off, end - off, "UTF-8")
  }

  private def zeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = off
    while (i < off + Block) { if (b(i) != 0) return false; i += 1 }
    true
  }

  /** Walk every member. Stops at the terminating zero block, a
    * malformed header, or a truncated payload.
    */
  def entries(b: Array[Byte]): Iterator[TarEntry] =
    if (b == null) Iterator.empty
    else new Iterator[TarEntry] {
      private var pos = 0
      // a PAX 'path' or GNU 'L' longname overriding the NEXT entry
      private var nameOverride: String = null
      private var nextEnt: TarEntry = advance()
      private def advance(): TarEntry = {
        while (true) {
          if (pos + Block > b.length || zeroBlock(b, pos)) return null
          val name0 = str(b, pos, 100)
          if (name0.isEmpty) return null
          val size = octal(b, pos + 124, 12).getOrElse(return null)
          val mtime = octal(b, pos + 136, 12).getOrElse(return null)
          val chksum = octal(b, pos + 148, 8).getOrElse(return null)
          // blank checksum field (all spaces/NULs): writer never filled
          // it — skip verification; otherwise both sum conventions
          var ckOff = pos + 148
          var ckBlank = true
          while (ckBlank && ckOff < pos + 156) {
            if (b(ckOff) != ' ' && b(ckOff) != 0) ckBlank = false
            ckOff += 1
          }
          if (!ckBlank && !checksumOk(b, pos, chksum)) return null
          val tf = b(pos + 156)
          // v7 marks regular files with NUL; normalize to '0'
          val typeFlag = if (tf == 0) '0' else tf.toChar
          val ustar = b(pos + 257) == 'u' && b(pos + 258) == 's' &&
            b(pos + 259) == 't' && b(pos + 260) == 'a' && b(pos + 261) == 'r'
          val prefix = if (ustar) str(b, pos + 345, 155) else ""
          if (size < 0 || size > Int.MaxValue.toLong) return null
          val payloadStart = pos + Block
          // bound in LONG: an octal size near 2^31 fits the 11-digit
          // field, and adding it to payloadStart in Int overflows
          // negative — passing the bound check and then throwing in
          // copyOfRange, which would break the never-throw contract
          val payloadEnd = payloadStart.toLong + size
          if (payloadEnd > b.length) return null
          val content =
            java.util.Arrays.copyOfRange(b, payloadStart, payloadEnd.toInt)
          val paddedEnd = payloadStart.toLong +
            ((size + Block - 1) / Block) * Block
          // truncated final padding: the member itself is complete —
          // keep it, and land the cursor at EOF so the walk ends
          pos = math.min(paddedEnd, b.length.toLong).toInt
          // metadata members (Python tarfile writes PAX by default;
          // GNU tar writes 'L'/'K' for >100-char names): consumed,
          // never surfaced as data entries
          typeFlag match {
            case 'x' => // PAX extended header: may carry the real path
              paxValue(content, "path").foreach(nameOverride = _)
            case 'g' => // PAX global header: advisory, skipped
            case 'L' => // GNU longname: payload IS the next entry's name
              nameOverride = {
                var end = content.length
                while (end > 0 && content(end - 1) == 0) end -= 1
                new String(content, 0, end, "UTF-8")
              }
            case 'K' => // GNU longlink: skipped
            case _ =>
              val name =
                if (nameOverride != null) { val n = nameOverride; nameOverride = null; n }
                else if (prefix.isEmpty) name0
                else prefix + "/" + name0
              return TarEntry(name, size, mtime, typeFlag, chksum, content)
          }
        }
        null // unreachable
      }
      override def hasNext: Boolean = nextEnt != null
      override def next(): TarEntry = {
        val r = nextEnt; nextEnt = advance(); r
      }
    }

  /** Build a USTAR archive (correct checksums, zero-block trailer) —
    * the writer side of the WebDataset posture, and the fixture
    * builder the spec verifies [[entries]] against.
    */
  def tarBytes(members: Seq[(String, Array[Byte])],
      mtime: Long = 0L): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, content) =>
      require(name.getBytes("UTF-8").length <= 100,
        s"member name over 100 bytes (USTAR name field): $name — " +
          "a longer name needs a PAX/longname member this builder doesn't write")
      val h = new Array[Byte](Block)
      def put(s: String, off: Int): Unit = {
        val bs = s.getBytes("UTF-8")
        System.arraycopy(bs, 0, h, off, bs.length)
      }
      put(name, 0)
      put("0000644", 100); put("0000000", 108); put("0000000", 116)
      put(f"${content.length}%011o", 124)
      put(f"$mtime%011o", 136)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum spaces
      h(156) = '0'
      put("ustar", 257); h(262) = 0; put("00", 263)
      val sum = h.foldLeft(0L)((a, x) => a + (x & 0xff))
      put(f"$sum%06o", 148); h(154) = 0; h(155) = ' '
      out.write(h)
      out.write(content)
      val pad = (Block - content.length % Block) % Block
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * Block))
    out.toByteArray
  }
}
