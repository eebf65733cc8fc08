package graft.crawl

/** Zstandard framing for dataset archives — the codec modern LLM
  * corpora ship in (`.jsonl.zst` shards). Same contract as
  * [[Warc.gzip]]/[[Warc.gunzipAll]]: compression is one frame per
  * call (concatenate frames for a multi-shard stream), inflation
  * consumes a full frame CHAIN under an output cap enforced during
  * the read — a decompression bomb is None, never an executor OOM.
  *
  * Uses zstd-jni, which ships on every Spark classpath (Spark's own
  * shuffle/parquet codecs depend on it) — no new dependency.
  */
object Codecs {

  /** One zstd frame (default level). */
  def zstd(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val z = new com.github.luben.zstd.ZstdOutputStream(out)
    z.write(b)
    z.close()
    out.toByteArray
  }

  /** Inflate a chain of concatenated zstd frames. None on corrupt
    * bytes or output past `maxOut`. The native decompression context
    * is released deterministically (expression kernels run once per
    * row — finalizer-paced release accumulates unbounded off-heap
    * window buffers on an executor).
    */
  def unzstdAll(b: Array[Byte], maxOut: Int = 1 << 28): Option[Array[Byte]] = {
    if (b == null) return None
    // non-continuous: consumes every frame in the chain AND throws
    // on a truncated tail ("Truncated source") — continuous mode
    // would return the empty prefix silently, losing the shard
    var in: com.github.luben.zstd.ZstdInputStream = null
    try {
      in = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream(
        math.min(b.length.toLong * 4, 1L << 16).toInt)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        if (out.size().toLong + n > maxOut) return None
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally if (in != null) in.close()
  }
}
