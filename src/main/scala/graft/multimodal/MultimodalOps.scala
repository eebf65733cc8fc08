package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads ride as opaque `binary`
  * columns next to typed metadata, and decode/feature-extraction runs as
  * batched per-partition processing.
  *
  * Containers are parsed for real — [[MediaContainers]] reads BMP / PPM
  * / WAV headers byte-by-byte (surfaced as the native
  * [[graft.plans.MediaMeta]] expression) and extracts full pixel rasters
  * from the uncompressed image formats ([[decodeImages]]: BMP 24-bit
  * BI_RGB and binary Netpbm, no codec library needed). Compressed codecs
  * (JPEG entropy decode etc.) would need a library this container
  * doesn't have; such payloads decode to metadata only and are dropped
  * by the pixel path — quarantine them upstream via the `format` column.
  * The raw-RGB888 and raw-PCM kernels below are the post-decode compute
  * path on real byte math.
  */
object MultimodalOps {

  case class MediaRecord(id: Long, media: Array[Byte], media_type: String)
  case class DecodedMeta(
      id: Long, media_type: String, byte_len: Long, format: String,
      width: Option[Int], height: Option[Int], n_frames: Option[Long],
      checksum: String)

  /** Expression-level metadata extraction (no JVM round trip): byte
    * length, md5 checksum, and REAL container-header parsing (format
    * sniff + width/height/n_frames) via the native media_meta kernel.
    * Unknown containers yield format="unknown" and null dims.
    */
  def decodeMetaColumns(media: Column): Seq[Column] = {
    val meta = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.MediaMeta(
        org.apache.spark.sql.graft.ColumnBridge.expression(media)))
    Seq(
      octet_length(media).cast("long").as("byte_len"),
      meta.getField("format").as("format"),
      meta.getField("width").as("width"),
      meta.getField("height").as("height"),
      meta.getField("n_frames").as("n_frames"),
      md5(media).as("checksum"))
  }

  /** Batched imperative decode path (the `mapPartitions` shape a real
    * codec needs: it amortizes per-batch setup — model load, decoder
    * context — across `batchSize` records, and never materializes more
    * than one batch per task). Metadata comes from the same real
    * container parsers as the expression path.
    */
  def decodeBatched(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[DecodedMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup lives here (a codec would allocate its
        // context once per batch); md5 instances are cheap but follow
        // the same shape
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.map { r =>
          md.reset()
          val digest = md.digest(r.media).map("%02x".format(_)).mkString
          val m = MediaContainers.parse(r.media)
          DecodedMeta(
            r.id, r.media_type, r.media.length.toLong,
            m.format, m.width, m.height, m.nFrames, digest)
        }
      }
    }
  }

  /** Encoded payloads → raw RGB888: real pixel extraction for the
    * uncompressed containers (BMP 24-bit, binary PPM/PGM) via
    * [[MediaContainers.decodePixels]], batched per partition like
    * [[decodeBatched]]. Rows whose payload is not an uncompressed image
    * (WAV, truncated, compressed codecs) are DROPPED here — route them
    * first on the `format` metadata column if they must be kept. The
    * output feeds [[resizeRawRgb]] / [[channelStats]] directly, so
    * encoded-in → resized-raw-out is a two-call pipeline with no stub
    * anywhere in it.
    */
  def decodeImages(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[RawImage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap { r =>
        MediaContainers.decodePixels(r.media)
          .map(p => RawImage(r.id, p.width, p.height, p.rgb))
      })
    }
  }

  // ---------------------------------------------------------------------
  // Raw-bitmap kernels — REAL pixel math, codec-free. Once a decoder has
  // produced raw RGB888 (3 bytes/pixel, row-major), everything below is
  // the actual production path, not a stub: deterministic synthesis for
  // tests, nearest-neighbor resize, per-channel statistics.
  // ---------------------------------------------------------------------

  case class RawImage(id: Long, width: Int, height: Int, pixels: Array[Byte])
  case class ResizedImage(id: Long, width: Int, height: Int, pixels: Array[Byte])
  case class ChannelStats(id: Long, mean_r: Double, mean_g: Double, mean_b: Double)

  /** Deterministic synthetic RGB888 bitmap (the "already decoded" stand-in:
    * a real pipeline gets these bytes from the codec).
    */
  def synthBitmap(id: Long, w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = (y * w + x) * 3
        px(base) = ((id * 31 + x * 7 + y * 13) & 0xff).toByte
        px(base + 1) = ((id * 17 + x * 3 + y * 11) & 0xff).toByte
        px(base + 2) = ((id * 23 + x * 5 + y * 19) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    px
  }

  /** Deterministic NOISE bitmap (middle-square mix): each channel byte
    * is the middle bits of `u²` for a per-(seed, x, y, channel) linear
    * seed `u` — NONLINEAR in position, so neighboring pixels decorrelate
    * (the gradient-structured [[synthBitmap]] makes every image's dHash
    * near-identical; perceptual-hash fixtures need per-image
    * pseudorandom content). All intermediates < 2⁶² — safe int64 under
    * ANSI, replayable verbatim in oracle SQL. `perturbR00` adds to the
    * (0,0) red channel (mod 256): the "small edit" a perceptual hash
    * must tolerate.
    */
  def synthNoiseBitmap(seed: Long, w: Int, h: Int,
      perturbR00: Int = 0): Array[Byte] = {
    def chan(x: Int, y: Int, salt: Int): Int = {
      val u = (seed * 40503L + x * 65521L + y * 97531L + salt * 11939L +
        12345L) % 2147483648L
      (((u * u) / 65536L) % 256L).toInt
    }
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = (y * w + x) * 3
        px(base) = chan(x, y, 1).toByte
        px(base + 1) = chan(x, y, 2).toByte
        px(base + 2) = chan(x, y, 3).toByte
        x += 1
      }
      y += 1
    }
    if (perturbR00 != 0)
      px(0) = (((px(0) & 0xff) + perturbR00) % 256).toByte
    px
  }

  /** Nearest-neighbor resample of one raw RGB888 buffer (floor mapping
    * sx = x*sw/tw — the standard NN kernel, exact integer arithmetic).
    */
  def resizeNearestKernel(
      src: Array[Byte], sw: Int, sh: Int, tw: Int, th: Int): Array[Byte] = {
    require(src.length == sw * sh * 3, s"expected ${sw * sh * 3} bytes, got ${src.length}")
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * sh / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * sw / tw).toInt
        val s = (sy * sw + sx) * 3
        val t = (y * tw + x) * 3
        out(t) = src(s); out(t + 1) = src(s + 1); out(t + 2) = src(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Distributed NN resize: binary in, binary out, new dims alongside —
    * batched per partition like [[decodeBatched]] (per-batch setup cost
    * amortized; memory bounded by one batch of pixels per task).
    */
  def resizeRawRgb(ds: Dataset[RawImage], tw: Int, th: Int,
      batchSize: Int = 64): Dataset[ResizedImage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { img =>
        ResizedImage(img.id, tw, th,
          resizeNearestKernel(img.pixels, img.width, img.height, tw, th))
      })
    }
  }

  /** Per-channel means over raw RGB888 — the feature-extraction shape
    * (image → embedding-ish vector) on real bytes.
    */
  def channelStats(ds: Dataset[RawImage]): Dataset[ChannelStats] = {
    import ds.sparkSession.implicits._
    ds.map { img =>
      var (r, g, b) = (0L, 0L, 0L)
      var i = 0
      while (i < img.pixels.length) {
        r += img.pixels(i) & 0xff
        g += img.pixels(i + 1) & 0xff
        b += img.pixels(i + 2) & 0xff
        i += 3
      }
      val n = (img.pixels.length / 3).toDouble
      ChannelStats(img.id, r / n, g / n, b / n)
    }
  }

  // ---------------------------------------------------------------------
  // Raw-PCM kernels — the audio analog of the bitmap path: 16-bit
  // signed little-endian samples in a binary column, decoded and
  // feature-extracted with real byte math.
  // ---------------------------------------------------------------------

  case class RawAudio(id: Long, pcm: Array[Byte])
  case class AudioFeatures(
      id: Long, n_samples: Long, mean_square: Double,
      zero_crossings: Long, peak: Long)

  /** Deterministic synthetic 16-bit LE PCM clip (decoder-output stand-in). */
  def synthPcm(id: Long, nSamples: Int): Array[Byte] = {
    val out = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (((id * 7 + i.toLong * 3) % 512) - 256).toInt
      out(i * 2) = (s & 0xff).toByte
      out(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Deterministic NOISE PCM (middle-square mix, like
    * [[synthNoiseBitmap]]): decorrelated samples so per-clip frame
    * energies are independent across seeds — [[synthPcm]]'s linear
    * sawtooth gives every clip the same energy profile, useless as a
    * fingerprint fixture. Samples are EVEN by construction, so
    * `halve = true` (the acoustic twin: same signal at half volume) is
    * an EXACT integer division — truncate-vs-floor can't diverge on the
    * replay, and frame-energy ORDER is exactly preserved (E/4).
    */
  def synthNoisePcm(seed: Long, nSamples: Int,
      halve: Boolean = false): Array[Byte] = {
    val out = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val u = (seed * 40503L + i * 65521L + 12345L) % 2147483648L
      val sb = (((u * u) / 65536L) % 65536L % 30000L - 15000L).toInt
      val s = if (halve) sb else 2 * sb
      out(i * 2) = (s & 0xff).toByte
      out(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Energy (mean square — kept transcendental-free, unlike RMS), signed
    * zero-crossing count, and peak magnitude per clip, decoding the
    * 16-bit LE samples straight off the byte buffer. Sample squares are
    * ≤ 2^30 and clips are task-bounded, so the sums stay double-exact.
    */
  def audioFeatures(ds: Dataset[RawAudio]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.map { a =>
      val n = a.pcm.length / 2
      var (sumSq, zc, peak) = (0L, 0L, 0L)
      var prev = 0
      var i = 0
      while (i < n) {
        val s = (((a.pcm(i * 2 + 1) & 0xff) << 8) | (a.pcm(i * 2) & 0xff)).toShort.toInt
        sumSq += s.toLong * s
        if (i > 0 && s * prev < 0) zc += 1
        if (math.abs(s) > peak) peak = math.abs(s)
        prev = s
        i += 1
      }
      AudioFeatures(a.id, n.toLong, sumSq.toDouble / n, zc, peak)
    }
  }

  /** Linear-interpolation resample of 16-bit LE PCM from `srIn` to
    * `srOut` Hz — the decode-side DSP every audio ingest runs before a
    * feature extractor with a fixed input rate. Output length is
    * floor((n-1)·srOut/srIn)+1 (source positions stay inside
    * [0, n-1]).
    *
    * EXACT integer arithmetic, deliberately: source position of output
    * j is the rational j·srIn/srOut, split as i = (j·srIn) div srOut
    * and remainder r; interpolation runs in the shifted non-negative
    * domain u = s + 32768 as (u_i·(srOut−r) + u_{i+1}·r) div srOut — a
    * single floor division of a non-negative numerator, so the whole
    * resample replays relationally with no engine-rounding hazard
    * (truncate-vs-floor division only differs on negative numerators,
    * which the shift removes). r == 0 short-circuits to u_i so the
    * final sample never reads past the buffer.
    */
  def resamplePcmLinear(ds: Dataset[RawAudio], srIn: Int, srOut: Int,
      batchSize: Int = 64): Dataset[RawAudio] = {
    require(srIn > 0 && srOut > 0)
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { a =>
        val n = a.pcm.length / 2
        val nOut = if (n == 0) 0 else ((n - 1).toLong * srOut / srIn).toInt + 1
        val out = new Array[Byte](nOut * 2)
        def u(k: Int): Long =
          ((((a.pcm(k * 2 + 1) & 0xff) << 8) | (a.pcm(k * 2) & 0xff))
            .toShort.toInt + 32768).toLong
        var j = 0
        while (j < nOut) {
          val num = j.toLong * srIn
          val i = (num / srOut).toInt
          val r = num % srOut
          val uo = if (r == 0) u(i)
            else (u(i) * (srOut - r) + u(i + 1) * r) / srOut
          val s = (uo - 32768).toInt
          out(j * 2) = (s & 0xff).toByte
          out(j * 2 + 1) = ((s >> 8) & 0xff).toByte
          j += 1
        }
        RawAudio(a.id, out)
      })
    }
  }

  /** Frame sampling: one output row per sampled frame index — pure
    * expression (`sequence` + `explode`), so sampling N frames from a
    * video column never leaves codegen.
    */
  def sampleFrames(df: DataFrame, nFramesCol: String, every: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(col(nFramesCol) - 1, lit(0)), lit(every))))
}
