package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads ride as opaque `binary`
  * columns next to typed metadata, and decode/feature-extraction runs as
  * batched per-partition processing.
  *
  * This container has no media codecs, so the decode step itself is a
  * clearly-marked deterministic STUB — but the Spark-side plumbing is
  * real: binary column schema, batched `mapPartitions` shape (batch in,
  * batch out, bounded memory per batch), deterministic metadata extraction
  * and frame sampling, all of which survive a swap-in of a real codec.
  */
object MultimodalOps {

  case class MediaRecord(id: Long, media: Array[Byte], media_type: String)
  case class DecodedMeta(
      id: Long, media_type: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int, checksum: String)

  /** Expression-level metadata extraction (no JVM round trip): byte
    * length, md5 checksum, and STUBBED decode dimensions derived
    * deterministically from the payload bytes (a real decoder would parse
    * the container header here).
    */
  def decodeMetaColumns(media: Column): Seq[Column] = Seq(
    octet_length(media).cast("long").as("byte_len"),
    (pmod(xxhash64(media), lit(512)) + 128).cast("int").as("width"),   // STUB
    (pmod(xxhash64(lit(1), media), lit(512)) + 128).cast("int").as("height"), // STUB
    (pmod(xxhash64(lit(2), media), lit(240)) + 1).cast("int").as("n_frames"), // STUB
    md5(media).as("checksum"))

  /** Batched imperative decode path (the `mapPartitions` shape a real
    * codec needs: it amortizes per-batch setup — model load, decoder
    * context — across `batchSize` records, and never materializes more
    * than one batch per task).
    */
  def decodeBatched(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[DecodedMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // Real implementation: hand `batch` to a vectorized codec /
        // feature extractor. STUB: deterministic metadata from bytes.
        batch.map { r =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val digest = md.digest(r.media).map("%02x".format(_)).mkString
          val h = java.util.Arrays.hashCode(r.media)
          DecodedMeta(
            r.id, r.media_type, r.media.length.toLong,
            128 + math.floorMod(h, 512), 128 + math.floorMod(h * 31, 512),
            1 + math.floorMod(h * 131, 240), digest)
        }
      }
    }
  }

  /** STUB "resize": a real kernel would transform pixels; the plumbing
    * (binary in, binary out, new dims in metadata) is what's exercised.
    */
  def resizeStub(df: DataFrame, mediaCol: String, w: Int, h: Int): DataFrame =
    df.withColumn("resized_width", lit(w))
      .withColumn("resized_height", lit(h))
      .withColumn("resized_media", col(mediaCol)) // STUB: identity payload

  /** Frame sampling: one output row per sampled frame index — pure
    * expression (`sequence` + `explode`), so sampling N frames from a
    * video column never leaves codegen.
    */
  def sampleFrames(df: DataFrame, nFramesCol: String, every: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(col(nFramesCol) - 1, lit(0)), lit(every))))
}
