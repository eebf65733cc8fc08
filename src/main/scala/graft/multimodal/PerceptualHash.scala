package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.BucketCaps

/** Perceptual image dedup — dHash (difference hash) over decoded
  * rasters, the image-modality member of the near-dup family (text =
  * MinHash/SimHash, audio = PCM features): re-encoding, metadata edits,
  * or small pixel perturbations leave the hash within a few bits, while
  * byte-level dedup ([[graft.operators.Dedup]]) sees entirely different
  * files.
  *
  * dHash (public domain technique, popularized by Krawetz's
  * "Kind of Like That", 2013): NN-resize the raster to a 9×8 grayscale
  * grid and emit one bit per horizontal neighbor comparison
  * `gray(x+1,y) > gray(x,y)` — 64 bits that encode the image's
  * brightness GRADIENT structure, invariant to global brightness and
  * scale. Everything is exact integer arithmetic on decoded bytes
  * (floor-mapped NN resize, `(r+g+b) div 3` grayscale, strict
  * comparison), so the full pipeline — decode → resize → hash → banded
  * pairs — replays relationally in the oracle.
  *
  * The hash ships as two 32-bit halves `(h1, h2)` (rows 0-3 / 4-7, bit
  * `y*8 + x` within each half): every downstream op (band keys, XOR,
  * bit_count) stays in safe non-negative int64 under ANSI mode.
  *
  * Near-dup search is the same shape as SimHash banding: 4 disjoint
  * 16-bit blocks; Hamming distance ≤ r with r < 4 pigeonholes at least
  * one equal block, so the block-equality self-join finds every pair at
  * small radius (and serves as a high-recall candidate generator above
  * that — radius 8 with ≤ 2 flipped blocks still guarantees 2 shared
  * blocks). Candidates verify by exact `bit_count(a XOR b)`. The
  * self-join takes the standard `maxBucketSize` cap ([[BucketCaps]]) so
  * a degenerate bucket (solid-color images all hash to 0) cannot go
  * quadratic.
  */
object PerceptualHash {

  case class PHash(id: Long, h1: Long, h2: Long)

  /** dHash halves of one raw RGB888 buffer. */
  def dHashKernel(src: Array[Byte], sw: Int, sh: Int): (Long, Long) = {
    val g = MultimodalOps.resizeNearestKernel(src, sw, sh, 9, 8)
    def gray(x: Int, y: Int): Int = {
      val b = (y * 9 + x) * 3
      ((g(b) & 0xff) + (g(b + 1) & 0xff) + (g(b + 2) & 0xff)) / 3
    }
    var h1 = 0L; var h2 = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (gray(x + 1, y) > gray(x, y)) {
          if (y < 4) h1 |= 1L << (y * 8 + x)
          else h2 |= 1L << ((y - 4) * 8 + x)
        }
        x += 1
      }
      y += 1
    }
    (h1, h2)
  }

  /** Distributed dHash over decoded images (batched per partition like
    * the decode path).
    */
  def dHash(ds: Dataset[MultimodalOps.RawImage],
      batchSize: Int = 64): Dataset[PHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { img =>
        val (h1, h2) = dHashKernel(img.pixels, img.width, img.height)
        PHash(img.id, h1, h2)
      })
    }
  }

  /** Audio fingerprint — the energy-GRADIENT analog of dHash for PCM
    * clips: frame the 16-bit LE samples into windows of `frame`
    * samples, one bit per consecutive-frame energy comparison
    * `E(f+1) > E(f)` (E = Σ s², exact int64), comparisons 0-31 in h1,
    * 32-63 in h2. Invariant to exact amplitude rescaling (energies
    * scale together, order preserved) and, like dHash, robust to any
    * transform that preserves the clip's ENERGY CONTOUR — while byte
    * comparison sees unrelated buffers. Clips with fewer than 65
    * frames leave the remaining high bits 0. Pairs search reuses
    * [[nearDupPairs]] — the banding/verify layer is hash-agnostic.
    */
  def audioFingerprintKernel(pcm: Array[Byte], frame: Int = 8): (Long, Long) = {
    require(frame > 0)
    val n = pcm.length / 2
    val nf = n / frame
    val e = new Array[Long](nf)
    var f = 0
    while (f < nf) {
      var acc = 0L
      var i = f * frame
      val end = i + frame
      while (i < end) {
        val s = (((pcm(i * 2 + 1) & 0xff) << 8) | (pcm(i * 2) & 0xff))
          .toShort.toInt
        acc += s.toLong * s
        i += 1
      }
      e(f) = acc
      f += 1
    }
    var h1 = 0L; var h2 = 0L
    var c = 0
    while (c < math.min(64, nf - 1)) {
      if (e(c + 1) > e(c)) {
        if (c < 32) h1 |= 1L << c else h2 |= 1L << (c - 32)
      }
      c += 1
    }
    (h1, h2)
  }

  /** Distributed audio fingerprint over raw PCM clips. */
  def audioFingerprint(ds: Dataset[MultimodalOps.RawAudio],
      frame: Int = 8, batchSize: Int = 64): Dataset[PHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { a =>
        val (h1, h2) = audioFingerprintKernel(a.pcm, frame)
        PHash(a.id, h1, h2)
      })
    }
  }

  /** Video near-dup from per-FRAME hashes `(id, f, h1, h2)` (sampled
    * frames, each dHashed): two clips pair when at least `minMatched`
    * of clip A's frames have SOME frame of B within `radius` — set
    * matching over frame fingerprints, deliberately NOT positional
    * alignment, so temporal shifts (trimmed intros, re-cut openings)
    * and re-encodes still pair while byte comparison sees nothing.
    * Returns `(id_a, id_b, matched_frames)`. Candidate generation is
    * the same 16-bit-block banding as [[nearDupPairs]], per frame, with
    * the same hot-bucket cap (a black-frame population would otherwise
    * cross-join).
    */
  def videoNearDup(
      frameHashes: DataFrame,
      idCol: String = "id",
      frameCol: String = "f",
      radius: Int = 4,
      minMatched: Int = 3,
      maxBucketSize: Long = 10000L): DataFrame = {
    val blocks = frameHashes.select(col(idCol).as("id"),
        col(frameCol).as("f"), col("h1"), col("h2"),
        explode(array(
          struct(lit(0).as("band"),
            col("h1").bitwiseAND(lit(0xffffL)).as("key")),
          struct(lit(1).as("band"), shiftright(col("h1"), 16).as("key")),
          struct(lit(2).as("band"),
            col("h2").bitwiseAND(lit(0xffffL)).as("key")),
          struct(lit(3).as("band"), shiftright(col("h2"), 16).as("key"))))
          .as("bx"))
      .select(col("id"), col("f"), col("h1"), col("h2"),
        col("bx.band").as("band"), col("bx.key").as("key"))
    val capped = BucketCaps.capBuckets(blocks,
      Seq(col("band"), col("key")), maxBucketSize)
    val a = capped.select(col("id").as("id_a"), col("f").as("fa"),
      col("h1").as("h1a"), col("h2").as("h2a"), col("band"), col("key"))
    val b = capped.select(col("id").as("id_b"), col("f").as("fb"),
      col("h1").as("h1b"), col("h2").as("h2b"), col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "fa", "fb", "h1a", "h2a", "h1b", "h2b")
      .distinct()
      .filter(
        (bit_count(col("h1a").bitwiseXOR(col("h1b"))) +
          bit_count(col("h2a").bitwiseXOR(col("h2b")))) <= radius)
      .select("id_a", "id_b", "fa")
      .distinct()
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("matched_frames"))
      .filter(col("matched_frames") >= minMatched)
  }

  /** Near-duplicate image pairs `(id_a, id_b, hamming)` with
    * `hamming ≤ radius`, via 4-block banding + exact XOR-popcount
    * verification. Complete for any pair sharing at least one 16-bit
    * block (always true at radius ≤ 3; true at radius ≤ 8 unless the
    * flips spread across all 4 blocks — at most `radius` blocks can be
    * touched, so radius ≤ 8 pairs with flips in ≤ 3 blocks are found).
    */
  def nearDupPairs(
      hashes: DataFrame,
      idCol: String = "id",
      radius: Int = 8,
      maxBucketSize: Long = 10000L): DataFrame = {
    val blocks = hashes.select(col(idCol).as("id"), col("h1"), col("h2"),
        explode(array(
          struct(lit(0).as("band"),
            col("h1").bitwiseAND(lit(0xffffL)).as("key")),
          struct(lit(1).as("band"), shiftright(col("h1"), 16).as("key")),
          struct(lit(2).as("band"),
            col("h2").bitwiseAND(lit(0xffffL)).as("key")),
          struct(lit(3).as("band"), shiftright(col("h2"), 16).as("key"))))
          .as("bx"))
      .select(col("id"), col("h1"), col("h2"),
        col("bx.band").as("band"), col("bx.key").as("key"))
    val capped = BucketCaps.capBuckets(blocks,
      Seq(col("band"), col("key")), maxBucketSize)
    val a = capped.select(col("id").as("id_a"), col("h1").as("h1a"),
      col("h2").as("h2a"), col("band"), col("key"))
    val b = capped.select(col("id").as("id_b"), col("h1").as("h1b"),
      col("h2").as("h2b"), col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h1a", "h2a", "h1b", "h2b")
      .distinct()
      .withColumn("hamming",
        (bit_count(col("h1a").bitwiseXOR(col("h1b"))) +
          bit_count(col("h2a").bitwiseXOR(col("h2b")))).cast("long"))
      .filter(col("hamming") <= radius)
      .select("id_a", "id_b", "hamming")
  }
}
