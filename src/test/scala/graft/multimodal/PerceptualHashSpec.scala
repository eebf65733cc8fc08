package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.multimodal.MultimodalOps.RawImage

class PerceptualHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 9×8 image whose grayscale is given by `g(x, y)` (all channels
    * equal, so resize is identity and grayscale is exact).
    */
  private def img(id: Long, g: (Int, Int) => Int): RawImage = {
    val px = new Array[Byte](9 * 8 * 3)
    for (y <- 0 until 8; x <- 0 until 9; c <- 0 until 3)
      px((y * 9 + x) * 3 + c) = g(x, y).toByte
    RawImage(id, 9, 8, px)
  }

  test("bit layout: ascending gradient sets every bit, flat image none") {
    val (a1, a2) = PerceptualHash.dHashKernel(img(0, (x, _) => x * 10).pixels, 9, 8)
    assert(a1 == 0xffffffffL && a2 == 0xffffffffL)
    val (f1, f2) = PerceptualHash.dHashKernel(img(0, (_, _) => 77).pixels, 9, 8)
    assert(f1 == 0L && f2 == 0L)
    // one rising step at (x=2, y=5) only: bit (y-4)*8+x of h2
    val (s1, s2) = PerceptualHash.dHashKernel(
      img(0, (x, y) => if (y == 5 && x >= 3) 50 else 10).pixels, 9, 8)
    assert(s1 == 0L && s2 == (1L << (1 * 8 + 2)))
  }

  test("resize invariance: 2x-upscaled image hashes identically") {
    val base = img(0, (x, y) => (x * 37 + y * 59) % 200)
    val big = new Array[Byte](18 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 18; c <- 0 until 3)
      big((y * 18 + x) * 3 + c) = base.pixels(((y / 2) * 9 + x / 2) * 3 + c)
    assert(PerceptualHash.dHashKernel(base.pixels, 9, 8) ==
      PerceptualHash.dHashKernel(big, 18, 16))
  }

  test("near-dup pairs: perturbed copy found, reversed gradient rejected") {
    val noisy = (x: Int, y: Int) =>
      (((x * 65521L + y * 97531L + 12345L) % 32768L *
        ((x * 65521L + y * 97531L + 12345L) % 32768L) / 64L) % 256L).toInt
    val a = img(1, noisy)
    // b = a with one grayscale cell nudged: at most 2 bits differ
    val b = img(2, (x, y) => if (x == 4 && y == 2) noisy(4, 2) + 9 else noisy(x, y))
    val c = img(3, (x, y) => noisy(8 - x, y)) // mirrored: gradient signs flip
    val d = img(4, noisy) // exact duplicate of a
    val hashes = PerceptualHash.dHash(Seq(a, b, c, d).toDS()).toDF()
    val pairs = PerceptualHash.nearDupPairs(hashes, "id", radius = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) == 0L)
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) <= 2L)
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.keys.exists { case (x, y) => x == 3L || y == 3L })
  }

  test("hot-bucket cap: a degenerate all-flat population is dropped, not joined") {
    val flats = (0L until 50L).map(i => img(i, (_, _) => 0))
    val hashes = PerceptualHash.dHash(flats.toDS()).toDF()
    val capped = PerceptualHash.nearDupPairs(hashes, "id",
      radius = 8, maxBucketSize = 10L)
    assert(capped.count() == 0L)
    val uncapped = PerceptualHash.nearDupPairs(hashes, "id",
      radius = 8, maxBucketSize = 0L)
    assert(uncapped.count() == 50L * 49L / 2L)
  }

  test("audio fingerprint: bit layout, amplitude invariance, noise decorrelation") {
    // 66 frames of 8 samples with hand-chosen rising/flat energies
    def pcm(vals: Seq[Int]): Array[Byte] = {
      val out = new Array[Byte](vals.size * 2 * 8)
      vals.zipWithIndex.foreach { case (v, f) =>
        for (k <- 0 until 8) {
          val i = f * 8 + k
          out(i * 2) = (v & 0xff).toByte
          out(i * 2 + 1) = ((v >> 8) & 0xff).toByte
        }
      }
      out
    }
    // strictly rising |amplitude| per frame → every comparison bit set
    val rising = pcm((0 until 65).map(f => f + 1))
    val (r1, r2) = PerceptualHash.audioFingerprintKernel(rising)
    assert(r1 == 0xffffffffL && r2 == 0xffffffffL)
    // flat → no bits
    val (f1, f2) = PerceptualHash.audioFingerprintKernel(pcm(Seq.fill(65)(9)))
    assert(f1 == 0L && f2 == 0L)
    // exact halving preserves the fingerprint bit-for-bit
    val full = MultimodalOps.synthNoisePcm(7L, 520)
    val half = MultimodalOps.synthNoisePcm(7L, 520, halve = true)
    assert(PerceptualHash.audioFingerprintKernel(full) ==
      PerceptualHash.audioFingerprintKernel(half))
    // different seeds decorrelate: only the volume twins pair
    val clips = (0L until 6L).flatMap { gid =>
      Seq(
        MultimodalOps.RawAudio(gid * 2, MultimodalOps.synthNoisePcm(gid, 520)),
        MultimodalOps.RawAudio(gid * 2 + 1,
          MultimodalOps.synthNoisePcm(gid, 520, halve = true)))
    }
    val hashes = PerceptualHash.audioFingerprint(clips.toDS()).toDF()
    val pairs = PerceptualHash.nearDupPairs(hashes, "id", radius = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == (0L until 6L).map(g => (g * 2, g * 2 + 1)).toSet)
    assert(pairs.values.forall(_ == 0L))
  }

  test("video set-matching pairs shifted clips and rejects unrelated ones") {
    import org.apache.spark.sql.functions.col
    // clip 0: frames seeded 0..5; clip 1: seeds 1..6 (one-frame trim →
    // 5 shared frames); clip 2: disjoint seeds 100..105
    def clip(id: Long, seeds: Seq[Long]) = seeds.zipWithIndex.map {
      case (fs, f) =>
        val (h1, h2) = PerceptualHash.dHashKernel(
          MultimodalOps.synthNoiseBitmap(fs, 16, 12), 16, 12)
        (id, f, h1, h2)
    }
    val frames = (clip(0L, 0L to 5L) ++ clip(1L, 1L to 6L) ++
      clip(2L, 100L to 105L)).toDF("id", "f", "h1", "h2")
    val out = PerceptualHash.videoNearDup(frames, radius = 4, minMatched = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 1L) -> 5L))
    // tighter threshold than the overlap → no pair
    assert(PerceptualHash.videoNearDup(frames, radius = 4, minMatched = 6)
      .filter(col("id_a") === 0L).count() == 0L)
  }

  test("synthNoiseBitmap decorrelates ids; perturbation stays within radius") {
    val imgs = (0L until 6L).flatMap { gid =>
      Seq(RawImage(gid * 2,
          16, 12, MultimodalOps.synthNoiseBitmap(gid, 16, 12)),
        RawImage(gid * 2 + 1,
          16, 12, MultimodalOps.synthNoiseBitmap(gid, 16, 12, perturbR00 = 8)))
    }
    val hashes = PerceptualHash.dHash(imgs.toDS()).toDF()
    val pairs = PerceptualHash.nearDupPairs(hashes, "id", radius = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 6L).map(g => (g * 2, g * 2 + 1)).toSet)
  }
}
