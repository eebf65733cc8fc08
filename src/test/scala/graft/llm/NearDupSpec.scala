package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Fixture-pinned semantics for the near-duplicate detectors whose seeded
  * hashing has no SQL oracle (minhash / simhash), plus the exact jaccard
  * reference they are checked against.
  */
class NearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the river bank today"
  private def docs = Seq(
    (1L, base),
    (2L, base + " extra"),      // near-dup of 1 (jaccard ~0.92)
    (3L, "completely different words about spark query engines and shuffles"),
    (4L, base)                  // exact dup of 1 (jaccard 1.0)
  ).toDF("doc_id", "text")

  test("NGramJaccard: exact similarity on a hand-computed pair") {
    val pairs = NGramJaccard.similarPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 1000L)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect()
    // base: 14 tokens -> 12 distinct 3-gram shingles; +1 word appends 1
    // shingle set diff of 1 -> j = 12/13; identical pair -> 1.0
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L), (1L, 4L), (2L, 4L)))
    val j12 = pairs.find(p => p._1 == 1L && p._2 == 2L).get._3
    assert(math.abs(j12 - 12.0 / 13.0) < 1e-12)
    assert(pairs.find(p => p._1 == 1L && p._2 == 4L).get._3 == 1.0)
  }

  test("NGramJaccard: maxDocFreq only prunes candidates, never distorts scores") {
    // shingles shared by all three similar docs have df=3; cutting at 2
    // removes them from candidate generation -- the surviving pair scores
    // must still be the exact full-set jaccard
    val pairs = NGramJaccard.similarPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.9, maxDocFreq = 1000L)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 1.0))
  }

  test("MinHash: recovers the exact-jaccard pair set on the fixture") {
    val exact = NGramJaccard.similarPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 1000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = MinHashDedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // identical docs always collide in every band; the ~0.92 pairs collide
    // with overwhelming probability under 8 bands of 4 rows -- and the
    // seeded hashes make this deterministic, so equality is stable
    assert(lsh == exact)
    // verified jaccard values match the exact computation
    val j = MinHashDedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .filter(col("id_a") === 1L && col("id_b") === 4L)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("MinHash: degenerate hot bucket is capped") {
    val flood = (1L to 60L).map(i => (i, "x")).toDF("doc_id", "text")
    // 60 identical single-shingle docs -> one bucket per band; cap 10 drops it
    assert(MinHashDedup.candidatePairs(flood, "doc_id", "text",
      maxBucketSize = 10L).count() == 0)
    // uncapped: all 60*59/2 pairs
    assert(MinHashDedup.candidatePairs(flood, "doc_id", "text",
      maxBucketSize = 0L).count() == 60L * 59 / 2)
  }

  test("SimHash: exact duplicates at hamming 0; unrelated text not paired") {
    val pairs = SimHashDedup.nearDupPairs(docs, "doc_id", "text", radius = 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("SimHash: banding is lossless for hamming <= radius (brute-force check)") {
    // 20 short docs; compare banded pairs against an all-pairs hamming scan
    val many = (1L to 20L).map(i =>
      (i, s"token$i shared words appear in every document here ${i % 3}"))
      .toDF("doc_id", "text")
    val sig = SimHashDedup.signatures(many, "doc_id", "text")
    val brute = sig.as("a").join(sig.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("h"))
      .filter(col("h") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    val banded = SimHashDedup.nearDupPairs(many, "doc_id", "text", radius = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute)
  }

  test("SimHash jaccard-verified: exactly the exact pairs WITHIN the Hamming radius") {
    // the output contract is {jaccard >= t AND hamming <= radius} — a
    // fixed set, not "true pairs plus whatever combo keys collided".
    // On this tiny fixture the (1,2)/(2,4) near-dups flip MANY signature
    // bits (one extra word in a 14-token doc moves a large fraction of
    // the simhash sums), so they fall outside radius 5 and are out of
    // contract at that radius; the exact duplicate (hamming 0) is in.
    val sig = SimHashDedup.signatures(docs, "doc_id", "text")
    val ham = sig.as("a").join(sig.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("h"))
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    val exact = NGramJaccard.similarPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 1000L)
      .as[(Long, Long, Double)].collect().toSet
    def bandedAt(r: Int, blocks: Int) =
      SimHashDedup.nearDupPairsJaccard(docs, "doc_id", "text",
          threshold = 0.5, radius = r, blocks = blocks)
        .as[(Long, Long, Double)].collect().toSet
    val at5 = bandedAt(5, 8)
    assert(at5 == exact.filter { case (a, b, _) => ham((a, b)) <= 5 })
    assert(at5.map(p => (p._1, p._2)) == Set((1L, 4L)))
    // raising the radius past the fixture's max true-pair hamming
    // recovers the full exact set with exact (not estimated) scores
    val maxTrueHam = exact.map { case (a, b, _) => ham((a, b)) }.max
    assert(maxTrueHam > 5, "fixture should exercise the out-of-radius case")
    // blocks = radius + 1 keeps the pigeonhole guarantee with only
    // C(radius+1, 1) = radius+1 single-block keys — the cheap way to
    // band a wide radius (tiny blocks -> hot buckets, fine at this size)
    val wide = bandedAt(maxTrueHam, maxTrueHam + 1)
    assert(wide == exact)
  }

  test("SimHash: radius 0 with blocks 1 keys on the full signature (width-64 mask)") {
    val banded = SimHashDedup.nearDupPairs(docs, "doc_id", "text", radius = 0, blocks = 1)
      .as[(Long, Long, Int)].collect().toSet
    // only the exact duplicates (identical signatures) pair at radius 0
    assert(banded.map(p => (p._1, p._2)) == Set((1L, 4L)))
  }

  test("SimHash: hot-bucket cap bounds the self-join") {
    val flood = (1L to 40L).map(i => (i, "same text for everyone")).toDF("doc_id", "text")
    assert(SimHashDedup.nearDupPairs(flood, "doc_id", "text",
      maxBucketSize = 10L).count() == 0)
    assert(SimHashDedup.nearDupPairs(flood, "doc_id", "text",
      maxBucketSize = 0L).count() == 40L * 39 / 2)
  }

  test("bandsFor: cheapest banding with P(candidate | J=threshold) ≥ 0.95") {
    // anchors at 32 hashes — the historical default b=8/r=4 is only
    // calibrated for t ≳ 0.75 (at t=0.5 it leaves P=0.40, the sf1.0
    // sidecar's measured 8% survivor surplus)
    assert(MinHashDedup.bandsFor(0.95) == 4)  // r=8 already suffices
    assert(MinHashDedup.bandsFor(0.8) == 8)   // the historical default
    assert(MinHashDedup.bandsFor(0.7) == 16)
    assert(MinHashDedup.bandsFor(0.5) == 16)  // P = 0.99
    assert(MinHashDedup.bandsFor(0.3) == 32)
    assert(MinHashDedup.bandsFor(0.01) == 32) // r=1 floor: nothing better
    // calibrated banding always divides the signature, and delivers the
    // guarantee wherever some divisor banding can
    for (t <- Seq(0.2, 0.3, 0.5, 0.7, 0.8, 0.9, 0.95)) {
      val b = MinHashDedup.bandsFor(t); val r = 32 / b
      assert(32 % b == 0)
      val p = 1.0 - math.pow(1.0 - math.pow(t, r), b)
      assert(p >= 0.95, s"t=$t b=$b recall-at-threshold $p")
    }
  }
}
