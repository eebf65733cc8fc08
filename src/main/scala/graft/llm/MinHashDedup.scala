package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** MinHash + LSH near-duplicate detection over a text column — the
  * standard shingle → minhash signature → band-bucket join pipeline.
  *
  * Scale shape (the part that matters at 100 TB): candidate generation is
  * a shuffle join on (band, band-hash) — documents only ever meet inside a
  * bucket, never via a cross join — and verification touches only the
  * candidate pairs. All hashing is the built-in `xxhash64` (codegen'd).
  */
object MinHashDedup {

  /** MinHash signature: per hash function i, min over shingles of
    * xxhash64(i, shingle). `numHashes` independent permutations are
    * simulated by seeding the hash with the function index. Computed by
    * the single-pass native `MinHashSignature` expression (bit-compatible
    * with the composed `array_min(transform(...))` form, but one Long[]
    * allocation per row instead of `numHashes` hashed array copies).
    */
  def signature(shingles: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.MinHashSignature(
        org.apache.spark.sql.graft.ColumnBridge.expression(shingles), numHashes))

  /** One (id, band, bkey) row per document per band: the LSH bucket
    * keys. Public so band-key tables can be PERSISTED as an
    * incremental-dedup index ([[MinHashIndex]]) — the bucket key
    * hashes the band's signature slice, so the join key is one long.
    */
  /** Threshold-calibrated band count: the CHEAPEST banding of
    * `numHashes` with P(candidate | J = threshold) = 1-(1-t^r)^b ≥
    * 0.95, so a pair AT the caller's threshold is a candidate with
    * high probability rather than a coin flip. The historical default
    * b=8/r=4 achieves that only for t ≳ 0.75; at t = 0.5 it leaves
    * P = 0.40, and the sf1.0 oracle sidecar measured the consequence —
    * an 8% survivor surplus on a borderline-pair-rich corpus, closed
    * to 0.06% by the b=16 this returns (P = 0.99). More bands = more
    * candidates, so this is a knob, not a silent default — explicit
    * `bands` always wins, and banding stays probabilistic even when
    * calibrated: exact-recall contracts want
    * [[NGramJaccard.similarPairs]] instead.
    */
  def bandsFor(threshold: Double, numHashes: Int = 32): Int = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    def pAtThreshold(b: Int): Double = {
      val r = numHashes / b
      1.0 - math.pow(1.0 - math.pow(threshold, r), b)
    }
    (1 to numHashes).filter(numHashes % _ == 0) // candidate band counts
      .filter(pAtThreshold(_) >= 0.95)
      .minOption.getOrElse(numHashes) // r=1 floor: no banding does better
  }

  def bandKeys(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleWords: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // stage shingles into their own projection first: `signature` references
    // its input 32 times, and passing the raw wordShingles expression would
    // inline (and re-execute) the whole tokenize+slice tree per hash
    // function — staging makes it a cheap attribute reference instead
    val sig = docs
      .select(col(idCol).as("id"),
        TextFunctions.wordShingles(col(textCol), shingleWords).as("__sh"))
      .select(col("id"), signature(col("__sh"), numHashes).as("sig"))
    sig.select(
      col("id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(lit(b), slice(col("sig"), b * r + 1, r))): _*)).as(Seq("band", "bkey")))
  }

  /** LSH candidate pairs (id_a < id_b): documents sharing at least one
    * band of their minhash signature. bands × rowsPerBand = numHashes.
    *
    * `maxBucketSize` drops degenerate hot buckets (e.g. empty/boilerplate
    * documents whose one shingle makes every band collide) before the
    * self-join, bounding worst-case fan-out at maxBucketSize² per bucket
    * instead of quadratic in the corpus. 0 = no cap.
    */
  def candidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleWords: Int = 3,
      maxBucketSize: Long = 100000L): DataFrame = {
    val capped = graft.operators.BucketCaps.capBuckets(
      bandKeys(docs, idCol, textCol, numHashes, bands, shingleWords),
      Seq(col("band"), col("bkey")), maxBucketSize)
    capped.as("l")
      .join(capped.as("r"),
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** Candidate pairs verified with the exact shingle-set Jaccard
    * similarity; keeps pairs with jaccard >= threshold.
    */
  /** Near-dup pairs at `threshold`, banding-candidates then
    * exact-verify. `bands = 0` (the default) self-calibrates via
    * [[bandsFor]] so P(candidate | J = threshold) ≥ 0.95 — the
    * round-9 sf1.0 catch showed the fixed b=8 default has P = 0.40
    * AT a 0.5 threshold, which reads as silent recall loss the moment
    * a corpus has genuinely-borderline pairs (the planted-pair decade
    * corpus measured it as 4,535/4,974). Callers needing the raw
    * S-curve of a specific geometry pass `bands` explicitly.
    */
  def nearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int = 32,
      bands: Int = 0,
      shingleWords: Int = 3,
      maxBucketSize: Long = 100000L): DataFrame = {
    val b = if (bands == 0) bandsFor(threshold, numHashes) else bands
    JaccardVerify.verify(
      candidatePairs(docs, idCol, textCol, numHashes, b, shingleWords, maxBucketSize),
      docs, idCol, textCol, threshold, shingleWords)
  }
}
