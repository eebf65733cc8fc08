package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.functions.TextFunctions
import graft.plans.{SimHash64 => SimHash64Expr}

/** SimHash near-duplicate detection: 64-bit per-document signature (native
  * Catalyst expression, `graft.plans.SimHash64`), multi-index block
  * banding for candidate generation, exact Hamming verification via
  * `bit_count`.
  *
  * Banding (the scale-critical part): the 64-bit signature is split into
  * `blocks` contiguous blocks. A pair within Hamming distance `radius`
  * differs in at most `radius` blocks, so at least `blocks - radius`
  * blocks agree — by pigeonhole the pair collides on at least one
  * combination key built from `blocks - radius` blocks. With the default
  * blocks=6 / radius=3 each document emits C(6,3)=20 keys of ~32
  * signature bits (the multi-index scheme of Manku et al., WWW'07
  * "Detecting Near-Duplicates for Web Crawling") — a ~4-billion-value key
  * space per index, vs 65k for naive 16-bit banding, which is what keeps
  * bucket sizes sub-quadratic at billions of documents.
  *
  * `maxBucketSize` additionally drops degenerate hot buckets (e.g. empty
  * or boilerplate documents that all hash identically) before the
  * self-join — the same guard as `NGramJaccard.maxDocFreq`.
  */
object SimHashDedup {

  /** SimHash64 of a token array column as a Column. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(tokens)))

  /** Per-document signature from raw text (normalized word tokens). */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("id"),
      simhash64(TextFunctions.tokens(TextFunctions.normalized(col(textCol)))).as("simhash"))

  /** Bit ranges of `blocks` contiguous blocks covering 64 bits as
    * (shift, width); widths differ by at most one bit.
    */
  private def blockRanges(blocks: Int): Seq[(Int, Int)] = {
    val base = 64 / blocks
    val extra = 64 % blocks
    val widths = Seq.tabulate(blocks)(i => if (i < extra) base + 1 else base)
    widths.scanLeft(0)(_ + _).zip(widths).map { case (shift, w) => (shift, w) }
  }

  /** All size-k index combinations of 0 until n, deterministic order. */
  private def combinations(n: Int, k: Int): Seq[Seq[Int]] =
    (0 until n).combinations(k).map(_.toSeq).toSeq

  /** Banding candidate pairs (id_a < id_b, with their exact Hamming
    * distance): every pair within `radius` Hamming distance is GUARANTEED
    * to appear (pigeonhole over the block combos — deterministic, not
    * probabilistic); farther pairs may appear when a combo key happens to
    * collide. Callers decide membership: [[nearDupPairs]] verifies by
    * Hamming radius, [[nearDupPairsJaccard]] by exact shingle Jaccard.
    *
    * @param blocks number of signature blocks; must exceed `radius` for
    *               the banding to be lossless (pigeonhole)
    * @param maxBucketSize drop (combo, key) buckets holding more documents
    *               than this before the self-join; bounds worst-case join
    *               fan-out at maxBucketSize² per bucket. 0 = no cap.
    */
  /** One row per (document, combo key): `(id, simhash, combo, bkey)` —
    * the multi-index banding table [[candidatePairs]] self-joins and
    * [[SimHashIndex]] persists. Each key hashes the combo id with the
    * chosen blocks' values, so each multi-index join key is a single
    * long drawn from the full combined block width
    * (~(blocks-radius) * 64/blocks bits).
    */
  def bandKeys(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      radius: Int = 3,
      blocks: Int = 6): DataFrame = {
    require(radius >= 0, "radius must be non-negative")
    require(blocks > radius, "banding is only complete for radius < blocks")
    require(blocks <= 64, "at most one block per signature bit")
    val ranges = blockRanges(blocks)
    val combos = combinations(blocks, blocks - radius)
    val sig = signatures(docs, idCol, textCol)
    sig.select(
      col("id"), col("simhash"),
      posexplode(array(combos.zipWithIndex.map { case (combo, ci) =>
        val parts = combo.map { b =>
          val (shift, width) = ranges(b)
          // width == 64 (blocks=1, radius=0): (1L << 64) wraps to 1 under
          // Java shift semantics, so the mask must be special-cased to -1
          val mask = if (width == 64) -1L else (1L << width) - 1L
          shiftright(col("simhash"), shift).bitwiseAND(lit(mask))
        }
        xxhash64((lit(ci) +: parts): _*)
      }: _*)).as(Seq("combo", "bkey")))
  }

  /** @param maxHamming when >= 0, drop candidate pairs whose exact
    *        Hamming distance exceeds it BEFORE the dedup shuffle. This
    *        is the scale valve for the verified forms: banding with
    *        many short combo keys (e.g. radius=5/blocks=8: 56 combos of
    *        ~24 bits) collides far pairs constantly — measured at a
    *        synthesized 500k-doc corpus, ~900M raw candidate pairs of
    *        which only the within-radius sliver can satisfy any
    *        downstream check; without the prefilter the pair-distinct
    *        shuffle and the shingle-array verification join materialize
    *        all of them (a disk-filling ~TB at that size, measured).
    *        The filter runs on the join output row (two longs already
    *        in hand), so far collisions die before costing anything.
    */
  def candidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      radius: Int = 3,
      blocks: Int = 6,
      maxBucketSize: Long = 100000L,
      maxHamming: Int = -1): DataFrame = {
    val keyed = bandKeys(docs, idCol, textCol, radius, blocks)
    val capped = graft.operators.BucketCaps.capBuckets(
      keyed, Seq(col("combo"), col("bkey")), maxBucketSize)
    val raw = capped.as("l")
      .join(capped.as("r"),
        col("l.combo") === col("r.combo") && col("l.bkey") === col("r.bkey") &&
          col("l.id") < col("r.id"))
      .select(
        col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
    (if (maxHamming >= 0) raw.filter(col("hamming") <= maxHamming) else raw)
      .distinct()
  }

  /** Pairs (id_a < id_b) within `radius` Hamming distance — pure SimHash
    * semantics (banding + Hamming verification).
    */
  def nearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      radius: Int = 3,
      blocks: Int = 6,
      maxBucketSize: Long = 100000L): DataFrame =
    candidatePairs(docs, idCol, textCol, radius, blocks, maxBucketSize,
      maxHamming = radius)

  /** SimHash banding as CANDIDATE GENERATION with exact shingle-Jaccard
    * verification deciding membership. Output contract:
    * `{(a,b) : jaccard >= threshold AND hamming(sig_a, sig_b) <= radius}`
    * — banding GUARANTEES every within-radius pair surfaces
    * (pigeonhole), and the radius prefilter drops out-of-radius combo
    * collisions deterministically, so the result is a fixed set, not
    * "true pairs plus whatever happened to collide". The Hamming radius
    * is the explicit recall knob: a true Jaccard pair whose signatures
    * differ in more than `radius` bits is out of contract (raise
    * `radius` to chase it — candidate volume rises accordingly).
    *
    * The prefilter is also what makes this form survive scale: without
    * it the verification join hauls both documents' shingle arrays for
    * EVERY raw banding collision (measured ~900M pairs / ~TB of shuffle
    * at a 500k-doc corpus with the q28 parameters; with the prefilter
    * the verified set is proportional to real near-dup density).
    */
  def nearDupPairsJaccard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      radius: Int = 5,
      blocks: Int = 8,
      shingleWords: Int = 3,
      maxBucketSize: Long = 100000L): DataFrame =
    JaccardVerify.verify(
      candidatePairs(docs, idCol, textCol, radius, blocks, maxBucketSize,
        maxHamming = radius),
      docs, idCol, textCol, threshold, shingleWords)
}
