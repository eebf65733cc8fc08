package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.BucketCaps
import graft.operators.Iterate.MaterializeOps

/** Exact asymmetric containment search — the quote/subset axis of
  * near-dup detection that symmetric Jaccard misses: a 10-shingle snippet
  * fully inside a 300-shingle article has jaccard ~= 0.03 but containment
  * 1.0. Containment C(A,B) = |sh(A) ∩ sh(B)| / |sh(A)| over distinct word
  * n-gram shingles; output is the ordered pairs {(a,b) : a != b,
  * C(a,b) >= t} — a is the contained (quoted) side.
  *
  * Candidate generation is one-sided prefix filtering (the containment
  * variant of AllPairs, Bayardo et al. WWW'07 — NGramJaccard.scala holds
  * the symmetric form): C(A,B) >= t forces overlap >= ceil(t·|A|), and
  * A's non-prefix tail only has ceil(t·|A|) - 1 elements, so under ANY
  * fixed global shingle order at least one shared shingle lands in A's
  * first |A| - ceil(t·|A|) + 1 — the contained side indexes only that
  * prefix (its RAREST shingles, df-ascending, so candidates form on
  * selective keys). The container side indexes everything: containment
  * puts no lower bound on |B|, so B has no safe prefix — this asymmetry
  * is inherent to containment joins, so the `maxDocFreq` stop-shingle
  * cutoff guards against boilerplate-hot keys. It is ON by default
  * (100k, the same default as every other bucketed self-join here):
  * one shingle in d docs otherwise makes a single candidate-join bucket
  * emit O(d²) pairs — a boilerplate line shared by 1% of a 10^10-doc
  * corpus is quadratic death, and the pairs it generates are worthless
  * (they share only the boilerplate). Pairs sharing ONLY over-cap
  * shingles are lost; [[hotShingles]] is the divergence report — a
  * non-empty result means the capped run differs from an uncapped one
  * on exactly those keys (same observability contract as
  * `BucketCaps.overflowBuckets` on the SimHash/MinHash paths).
  *
  * Document frequency is computed with a two-phase `groupBy` (map-side
  * partial aggregation) joined back onto the postings — NOT with
  * `count().over(Window.partitionBy(s))`, which would land every raw
  * posting of one shingle in a single partition before counting and
  * re-create at the df step the very hot-key blowup the cap exists to
  * prevent. The join shuffles both sides hash-partitioned on the 8-byte
  * shingle key; the aggregate side is bounded by distinct-shingle count.
  *
  * The prefix length is computed in pure integer arithmetic:
  * ceil(t·|A|) = (|A|·thresholdPct + 99) div 100 exactly, so the
  * lossless bound cannot be shrunk by a floating-point rounding
  * overshoot at any threshold.
  *
  * Verification is exact: candidates re-score on the full distinct
  * shingle sets; the scaled-integer containment (inter·100 div |A|)
  * replays bit-for-bit relationally.
  */
object Containment {

  /** Ordered pairs (id_a contained in id_b): (id_a, id_b, inter, sz_a,
    * sz_b, cont_x100) with cont_x100 >= thresholdPct.
    */
  def containedPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      thresholdPct: Int = 80,
      maxDocFreq: Long = 100000L): DataFrame = {
    require(thresholdPct > 0 && thresholdPct <= 100)
    require(maxDocFreq > 0, "maxDocFreq must be positive (it bounds bucket fan-out)")
    // the shingle sets feed the posting generation AND both sides of the
    // verification rejoin — materialize once so the shingling expression
    // runs a single pass over the corpus instead of once per consumer
    val sets = docs.select(
      col(idCol).as("id"),
      array_distinct(TextFunctions.wordShingles(col(textCol), n)).as("sh"))
      .materialized
    // hashed postings: 8-byte keys through every shuffle; a collision can
    // only ADD a candidate, which exact verification rejects
    val raw = sets
      .select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("s0"))
      .select(col("id"), col("sz"), xxhash64(col("s0")).as("s"))
    // two-phase df + stop-shingle cap (see scaladoc): the inner join both
    // attaches df for rarest-first prefix ordering AND drops over-cap keys
    val dfBy = raw.groupBy(col("s"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
    // consumed by the prefix window AND the candidate join's container
    // side: one eval
    val postings = raw.join(dfBy, "s").materialized
    val prefixA = postings
      .withColumn("__rnk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
      .filter(col("__rnk") <=
        expr(s"sz - ((sz * $thresholdPct + 99) div 100) + 1"))
      .select(col("id"), col("s"))
    val candidates = prefixA.as("a")
      .join(postings.select("id", "s").as("b"),
        col("a.s") === col("b.s") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candidates
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(
        col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter"),
        size(col("sh_a")).cast("long").as("sz_a"),
        size(col("sh_b")).cast("long").as("sz_b"))
      .withColumn("cont_x100", expr("inter * 100 div sz_a"))
      .filter(col("cont_x100") >= thresholdPct)
  }

  /** Divergence report for the `maxDocFreq` stop-shingle cap: every
    * hashed shingle key whose document frequency exceeds the cap, with
    * its occupancy — exactly the keys [[containedPairs]] drops from the
    * candidate index. Empty ⇒ the capped run is identical to an uncapped
    * one on this corpus; non-empty ⇒ pairs sharing ONLY these keys are
    * absent. Shares `BucketCaps.overflowBuckets` with the SimHash /
    * MinHash banded paths so all cap reports have one shape.
    */
  def hotShingles(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      maxDocFreq: Long = 100000L): DataFrame = {
    val posts = docs
      .select(
        col(idCol).as("id"),
        explode(array_distinct(
          TextFunctions.wordShingles(col(textCol), n))).as("s0"))
      .select(xxhash64(col("s0")).as("s"))
    BucketCaps.overflowBuckets(posts, Seq(col("s")), maxDocFreq)
  }
}
