package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

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
  * is inherent to containment joins, and the `maxDocFreq` stop-shingle
  * cutoff is the documented guard for boilerplate-hot keys (off by
  * default; when on, pairs sharing ONLY ultra-hot shingles are lost).
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
      maxDocFreq: Long = Long.MaxValue): DataFrame = {
    require(thresholdPct > 0 && thresholdPct <= 100)
    val t = thresholdPct / 100.0
    val sets = docs.select(
      col(idCol).as("id"),
      array_distinct(TextFunctions.wordShingles(col(textCol), n)).as("sh"))
    // hashed postings: 8-byte keys through every shuffle; a collision can
    // only ADD a candidate, which exact verification rejects
    val postings = sets
      .select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("s0"))
      .select(col("id"), col("sz"), xxhash64(col("s0")).as("s"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("df") <= maxDocFreq)
    val prefixA = postings
      .withColumn("__rnk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
      .filter(col("__rnk") <= col("sz") - ceil(lit(t) * col("sz")) + 1)
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
}
