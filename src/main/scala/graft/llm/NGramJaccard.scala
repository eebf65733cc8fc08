package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Exact n-gram Jaccard similarity via a prefix-filtered inverted-index
  * join (the AllPairs/PPJoin scheme, Bayardo et al., WWW'07 "Scaling Up
  * All Pairs Similarity Search").
  *
  * Candidate generation: under a global shingle order (document frequency
  * ascending, then shingle), a document of distinct-shingle size `s` only
  * indexes its first `s - ceil(t*s) + 1` shingles. Any pair with
  * jaccard >= t must overlap within these prefixes, so no true pair is
  * lost — but candidates now only form on each document's RAREST
  * shingles, which keeps the posting self-join small even on dense
  * corpora where every common shingle is shared by thousands of
  * documents (where a naive full-posting join goes quadratic).
  *
  * Verification: candidates are scored with the EXACT Jaccard over the
  * full shingle sets — the output is precisely {pairs : jaccard >= t}.
  *
  * `maxDocFreq` remains as a last-resort guard for degenerate data where
  * even prefix shingles are ultra-hot (e.g. a corpus of identical
  * boilerplate); when it fires, pairs whose every prefix shingle exceeds
  * the cutoff are not generated (documented approximation, off by
  * default).
  */
object NGramJaccard {

  /** Pairs (id_a < id_b) with exact word-n-gram Jaccard >= threshold. */
  def similarPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      maxDocFreq: Long = Long.MaxValue): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    val sets = docs.select(
      col(idCol).as("id"),
      array_distinct(TextFunctions.wordShingles(col(textCol), n)).as("sh"))
    // candidate generation runs on xxhash64'd shingles: the posting rows
    // (and all three shuffles over them) carry an 8-byte long instead of
    // a multi-word string. A hash collision can only ADD a candidate
    // pair, which exact verification below then rejects — candidate-side
    // hashing cannot change the output. (`sz` stays the true string-set
    // size, so prefix lengths and the length filter are unaffected.)
    val postings = sets.select(col("id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("s0"))
      .select(col("id"), col("sz"), xxhash64(col("s0")).as("s"))
    val withDf = postings
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("df") <= maxDocFreq)
    // global order: rarest shingles first; each doc indexes only its
    // prefix — enough that any >= threshold pair still collides
    val prefix = withDf
      .withColumn("__rnk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
      .filter(col("__rnk") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select("id", "sz", "s")
    // length filter (also from AllPairs): jaccard >= t forces
    // t*|b| <= |a| and t*|a| <= |b|, so size-mismatched pairs are pruned
    // inside the join, before the distinct
    val candidates = prefix.as("a")
      .join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          col("a.sz") >= lit(threshold) * col("b.sz") &&
          col("b.sz") >= lit(threshold) * col("a.sz"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    JaccardVerify.verify(candidates, docs, idCol, textCol, threshold, n)
  }
}
