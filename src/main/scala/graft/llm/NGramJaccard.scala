package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Exact n-gram Jaccard similarity via an inverted-index join.
  *
  * Candidate generation: explode distinct shingles to (shingle, id)
  * postings, drop stop-shingles (posting lists longer than `maxDocFreq` —
  * the guard that keeps the self-join quadratic-in-bucket, not
  * quadratic-in-corpus, at 100 TB), self-join postings on the shingle.
  *
  * Verification: candidates are then scored with the EXACT Jaccard over
  * the full (unfiltered) shingle sets — so `maxDocFreq` never distorts a
  * reported similarity, it only bounds which pairs become candidates. A
  * pair whose every common shingle is a stop-shingle is not generated;
  * with any meaningful threshold such pairs are far below it (all their
  * common shingles occur in > maxDocFreq documents).
  */
object NGramJaccard {

  /** Pairs (id_a < id_b) with exact word-n-gram Jaccard >= threshold. */
  def similarPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      maxDocFreq: Long = 1000L): DataFrame = {
    val sets = docs.select(
      col(idCol).as("id"),
      array_distinct(TextFunctions.wordShingles(col(textCol), n)).as("sh"))
    val postings = sets.select(col("id"), explode(col("sh")).as("s"))
    val filtered = postings
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("s"))))
      .filter(col("df") <= maxDocFreq)
      .drop("df")
    val candidates = filtered.as("a")
      .join(filtered.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candidates
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
