package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Exact n-gram Jaccard similarity via an inverted-index join: explode
  * distinct shingles to (shingle, id) postings, self-join postings to
  * count common shingles per document pair, then
  * jaccard = common / (|A| + |B| - common).
  *
  * Unlike an all-pairs cross join this only materializes pairs that share
  * at least one shingle, and `maxDocFreq` drops stop-shingles (posting
  * lists longer than the cutoff) before the self-join — the standard
  * guard that keeps the join quadratic-in-bucket, not quadratic-in-corpus,
  * at 100 TB.
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
    val sh = docs.select(
      col(idCol).as("id"),
      explode(array_distinct(TextFunctions.wordShingles(col(textCol), n))).as("s"))
    val filtered = sh
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("s"))))
      .filter(col("df") <= maxDocFreq)
      .drop("df")
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val common = filtered.as("a")
      .join(filtered.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
