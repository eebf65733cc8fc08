package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Exact-Jaccard verification of candidate pairs — the shared final stage
  * of every text near-dup pipeline here (exact inverted-index, MinHash
  * banding, SimHash banding). Candidate generation differs per scheme;
  * membership in the output is always decided by the EXACT shingle-set
  * Jaccard, so `{output} ⊆ {pairs : jaccard >= threshold}` with equality
  * whenever the candidate stage has full recall.
  *
  * Verification cost is proportional to the candidate count, not the
  * corpus size — the property that makes candidates-then-verify the
  * 100 TB shape (reference has no similarity operators; this tier is the
  * training-data extension of SURVEY.md §8).
  */
object JaccardVerify {

  /** Keep the candidate pairs whose exact word-shingle Jaccard is at
    * least `threshold`; emits (id_a, id_b, jaccard). The set-Jaccard runs
    * as the native [[graft.plans.JaccardSimilarity]] kernel (dedups
    * internally, so no array_distinct materialization per document).
    */
  def verify(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleWords: Int = 3): DataFrame = {
    val sets = docs.select(
      col(idCol).as("id"),
      TextFunctions.wordShingles(col(textCol), shingleWords).as("sh"))
    def jaccardSim(a: Column, b: Column): Column =
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.plans.JaccardSimilarity(
          org.apache.spark.sql.graft.ColumnBridge.expression(a),
          org.apache.spark.sql.graft.ColumnBridge.expression(b)))
    pairs.select("id_a", "id_b")
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccardSim(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
