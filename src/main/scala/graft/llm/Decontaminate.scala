package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination — the training-data curation gate that
  * keeps evaluation sets honest: any corpus document sharing a word
  * n-gram with a benchmark document is flagged (the n-gram-collision
  * discipline popularized by large-LM training reports; 13-grams at
  * production scale, parameterized here). Dedup can't do this job —
  * a doc 1% of which is a verbatim benchmark question is nowhere near
  * any near-dup threshold, but it still leaks the answer.
  *
  * Shape: one inverted-index semi-join keyed on the shingle STRING —
  * exact by construction (decontamination is the one pipeline stage
  * where a hash-collision false positive silently discards good data
  * and a false negative silently leaks eval answers, so the 8-byte
  * hashed-key variant the near-dup tier uses is deliberately NOT used
  * here; at 100 TB the join key is wider but the benchmark side is
  * tiny). The benchmark's distinct-shingle set is benchmark-sized
  * (thousands of docs × shingles — broadcastable in practice; Spark's
  * planner picks broadcast automatically under the threshold), and the
  * corpus side streams through the join once, partial-aggregating
  * per doc.
  */
object Decontaminate {

  /** Per contaminated corpus doc: `(doc_id, n_overlap)` — the number
    * of the doc's DISTINCT word `n`-gram shingles that appear anywhere
    * in `bench`. Clean docs (zero overlap) are absent; left-join the
    * corpus back for a keep-list. Shingling and normalization are
    * [[TextFunctions.wordShingles]] — identical to the near-dup tier,
    * so a doc's shingle set is computed once per pipeline in practice.
    */
  def overlap(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    def shingles(df: DataFrame) = df.select(
      col(idCol).as("doc_id"),
      explode(array_distinct(
        TextFunctions.wordShingles(col(textCol), n))).as("s"))
    val benchSh = shingles(bench).select("s").distinct()
    shingles(corpus)
      .join(benchSh, "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** Per REFERENCE doc contamination telemetry against a training
    * corpus — the reverse direction of [[overlap]], and the eval-side
    * report LM training runs publish (GPT-3 appendix C's methodology:
    * for each benchmark document, the fraction of its distinct word
    * n-grams that appear anywhere in training data). [[overlap]] asks
    * "which training docs must go"; this asks "how burned is each eval
    * doc if nothing goes" — the number an eval-integrity dashboard
    * tracks per benchmark release. Clean reference docs ARE emitted
    * (overlap 0): a telemetry table with absent rows invites
    * survivorship mistakes downstream. Same exactness stance as
    * [[overlap]]: the join key is the shingle STRING, never a hash.
    * Scale: the training side reduces to its distinct-gram set before
    * the join (semi-join, gram-keyed shuffle ∝ corpus); the reference
    * side is benchmark-sized.
    */
  def report(
      train: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    val trainG = train.select(explode(array_distinct(
      TextFunctions.wordShingles(col(textCol), n))).as("g")).distinct()
    val refSets = reference.select(col(idCol).as("ref_id"),
      array_distinct(TextFunctions.wordShingles(col(textCol), n)).as("sh"))
    val hits = refSets.select(col("ref_id"), explode(col("sh")).as("g"))
      .join(trainG, Seq("g"), "left_semi")
      .groupBy("ref_id").agg(count(lit(1)).as("n_contaminated"))
    refSets.select(col("ref_id"), size(col("sh")).cast("long").as("n_grams"))
      .join(hits, Seq("ref_id"), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("overlap_frac",
        round(col("n_contaminated").cast("double") / col("n_grams"), 6))
  }
}
