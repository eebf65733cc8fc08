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
}
