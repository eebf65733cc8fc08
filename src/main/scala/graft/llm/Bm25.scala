package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval (Robertson & Spärck Jones' probabilistic
  * weighting with Okapi's tf saturation) — the sparse half of the
  * engine's search story next to the dense [[EmbeddingKnn]]/[[IvfIndex]]
  * path: score a query set against the corpus through an inverted-index
  * join, no per-query corpus scan.
  *
  * Exact-integer formulation (the house rule — no log(), no float
  * accumulation, so rankings replay bit-for-bit relationally):
  *
  *  - **idf**: the classic `log((N+1)/df)` is replaced by the QUANTIZED
  *    floor-log2 `bitlength((N·64) div df) - 1` = `floor(log2(64·N/df))`
  *    — the [[BigramLm]] surprisal trick at 1/64-octave granularity
  *    (6 fixed bits + up to log2(N) variable). Monotone in the true
  *    idf, integer-exact.
  *  - **tf saturation**: `tf·(k1+1) / (tf + k1·((1-b) + b·len/avglen))`
  *    with k1=1.2, b=0.75, computed entirely in scaled integers:
  *    the length norm and denominator carry ×1000 scales and every
  *    division is a floor `div`. Deterministic by construction (floors
  *    compose identically in any engine), and within ~1e-3 of the IEEE
  *    form — ranking-grade precision.
  *
  * Scale: one tokenize + tf aggregation over the corpus (the index),
  * df + avglen as tiny side tables, then a query-term ⋈ posting join
  * shuffled on the term — cost proportional to the postings of the
  * query's terms, the inverted-index property. Top-k per query is a
  * rank-limited window ([[graft.operators.TopK]] shape).
  */
object Bm25 {

  /** Score `queries` (qid, qtext) against `docs` (idCol, textCol);
    * returns the top-`k` (qid, rank, doc id, score_x1000) per query,
    * ties broken by doc id.
    *
    * By default a query whose terms ALL miss the corpus has no rows in
    * the output — the term→postings join is inner, so a zero-result qid
    * VANISHES rather than appearing with an empty hit list (the
    * standard sparse-retrieval contract: an all-OOV query has no
    * defined score against any document; kept inner deliberately so
    * the scoring join cost stays proportional to matching postings).
    * With `emitEmpty = true`, zero-result qids are left-joined back in
    * with an explicit empty-result marker row `(qid, rank = 0,
    * did = NULL, score_x1000 = NULL)` — rank 0 can never occur for a
    * real hit (ranks start at 1), so callers iterating a query set
    * keep every qid without the anti-join dance.
    */
  def search(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      k: Int = 5,
      emitEmpty: Boolean = false): DataFrame = {
    val (tf, len) = postings(docs, idCol, textCol)
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val stats = len.agg(count(lit(1)).as("n_docs"),
      sum("len").as("total_len"))
    withEmpty(score(tf, len, df, stats, queries, k), queries, emitEmpty)
  }

  /** Left-join `queries`' qids back onto `hits`, marking hitless qids
    * with `(rank = 0, did = NULL, score_x1000 = NULL)` — shared by the
    * one-shot and [[Bm25Index]] search paths.
    */
  private[llm] def withEmpty(
      hits: DataFrame, queries: DataFrame, emitEmpty: Boolean): DataFrame =
    if (!emitEmpty) hits
    else queries.select("qid").distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("rank"), lit(0L)).as("rank"),
        col("did"), col("score_x1000"))

  /** The (did, t, tf) postings and (did, len) length tables — the
    * inverted-index building blocks shared with [[Bm25Index]].
    */
  private[llm] def postings(
      docs: DataFrame, idCol: String, textCol: String): (DataFrame, DataFrame) = {
    val tok = docs.select(col(idCol).as("did"),
      explode(split(col(textCol), " ")).as("t"))
    (tok.groupBy("did", "t").agg(count(lit(1)).as("tf")),
      tok.groupBy("did").agg(count(lit(1)).as("len")))
  }

  /** The scoring join over prebuilt index tables — ONE implementation of
    * the Okapi arithmetic whether the tables were just aggregated
    * ([[search]]) or read from a persisted incremental index
    * ([[Bm25Index.search]]), so index-path scores are definitionally the
    * one-shot scores whenever the tables match.
    */
  private[llm] def score(
      tf: DataFrame, len: DataFrame, df: DataFrame, stats: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    val qt = queries.select(col("qid"),
      explode(array_distinct(split(col("qtext"), " "))).as("t"))
    qt.join(tf, "t")
      .join(df, "t")
      .join(len, "did")
      .crossJoin(broadcast(stats))
      // all scaled-integer: rel len x1000, norm x1000, denom x1000,
      // tf-part x1000, idf in 1/1 bits of log2(64N/df)
      .withColumn("avg_x100", expr("total_len * 100 div n_docs"))
      .withColumn("rel_x1000", expr("len * 100000 div avg_x100"))
      .withColumn("norm_x1000", expr("250 + (750 * rel_x1000) div 1000"))
      .withColumn("denom_x1000", expr("tf * 1000 + (12 * norm_x1000) div 10"))
      .withColumn("tfpart_x1000", expr("(tf * 2200 * 1000) div denom_x1000"))
      .withColumn("idf_bits",
        expr("length(bin((n_docs * 64) div df)) - 1").cast("long"))
      .groupBy("qid", "did")
      .agg(sum(expr("tfpart_x1000 * idf_bits")).as("score_x1000"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("score_x1000").desc, col("did"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("did"), col("score_x1000"))
  }
}
