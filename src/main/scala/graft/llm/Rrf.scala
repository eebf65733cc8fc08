package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR'09) — the
  * standard way to combine heterogeneous retrieval lists (sparse BM25,
  * dense KNN, ...) without score calibration: each list contributes
  * 1/(k0 + rank) to every document it ranks, and documents are re-ranked
  * by the summed contribution. Only RANKS cross the fusion boundary, so
  * incomparable score scales (BM25 integers vs cosine floats) never mix.
  *
  * Exact-arithmetic form: contribution is the scaled integer
  * `1e6 div (k0 + rank)` — floor division, so the fused score replays
  * bit-for-bit relationally (the same discipline as Bm25/Hits/BigramLm).
  * k0 = 60 is the paper's constant.
  *
  * Scale: one hash aggregation on (qid, id) over the concatenated lists
  * (size = Σ per-list k·|queries|, tiny relative to any corpus), then a
  * grouped top-k via the WindowGroupLimit-pinned [[graft.operators.TopK]]
  * path. No per-corpus work happens here at all — fusion cost depends
  * only on the retrieval depth, which is why RRF is the production
  * default for hybrid search at any corpus size.
  */
object Rrf {

  /** Fuse ranked lists `(qid, id, rank)` (rank 1-based within each list;
    * rows from all lists unioned together, one row per list membership).
    * Returns (qid, fused_rank, id, rrf_x1e6, n_lists): top-`topK` per
    * qid by fused score, ties broken by id; `n_lists` is how many input
    * lists ranked the document — the agreement signal callers often
    * threshold on.
    */
  def fuse(lists: DataFrame, k0: Int = 60, topK: Int = 5): DataFrame = {
    require(k0 >= 0 && topK >= 1)
    val scored = lists
      .select(col("qid"), col("id"),
        expr(s"1000000 div ($k0 + rank)").as("contrib"))
      .groupBy("qid", "id")
      .agg(sum("contrib").as("rrf_x1e6"),
        count(lit(1)).as("n_lists"))
    graft.operators.TopK.perGroup(scored,
        Seq(col("qid")),
        Seq(col("rrf_x1e6").desc, col("id").asc),
        k = topK, rankCol = "fused_rank")
      .select(col("qid"), col("fused_rank").cast("long").as("fused_rank"),
        col("id"), col("rrf_x1e6"), col("n_lists"))
  }
}
