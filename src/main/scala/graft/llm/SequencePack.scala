package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning documents to fixed-size context windows
  * for training. This is the standard concat-and-split scheme: within
  * each group (e.g. source/shard), documents are laid out in a
  * deterministic order, token counts are prefix-summed, and a document
  * lands in the pack where its first token falls
  * (`pack = (cumTokens - tokens) div budget`). A document whose tokens
  * straddle a pack boundary is flagged (`crosses`) — the fraction of
  * straddlers is the metric packing pipelines watch, since straddled
  * documents get truncated or split at training time.
  *
  * Scale posture: one window (partitioned by the group key, ordered by
  * the id) — a single shuffle by group, linear scan per partition, no
  * driver state. Pack ids are per-group, so partitions stay bounded by
  * the largest group; production runs key on (source, shard) to bound
  * that. First-fit bin packing would need sequential state per group
  * (no prefix-sum form); concat-and-split is what large-scale trainers
  * actually use because it is exactly this parallel.
  */
object SequencePack {

  /** Per-document pack assignment: adds `tokens` (caller-supplied
    * expression result), `pack_id`, and `crosses` (1 when the doc
    * straddles a pack boundary, else 0).
    */
  def assign(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
    // `div` (not `/`): Spark's `/` on longs is double division, and the
    // cumulative token count of a large group can exceed double's exact
    // integer range.
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("pack_id", expr(s"(__cum - $tokensCol) div $budget"))
      .withColumn("crosses",
        expr(s"""CAST(CASE WHEN $tokensCol > 0
                 |  AND (__cum - 1) div $budget != (__cum - $tokensCol) div $budget
                 |THEN 1 ELSE 0 END AS BIGINT)""".stripMargin))
      .drop("__cum")
  }

  /** Pack-level summary: docs, tokens, and straddlers per pack. */
  def packs(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      tokensCol: String,
      budget: Long): DataFrame =
    assign(df, groupCol, orderCol, tokensCol, budget)
      .groupBy(col(groupCol), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("n_tokens"),
        sum(col("crosses")).as("n_straddlers"))
}
