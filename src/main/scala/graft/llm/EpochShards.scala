package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-order planning: a deterministic global shuffle of the corpus
  * per epoch plus greedy token-budget sharding — the pass that turns a
  * deduped corpus into the ordered, size-balanced shards a trainer
  * streams. Every decision is pure hash arithmetic, so the plan is
  * reproducible run-to-run and append-stable per epoch seed.
  *
  *  - **Epoch order**: priority = md5("ep<epoch>:<id>") — a different
  *    deterministic permutation per epoch (the md5 idiom shared with
  *    DatasetSplit / the q133 priority sample).
  *  - **Sharding**: docs are packed in priority order; a doc starts in
  *    shard floor(cum_before / budget) where cum_before is the sum of
  *    weights of all earlier docs. All shards except the last hold
  *    >= budget - max_doc_weight + 1 and < budget + max_doc_weight
  *    tokens — balanced without any sequential pass.
  *
  * The global cumulative sum is the scale problem: a naive
  * `Window.orderBy(priority)` funnels the corpus through ONE task. This
  * uses the two-phase form instead: the first two hex chars of the
  * priority are a PREFIX of the sort key, so they induce 256 ordered
  * range buckets; per-(epoch, bucket) totals (a <= 256·epochs row table)
  * get prefix offsets from a tiny partitioned window, broadcast back,
  * and the per-bucket cumsum windows are partitioned by (epoch, bucket)
  * — no single-task stage anywhere, identical result (the oracle proves
  * the equivalence against a literal global window).
  */
object EpochShards {

  /** Per-(epoch, doc) shard assignment: (epoch, idCol, w, shard). */
  def plan(
      docs: DataFrame,
      idCol: String,
      weightCol: Column,
      epochs: Int,
      budget: Long): DataFrame = {
    require(epochs >= 1 && budget >= 1)
    val base = docs
      .select(col(idCol), weightCol.cast("long").as("w"))
      .select(col(idCol), col("w"),
        explode(sequence(lit(0L), lit(epochs - 1L))).as("epoch"))
      .withColumn("pr", md5(concat(lit("ep"), col("epoch").cast("string"),
        lit(":"), col(idCol).cast("string"))))
      .withColumn("bucket", conv(substring(col("pr"), 1, 2), 16, 10)
        .cast("long"))
    val offsets = base
      .groupBy("epoch", "bucket")
      .agg(sum("w").as("bw"))
      .withColumn("off", coalesce(
        sum("bw").over(Window.partitionBy("epoch").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("epoch", "bucket", "off")
    val cumIn = sum("w").over(
      Window.partitionBy("epoch", "bucket").orderBy("pr", idCol))
    base
      .join(broadcast(offsets), Seq("epoch", "bucket"))
      .withColumn("cum_before", col("off") + cumIn - col("w"))
      .select(col("epoch"), col(idCol), col("w"),
        expr(s"cum_before div $budget").as("shard"))
  }
}
