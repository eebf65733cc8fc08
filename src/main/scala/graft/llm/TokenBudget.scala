package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection: fill a fixed training-token budget
  * with the best documents first — the pass that turns "we scored the
  * corpus" into "this is the 10B-token dataset we train on". Documents
  * are ranked by `qualityCol` descending (ties broken by id, so the
  * selection is a deterministic OBJECT, not an arbitrary topset), their
  * token weights are prefix-summed in rank order, and the strict prefix
  * whose cumulative weight stays within `budget` is kept. Strict-prefix
  * semantics (the first overflowing doc and everything ranked below it
  * are out) keep the result engine-replayable and monotone: raising the
  * budget only ever ADDS documents.
  *
  * The global rank-order cumulative sum is the scale hazard — a naive
  * `Window.orderBy(quality)` funnels the corpus through ONE task. This
  * uses the [[EpochShards]] two-phase form: `floor((1-q)·256)` is an
  * order-consistent PREFIX of the sort key, so per-bucket totals (a
  * ≤256-row table) get prefix offsets from a tiny window, broadcast
  * back, and the heavy cumsum windows are partitioned per bucket — no
  * single-task stage, provably identical to the literal global window
  * (the oracle runs the literal form).
  */
object TokenBudget {

  /** Selected docs as `(idCol, n_tokens, cum_tokens)`, rank order by
    * (`qualityCol` desc, id asc). `qualityCol` must be in [0, 1]
    * (quality ratios are); NULL quality ranks last (0.0).
    */
  def fill(
      docs: DataFrame,
      idCol: String,
      weightCol: Column,
      qualityCol: Column,
      budget: Long): DataFrame =
    fillPerGroup(docs, idCol, weightCol, qualityCol, budget, Seq.empty)

  /** [[fill]] with an INDEPENDENT budget per group (mixture allocation
    * in TOKENS, the unit trainers actually budget in — q198's
    * per-source quotas count docs, which over-serves sources of long
    * documents): each `groupCols` combination fills its own strict
    * quality-ranked prefix up to `budget`. Same two-phase cumsum, with
    * every window additionally keyed by the group — the offsets table
    * is ≤ 256·groups rows, still a broadcast.
    */
  def fillPerGroup(
      docs: DataFrame,
      idCol: String,
      weightCol: Column,
      qualityCol: Column,
      budget: Long,
      groupCols: Seq[String]): DataFrame = {
    require(budget >= 1)
    val g = groupCols.map(col)
    val base = docs
      .select(g :+ col(idCol) :+ weightCol.cast("long").as("w") :+
        (lit(1.0) - coalesce(qualityCol, lit(0.0))).as("key"): _*)
      .withColumn("bucket",
        least(floor(col("key") * 256).cast("long"), lit(255L)))
    val offsets = base
      .groupBy(g :+ col("bucket"): _*)
      .agg(sum("w").as("bw"))
      .withColumn("off", coalesce(
        sum("bw").over(Window.partitionBy(g: _*).orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(g :+ col("bucket") :+ col("off"): _*)
    val cumIn = sum("w").over(
      Window.partitionBy(g :+ col("bucket"): _*)
        .orderBy(col("key"), col(idCol)))
    base
      .join(broadcast(offsets), groupCols :+ "bucket")
      .withColumn("cum_tokens", col("off") + cumIn)
      .filter(col("cum_tokens") <= budget)
      .select(g :+ col(idCol) :+ col("w").as("n_tokens") :+
        col("cum_tokens"): _*)
  }
}
