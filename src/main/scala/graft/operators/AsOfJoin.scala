package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single right row with the
  * greatest `rightTs <= leftTs` for the same key (time-series "most
  * recent state at event time": price at trade time, last login before a
  * purchase). Spark has no native as-of join; the naive formulation is a
  * range join + per-left-row argmax, which explodes quadratically inside
  * skewed keys.
  *
  * Implementation is the single-pass union trick: tag both sides, union,
  * and take a running `last(right_payload, ignoreNulls)` over a
  * (key, time) window. Exactly ONE shuffle (by key) and one partition
  * sort — the same cost envelope as any windowed aggregation, no join
  * fan-out at all, so it survives 100 TB with skewed keys the same way
  * every other window here does. (The union is what makes this linear:
  * each side is scanned once, and the window merge-sorts them.)
  *
  * Determinism: at equal (key, ts) the window orders right rows before
  * left rows (a state change AT the event's own timestamp is visible to
  * it) and orders duplicate right rows by their payload struct, so the
  * lexicographically-greatest payload wins — a total order, reproducible
  * across engines (callers wanting DuckDB-`ASOF`-comparable output
  * should still dedup right to one row per (key, ts); ASOF leaves that
  * tie unspecified).
  */
object AsOfJoin {

  /** Left columns pass through unchanged; right columns (except the key)
    * are appended with `payloadPrefix`, null when no right row is at or
    * before the left row's timestamp.
    */
  def lastAtOrBefore(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payloadPrefix: String = "asof_"): DataFrame = {
    val rPayloadCols = right.columns.filterNot(_ == rightKey).toSeq
    val rp = struct(rPayloadCols.map(col): _*)
    val rpType = right.select(rp.as("p")).schema("p").dataType
    val lp = struct(left.columns.map(col): _*)
    val lpType = left.select(lp.as("p")).schema("p").dataType

    val taggedR = right.select(
      col(rightKey).as("__k"), col(rightTs).as("__t"),
      lit(1).as("__isR"), rp.as("__rp"), lit(null).cast(lpType).as("__lp"))
    val taggedL = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__t"),
      lit(0).as("__isR"), lit(null).cast(rpType).as("__rp"), lp.as("__lp"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__isR").desc, col("__rp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = taggedR.union(taggedL)
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__isR") === 0)

    val leftOut = left.columns.toSeq.map(c => col(s"__lp.$c").as(c))
    val rightOut = rPayloadCols.map(c => col(s"__m.$c").as(s"$payloadPrefix$c"))
    matched.select(leftOut ++ rightOut: _*)
  }

  /** Same semantics via the NATIVE whole-operator path: a custom logical
    * node planned by [[graft.plans.AsOfJoinStrategy]] into a streaming
    * sort-merge [[graft.plans.AsOfJoinExec]]. Both formulations shuffle
    * each side once by key, but the merge streams per-partition with O(1)
    * state — no unioned null-padded rows, no window buffer — so prefer
    * this one at scale; [[lastAtOrBefore]] stays as the composed
    * executable spec (AsOfJoinSpec pins them equal).
    *
    * Input column names must be disjoint; right rows sharing (key, ts)
    * should be pre-deduped for full determinism (same caveat as the
    * window form's payload tie-break, and as DuckDB ASOF).
    */
  def lastAtOrBeforeMerge(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payloadPrefix: String = "asof_"): DataFrame = {
    import graft.plans.{AsOfJoinNode, AsOfJoinPruningRule, AsOfJoinStrategy}
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(AsOfJoinPruningRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfJoinPruningRule
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTs), attr(rPlan, rightTs))
    require(lk.dataType == rk.dataType,
      s"key type mismatch: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"timestamp type mismatch: ${lt.dataType} vs ${rt.dataType}")
    val joined = org.apache.spark.sql.graft.PlanBridge.ofRows(
      spark, AsOfJoinNode(lPlan, rPlan, lk, rk, lt, rt))
    val leftOut = left.columns.toSeq.map(col)
    val rightOut = right.columns.toSeq.filterNot(_ == rightKey)
      .map(c => col(c).as(s"$payloadPrefix$c"))
    joined.select(leftOut ++ rightOut: _*)
  }
}
