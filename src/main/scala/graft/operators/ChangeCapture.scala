package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture between table snapshots: extract a changeset by
  * diffing two snapshots, and apply a changeset to a target (MERGE INTO
  * semantics) — the two halves of a lakehouse ingestion loop. The
  * reference engine has no incremental story at all (every run recomputes
  * from full inputs, reference `ParquetCombinerRDD.scala` pipeline);
  * these operators are what replaces that full recompute when the corpus
  * is a maintained table rather than a one-shot input.
  *
  * Scale posture: each operator is ONE full-outer shuffle join on the
  * key — no driver-side state, no multi-pass. On a bucketed/partitioned
  * target the join co-locates and the shuffle disappears; with AQE the
  * usual skew handling applies. Change classification and row resolution
  * are per-row projections (whole-stage codegen), so cost is join cost.
  *
  * Both operators rename one side to reserved `__`-prefixed columns
  * before joining: a changeset is routinely DERIVED from the target
  * (snapshots of the same table, transformed rows), and attribute-id
  * reuse across such self-derived frames is exactly what trips Spark's
  * ambiguous-self-join resolution. Disjoint names make the join
  * unambiguous by construction.
  */
object ChangeCapture {

  /** Diff two snapshots keyed by `keys`, comparing `compareCols`:
    * emits one row per changed key with `change` ∈
    * insert (key only in `newSnap`), delete (key only in `oldSnap`),
    * update (both present and some compare column differs null-safely).
    * Unchanged keys are dropped. Output columns: the keys (coalesced
    * across sides), `change`, then `old_<c>` / `new_<c>` per compare
    * column (null on the absent side).
    */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val cols = keys ++ compareCols
    val o = oldSnap.select(cols.map(c => col(c).as(s"__o_$c")): _*)
    val n = newSnap.select(cols.map(c => col(c).as(s"__n_$c")): _*)
    val cond = keys.map(k => col(s"__o_$k") === col(s"__n_$k")).reduce(_ && _)
    val oKey = col(s"__o_${keys.head}")
    val nKey = col(s"__n_${keys.head}")
    val differs = compareCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c"))).reduce(_ || _)
    val change = when(oKey.isNull, lit("insert"))
      .when(nKey.isNull, lit("delete"))
      .when(differs, lit("update"))
    val keyCols = keys.map(k => coalesce(col(s"__o_$k"), col(s"__n_$k")).as(k))
    val valCols = compareCols.flatMap(c =>
      Seq(col(s"__o_$c").as(s"old_$c"), col(s"__n_$c").as(s"new_$c")))
    o.join(n, cond, "full_outer")
      .select((keyCols :+ change.as("change")) ++ valCols: _*)
      .filter(col("change").isNotNull)
  }

  /** Apply a changeset to a target table — MERGE INTO semantics in one
    * full-outer join. `changes` must carry the target's columns plus
    * `opCol` ∈ {"I","U","D"}:
    *   - matched + U → the change row's values replace the target row;
    *   - matched + D → the target row is dropped;
    *   - matched + I → idempotent no-op (target row kept — a re-delivered
    *     insert must not duplicate or clobber);
    *   - unmatched + I or U → the change row is inserted (U upserts);
    *   - unmatched + D → no-op (delete of a missing key).
    * `changes` must have at most one row per key (standard MERGE
    * precondition; enforce upstream with [[Dedup.byKeyMin]] if the feed
    * can re-deliver).
    */
  def merge(
      target: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      opCol: String): DataFrame = {
    val tCols = target.columns.toSeq
    val c = changes.select((tCols :+ opCol).map(cn => col(cn).as(s"__c_$cn")): _*)
    val cond = keys.map(k => col(k) === col(s"__c_$k")).reduce(_ && _)
    val tKey = col(keys.head)
    val cKey = col(s"__c_${keys.head}")
    val op = col(s"__c_$opCol")
    val dropped = op === "D" // matched-delete, or delete of a missing key
    val takeChange = cKey.isNotNull && op =!= "D" &&
      (tKey.isNull || op === "U")
    target.join(c, cond, "full_outer")
      .filter(!coalesce(dropped, lit(false)))
      .select(tCols.map(cn =>
        when(takeChange, col(s"__c_$cn")).otherwise(col(cn)).as(cn)): _*)
  }
}
