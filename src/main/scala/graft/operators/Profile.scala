package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling + snapshot drift detection — the data-quality gate a
  * pipeline runs between ingests: per-column row/null/distinct counts and
  * value envelopes, and the column-level diff of two snapshots (schema
  * adds/removals plus metric drift), with every rate an exact integer in
  * basis points so reports replay bit-for-bit relationally.
  *
  * Scale posture: `profile` is ONE wide aggregation pass over the data
  * (count/null-count/min/max combine map-side; the exact distinct counts
  * expand k× for k profiled columns — the documented trade for an exact,
  * oracle-replayable report; at 100 TB swap `countDistinct` for
  * `approx_count_distinct` and the report stays one pass with no
  * expand). The wide single row then pivots to one row per column
  * driver-side-free (a literal `stack`).
  */
object Profile {

  /** One row per profiled column:
    * (column, n_rows, n_null, n_distinct, min_v, max_v) — the value
    * envelope is stringified so mixed-type snapshots stack into one
    * frame (nulls-only columns profile as NULL envelopes).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = Seq(count(lit(1)).cast("long").as("n_rows")) ++ cols.flatMap { c =>
      Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"${c}__null"),
        countDistinct(col(c)).cast("long").as(s"${c}__dist"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__null`, `${c}__dist`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    wide.select(
      col("n_rows"),
      expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_null, n_distinct, min_v, max_v)"))
      .select("column_name", "n_rows", "n_null", "n_distinct", "min_v", "max_v")
  }

  /** Column-level drift between two profiles: status
    * added/removed/kept, both sides' metrics (zeros for the absent
    * side), and the null-rate delta in exact basis points.
    */
  def drift(before: DataFrame, after: DataFrame): DataFrame = {
    val a = before.select(col("column_name"),
      col("n_rows").as("rows_a"), col("n_null").as("null_a"),
      col("n_distinct").as("dist_a"))
    val b = after.select(col("column_name"),
      col("n_rows").as("rows_b"), col("n_null").as("null_b"),
      col("n_distinct").as("dist_b"))
    a.join(b, Seq("column_name"), "full_outer")
      .select(
        col("column_name"),
        when(col("rows_a").isNull, "added")
          .when(col("rows_b").isNull, "removed")
          .otherwise("kept").as("status"),
        coalesce(col("rows_a"), lit(0L)).as("rows_a"),
        coalesce(col("rows_b"), lit(0L)).as("rows_b"),
        coalesce(col("null_a"), lit(0L)).as("null_a"),
        coalesce(col("null_b"), lit(0L)).as("null_b"),
        coalesce(col("dist_a"), lit(0L)).as("dist_a"),
        coalesce(col("dist_b"), lit(0L)).as("dist_b"))
      .withColumn("null_bp_a",
        expr("CASE WHEN rows_a = 0 THEN 0 ELSE null_a * 10000 div rows_a END"))
      .withColumn("null_bp_b",
        expr("CASE WHEN rows_b = 0 THEN 0 ELSE null_b * 10000 div rows_b END"))
      .withColumn("null_delta_bp", col("null_bp_b") - col("null_bp_a"))
  }
}
