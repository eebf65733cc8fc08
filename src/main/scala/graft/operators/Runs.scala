package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Run-length collapse over ordered per-key sequences — the core of an
  * SCD-2 (slowly-changing-dimension) build: consecutive rows with the
  * same attribute value collapse into one versioned validity run. Also
  * the "islands" half of the classic gaps-and-islands pair (q34's
  * sessionizer is the gaps half, cutting on time distance; this cuts on
  * value change).
  *
  * Mechanism: lag() marks rows whose value differs from their
  * predecessor (null-safely), a running sum of marks numbers the runs,
  * and a groupBy collapses each run. Two shuffles by the key (window +
  * aggregation, same partitioning — with matched partitioning the second
  * exchange is elided), no driver state, partitions bounded by the
  * largest single key's history.
  */
object Runs {

  /** Collapse consecutive equal `valueCol` rows per `keyCol` (ordered by
    * `orderCols`) into one row per run: key, run number (`version`,
    * 1-based), the value, run length `n_rows`, and the first/last order
    * column value of the run (the SCD-2 validity interval's open edge is
    * the next run's `run_start`).
    */
  def collapse(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    // First row is explicitly a run start: the lag-is-distinct test alone
    // would miss it when the sequence begins with a null value
    // (null <=> null is true).
    val changed = when(row_number().over(w) === 1, 1L)
      .when(!(lag(col(valueCol), 1).over(w) <=> col(valueCol)), 1L)
      .otherwise(0L)
    df.withColumn("__chg", changed)
      .withColumn("version", sum(col("__chg")).over(w))
      .groupBy(col(keyCol), col("version"))
      .agg(
        first(col(valueCol)).as(valueCol),
        count(lit(1)).as("n_rows"),
        min(col(orderCols.head)).as("run_start"),
        max(col(orderCols.head)).as("run_end"))
  }
}
