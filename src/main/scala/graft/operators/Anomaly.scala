package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly flagging over ordered per-key integer series.
  * A point is anomalous when it sits more than `tau` standard deviations
  * from the mean of the `lookback` points BEFORE it (trailing window —
  * the point never contaminates its own baseline).
  *
  * The test is evaluated in exact integer arithmetic: with
  * S = Σx, Q = Σx², n over the trailing window,
  *   |x − μ| > τσ  ⇔  (n·x − S)² > τ²·(n·Q − S²)
  * (both sides are integers — multiply through by n²; σ² = (nQ−S²)/n²).
  * No floating point means the flag is bit-deterministic across engines,
  * partitionings, and reruns — an alerting pipeline can't tolerate flags
  * that flip on re-execution.
  *
  * Scale posture: one window per key (single shuffle), O(lookback) state
  * per row inside Spark's window frame machinery, no driver state.
  * Overflow bound: |x| ≤ 2^20 and lookback ≤ 2^10 keep (n·x − S)² under
  * 2^63; callers with wider values should pre-scale.
  */
object Anomaly {

  /** Adds `n_base` (trailing-window size actually available) and
    * `is_anomaly` (1/0; only rows with a full `lookback` baseline are
    * ever flagged). `valueCol` must be integral.
    */
  def flag(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCol: String,
      lookback: Int,
      tau: Int): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(-lookback, -1)
    val x = col(valueCol).cast("long")
    val s = sum(x).over(w)
    val q = sum(x * x).over(w)
    val n = count(x).over(w)
    val lhs = (n * x - s) * (n * x - s)
    val rhs = lit(tau.toLong * tau) * (n * q - s * s)
    df.withColumn("n_base", coalesce(n, lit(0L)))
      .withColumn("is_anomaly",
        when(col("n_base") === lookback && lhs > rhs, 1L).otherwise(0L))
  }
}
