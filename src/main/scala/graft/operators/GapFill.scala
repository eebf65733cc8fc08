package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resample + gap fill: fixed time buckets per series,
  * missing buckets materialized from a `sequence` spine (no driver
  * loop), interior gaps linearly interpolated between the nearest
  * observed neighbors via IGNORE NULLS value-navigation windows.
  *
  * Determinism: the per-bucket aggregate is an order-independent
  * fixed-point LONG sum + count (quantized at `scale`); only the
  * per-row scalar math is IEEE double, so results replay bit-for-bit
  * in any engine (the q98 DuckDB oracle replays this exact plan).
  *
  * Scale posture: the spine join is per-series and the navigation
  * windows partition by series — a 100 TB corpus parallelizes per
  * series with no global sort anywhere. Bucket count per series is
  * bounded by the series' own time span, not corpus size.
  */
object GapFill {

  /** Resample `df` to `bucket`-sized buckets (a `date_trunc` unit,
    * e.g. "hour"/"day") per `seriesCol`, averaging `valueCol`
    * (quantized at `scale`), and linearly interpolate missing buckets.
    *
    * Output: (`seriesCol`, `b`, `n_obs`, `value_filled`, `src`) where
    * `src` is 'obs' | 'interp' | 'edge' ('edge' = no observed neighbor
    * on one side; unreachable when the spine spans observed min..max,
    * kept total for pre-supplied spines).
    */
  def linear(df: DataFrame, seriesCol: String, tsCol: String,
             valueCol: String, bucket: String = "hour",
             scale: Long = 1000L): DataFrame = {
    val step = expr(s"interval 1 $bucket")
    val hourly = df
      .groupBy(col(seriesCol), date_trunc(bucket, col(tsCol)).as("b"))
      // count(valueCol), not count(*): a NULL value contributes to
      // neither the sum nor the denominator, and an all-NULL bucket
      // reports n_obs=0 and fills like any other gap
      .agg(sum(round(col(valueCol) * scale).cast("long")).as("obs_fp"),
        count(col(valueCol)).as("n_obs"))
    val spine = hourly.groupBy(seriesCol)
      .agg(min(col("b")).as("b0"), max(col("b")).as("b1"))
      .select(col(seriesCol), explode(sequence(col("b0"), col("b1"), step)).as("b"))
    val past = Window.partitionBy(seriesCol).orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val future = Window.partitionBy(seriesCol).orderBy("b")
      .rowsBetween(1, Window.unboundedFollowing)
    val secs = (c: Column) => c.cast("long").cast("double")
    spine.join(hourly, Seq(seriesCol, "b"), "left")
      .withColumn("avg_v",
        col("obs_fp").cast("double") / (col("n_obs").cast("double") * scale.toDouble))
      .withColumn("pv", last(col("avg_v"), ignoreNulls = true).over(past))
      .withColumn("pt",
        last(when(col("avg_v").isNotNull, col("b")), ignoreNulls = true).over(past))
      .withColumn("nv", first(col("avg_v"), ignoreNulls = true).over(future))
      .withColumn("nt",
        first(when(col("avg_v").isNotNull, col("b")), ignoreNulls = true).over(future))
      .select(col(seriesCol), col("b"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        when(col("avg_v").isNotNull, col("avg_v"))
          .when(col("pv").isNotNull && col("nv").isNotNull,
            col("pv") + (col("nv") - col("pv")) *
              (secs(col("b")) - secs(col("pt"))) /
              (secs(col("nt")) - secs(col("pt"))))
          .as("value_filled"),
        when(col("avg_v").isNotNull, lit("obs"))
          .when(col("pv").isNotNull && col("nv").isNotNull, lit("interp"))
          .otherwise(lit("edge")).as("src"))
  }
}
