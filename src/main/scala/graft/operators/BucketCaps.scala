package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared hot-bucket guard for LSH self-joins: drop (key) buckets holding
  * more than `max` rows before a bucket self-join, bounding worst-case
  * fan-out at max² per bucket instead of quadratic in the corpus
  * (degenerate content — empty docs, boilerplate, zero vectors — lands
  * whole populations in one bucket otherwise). `max <= 0` disables.
  */
object BucketCaps {
  def capBuckets(df: DataFrame, keys: Seq[Column], max: Long): DataFrame =
    if (max <= 0) df
    else df
      .withColumn("__bsz", count(lit(1)).over(Window.partitionBy(keys: _*)))
      .filter(col("__bsz") <= max)
      .drop("__bsz")

  /** The buckets `capBuckets` WOULD drop: (keys..., occupancy) for every
    * bucket over `max`. Capping trades recall for boundedness silently;
    * this makes the trade observable — a non-empty report means results
    * diverge from an uncapped run (and, for a persisted index, that
    * incremental results may diverge from a single-pass full-corpus run).
    */
  def overflowBuckets(df: DataFrame, keys: Seq[Column], max: Long): DataFrame =
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("occupancy"))
      .filter(if (max <= 0) lit(false) else col("occupancy") > max)
}
