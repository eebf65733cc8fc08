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
}
