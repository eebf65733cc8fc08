package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation — reference J4/A3
  * (`SkewedDataHandler.scala:26-65`): split a hot key, salt it, aggregate
  * (key, salt), then re-aggregate by key.
  *
  * On Spark this is normally unnecessary: counts already run as partial →
  * final HashAggregate (map-side combine absorbs key skew), and AQE splits
  * skewed shuffle partitions at runtime. This utility is the documented
  * fallback for pathological cases (e.g. a single key that dominates even
  * after partial aggregation when the aggregation state per key is large).
  */
object SkewedAgg {

  /** Count rows per `keys` via an explicit salt from `saltSource`
    * (any well-distributed column or expression, e.g. a row id). Result is
    * identical to `df.groupBy(keys).count()`.
    */
  def saltedCount(
      df: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      numSalts: Int,
      countName: String = "cnt"): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    val salted = df.withColumn("__salt", pmod(saltSource, lit(numSalts)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__partial").as(countName))
  }
}
