package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped top-K with sequential ranking — reference A4/O1/O2
  * (`Aggregations.scala:54-67`): per-group sort desc, take K, ranks "1"..k.
  *
  * The reference materializes each group in memory (`groupByKey` +
  * in-memory sort) — its documented scalability cliff. Here the same
  * semantics are `row_number()` over a window plus a rank filter, which
  * Spark ≥3.5 rewrites to `WindowGroupLimit`: each map task keeps only K
  * rows per group before the shuffle, so the operator scales to arbitrary
  * group sizes.
  */
object TopK {

  /** One row per (group, rank<=k), rank column is an IntegerType named
    * `rankCol`, strictly sequential 1..k within each group (row_number,
    * not rank/dense_rank — ties still get distinct ranks, reference
    * `ParquetCombinerRDDIntegrationTest.scala:253-264`).
    *
    * `orderCols` should be a total order within each group if the caller
    * needs deterministic output (append a unique tie-break column).
    * NOTE: the rank filter is planted directly over the window projection
    * so Catalyst's InferWindowGroupLimit can push the limit map-side.
    */
  def perGroup(
      df: DataFrame,
      partitionCols: Seq[Column],
      orderCols: Seq[Column],
      k: Int,
      rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}
