package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Spark 4 keeps `Dataset.ofRows` (logical plan → DataFrame) behind
  * `private[sql]` in the classic implementation; re-exported here for
  * graft's custom logical operators (same pattern as [[ColumnBridge]]).
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
