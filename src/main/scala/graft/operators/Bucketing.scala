package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the "pay the shuffle once" path for joins and
  * aggregations that repeat on the same key (SURVEY.md §4: co-located
  * joins via bucketing).
  *
  * Writing a table bucketed by the join key hash-partitions its files on
  * disk; any later equi-join or aggregation on that key reads the
  * buckets as its required distribution and plans NO Exchange. At 100 TB
  * that converts every repeated fact-to-fact join from a full shuffle
  * into a local merge — the single biggest structural saving available
  * to a recurring pipeline.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table (parquet). Both
    * sides of a future join must use the same bucket count and keys.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      numBuckets: Int,
      sortKeys: Seq[String] = Seq.empty): Unit = {
    require(keys.nonEmpty && numBuckets > 0)
    val sorted = if (sortKeys.isEmpty) keys else sortKeys
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .saveAsTable(table)
  }

  /** Equi-join two same-bucketed tables on their bucket keys — plans as a
    * shuffle-free SortMergeJoin when bucket layouts line up.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
