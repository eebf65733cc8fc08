package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Layout-aware parquet sink: hive-style partition directories plus
  * sorted row groups — the write-side half of scan efficiency at 100 TB.
  *
  *  - `partitionBy` gives directory-level pruning: a reader's filter on
  *    a partition column eliminates whole directories before any IO
  *    (visible as `PartitionFilters` on the scan, vs `PushedFilters`
  *    which still opens files to check row-group stats).
  *  - `repartition(partitionCols)` routes each hive partition's rows to
  *    one task, so a P-partition write emits O(P) files instead of
  *    O(tasks × P) small files — the classic small-files failure at
  *    scale.
  *  - `sortWithinPartitions(sortCols)` clusters values so parquet
  *    row-group min/max stats become selective for range predicates on
  *    the sort key (pushed filters then skip most row groups).
  */
object PartitionedSink {

  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Seq.empty,
      mode: String = "overwrite"): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode(mode)
      .parquet(path)
}
