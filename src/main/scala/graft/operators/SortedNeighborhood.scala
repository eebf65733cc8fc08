package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Iterate.MaterializeOps

/** Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95) — the
  * record-linkage candidate generator orthogonal to LSH banding: sort
  * the corpus by a blocking key, slide a window of `w` positions, and
  * emit every pair that co-occurs in some window. Candidates are
  * O(n·w) by construction regardless of value skew — where hash/LSH
  * blocking degenerates on a hot key, sorted-neighborhood degrades
  * only in recall (similar records whose keys sort far apart), which
  * is why production linkage stacks run both and union the pairs.
  *
  * Global positions use the two-phase scheme (the [[graft.llm.EpochShards]]
  * cumsum idiom adapted to range order): range-repartition on the sort
  * key, count per partition (a partition-count-sized driver collect,
  * same class as the zone-map manifest), broadcast the prefix offsets
  * back, and take partition-LOCAL row_numbers — no single-partition
  * global window anywhere. Pairing then block-joins positions at
  * `pos div w` granularity (each left row probes its own and the next
  * block), so the join fan-out is bounded by 2w per row.
  *
  * `sortCols` must be a TOTAL order (append the id column) — ties that
  * straddle a range boundary would otherwise make positions, and thus
  * the candidate set, nondeterministic.
  */
object SortedNeighborhood {

  /** Ordered candidate pairs `(id_a, id_b, pos_a, pos_b)` with
    * `1 <= pos_b - pos_a <= w` in the `sortCols` total order
    * (positions 0-based).
    */
  def candidates(
      df: DataFrame,
      idCol: String,
      sortCols: Seq[Column],
      w: Int,
      numPartitions: Int = 32): DataFrame = {
    require(w >= 1 && numPartitions >= 1)
    val keyCols = sortCols.zipWithIndex.map { case (c, i) => c.as(s"__k$i") }
    val keyed = df.select(col(idCol).as("__id") +: keyCols: _*)
    val ks = keyed.columns.filter(_.startsWith("__k")).toSeq.map(col)
    // Pin the range partitioning ONCE (eager localCheckpoint) before
    // either phase reads it: RangePartitioner samples with a seed
    // derived from the per-execution RDD id, so re-executing the
    // repartition in two separate jobs (the size collect below, then
    // the row_number job) could draw DIFFERENT range boundaries —
    // broadcast prefix offsets would then mismatch the partitions rows
    // actually land in, silently corrupting global positions.
    val parted = keyed
      .repartitionByRange(numPartitions, ks: _*)
      .withColumn("__pid", spark_partition_id())
      .materialized
    // phase 1: partition sizes -> prefix offsets (numPartitions rows)
    val sizes = parted.groupBy("__pid").count()
      .orderBy("__pid").collect()
    var acc = 0L
    val offs = sizes.map { r =>
      val o = (r.getInt(0), acc); acc += r.getLong(1); o
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offsDf = broadcast(offs.toDF("__pid", "__off"))
    // phase 2: partition-local row_number + broadcast offset = global pos
    // (range partitioning guarantees every row of partition p sorts
    // before every row of p+1, so local rank + prefix count IS the
    // global rank — boundary placement cancels out)
    val pos = parted
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(ks: _*)))
      .join(offsDf, "__pid")
      .select(col("__id"), (col("__off") + col("__rn") - 1).as("__pos"))
    val a = pos
      .select(col("__id").as("id_a"), col("__pos").as("pos_a"))
      .withColumn("__blk", explode(array(
        expr(s"pos_a div $w"), expr(s"pos_a div $w") + 1)))
    val b = pos
      .select(col("__id").as("id_b"), col("__pos").as("pos_b"),
        expr(s"__pos div $w").as("__blk"))
    a.join(b, "__blk")
      .filter(col("pos_b") > col("pos_a") &&
        col("pos_b") <= col("pos_a") + w)
      .select("id_a", "id_b", "pos_a", "pos_b")
  }
}
