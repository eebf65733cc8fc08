package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve utilities: interleave the low bits of several
  * dimension columns into one long so that sorting by the single z-value
  * clusters rows that are close in EVERY dimension at once.
  *
  * Why this matters at 100 TB: parquet data skipping is driven by
  * per-file/rowgroup min-max statistics, and a sort on one column makes
  * only that column's stats selective. Laying files out along the z-curve
  * makes min-max pruning effective for predicates on ANY of the interleaved
  * dimensions (the standard multi-dimensional clustering technique used by
  * lakehouse table formats). The whole computation is plain codegen'd
  * bit arithmetic — no UDF, no shuffle beyond the final range partition.
  *
  * The reference has no layout tooling (its sink is a plain overwrite,
  * Parquet-combiner `ParquetCombinerRDD.scala:193-207`); this extends the
  * sink surface the same way `PartitionedSink` does.
  */
object ZOrder {

  /** Bit-interleaved z-value of the given dimension columns: bit `b` of
    * dimension `i` lands at output position `b*dims + i`. Each dimension
    * is masked to its low `bits` bits — quantize/shift wider domains down
    * first or distinct values will collide, which degrades clustering but
    * never correctness (the z-value is a sort key, not an identifier).
    */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "at least one dimension")
    require(bits >= 1 && bits * dims.size <= 63,
      s"bits*dims must fit a positive long, got $bits*${dims.size}")
    val mask = (1L << bits) - 1L
    val terms = for {
      (dim, i) <- dims.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(
      shiftright(dim.cast("long").bitwiseAND(lit(mask)), b).bitwiseAND(lit(1L)),
      b * dims.size + i)
    // positions are pairwise distinct, so + is a bitwise OR
    terms.reduce(_ + _)
  }

  /** The same interleave as ANSI SQL text (DuckDB-compatible), generated
    * by the same loop so the Spark plan and the oracle compute the exact
    * same formula. `dims` are SQL expressions (already-quantized).
    */
  def zValueSql(dims: Seq[String], bits: Int): String = {
    // same guards as zValue: the two forms are documented as twins, so
    // arguments the Column form rejects must not silently produce
    // overflow-corrupted SQL here
    require(dims.nonEmpty, "at least one dimension")
    require(bits >= 1 && bits * dims.size <= 63,
      s"bits*dims must fit a positive long, got $bits*${dims.size}")
    val mask = (1L << bits) - 1L
    val terms = for {
      (dim, i) <- dims.zipWithIndex
      b <- 0 until bits
    } yield s"((((($dim) & $mask) >> $b) & 1) << ${b * dims.size + i})"
    terms.mkString("(", " + ", ")")
  }

  /** Cluster `df` along the z-curve of `dimCols` into `numFiles` output
    * partitions: range-partition on the z-value, then sort within each
    * partition, so every written file covers a compact z-range = a small
    * hyper-rectangle of the dimension space.
    */
  def cluster(df: DataFrame, dimCols: Seq[String], bits: Int, numFiles: Int): DataFrame = {
    val zCol = "__graft_z"
    df.withColumn(zCol, zValue(dimCols.map(col), bits))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol)
  }
}
