package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test assignment — the split step of a
  * training-data pipeline. Assignment is a pure function of
  * (salt, id): md5 the salted id, parse the first two hex digits as a
  * bucket in [0, 256), and map bucket ranges to named splits by
  * cumulative weight. Properties that matter at 100 TB:
  *   - stable under re-partitioning, re-ordering, and incremental
  *     appends (no RNG state, no row numbering — a doc keeps its split
  *     forever, which is what keeps eval sets uncontaminated as the
  *     corpus grows);
  *   - embarrassingly parallel (a per-row projection inside whole-stage
  *     codegen; no shuffle);
  *   - portable: md5 is bit-identical everywhere, so an oracle replays
  *     the assignment exactly (same device as q57's deterministic
  *     sample; DuckDB's twin of `conv(h, 16, 10)` is
  *     `CAST('0x' || h AS INT)`).
  */
object DatasetSplit {

  /** Bucket in [0, 256): the first two hex chars of md5("salt:id"). */
  def bucket(idCol: Column, salt: String): Column =
    conv(substring(md5(concat(lit(s"$salt:"), idCol.cast("string"))), 1, 2),
      16, 10).cast("long")

  /** Adds `splitCol` naming the assigned split. `splits` are
    * (name, weight) pairs; weights are normalized over 256 buckets with
    * cumulative bounds rounded per prefix (a 0.8/0.1/0.1 spec maps to
    * buckets [0,205) / [205,230) / [230,256)).
    */
  def assign(
      df: DataFrame,
      idCol: String,
      salt: String,
      splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0)(_ + _._2 / total).tail
      .map(f => math.round(f * 256).toInt)
    val b = bucket(col(idCol), salt)
    val assigned = splits.map(_._1).zip(bounds).init.foldRight(
      lit(splits.last._1): Column) { case ((name, bound), rest) =>
      when(b < bound, lit(name)).otherwise(rest)
    }
    df.withColumn(splitCol, assigned)
  }
}
