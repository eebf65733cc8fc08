package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric profiling — reference A10 (`ReadParquet.scala:166-172`,
  * `df.describe`) re-expressed with oracle-safe arithmetic.
  */
object Stats {

  /** Order-independent exact sum of a double column that carries
    * fixed-precision values: cast to decimal first so accumulation order
    * cannot perturb low bits (decimal addition is exact), then back to
    * double. A raw double sum differs between engines/partitionings in the
    * last ulps; this form is bit-stable. Safe because binary doubles are
    * never exact midpoints of scale>=1 decimals, so round-to-nearest agrees
    * across engines regardless of their midpoint rounding mode.
    * Precision 38 (not 18) so 64-bit-magnitude inputs — epoch nanos, hash
    * values — don't overflow the cast, which under ANSI mode fails the job.
    */
  def decimalSum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double")

  /** min/max/count/mean per requested numeric column, one scan (all
    * aggregates computed in a single Aggregate node, rows then unpivoted
    * driver-free with `stack`). Mean = exact decimal sum / count, both
    * IEEE-divided as double — deterministic across engines.
    */
  def describeNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__${c}_n"),
        min(col(c)).cast("double").as(s"__${c}_min"),
        max(col(c)).cast("double").as(s"__${c}_max"),
        // all-null column → count 0; guard the /0 (ANSI mode is on by
        // default in Spark 4 and would fail the job)
        when(count(col(c)) === 0, lit(null).cast("double"))
          .otherwise(decimalSum(col(c)) / count(col(c))).as(s"__${c}_mean"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `__${c}_n`, `__${c}_min`, `__${c}_max`, `__${c}_mean`")
      .mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) as (column_name, n, min_v, max_v, mean_v)")
  }
}
