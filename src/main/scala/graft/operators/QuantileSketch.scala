package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-bucketed quantile sketch — the quantiles member of the
  * mergeable-sketch family ([[CountMin]] = frequency, [[DistinctSketch]]
  * = cardinality, this = order statistics), using the HdrHistogram
  * bucketing scheme (Tene, public domain): a value keeps its top
  * `k` mantissa bits, so every bucket spans a `2^-k` relative-error
  * slice of its octave. Like the rest of the family it is built
  * PORTABLE — bucket ids are pure integer arithmetic (`length(bin(v))`
  * for floor(log2), one shift, one multiply) that an external engine
  * replays bit-for-bit, unlike `percentile_approx`'s opaque KLL binary.
  *
  * Bucket id for `v ≥ 0` with sub-bucket bits `k`:
  * {{{
  *   v < 2^k           : id = v                       (exact, width 1)
  *   v ∈ [2^e, 2^(e+1)): id = (e-k)·2^k + (v >> (e-k))
  * }}}
  * The two branches agree at `e = k`, the id is monotone in `v`, and a
  * bucket holding id covers `[lb, lb + 2^s)` with `s = (id >> k) - 1`,
  * `lb = (id - s·2^k) << s` — so any quantile answered from the sketch
  * carries a `< 2^-k` relative-error guarantee (exact below `2^k`).
  *
  * The bucket table IS the sketch: `count` is partially aggregable
  * (map-side combine — one row per bucket leaves each mapper), two
  * sketches merge by per-bucket sum, and the table is bounded at
  * `64·2^k` rows regardless of data volume, so per-segment sketches
  * roll up without rescanning history and the quantile walk is a
  * bounded-state window (both pinned in QuantileSketchSpec). At 100 TB
  * this answers p50/p99 in one scan + one tiny-table walk where an
  * exact percentile needs a global sort.
  */
object QuantileSketch {

  /** `(bucket, cnt)` over the non-negative values of `value` — one row
    * per occupied bucket, at most `64·2^k` rows total.
    */
  def build(df: DataFrame, value: Column, k: Int = 5): DataFrame = {
    require(k > 0 && k < 32, "sub-bucket bits must be in (0, 32)")
    val b = 1L << k
    df.select(value.cast("long").as("v"))
      .filter(col("v") >= 0)
      .selectExpr(
        s"""CASE WHEN v < ${b}L THEN v
           |     ELSE (CAST(length(bin(v)) AS BIGINT) - ${k + 1}) * ${b}L
           |          + shiftright(v, CAST(length(bin(v)) AS INT) - ${k + 1})
           |END AS bucket""".stripMargin)
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge any number of bucket tables: per-bucket sum. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("bucket")
      .agg(sum("cnt").as("cnt"))

  /** Grouped sketches: `(groupCols..., bucket, cnt)` — one bounded
    * bucket table per group, still one aggregation pass (map-side
    * combine collapses to ≤ 64·2^k rows per group per mapper).
    */
  def buildBy(df: DataFrame, groupCols: Seq[String], value: Column,
      k: Int = 5): DataFrame = {
    require(k > 0 && k < 32, "sub-bucket bits must be in (0, 32)")
    require(groupCols.nonEmpty)
    val b = 1L << k
    df.select(groupCols.map(col) :+ value.cast("long").as("v"): _*)
      .filter(col("v") >= 0)
      .withColumn("bucket", expr(
        s"""CASE WHEN v < ${b}L THEN v
           |     ELSE (CAST(length(bin(v)) AS BIGINT) - ${k + 1}) * ${b}L
           |          + shiftright(v, CAST(length(bin(v)) AS INT) - ${k + 1})
           |END""".stripMargin))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-group quantile envelopes: `(groupCols..., p, est_lb, est_ub)`.
    * Unlike the global walk, the cumulative window is PARTITIONED by the
    * group — no single-task stage; each group's walk touches only its
    * own bounded bucket rows.
    */
  def quantilesBy(sketch: DataFrame, groupCols: Seq[String],
      percentiles: Seq[Int], k: Int = 5): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      "percentiles must be integers in [1, 100]")
    val spark = sketch.sparkSession
    import spark.implicits._
    val b = 1L << k
    val cum = sketch.withColumn("cum", sum("cnt").over(
      Window.partitionBy(groupCols.map(col): _*).orderBy("bucket")))
    val n = cum.groupBy(groupCols.map(col): _*).agg(max("cum").as("n"))
    val targets = n
      .crossJoin(broadcast(percentiles.toDF("p")))
      .select(groupCols.map(col) :+ col("p").cast("long").as("p") :+
        expr("(n * p + 99) div 100").as("target"): _*)
    targets.join(cum, groupCols)
      .where(col("cum") >= col("target"))
      .groupBy(groupCols.map(col) :+ col("p"): _*)
      .agg(min("bucket").as("bucket"))
      .selectExpr(groupCols ++ Seq("p",
        s"CASE WHEN bucket < ${b}L THEN bucket ELSE " +
          s"shiftleft(bucket - (shiftright(bucket, $k) - 1) * ${b}L, " +
          s"CAST(shiftright(bucket, $k) - 1 AS INT)) END AS est_lb",
        s"CASE WHEN bucket < ${b}L THEN bucket ELSE " +
          s"shiftleft(bucket - (shiftright(bucket, $k) - 1) * ${b}L + 1, " +
          s"CAST(shiftright(bucket, $k) - 1 AS INT)) - 1 END AS est_ub"): _*)
  }

  /** Quantile estimates from a sketch, one row per requested integer
    * percentile: `(p, est_lb, est_ub)` where the true p-th percentile
    * (rank `ceil(p·n/100)`, the inclusive nearest-rank definition) is
    * guaranteed inside `[est_lb, est_ub]`. Integer arithmetic
    * throughout — the rank target is `(n·p + 99) div 100`, never a
    * float multiply. The cumulative walk is a single-partition window
    * over the bounded bucket table (≤ 64·2^k rows), not the data.
    */
  def quantiles(sketch: DataFrame, percentiles: Seq[Int], k: Int = 5): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      "percentiles must be integers in [1, 100]")
    val spark = sketch.sparkSession
    import spark.implicits._
    val b = 1L << k
    val cum = sketch
      .withColumn("cum", sum("cnt").over(Window.orderBy("bucket")))
    val n = cum.agg(max("cum").as("n"))
    val targets = percentiles.toDF("p")
      .crossJoin(broadcast(n))
      .select(col("p").cast("long").as("p"),
        expr("(n * p + 99) div 100").as("target"))
    targets.join(cum, col("cum") >= col("target"))
      .groupBy("p")
      .agg(min("bucket").as("bucket"))
      .selectExpr("p",
        s"CASE WHEN bucket < ${b}L THEN bucket ELSE " +
          s"shiftleft(bucket - (shiftright(bucket, $k) - 1) * ${b}L, " +
          s"CAST(shiftright(bucket, $k) - 1 AS INT)) END AS est_lb",
        s"CASE WHEN bucket < ${b}L THEN bucket ELSE " +
          s"shiftleft(bucket - (shiftright(bucket, $k) - 1) * ${b}L + 1, " +
          s"CAST(shiftright(bucket, $k) - 1 AS INT)) - 1 END AS est_ub")
  }
}
