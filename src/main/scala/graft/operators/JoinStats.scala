package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight equi-join cardinality and skew profiling — answer "how
  * many rows will this join produce, and which keys dominate?" WITHOUT
  * running the join. For an inner equi-join the output cardinality is
  * EXACTLY Σ_k cA(k)·cB(k): two per-key count aggregations (two-phase,
  * map-side partial) joined on the key — the joined relation is
  * distinct-key-sized, typically orders of magnitude smaller than either
  * input — so the "estimate" is not an estimate at all, it is the exact
  * figure, at grouped-count cost.
  *
  * This is the guard a 100 TB join needs BEFORE launch: a hot key that
  * would make one reducer quadratic shows up here as a dominant
  * `pairs = n_a·n_b` row, the signal for salting ([[SaltedJoin]]) or an
  * AQE skew-join expectation — and the total tells you whether the
  * output is even writable. Products and the total run in DECIMAL(38,0)
  * (two billion-row sides sharing one key already exceed 2^63 pairs);
  * the long casts at the output boundary fail loudly under ANSI rather
  * than wrapping if a profile genuinely exceeds long range.
  */
object JoinStats {

  /** Top-`topK` keys by joint fan-out, each row carrying the exact join
    * cardinality alongside: (rnk, k, n_a, n_b, pairs, total_pairs).
    */
  def profile(
      a: DataFrame, aKey: String,
      b: DataFrame, bKey: String,
      topK: Int = 10): DataFrame = {
    require(topK >= 1)
    val ca = a.groupBy(col(aKey).as("k")).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(col(bKey).as("k")).agg(count(lit(1)).as("n_b"))
    val prod = ca.join(cb, "k")
      .withColumn("pairs",
        expr("CAST(n_a AS DECIMAL(38,0)) * n_b"))
    val total = prod.agg(
      sum(col("pairs")).cast("decimal(38,0)").as("__total"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pairs").desc, col("k"))
    prod
      .orderBy(col("pairs").desc, col("k"))
      .limit(topK)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(total))
      .select(col("rnk"), col("k"), col("n_a"), col("n_b"),
        col("pairs").cast("long").as("pairs"),
        col("__total").cast("long").as("total_pairs"))
      .orderBy("rnk")
  }
}
