package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the JOIN counterpart of
  * [[SkewedAgg]] (reference `SkewedDataHandler.scala:26-65` only salts
  * aggregation; a skewed fact⋈fact join needs the same medicine when
  * AQE's `OptimizeSkewedJoin` can't help, e.g. when the skew only
  * materializes after a partial aggregation, or under a partitioning the
  * planner must preserve).
  *
  * Mechanics: the left (skewed) side gets a random-but-deterministic salt
  * in [0, n) derived from a caller-supplied well-distributed column; the
  * right side is replicated n× (explode of a literal range), so every
  * (key, salt) bucket of the left finds its right rows. Row multiplicity
  * is exactly the plain join's — the salt is an internal routing column,
  * dropped on output — so the operator is semantics-preserving by
  * construction (q95 pins it against the unsalted oracle).
  *
  * Cost model at 100 TB: right side shuffles n× its size; left shuffles
  * once but in n-way finer buckets. Worth it iff the hottest key's bucket
  * exceeds an executor's capacity — measure with q89's skew profiler
  * first.
  */
object SaltedJoin {

  /** Inner equi-join of `left` and `right` on `keys`, with `left` salted
    * `numSalts` ways by `saltSource` (any well-distributed left column
    * expression, e.g. a row id).
    */
  def inner(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltSource: org.apache.spark.sql.Column,
      numSalts: Int): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    require(!(left.columns ++ right.columns).contains("__salt"),
      "inputs must not already have a __salt column")
    // a NULL saltSource must still land in SOME bucket — a null salt
    // would silently drop the row from the inner join (null never
    // equals the replicated salt), breaking semantics preservation
    val saltedLeft = left.withColumn("__salt",
      coalesce(pmod(saltSource, lit(numSalts)), lit(0)))
    val replicatedRight = right.withColumn(
      "__salt", explode(lit((0 until numSalts).toArray)))
    saltedLeft
      .join(replicatedRight, keys :+ "__salt")
      .drop("__salt")
  }
}
