package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (pareto frontier), both dimensions maximized — the
  * "best trade-off" operator (Börzsönyi et al., "The Skyline Operator",
  * ICDE'01): a point survives iff no other point is ≥ in both
  * dimensions and > in at least one.
  *
  * Scale shape — grid-prune then exact, the distributed-skyline
  * standard (cf. angle/grid partitioning in the skyline literature):
  *
  *  1. PRUNE (distributed): bucket x by integer division; per bucket
  *     take max(y) (two-phase agg); suffix-max those B rows (window
  *     over B = bucket-count rows, driver-scale); a point survives iff
  *     its y ≥ the max y of all STRICTLY HIGHER buckets. Exact-safe:
  *     bucket(x') > bucket(x) ⇒ x' > x (floor-div is monotone), and a
  *     higher-bucket point with y' ≥ y dominates outright — so pruning
  *     never removes a frontier point. This one broadcast-joined pass
  *     eliminates all but O(frontier + points sharing its buckets).
  *  2. EXACT (survivors only): dominated iff max(y | x' > x) ≥ y — a
  *     range-frame window over x — or max(y | x' = x) > y — a
  *     partition-by-x max. The global range window funnels one
  *     partition, which is exactly why phase 1 exists: it sees only
  *     the pruned survivor set, not the corpus.
  *
  * Coordinates must be LONG (exact window range arithmetic and exact
  * cross-engine compares); callers with decimal data scale to integer
  * units first (e.g. cents). Duplicate (x, y) points tie — neither
  * dominates — and all copies survive, so callers wanting set output
  * aggregate multiplicities.
  */
object Skyline {

  /** Pareto-frontier rows of `df` maximizing long columns (`xCol`,
    * `yCol`); `bucketWidth` is the phase-1 grid pitch in x units.
    */
  def frontier2D(
      df: DataFrame, xCol: String, yCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    val x = col(xCol)
    val y = col(yCol)
    // integer division, not floor(x / w): double division loses exactness
    // past 2^53, and any monotone bucketing preserves the prune guarantee
    val b = df.withColumn("__bk", expr(s"`$xCol` div ${bucketWidth}L"))

    // per-bucket max y, then "best y strictly above this bucket" via a
    // suffix max over the B bucket rows (tiny frame; the lead(1) shifts
    // the running max to exclude the bucket itself)
    val wSuffix = Window.orderBy(col("__bk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val above = b.groupBy("__bk").agg(max(y).as("__bmax"))
      .withColumn("__above", max(col("__bmax")).over(wSuffix))
      .select(col("__bk"), col("__above"))

    val survivors = b.join(broadcast(above), Seq("__bk"))
      .filter(col("__above").isNull || y >= col("__above"))
      .drop("__bk", "__above")

    // exact dominance over the pruned set
    val wGt = Window.orderBy(x.cast("long"))
      .rangeBetween(1L, Window.unboundedFollowing)
    val wEq = Window.partitionBy(x)
    survivors
      .withColumn("__mgt", max(y).over(wGt))
      .withColumn("__meq", max(y).over(wEq))
      .filter((col("__mgt").isNull || y > col("__mgt")) &&
        y === col("__meq"))
      .drop("__mgt", "__meq")
  }
}
