package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Iterate.MaterializeOps

/** HITS hubs & authorities (Kleinberg, JACM'99) over a directed edge
  * list — the second member of the link-analysis pair next to
  * [[PageRank]]: PageRank scores global influence on the undirected
  * trade graph; HITS splits the DIRECTED graph into "good buyers" (hubs:
  * point at good authorities) and "good products" (authorities: pointed
  * at by good hubs), the shape that matters on bipartite interaction
  * graphs where PageRank's single score conflates the two roles.
  *
  * Same exact-arithmetic philosophy as the q93 PageRank and q85 k-means
  * replays: scores are integers quantized to 1e6, each half-round
  * renormalizes by `score·1e6 div max(score)` (the integer analog of the
  * L∞ normalization HITS needs to avoid growth — max, not L2, so no
  * square roots), and every operation is sum / floor-division /
  * broadcast of ONE scalar row. The whole training loop replays
  * relationally, unrolled round by round.
  *
  * Scale: each half-round is one join + one aggregation shuffled on the
  * edge keys; the normalization scalar is a 1-row broadcast. The edge
  * list and each half-round's raw sums are materialized
  * ([[Iterate.materialize]], same discipline as [[PageRank]]): every
  * score table is consumed twice (renormalize + max scalar) and the edge
  * list 2× per half-round, so an untruncated unrolled plan re-derives
  * the edge producer per reference and doubles per half-round — q170's
  * 2-round run planned 540 Exchange nodes before the truncation, 12
  * after. Overflow bound: score ≤ 1e6, so a
  * round's raw sum ≤ 1e6·max_degree and the renormalize multiply stays
  * under 2^63 while max_degree < 9.2e6. Long mode enforces that bound
  * LOUDLY (one degree aggregation up front, then a clear error naming
  * the fix) instead of corrupting scores; `decimal = true` runs the
  * sum/renormalize chain in DECIMAL(38,0) — bit-identical results
  * (integer math is exact in both), degree bound lifted to ~1e26.
  */
object Hits {

  val Scale = 1000000L

  /** Largest max-degree the long-mode chain is provably exact for:
    * ar ≤ Scale·d and the renormalize multiplies by Scale again.
    */
  val LongModeMaxDegree: Long = Long.MaxValue / (Scale * Scale)

  /** Run `iters` full (authority, hub) update rounds over `edges`
    * (columns u, v — u points at v). Returns (side, node, score_fp):
    * side "hub" for u-nodes, "auth" for v-nodes, scores L∞-normalized
    * to [0, 1e6].
    */
  def run(edges: DataFrame, iters: Int, decimal: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 8, "unrolled HITS wants few rounds")
    // materialize the edge list ONCE: it is referenced twice per
    // half-round (join + the renormalization scalar's subtree) plus the
    // degree probe, and without lineage truncation the unrolled plan
    // re-derives the producing join per reference — measured on q170
    // (orders⋈lineitem⋈distinct producer, 2 rounds) as a 540-Exchange
    // physical plan
    val e = edges.select(col("u"), col("v")).materialized
    if (!decimal) {
      val maxDeg = e.select(col("u").as("n"))
        .unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
        .agg(max("d")).first().get(0)
      val d = Option(maxDeg).map(_.asInstanceOf[Long]).getOrElse(0L)
      require(d <= LongModeMaxDegree,
        s"max degree $d exceeds the long-mode exactness bound " +
          s"$LongModeMaxDegree; call run(edges, iters, decimal = true)")
    }
    val wide = org.apache.spark.sql.types.DecimalType(38, 0)
    def scoreSum(c: String) =
      if (decimal) sum(col(c).cast(wide)) else sum(col(c))
    var h: DataFrame = e.select(col("u")).distinct()
      .withColumn("h", lit(Scale))
    var a: DataFrame = null
    (1 to iters).foreach { _ =>
      // each half-round's raw sum feeds BOTH the renormalized scores and
      // the max() scalar; truncate its lineage so the second consumer
      // reads blocks instead of re-running the join+agg, and so the plan
      // stays linear in rounds instead of doubling per half-round
      val aRaw = e.join(h, "u").groupBy("v").agg(scoreSum("h").as("ar"))
        .materialized
      a = aRaw.crossJoin(broadcast(aRaw.agg(max("ar").as("m"))))
        .select(col("v"), expr(s"ar * $Scale div m").cast("long").as("a"))
      val hRaw = e.join(a, "v").groupBy("u").agg(scoreSum("a").as("hr"))
        .materialized
      h = hRaw.crossJoin(broadcast(hRaw.agg(max("hr").as("m"))))
        .select(col("u"), expr(s"hr * $Scale div m").cast("long").as("h"))
    }
    h.select(lit("hub").as("side"), col("u").as("node"),
        col("h").as("score_fp"))
      .unionByName(
        a.select(lit("auth").as("side"), col("v").as("node"),
          col("a").as("score_fp")))
  }
}
