package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * edge keys; the normalization scalar is a 1-row broadcast. Iterations
  * are few (HITS converges fast; callers unroll 2-3), so no lineage
  * truncation is needed at this depth — add `localCheckpoint` per round
  * beyond ~8 like PageRank does. Overflow bound: score ≤ 1e6, so a
  * round's raw sum ≤ 1e6·max_degree and the renormalize multiply stays
  * under 2^63 while max_degree < 9e6 — the DECIMAL(38,0) chain is the
  * path beyond.
  */
object Hits {

  val Scale = 1000000L

  /** Run `iters` full (authority, hub) update rounds over `edges`
    * (columns u, v — u points at v). Returns (side, node, score_fp):
    * side "hub" for u-nodes, "auth" for v-nodes, scores L∞-normalized
    * to [0, 1e6].
    */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8, "unrolled HITS wants few rounds")
    val e = edges.select(col("u"), col("v"))
    var h: DataFrame = e.select(col("u")).distinct()
      .withColumn("h", lit(Scale))
    var a: DataFrame = null
    (1 to iters).foreach { _ =>
      val aRaw = e.join(h, "u").groupBy("v").agg(sum("h").as("ar"))
      a = aRaw.crossJoin(broadcast(aRaw.agg(max("ar").as("m"))))
        .select(col("v"), expr(s"ar * $Scale div m").as("a"))
      val hRaw = e.join(a, "v").groupBy("u").agg(sum("a").as("hr"))
      h = hRaw.crossJoin(broadcast(hRaw.agg(max("hr").as("m"))))
        .select(col("u"), expr(s"hr * $Scale div m").as("h"))
    }
    h.select(lit("hub").as("side"), col("u").as("node"),
        col("h").as("score_fp"))
      .unionByName(
        a.select(lit("auth").as("side"), col("v").as("node"),
          col("a").as("score_fp")))
  }
}
