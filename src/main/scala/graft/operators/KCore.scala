package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by bounded peeling (Seidman '83; the
  * Batagelj–Zaveršnik sequential algorithm's bulk-synchronous form):
  * repeatedly delete every node whose degree in the SURVIVING subgraph
  * is below `k` — each deletion can drop a neighbor below the bar, so
  * peeling iterates to a fixpoint. The k-core is the canonical
  * "dense interaction backbone" extractor on interaction graphs (spam
  * rings, power-user nuclei) where degree alone over-counts nodes whose
  * neighbors are themselves peripheral.
  *
  * Each round is one degree aggregation (explode both endpoints +
  * count) and two semi-joins filtering the edge list, with
  * `localCheckpoint` truncating lineage per round — the
  * [[ConnectedComponents]]/[[TreePaths]] fixpoint idiom: plan size
  * stays linear in rounds and the shuffles are all keyed on node ids.
  * `rounds` bounds the peel like TreePaths bounds doubling: a round
  * that deletes nothing is a no-op (converged; extra rounds are free
  * modulo one count), and callers wanting certainty of convergence
  * compare edge counts across two calls or raise `rounds` — peeling
  * depth in practice is small (it is at most the degeneracy ordering's
  * longest cascade, not graph diameter).
  *
  * Input convention: undirected simple graph, one row per edge, node
  * id spaces disjoint across the two columns if the graph is bipartite
  * (offset one side) — self-loops dropped, duplicate rows collapsed.
  */
object KCore {

  /** Peel `rounds` times; returns surviving `(node, degree)` where
    * `degree` is the node's degree in the final surviving subgraph.
    */
  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 20)
    def degrees(e: DataFrame): DataFrame = e
      .select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    var e = edges.select(col("u"), col("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    (1 to rounds).foreach { _ =>
      val keep = degrees(e).filter(col("degree") >= k).select("node")
      e = e
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .localCheckpoint()
    }
    degrees(e)
  }
}
