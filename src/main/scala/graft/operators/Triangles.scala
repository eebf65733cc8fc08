package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting by degree orientation — the classic O(E^(3/2))
  * distributed formulation (the same shape MapReduce/Pregel triangle
  * counters use): every undirected edge is directed from its
  * lower-(degree, id) endpoint, wedges enumerate ordered out-neighbor
  * pairs, and closure is a pure EQUI-join back onto the oriented edge
  * set — no OR predicates, no nested loop, no per-node adjacency
  * collection.
  *
  * Scale posture: orientation bounds every out-degree by sqrt(2E), so
  * the wedge set is at most E^(3/2) rows even on power-law degree
  * distributions where naive neighbor-pair enumeration goes quadratic
  * in the hub degree. All three steps are shuffle joins/aggregations
  * on node keys — AQE handles residual skew.
  */
object Triangles {

  /** Orient an undirected edge list (`a`, `b`; one row per edge, no
    * self-loops) by (degree, id). Returns (`u`, `v`, `vdeg`) with
    * (deg(u), u) < (deg(v), v); `vdeg` rides along so wedge
    * enumeration can order out-neighbors without a second lookup.
    */
  def orient(pairs: DataFrame): DataFrame = {
    val deg = pairs.select(col("a").as("node"))
      .union(pairs.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val lt = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    pairs
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(lt, col("a")).otherwise(col("b")).as("u"),
        when(lt, col("b")).otherwise(col("a")).as("v"),
        when(lt, col("db")).otherwise(col("da")).as("vdeg"))
  }

  /** Ordered out-neighbor pairs of the oriented graph: one row
    * (`u`, `y`, `z`) per wedge, with `y` ≺ `z` under the (degree, id)
    * total order — so a closing edge, if present, is exactly (y, z).
    */
  private def wedges(oriented: DataFrame): DataFrame =
    oriented.as("e1")
      .join(oriented.as("e2"), col("e1.u") === col("e2.u") &&
        (struct(col("e1.vdeg"), col("e1.v"))
          < struct(col("e2.vdeg"), col("e2.v"))))
      .select(col("e1.u").as("u"), col("e1.v").as("y"), col("e2.v").as("z"))

  /** All triangles in the undirected graph, one row per triangle as
    * oriented node triples (`u` ≺ `y` ≺ `z` under the (degree, id)
    * total order).
    */
  def triangles(pairs: DataFrame): DataFrame = {
    val oriented = orient(pairs)
    wedges(oriented)
      .join(oriented.select(col("u").as("y"), col("v").as("z")),
        Seq("y", "z"))
      .select("u", "y", "z")
  }

  /** One row per graph-census metric: `n_edges`, `n_wedges`,
    * `n_triangles` (each undirected triangle counted exactly once).
    *
    * The wedge set — the E^(3/2) stage — is enumerated ONCE: a left
    * join marks closed wedges, and one aggregation counts wedges and
    * triangles together (`stack` unpivots the 1-row aggregate).
    * Only the cheap orientation sub-plan is shared with the separate
    * edge count.
    */
  def summary(pairs: DataFrame): DataFrame = {
    val oriented = orient(pairs)
    val closed = wedges(oriented).join(
      oriented.select(col("u").as("y"), col("v").as("z"),
        lit(1).as("hit")),
      Seq("y", "z"), "left")
    oriented.agg(count(lit(1)).as("n"))
      .select(lit("n_edges").as("metric"), col("n"))
      .union(closed
        .agg(count(lit(1)).as("nw"), count(col("hit")).as("nt"))
        .selectExpr("stack(2, 'n_wedges', nw, 'n_triangles', nt) AS (metric, n)"))
      .orderBy("metric")
  }
}
