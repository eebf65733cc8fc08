package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-point k-means over an embedding column — the "train the codebook"
  * step that [[EmbeddingKnn.ivfTopK]]'s scaladoc assumes happens offline.
  * Semantic clustering is also the candidate-pruning front end for
  * embedding-level near-dup at scale (q90): only within-cluster pairs are
  * verified, like LSH buckets but with learned cells.
  *
  * Everything is computed in QUANTIZED integer space: each float element is
  * scaled by 2^20 and rounded to a long once up front. Distances are then
  * exact integer sums (order-independent, no IEEE drift), centroid updates
  * are `floor(sum/count)` on exactly-representable integer doubles, and
  * ties break on the lowest cluster id — so the whole iterative algorithm
  * is bit-reproducible in any engine and the DuckDB oracle can replay
  * training AND assignment (q85), not just spot-check shapes.
  *
  * Scale posture: the model (k × dim longs) lives on the driver and is
  * inlined into closed-form expressions — the standard ML-pipeline shape
  * (centroids are parameters, not data). Each Lloyd iteration is one
  * narrow shuffle of (cluster, dim) partial sums via two-phase
  * HashAggregate over posexploded dims; assignment itself is a codegen'd
  * map with NO shuffle. At 100 TB: k·dim ≪ broadcast threshold, the
  * per-iteration shuffle carries k·dim·partitions rows — independent of
  * corpus size after map-side combine.
  *
  * No counterpart in the reference (similarity search tier is this repo's
  * extension surface; cf. /root/reference/README.md:38 scope).
  */
object Clustering {

  /** Quantization scale: 2^20 ≈ 6 decimal digits of an embedding in
    * [-1, 1]. Scaling a float32 by a power of two is exact in double, so
    * `round` sees the true value and HALF_UP agrees across engines.
    */
  val QuantScale: Long = 1L << 20

  /** Float vector → quantized long vector. */
  def quantize(vec: Column): Column =
    transform(vec, e => round(e.cast("double") * QuantScale).cast("long"))

  /** Exact squared L2 distance between a quantized vector column and a
    * driver-side centroid (integer arithmetic; |e| ≤ ~2^23 keeps the
    * 64-dim sum far under Long range).
    */
  def qDistSq(qv: Column, centroid: Array[Long]): Column =
    aggregate(
      zip_with(qv, typedlit(centroid.toSeq), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Nearest-centroid id (ties → lowest id) as a `struct(dist, cluster)`
    * column; `array_min` compares lexicographically so the tie-break is
    * part of the comparison, not a second pass.
    */
  def nearest(qv: Column, centroids: Seq[Array[Long]]): Column =
    array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(qDistSq(qv, c).as("d"), lit(i.toLong).as("c"))
    }: _*))

  /** `iters` Lloyd update rounds from deterministic seeds (the k lowest
    * ids' vectors), then a final assignment. Returns
    * `(idCol, cluster: long, dist_sq: long)` — dist_sq is the exact
    * quantized distance to the winning centroid.
    *
    * Empty clusters keep their previous centroid (k is stable).
    */
  def kmeans(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 8,
      iters: Int = 1): DataFrame = {
    val centroids = trainCentroids(emb, idCol, vecCol, k, iters)
    val q = emb.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
    q.select(col("id").as(idCol), nearest(col("qv"), centroids).as("nc"))
      .select(col(idCol), col("nc").getField("c").as("cluster"),
        col("nc").getField("d").as("dist_sq"))
  }

  /** The training loop alone: returns the quantized codebook (cell i's
    * centroid at index i) without materializing an assignment — for
    * consumers that persist the model separately from the data
    * (e.g. [[IvfIndex]]).
    */
  def trainCentroids(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 8,
      iters: Int = 1): Seq[Array[Long]] = {
    require(k >= 1 && iters >= 0, "k >= 1, iters >= 0")
    val q = emb.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))

    // seeds: the k lowest ids' quantized vectors (k rows to the driver —
    // the model, not the data)
    var centroids: Seq[Array[Long]] = q.orderBy("id").limit(k).collect()
      .map(_.getSeq[Long](1).toArray).toSeq
    require(centroids.size == k, s"corpus has fewer than k=$k rows")
    val dim = centroids.head.length

    for (_ <- 1 to iters) {
      // one narrow shuffle: (cluster, dim) → (sum, count); count comes for
      // free as the dim-0 rows' n. The struct is staged as a column before
      // .getField — an inline struct's field names don't survive analysis
      // in the same projection as a generator (posexplode).
      val sums = q.select(nearest(col("qv"), centroids).as("nc"), col("qv"))
        .select(col("nc").getField("c").as("c"),
          posexplode(col("qv")).as(Seq("j", "v")))
        .groupBy("c", "j").agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
      val upd = Array.fill(k)(null: Array[Long])
      sums.groupBy(_.getLong(0)).foreach { case (c, rows) =>
        val cv = new Array[Long](dim)
        rows.foreach { r =>
          // floor(sum/count) in PURE integer arithmetic: floorDiv is exact
          // at any magnitude, while a double round-trip silently breaks
          // bit-reproducibility once a cell's coordinate sum passes 2^53
          // (reachable at ~2^30 rows x 2^23-quantized coords). Identical
          // to floor(s/n) wherever the double is exact — i.e. everywhere
          // a SQL replay at test scale runs.
          cv(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3))
        }
        upd(c.toInt) = cv
      }
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        if (upd(i) == null) old else upd(i)
      }
    }
    centroids
  }

  /** Cluster-pruned exact near-dup pairs: k-means cells bound the
    * candidate set (like LSH buckets, but data-adaptive), the exact
    * rounded cosine decides membership. Approximate by construction —
    * cross-cluster pairs are unseen — but deterministic, so the miss set
    * is a fixed, oracle-replayable object. Output
    * `(id_a, id_b, cluster, sim)`.
    */
  def nearDupPairsClustered(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.4,
      k: Int = 8,
      iters: Int = 1,
      roundSim: Int = 6): DataFrame = {
    val assigned = kmeans(emb, idCol, vecCol, k, iters)
      .join(emb.select(col(idCol), col(vecCol)), idCol)
    val a = assigned.select(col("cluster"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = assigned.select(col("cluster"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        round(graft.functions.VectorFunctions.cosine(col("va"), col("vb")), roundSim))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cluster"), col("sim"))
  }
}
