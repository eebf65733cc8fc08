package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (the PQ half of Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI'11 — complementing
  * [[EmbeddingKnn.ivfTopK]]'s IVF half).
  *
  * The embedding space is split into `m` contiguous subspaces; each
  * subspace has a k-entry codebook, and a vector is stored as its `m`
  * nearest-centroid ids — 64-dim float32 (256 B) compresses to m = 8
  * code bytes, which is what makes billion-scale in-memory ANN possible.
  * Queries score candidates with ADC (asymmetric distance): one k×m
  * table of exact query→centroid distances, then every candidate costs m
  * table lookups instead of a d-dim dot product.
  *
  * Scale shape: encoding is a narrow map over the corpus (m·k tiny
  * distance evaluations per vector, codebook shipped as literals like a
  * dim table — production trains it with k-means offline); ADC is a
  * broadcast of the per-query tables against the coded corpus — no
  * shuffle of the corpus at all.
  *
  * Determinism: sub-distances are exact squared-diff sums evaluated in
  * a FIXED left-to-right order on both engines (float32 inputs make each
  * square exact in double), rounded to `roundDist` decimals before
  * argmin/rank with centroid/neighbor-id tie-breaks — so the entire
  * approximate pipeline (codes included) replays bit-for-bit in the
  * DuckDB oracle, same discipline as the Rademacher-plane LSH.
  */
object ProductQuantization {

  /** Exact squared L2 distance between an array column slice and a
    * literal centroid sub-vector, summed left-to-right.
    */
  private def l2sq(s: Column, centroid: Array[Double]): Column =
    aggregate(
      zip_with(s, typedlit(centroid.toSeq), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Collect a codebook DataFrame (id, vector) into per-subspace centroid
    * arrays: result(j)(c) = subvector j of centroid c, in ascending id
    * order (ids need not be dense — position defines the code).
    */
  def collectCodebook(
      codebook: DataFrame,
      idCol: String,
      vecCol: String,
      subspaces: Int): Array[Array[Array[Double]]] = {
    val rows = codebook.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .filter(col(vecCol).isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(rows.nonEmpty, "empty PQ codebook (after dropping null vectors)")
    require(rows.map(_._2.length).distinct.length == 1,
      "PQ codebook vectors must share one dimensionality")
    val dim = rows.head._2.length
    require(dim % subspaces == 0,
      s"dim $dim not divisible into $subspaces subspaces")
    val sub = dim / subspaces
    Array.tabulate(subspaces)(j => rows.map(_._2.slice(j * sub, (j + 1) * sub)))
  }

  /** Append PQ code columns `__code_0 .. __code_{m-1}` (int position of
    * the nearest centroid in subspace j, ties to the smallest).
    */
  def encode(
      df: DataFrame,
      vecCol: String,
      cb: Array[Array[Array[Double]]],
      roundDist: Int = 6): DataFrame = {
    val sub = cb(0)(0).length
    cb.indices.foldLeft(df) { (acc, j) =>
      val staged = acc.withColumn("__sl",
        slice(col(vecCol), j * sub + 1, sub).cast("array<double>"))
      staged.withColumn(s"__code_$j",
          array_min(array(cb(j).indices.map(c => struct(
            round(l2sq(col("__sl"), cb(j)(c)), roundDist).as("d"),
            lit(c).as("c"))): _*)).getField("c"))
        .drop("__sl")
    }
  }

  /** The full IVF-PQ composition (Jégou et al. TPAMI'11, both halves):
    * the coarse quantizer routes every corpus vector to one cell and each
    * query to its `nProbe` nearest cells (cosine, like
    * [[EmbeddingKnn.ivfTopK]]), and ADC scoring runs only inside the
    * probed cells. At 100 TB that's the difference between scanning m·n
    * code bytes and scanning m·n/|cells|·nProbe — the standard
    * billion-scale ANN shape: cells bound the candidate set, codes bound
    * the per-candidate cost.
    *
    * Deterministic end to end (rounded cell sims + exact fixed-order PQ
    * sums + id tie-breaks), so `nProbe >= |cells|` exactly equals
    * [[pqTopK]] — the invariant KnnSpec pins.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      codebook: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      subspaces: Int = 8,
      k: Int = 5,
      nProbe: Int = 4,
      roundDist: Int = 6): DataFrame = {
    import graft.functions.VectorFunctions
    import graft.operators.TopK
    val cb = collectCodebook(codebook, idCol, vecCol, subspaces)
    val sub = cb(0)(0).length
    val cents = broadcast(centroids.select(col(idCol).as("cell"), col(vecCol).as("cv")))
    def cellRank(side: DataFrame, id: String, v: String, kk: Int): DataFrame =
      TopK.perGroup(
        side.filter(col(vecCol).isNotNull)
          .select(col(idCol).as(id), col(vecCol).as(v))
          .crossJoin(cents)
          .withColumn("csim", round(VectorFunctions.cosine(col(v), col("cv")), roundDist)),
        Seq(col(id)), Seq(col("csim").desc, col("cell").asc), kk, "__cr")
    val cells = encode(
      cellRank(corpus, "neighbor_id", "nv", 1).select("cell", "neighbor_id", "nv"),
      "nv", cb, roundDist)
      .drop("nv") // only the cell + codes travel into the join
    val probes = cb.indices.foldLeft(
        cellRank(queries, "query_id", "qv", math.max(1, nProbe))
          .select("cell", "query_id", "qv")) { (acc, j) =>
      val staged = acc.withColumn("__sl",
        slice(col("qv"), j * sub + 1, sub).cast("array<double>"))
      staged.withColumn(s"__qd_$j",
          array(cb(j).indices.map(c =>
            round(l2sq(col("__sl"), cb(j)(c)), roundDist)): _*))
        .drop("__sl")
    }.drop("qv")
    val approx = cb.indices
      .map(j => element_at(col(s"__qd_$j"), col(s"__code_$j") + 1))
      .reduce(_ + _)
    val scored = cells.join(probes, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx_dist", round(approx, roundDist))
    TopK.perGroup(scored,
        partitionCols = Seq(col("query_id")),
        orderCols = Seq(col("approx_dist").asc, col("neighbor_id").asc),
        k = k, rankCol = "pq_rank")
      .select(col("query_id"), col("neighbor_id"), col("pq_rank"), col("approx_dist"))
  }

  /** ADC top-k: every query's `k` nearest corpus vectors by PQ-approximate
    * squared L2. Output: (query_id, neighbor_id, pq_rank, approx_dist).
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      codebook: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      subspaces: Int = 8,
      k: Int = 5,
      roundDist: Int = 6): DataFrame = {
    val cb = collectCodebook(codebook, idCol, vecCol, subspaces)
    val sub = cb(0)(0).length

    // null vectors can't be coded or scored — drop them (ANN semantics),
    // rather than let null codes silently collapse into bucket 0
    val coded = encode(
      corpus.filter(col(vecCol).isNotNull)
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv")),
      "nv", cb, roundDist)

    // per-query distance table: __qd_j = [d(q_j, c_0) .. d(q_j, c_{k-1})]
    val tabled = cb.indices.foldLeft(
        queries.filter(col(vecCol).isNotNull)
          .select(col(idCol).as("query_id"), col(vecCol).as("qv"))) { (acc, j) =>
      val staged = acc.withColumn("__sl",
        slice(col("qv"), j * sub + 1, sub).cast("array<double>"))
      staged.withColumn(s"__qd_$j",
          array(cb(j).indices.map(c =>
            round(l2sq(col("__sl"), cb(j)(c)), roundDist)): _*))
        .drop("__sl")
    }

    val approx = cb.indices
      .map(j => element_at(col(s"__qd_$j"), col(s"__code_$j") + 1))
      .reduce(_ + _) // fixed j order — reproducible fold
    val scored = coded.crossJoin(broadcast(tabled))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx_dist", round(approx, roundDist))
    graft.operators.TopK.perGroup(scored,
        partitionCols = Seq(col("query_id")),
        orderCols = Seq(col("approx_dist").asc, col("neighbor_id").asc),
        k = k, rankCol = "pq_rank")
      .select(col("query_id"), col("neighbor_id"), col("pq_rank"), col("approx_dist"))
  }
}
