package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.TopK

/** Similarity search over an `array<float>` embedding column.
  *
  * Brute force: broadcast the (small) query set against the corpus — one
  * scan, embarrassingly parallel, the exactness baseline. Scale path: LSH
  * with seeded random hyperplanes; candidates meet via a bucket join on
  * the signature, so the corpus is never cross-joined.
  */
object EmbeddingKnn {

  /** Exact top-k cosine neighbors for every row of `queries`. */
  def bruteForce(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", VectorFunctions.cosine(col("qv"), col("nv")))
    TopK.perGroup(scored,
        partitionCols = Seq(col("query_id")),
        orderCols = Seq(col("sim").desc, col("neighbor_id").asc),
        k = k, rankCol = "knn_rank")
      .select(col("query_id"), col("neighbor_id"), col("knn_rank"), col("sim"))
  }

  /** Deterministic seeded Gaussian hyperplanes (driver-side constants,
    * shipped as literals into the plan).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Deterministic ±1 (Rademacher) hyperplanes, reproducible OUTSIDE the
    * JVM: entry (p, j) is +1 iff the MurmurHash3 32-bit finalizer
    * (fmix32: two xorshift-multiply rounds) of `p*dim + j + seed` has
    * its top bit clear. Sign projections with ±1 entries are a standard
    * LSH family (Achlioptas' database-friendly random projections,
    * PODS'01); using integer mixing instead of a JVM PRNG means an
    * external engine (the DuckDB oracle) can rebuild the identical
    * planes in plain SQL, so the WHOLE approximate pipeline is
    * cross-engine checkable. A further exactness bonus: products flip
    * only the sign bit of float32 inputs, so bucket dots are exact in
    * double and engine-order-independent.
    *
    * The mixer choice is load-bearing for SELECTIVITY, not just
    * determinism: a plain multiplicative (Weyl) mix over the sequential
    * index lattice leaves consecutive planes correlated up to |ρ|≈0.97
    * (golden-ratio sequences are low-discrepancy, i.e. maximally
    * structured), which collapses a 16-bit signature to ~6 effective
    * bits and makes every LSH bucket quadratically deep — measured as a
    * 400× candidate-pair inflation before fmix32 replaced it. Requires
    * `(p+planeOffset)*dim + j + seed < 2^32` (plane counts are two
    * digits in practice).
    */
  def rademacherPlanes(
      numPlanes: Int, dim: Int, seed: Long, planeOffset: Int = 0): Array[Array[Double]] =
    Array.tabulate(numPlanes) { p =>
      Array.tabulate(dim) { j =>
        val k = ((p + planeOffset).toLong * dim + j + seed) & 0xffffffffL
        var h = k ^ (k >>> 16)
        h = (h * 0x85ebca6bL) & 0xffffffffL
        h ^= h >>> 13
        h = (h * 0xc2b2ae35L) & 0xffffffffL
        h ^= h >>> 16
        if (h < 0x80000000L) 1.0 else -1.0
      }
    }

  /** Sign-bit LSH signature of a vector under the given hyperplanes,
    * packed into a single long (numPlanes <= 63).
    */
  def lshSignature(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = typedlit(p.toSeq)
      when(VectorFunctions.dot(vec, plane) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Fail fast if the corpus vector width differs from the configured
    * `dim`: a mismatched hyperplane makes every dot product NULL, which
    * would silently collapse all vectors into signature 0 — one giant
    * bucket that either gets capped away (empty result) or goes
    * quadratic. Costs one single-row Spark job.
    */
  private def validateDim(corpus: DataFrame, vecCol: String, dim: Int): Unit = {
    // sample a non-null vector: size(NULL) is NULL (sizeOfNull=false) and
    // getInt on it would throw an opaque NPE instead of this diagnostic
    val head = corpus.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol)).as("d")).limit(1).collect()
    head.headOption.filterNot(_.isNullAt(0)).foreach { r =>
      val actual = r.getInt(0)
      require(actual == dim,
        s"embedding dim mismatch: column '$vecCol' has $actual elements, LSH configured for $dim")
    }
  }

  /** Corpus-self exact near-duplicate pairs: every (id_a < id_b) with
    * cosine >= threshold. The corpus is broadcast against itself (a
    * 100k-vector × 64-dim corpus is ~25 MB — broadcastable), so this is a
    * BroadcastNestedLoopJoin: exact, shuffle-free, but O(n²) compare —
    * the correctness baseline. The scale path is [[nearDupPairsLsh]].
    * Similarity is rounded to `roundSim` decimals before the threshold
    * test so results are engine-reproducible.
    */
  def nearDupPairsExact(
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9,
      roundSim: Int = 6): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = broadcast(corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb")))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", round(VectorFunctions.cosine(col("va"), col("vb")), roundSim))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Corpus-self approximate near-duplicate pairs — the all-pairs ANN a
    * training-data pipeline runs at 100 TB (embedding-level dedup).
    * Banded hyperplane LSH: `tables` independent signatures of
    * `planesPerTable` sign bits each; vectors meet iff some table's
    * signature matches exactly, then candidates are verified with the
    * exact cosine. Recall for pairs at angle θ is
    * 1-(1-(1-θ/π)^planesPerTable)^tables — tune tables up for recall,
    * planesPerTable up for precision/bucket size. `maxBucketSize` drops
    * degenerate buckets (e.g. zero vectors) like the text-LSH caps.
    */
  def nearDupPairsLsh(
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9,
      tables: Int = 8,
      planesPerTable: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      maxBucketSize: Long = 100000L,
      roundSim: Int = 6): DataFrame = {
    validateDim(corpus, vecCol, dim)
    val keyed = corpus.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      posexplode(array((0 until tables).map(t =>
        lshSignature(col(vecCol),
          rademacherPlanes(planesPerTable, dim, seed, planeOffset = t * planesPerTable))): _*))
        .as(Seq("table", "sig")))
    val capped = graft.operators.BucketCaps.capBuckets(
      keyed, Seq(col("table"), col("sig")), maxBucketSize)
    val pairs = capped.as("l")
      .join(capped.as("r"),
        col("l.table") === col("r.table") && col("l.sig") === col("r.sig") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct() // dedup on the narrow id pair BEFORE rejoining vectors
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    pairs
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .withColumn("sim", round(VectorFunctions.cosine(col("va"), col("vb")), roundSim))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** [[nearDupPairsLsh]] with a CANOPY HANDOFF for dense buckets
    * instead of a silent drop. Clustered corpora defeat geometry
    * scaling: a tight semantic cluster shares sign bits at ANY
    * signature resolution, so its bucket deepens with the corpus and
    * its pairwise join goes quadratic in cluster size. (An early
    * 100× decade leg spilled >77 GB in the band self-join; the
    * dominant cause there turned out to be the correlated-plane bug
    * fixed in [[rademacherPlanes]], but the mechanism is real — any
    * corpus with genuinely dense semantic mass reproduces it with
    * perfect planes, which is why the cap valve exists.) Production
    * stacks route that dense mass through a linear cluster pass;
    * this operator does it in one plan:
    *
    *   - buckets at or under `maxBucketSize`: the normal pairwise
    *     candidate join (identical to [[nearDupPairsLsh]]);
    *   - buckets OVER the cap: each member is verified against the
    *     bucket's min-id REPRESENTATIVE only — O(c) cosines per
    *     bucket instead of O(c²) pairs (a canopy in the
    *     McCallum/Nigam/Ungar KDD'00 sense, with the deterministic
    *     min-id as the canopy center) — so dense near-dup families
    *     surface as star edges around the representative, which is
    *     exactly what a downstream connected-components survivor
    *     pass consumes.
    *
    * Everything stays cross-engine replayable: deterministic planes,
    * deterministic representative, one shared exact-cosine verify
    * over the distinct candidate-pair union.
    */
  def nearDupPairsLshCanopy(
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9,
      tables: Int = 8,
      planesPerTable: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      maxBucketSize: Long = 100000L,
      roundSim: Int = 6): DataFrame = {
    validateDim(corpus, vecCol, dim)
    val keyed = corpus.select(
      col(idCol).as("id"),
      posexplode(array((0 until tables).map(t =>
        lshSignature(col(vecCol),
          rademacherPlanes(planesPerTable, dim, seed, planeOffset = t * planesPerTable))): _*))
        .as(Seq("table", "sig")))
    val sized = keyed.withColumn("csize",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("table"), col("sig"))))
    val cold = sized.filter(col("csize") <= maxBucketSize)
    val coldCand = cold.as("l")
      .join(cold.as("r"),
        col("l.table") === col("r.table") && col("l.sig") === col("r.sig") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
    val hot = sized.filter(col("csize") > maxBucketSize)
    val hotCand = hot
      .withColumn("rep",
        min(col("id")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("table"), col("sig"))))
      .filter(col("id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("id").as("id_b"))
    val cand = coldCand.union(hotCand).distinct()
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .withColumn("sim", round(VectorFunctions.cosine(col("va"), col("vb")), roundSim))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Semantic (embedding-tier) DECONTAMINATION: the corpus rows whose
    * vector has NO near-duplicate (banded-LSH candidate with rounded
    * cosine ≥ `threshold`) in `reference` — the embedding member of the
    * cleanse family (word-shingle: Decontaminate for q196, exact-span:
    * SpanDedup.cleanseAgainst for q203). The reference set is an eval /
    * benchmark suite: SMALL by construction, so both its band rows and
    * the final contaminated-id set ride as broadcasts — the corpus is
    * never shuffled (its band join and the anti-join are both
    * broadcast-hash, map-side), and the only exchange in the plan is
    * the distinct over contaminated ids, which is bounded by the
    * collision count. Recall is the LSH family's (same planes and banding
    * contract as [[nearDupPairsLsh]], so the oracle can replay the
    * approximation exactly); raise `tables` for stricter cleansing.
    */
  def cleanseAgainst(
      corpus: DataFrame,
      reference: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9,
      tables: Int = 8,
      planesPerTable: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      roundSim: Int = 6): DataFrame = {
    validateDim(corpus, vecCol, dim)
    def bands(df: DataFrame, id: String, vec: String) = df.select(
      col(idCol).as(id), col(vecCol).as(vec),
      posexplode(array((0 until tables).map(t =>
        lshSignature(col(vecCol),
          rademacherPlanes(planesPerTable, dim, seed, planeOffset = t * planesPerTable))): _*))
        .as(Seq("table", "sig")))
    val contaminated = bands(corpus, "cid", "cv")
      .join(broadcast(bands(reference, "rid", "rv")), Seq("table", "sig"))
      .filter(round(VectorFunctions.cosine(col("cv"), col("rv")), roundSim)
        >= threshold)
      .select(col("cid").as(idCol)).distinct()
    corpus.join(broadcast(contaminated), Seq(idCol), "left_anti")
  }

  /** IVF-style approximate top-k (inverted-file ANN): the corpus is
    * coarse-quantized once — every vector lands in the cell of its
    * nearest `centroid` (argmax cosine) — and each query exhaustively
    * searches only its `nProbe` nearest cells. Cost shape at 100 TB:
    * build = |corpus| × |centroids| broadcast compares (one scan, no
    * shuffle of the corpus beyond the cell join), query = |queries| ×
    * |centroids| + the probed cells' contents; with |centroids| ~ √n and
    * the cell join pre-partitioned by cell this is the standard IVF
    * trade (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI'11 — the IVF part, without PQ compression).
    *
    * The quantizer is PLUGGABLE: pass any centroid set (production
    * trains k-means offline and ships it like a dim table). Assignment
    * uses rounded similarity + centroid-id tie-breaks, so given the same
    * centroids the whole pipeline is deterministic and cross-engine
    * reproducible (the q41 oracle re-runs it in DuckDB).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      nProbe: Int = 4,
      roundSim: Int = 6): DataFrame = {
    val cents = broadcast(centroids.select(col(idCol).as("cell"), col(vecCol).as("cv")))
    def cellRank(side: DataFrame, id: String, v: String, kk: Int): DataFrame =
      TopK.perGroup(
        side.select(col(idCol).as(id), col(vecCol).as(v))
          .crossJoin(cents)
          .withColumn("csim", round(VectorFunctions.cosine(col(v), col("cv")), roundSim)),
        Seq(col(id)), Seq(col("csim").desc, col("cell").asc), kk, "__cr")
    // corpus vectors live in exactly one cell; queries probe nProbe cells
    val cells = cellRank(corpus, "neighbor_id", "nv", 1)
      .select("cell", "neighbor_id", "nv")
    val probes = cellRank(queries, "query_id", "qv", math.max(1, nProbe))
      .select("cell", "query_id", "qv")
    val scored = cells.join(probes, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(VectorFunctions.cosine(col("qv"), col("nv")), roundSim))
    TopK.perGroup(scored,
        partitionCols = Seq(col("query_id")),
        orderCols = Seq(col("sim").desc, col("neighbor_id").asc),
        k = k, rankCol = "knn_rank")
      .select(col("query_id"), col("neighbor_id"), col("knn_rank"), col("sim"))
  }

  /** Approximate top-k: queries only meet corpus vectors in the same LSH
    * bucket. Recall/cost is tuned by numPlanes (fewer planes → bigger
    * buckets → higher recall, more comparisons). Similarity is rounded to
    * `roundSim` decimals BEFORE ranking so rank order is engine-
    * reproducible (same convention as [[nearDupPairsExact]]).
    */
  def lshApproximate(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      numPlanes: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      roundSim: Int = 6): DataFrame = {
    validateDim(corpus, vecCol, dim)
    val planes = rademacherPlanes(numPlanes, dim, seed)
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
      lshSignature(col(vecCol), planes).as("bucket"))
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshSignature(col(vecCol), planes).as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(VectorFunctions.cosine(col("qv"), col("nv")), roundSim))
    TopK.perGroup(scored,
        partitionCols = Seq(col("query_id")),
        orderCols = Seq(col("sim").desc, col("neighbor_id").asc),
        k = k, rankCol = "knn_rank")
      .select(col("query_id"), col("neighbor_id"), col("knn_rank"), col("sim"))
  }
}
