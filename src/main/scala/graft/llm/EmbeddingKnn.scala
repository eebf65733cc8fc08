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

  /** Deterministic seeded hyperplanes (driver-side constants, shipped as
    * literals into the plan).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH signature of a vector under the given hyperplanes,
    * packed into a single long (numPlanes <= 63).
    */
  def lshSignature(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = typedlit(p.toSeq)
      when(VectorFunctions.dot(vec, plane) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: queries only meet corpus vectors in the same LSH
    * bucket. Recall/cost is tuned by numPlanes (fewer planes → bigger
    * buckets → higher recall, more comparisons).
    */
  def lshApproximate(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      numPlanes: Int = 8,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, dim, seed)
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
      lshSignature(col(vecCol), planes).as("bucket"))
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshSignature(col(vecCol), planes).as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", VectorFunctions.cosine(col("qv"), col("nv")))
    TopK.perGroup(scored,
        partitionCols = Seq(col("query_id")),
        orderCols = Seq(col("sim").desc, col("neighbor_id").asc),
        k = k, rankCol = "knn_rank")
      .select(col("query_id"), col("neighbor_id"), col("knn_rank"), col("sim"))
  }
}
