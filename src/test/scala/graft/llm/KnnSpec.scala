package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.VectorFunctions

class KnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine/dot/norm on known vectors") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 2.0f), Seq(3.0f, 4.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("c")).as("dot"),
      VectorFunctions.l2Norm(col("c")).as("norm"),
      VectorFunctions.cosine(col("a"), col("b")).as("ortho"),
      VectorFunctions.cosine(col("a"), col("a")).as("self")).collect()(0)
    assert(r.getDouble(0) == 3.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 0.0)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
  }

  test("cosine of zero vector is 0.0, not NaN") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("z", "v")
    assert(df.select(VectorFunctions.cosine(col("z"), col("v"))).as[Double].head() == 0.0)
  }

  private def corpus = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.0f, 0.0f, 1.0f)),
    (4L, Seq(1.0f, 0.05f, 0.0f))).toDF("vec_id", "embedding")

  test("bruteForce: correct neighbor order, self excluded") {
    val out = EmbeddingKnn.bruteForce(corpus, corpus.filter(col("vec_id") === 0L),
        k = 2)
      .orderBy("knn_rank").as[(Long, Long, Int, Double)].collect()
    // nearest to (1,0,0): vec 4 (cos ~0.9988) then vec 1 (cos ~0.9939)
    assert(out.map(r => (r._2, r._3)).toSeq == Seq((4L, 1), (1L, 2)))
    assert(!out.exists(_._2 == 0L))
  }

  test("nearDupPairsExact: all-pairs cosine with threshold, id_a < id_b") {
    val out = EmbeddingKnn.nearDupPairsExact(corpus, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    // (0,1) cos ~0.9939, (0,4) ~0.9988, (1,4) ~0.9858; orthogonals excluded
    assert(out.map(p => (p._1, p._2)) == Set((0L, 1L), (0L, 4L), (1L, 4L)))
    assert(out.forall(p => p._3 >= 0.9 && p._1 < p._2))
  }

  test("nearDupPairsLsh: recovers the exact pair set on clustered vectors") {
    val exact = EmbeddingKnn.nearDupPairsExact(corpus, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = EmbeddingKnn.nearDupPairsLsh(corpus, threshold = 0.9,
        tables = 16, planesPerTable = 4, dim = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // near-identical directions agree on every sign bit with high
    // probability per table; 16 tables of 4 planes make a miss vanishing,
    // and the seeded hyperplanes make the outcome deterministic
    assert(lsh == exact)
  }

  test("nearDupPairsLsh: hot-bucket cap bounds the self-join") {
    val flood = (1L to 30L).map(i => (i, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(EmbeddingKnn.nearDupPairsLsh(flood, threshold = 0.9, tables = 2,
      planesPerTable = 4, dim = 3, maxBucketSize = 5L).count() == 0)
    assert(EmbeddingKnn.nearDupPairsLsh(flood, threshold = 0.9, tables = 2,
      planesPerTable = 4, dim = 3, maxBucketSize = 0L).count() == 30L * 29 / 2)
  }

  test("nearDupPairsLshCanopy: dense buckets become linear star edges, not silent drops") {
    val flood = (1L to 30L).map(i => (i, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    // the plain capped join drops the flooded bucket entirely (test
    // above); the canopy verifies each member against the min-id
    // representative — 29 star edges, every member CC-reachable
    val star = EmbeddingKnn.nearDupPairsLshCanopy(flood, threshold = 0.9,
        tables = 2, planesPerTable = 4, dim = 3, maxBucketSize = 5L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(star == (2L to 30L).map(i => (1L, i)).toSet)
    // with nothing over the cap the canopy is EXACTLY the plain join
    val loose = EmbeddingKnn.nearDupPairsLshCanopy(corpus, threshold = 0.9,
        tables = 16, planesPerTable = 4, dim = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val plain = EmbeddingKnn.nearDupPairsLsh(corpus, threshold = 0.9,
        tables = 16, planesPerTable = 4, dim = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(loose == plain)
  }

  test("cleanseAgainst: drops banded near-dups of the reference, keeps the rest") {
    // reference contains an exact copy of vec 0's direction and an
    // orthogonal probe; vecs 0/1/4 cluster around (1,0,0) -> all
    // contaminated at 0.9; vec 2 matches the orthogonal reference
    // exactly; only vec 3 survives
    val reference = Seq(
      (100L, Seq(2.0f, 0.0f, 0.0f)),
      (101L, Seq(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val survivors = EmbeddingKnn.cleanseAgainst(corpus, reference,
        threshold = 0.9, tables = 16, planesPerTable = 4, dim = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors == Set(3L))
    // empty reference cleanses nothing
    val all = EmbeddingKnn.cleanseAgainst(corpus, reference.limit(0),
        threshold = 0.9, tables = 16, planesPerTable = 4, dim = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(all == Set(0L, 1L, 2L, 3L, 4L))
    // brute-force parity on the banded contract: a survivor has no
    // reference partner that BOTH collides in some table AND clears
    // the cosine cut (here geometry is saturated, so survivors are
    // exactly the exact-cosine survivors)
    val exactBad = corpus.as("c").crossJoin(reference.as("r"))
      .filter(round(VectorFunctions.cosine(col("c.embedding"), col("r.embedding")), 6) >= 0.9)
      .select(col("c.vec_id")).as[Long].collect().toSet
    assert(survivors == Set(0L, 1L, 2L, 3L, 4L) -- exactBad)
  }

  test("ivfTopK with nProbe >= nCells equals brute force exactly") {
    val queries = corpus.filter(col("vec_id") < 2)
    val ivf = EmbeddingKnn.ivfTopK(corpus, queries, centroids = corpus,
        k = 3, nProbe = 5)
      .select(col("query_id"), col("neighbor_id"), col("knn_rank"))
      .as[(Long, Long, Int)].collect().toSet
    val brute = EmbeddingKnn.bruteForce(corpus, queries, k = 3)
      .select(col("query_id"), col("neighbor_id"), col("knn_rank"))
      .as[(Long, Long, Int)].collect().toSet
    // probing every cell degrades IVF to exhaustive search — the recall
    // knob's boundary case pins the pipeline's correctness
    assert(brute.nonEmpty && ivf == brute)
  }

  test("ivfTopK single probe only searches the query's own cell") {
    // centroids at the two axes split the corpus into two cells; a query
    // on the x-axis with nProbe=1 must never see the y/z-cell vectors
    val cents = Seq((100L, Seq(1.0f, 0.0f, 0.0f)), (101L, Seq(0.0f, 1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val out = EmbeddingKnn.ivfTopK(corpus, corpus.filter(col("vec_id") === 0L),
        centroids = cents, k = 5, nProbe = 1)
      .as[(Long, Long, Int, Double)].collect()
    assert(out.map(_._2).toSet == Set(1L, 4L)) // x-cell mates only
  }

  test("pqTopK with codebook == corpus reproduces exact L2 ranking") {
    // every vector encodes to (a centroid with) its own slices, so the ADC
    // distance IS the exact squared L2 — PQ's zero-quantization-error case
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)), (3L, Seq(0.0f, 0.0f, 1.0f)),
      (4L, Seq(1.0f, 0.05f, 0.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = ProductQuantization.pqTopK(df, df.filter(col("vec_id") === 0L),
        codebook = df, subspaces = 3, k = 4)
      .select("neighbor_id", "pq_rank").as[(Long, Int)].collect().toMap
    val q = vecs.head._2.map(_.toDouble)
    val exact = vecs.tail
      .map { case (id, v) =>
        (id, v.map(_.toDouble).zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      .sortBy { case (id, d) => (d, id) }.map(_._1).zipWithIndex
      .map { case (id, i) => (id, i + 1) }.toMap
    assert(out == exact)
  }

  test("pqTopK quantizes: distances snap to the codebook's resolution") {
    // 2 centroids on the axes; every vector's code is its nearest axis, so
    // ADC distances only depend on codes, not exact positions
    val cb = Seq((0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = ProductQuantization.pqTopK(corpus,
        corpus.filter(col("vec_id") === 0L), cb, subspaces = 1, k = 4)
      .select("neighbor_id", "approx_dist").as[(Long, Double)].collect().toMap
    // 1 and 4 share query's code -> approx 0; 2 is the other axis; 3 codes
    // to centroid 0 (tie at equal distance) -> approx 0 as well
    assert(out(1L) == 0.0 && out(4L) == 0.0 && out(3L) == 0.0 && out(2L) == 2.0)
  }

  test("ivfPqTopK with nProbe >= nCells equals plain PQ exactly") {
    val queries = corpus.filter(col("vec_id") < 2)
    val ivfpq = ProductQuantization.ivfPqTopK(corpus, queries,
        centroids = corpus, codebook = corpus, subspaces = 3, k = 3, nProbe = 5)
      .as[(Long, Long, Int, Double)].collect().toSet
    val pq = ProductQuantization.pqTopK(corpus, queries,
        codebook = corpus, subspaces = 3, k = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    // probing every cell degrades IVF-PQ to exhaustive ADC
    assert(pq.nonEmpty && ivfpq == pq)
  }

  test("lshApproximate finds identical-direction vectors (same bucket by construction)") {
    val out = EmbeddingKnn.lshApproximate(corpus,
        corpus.filter(col("vec_id") === 0L), "vec_id", "embedding",
        k = 3, numPlanes = 4, dim = 3)
      .as[(Long, Long, Int, Double)].collect()
    // vectors 1 and 4 point almost the same way as query 0 -> same signs
    // under any hyperplane set, so they share its bucket and are returned
    assert(out.map(_._2).toSet.contains(4L))
    assert(!out.exists(_._2 == 0L))
  }
}
