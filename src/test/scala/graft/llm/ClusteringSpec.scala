package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two tight blobs far apart; ids ordered so the two seeds (k=2 lowest
  // ids) land one in each blob
  private def blobs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(10.0f, 10.0f, 10.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f)),
    (3L, Seq(10.1f, 9.9f, 10.0f)),
    (4L, Seq(1.1f, -0.1f, 0.1f)),
    (5L, Seq(9.9f, 10.1f, 9.9f))).toDF("vec_id", "embedding")

  test("quantize: 2^20 fixed-point, HALF_UP") {
    val r = Seq(Tuple1(Seq(1.0f, -0.5f, 0.0000004768f)))
      .toDF("v").select(Clustering.quantize(col("v"))).as[Seq[Long]].head()
    assert(r(0) == 1048576L)
    assert(r(1) == -524288L)
    // 0.0000004768... float quantizes to 0.49999... or 0.5ish * 2^20/2^20
    assert(math.abs(r(2)) <= 1L)
  }

  test("kmeans separates two blobs; assignment is total and stable") {
    val out = Clustering.kmeans(blobs, k = 2, iters = 2)
      .orderBy("vec_id").as[(Long, Long, Long)].collect()
    assert(out.length == 6)
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster(0L) == Set(0L, 2L, 4L))
    assert(byCluster(1L) == Set(1L, 3L, 5L))
    // running again yields the identical assignment (determinism)
    val again = Clustering.kmeans(blobs, k = 2, iters = 2)
      .orderBy("vec_id").as[(Long, Long, Long)].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("iters=0 assigns directly against the seed vectors") {
    val out = Clustering.kmeans(blobs, k = 2, iters = 0)
      .orderBy("vec_id").as[(Long, Long, Long)].collect()
    // seed 0 = vec 0, seed 1 = vec 1; members sit with their blob's seed
    assert(out.filter(r => Set(0L, 2L, 4L)(r._1)).forall(_._2 == 0L))
    assert(out.filter(r => Set(1L, 3L, 5L)(r._1)).forall(_._2 == 1L))
    // seeds themselves are at distance 0
    assert(out(0)._3 == 0L && out(1)._3 == 0L)
  }

  test("duplicate seeds: lowest cluster id wins ties, empty cluster keeps centroid") {
    val dup = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(1.2f, -0.1f))).toDF("vec_id", "embedding")
    // iters=0: seeds 0 and 1 are identical, every point ties between them
    // → the lower cluster id (0) takes all
    val direct = Clustering.kmeans(dup, k = 2, iters = 0)
      .as[(Long, Long, Long)].collect()
    assert(direct.forall(_._2 == 0L))
    // after an update round cluster 1 is empty but must keep its seed
    // centroid (k stays 2, no crash) — and the retained seed may
    // legitimately win points back; all we pin is totality + id range
    val out = Clustering.kmeans(dup, k = 2, iters = 2)
      .as[(Long, Long, Long)].collect()
    assert(out.length == 4)
    assert(out.forall(r => r._2 == 0L || r._2 == 1L))
  }

  test("nearDupPairsClustered: subset of exact pairs, within-cluster complete") {
    val exact = EmbeddingKnn.nearDupPairsExact(blobs, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val clustered = Clustering.nearDupPairsClustered(
        blobs, threshold = 0.99, k = 2, iters = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(clustered.subsetOf(exact))
    // blob assignment is clean here, so every exact pair is intra-cluster
    // → recall 1.0 on this fixture
    assert(clustered == exact)
  }

  test("kmeans requires k <= corpus size") {
    val tiny = Seq((0L, Seq(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Clustering.kmeans(tiny, k = 2, iters = 1)
    }
  }
}
