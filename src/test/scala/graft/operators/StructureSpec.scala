package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Units for the corpus-structure operators: count-min sketch, label
  * propagation, and the skyline. Each is pinned against a driver-side
  * brute-force ground truth on fixtures small enough to enumerate.
  */
class StructureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------- count-min sketch ----------------

  test("cms never undercounts and is exact absent collisions") {
    val keys = Seq.tabulate(300)(i => (i % 37).toLong) // 37 distinct keys
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val agg = udaf(CountMin.CountMinAgg(4, 256))
    val m = keys.toDF("h").agg(agg(col("h"))).head()
      .getSeq[Long](0).toIndexedSeq
    exact.foreach { case (k, n) =>
      val est = CountMin.estimate(m, k, 4, 256)
      assert(est >= n, s"key $k: est $est < exact $n")
    }
    // 37 keys in 4x256 cells: some row of the 4 is collision-free for
    // every key with overwhelming margin on this fixed fixture — the
    // estimate equals exact for all keys (asserts the min-of-rows works)
    assert(exact.forall { case (k, n) => CountMin.estimate(m, k, 4, 256) == n })
  }

  test("cms matrix is partitioning-invariant (merge associativity)") {
    val keys = Seq.tabulate(500)(i => (i % 91).toLong)
    val agg = udaf(CountMin.CountMinAgg(4, 64))
    def matrix(parts: Int): Seq[Long] =
      keys.toDF("h").repartition(parts).agg(agg(col("h"))).head().getSeq[Long](0)
    assert(matrix(1) == matrix(7))
  }

  // ---------------- label propagation ----------------

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LabelPropagation.run(edges.toDF("u", "v"), iters)
      .as[(Long, Long)].collect().toMap

  test("two cliques with one bridge resolve to two communities") {
    val k4a = for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j)
    val k4b = for (i <- 11L to 14L; j <- 11L to 14L if i < j) yield (i, j)
    val labels = lpa(k4a ++ k4b :+ (4L, 11L), iters = 3)
    // each clique converges to its own minimum
    assert((1L to 4L).map(labels).toSet.size == 1)
    assert((11L to 14L).map(labels).toSet.size == 1)
    assert(labels(1L) != labels(11L))
  }

  test("labels are a pure function of the graph, not its partitioning") {
    val edges = (for (i <- 0L until 30L) yield (i, (i * 7) % 30)) ++
      (for (i <- 0L until 30L) yield (i, (i + 1) % 30))
    val a = lpa(edges, 3)
    val b = LabelPropagation.run(
      edges.toDF("u", "v").repartition(13), 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("synchronous update uses previous-round labels (one round on a path)") {
    // path 1-2-3: after ONE round each node adopts its smallest
    // neighbor's INITIAL label: 1<-2's init 2, 2<-min(1,3)'s most
    // frequent (tie) -> 1, 3<-2's init 2
    val labels = lpa(Seq((1L, 2L), (2L, 3L)), iters = 1)
    assert(labels == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  // ---------------- bpe trainer ----------------

  test("bpe learns the classic merges and stops when no pairs remain") {
    import graft.llm.BpeTrainer
    val words = Seq(("abab", 2L), ("ab", 1L)).toDF("word", "freq")
    val merges = BpeTrainer.train(words, rounds = 3)
    // (a,b) appears 2x in "abab" (x2 freq) + 1x in "ab" = 5; after the
    // merge, (ab,ab) appears once per "abab"; then nothing is adjacent
    assert(merges.map(m => (m.round, m.a, m.b, m.cnt)) ==
      Seq((1, "a", "b", 5L), (2, "ab", "ab", 2L)))
  }

  test("bpe merge application is the greedy non-overlapping scan") {
    import graft.llm.BpeTrainer
    // "aaa" with winner (a,a): greedy merges the FIRST pair only ->
    // [aa, a], so round 2's top pair is (aa, a), not (a, aa)
    val merges = BpeTrainer.train(Seq(("aaa", 1L)).toDF("word", "freq"), 2)
    assert(merges.map(m => (m.round, m.a, m.b, m.cnt)) ==
      Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  // ---------------- skyline ----------------

  private def bruteFrontier(pts: Seq[(Long, Long)]): Set[(Long, Long)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }.toSet

  test("skyline matches brute force on a deterministic scatter") {
    val pts = for (i <- 0L until 200L)
      yield ((i * 67) % 101, (i * 31) % 97)
    val got = Skyline.frontier2D(pts.toDF("x", "y"), "x", "y", 10L)
      .as[(Long, Long)].collect().toSet
    assert(got == bruteFrontier(pts))
  }

  test("duplicate frontier points all survive; ties on x keep only max y") {
    val pts = Seq((5L, 5L), (5L, 5L), (5L, 3L), (3L, 7L), (2L, 9L), (1L, 1L))
    val got = Skyline.frontier2D(pts.toDF("x", "y"), "x", "y", 2L)
      .as[(Long, Long)].collect().toSeq
    assert(got.count(_ == (5L, 5L)) == 2)
    assert(got.toSet == bruteFrontier(pts))
  }

  test("prune phase is lossless at every bucket width") {
    val pts = for (i <- 0L until 120L) yield ((i * 13) % 50, (i * 29) % 61)
    val want = bruteFrontier(pts)
    for (w <- Seq(1L, 3L, 7L, 1000L)) {
      val got = Skyline.frontier2D(pts.toDF("x", "y"), "x", "y", w)
        .as[(Long, Long)].collect().toSet
      assert(got == want, s"bucketWidth $w")
    }
  }
}
