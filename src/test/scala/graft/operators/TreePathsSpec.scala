package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TreePathsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def resolveMap(edges: Seq[(Long, Long)], rounds: Int) =
    TreePaths.resolve(edges.toDF("node", "parent"), rounds)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("a 10-deep chain resolves in 4 doubling rounds (2^4 >= 10)") {
    val chain = (0L, 0L) +: (1L to 10L).map(i => (i, i - 1))
    val got = resolveMap(chain, rounds = 4)
    (0L to 10L).foreach(i => assert(got(i) == ((0L, i))))
  }

  test("extra rounds are no-ops once converged") {
    val chain = (0L, 0L) +: (1L to 5L).map(i => (i, i - 1))
    assert(resolveMap(chain, 3) == resolveMap(chain, 6))
  }

  test("multi-root forest: each node reaches ITS root with the right depth") {
    // two trees: 0 <- 2 <- 4; 1 <- 3 <- 5 <- 7
    val edges = Seq((0L, 0L), (1L, 1L), (2L, 0L), (4L, 2L),
      (3L, 1L), (5L, 3L), (7L, 5L))
    val got = resolveMap(edges, 3)
    assert(got(4L) == ((0L, 2L)))
    assert(got(7L) == ((1L, 3L)))
    assert(got(0L) == ((0L, 0L)) && got(1L) == ((1L, 0L)))
  }

  test("rounds=12 on a deep chain completes fast (plan stays linear in rounds)") {
    // 2^12 = 4096 >= 300; without per-round localCheckpoint the logical
    // plan holds 2^12 copies of the scan and the analyzer hangs — with
    // it this finishes in seconds.
    val chain = (0L, 0L) +: (1L to 300L).map(i => (i, i - 1))
    val t0 = System.nanoTime()
    val got = resolveMap(chain, rounds = 12)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got(300L) == ((0L, 300L)))
    assert(got(137L) == ((0L, 137L)))
    assert(secs < 120.0, s"deep-chain resolve took ${secs}s — plan growth?")
  }

  test("too few rounds leaves deep nodes unresolved (contract, not magic)") {
    val chain = (0L, 0L) +: (1L to 10L).map(i => (i, i - 1))
    val got = resolveMap(chain, rounds = 2) // covers depth <= 4
    assert(got(3L) == ((0L, 3L)))
    assert(got(10L)._1 != 0L, "depth-10 node cannot resolve in 2 rounds")
  }
}
