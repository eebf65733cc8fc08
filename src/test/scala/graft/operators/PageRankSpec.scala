package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sink-only nodes appear in the output and accumulate incoming mass") {
    // directed star into a sink: 1->3, 2->3; node 3 has no outgoing edge
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("u", "v")
    val out = PageRank.run(edges, iters = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L), "node space must be union(u, v)")
    val byNode = out.map(r => r._1 -> r).toMap
    assert(byNode(3L)._2 == 0L, "sink keeps deg 0")
    // the sink receives both sources' damped mass and must outrank them
    assert(byNode(3L)._3 > byNode(1L)._3)
    assert(byNode(1L)._3 == byNode(2L)._3, "symmetric sources tie")
  }

  test("symmetrized graphs preserve total mass (no dangling loss)") {
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("u", "v")
    val edges = e0.union(e0.select($"v".as("u"), $"u".as("v")))
    val scale = 1000000L
    val out = PageRank.run(edges, iters = 3, scale)
      .as[(Long, Long, Long)].collect()
    assert(out.length == 4)
    val total = out.map(_._3).sum
    // floor divisions lose at most a few units per node per round
    assert(total > scale - 100 && total <= scale, s"total=$total")
  }

  test("personalized: mass concentrates around the seed, far nodes get none") {
    // path 0-1-2-3-4-5 (symmetric), seed at node 0, 2 rounds: rank can
    // only have reached distance <= 2 from the seed
    val path = (0L until 5L).map(i => (i, i + 1))
    val e0 = path.toDF("u", "v")
    val edges = e0.union(e0.select($"v".as("u"), $"u".as("v")))
    val seeds = Seq(0L).toDF("node")
    val out = PageRank.personalized(edges, seeds, iters = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out(0L) > out(1L) && out(1L) > 0L && out(2L) > 0L)
    assert(out(3L) == 0L && out(4L) == 0L && out(5L) == 0L)
    // uniform teleport (run) would fund every node instead
    val uni = PageRank.run(edges, iters = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(uni(5L) > 0L)
  }

  test("personalized with ALL nodes as seeds equals the uniform form") {
    val ring = (0L until 12L).map(i => (i, (i + 1) % 12))
    val e0 = ring.toDF("u", "v")
    val edges = e0.union(e0.select($"v".as("u"), $"u".as("v")))
    val all = (0L until 12L).toDF("node")
    val p = PageRank.personalized(edges, all, iters = 3)
      .as[(Long, Long, Long)].collect().toSet
    val u = PageRank.run(edges, iters = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(p == u && p.nonEmpty)
  }

  test("20 iterations stay fast (per-iteration lineage truncation)") {
    // ring of 50 nodes, symmetric: without localCheckpoint per round the
    // analyzed plan doubles each iteration and analysis alone dominates
    val ring = (0L until 50L).map(i => (i, (i + 1) % 50))
    val e0 = ring.toDF("u", "v")
    val edges = e0.union(e0.select($"v".as("u"), $"u".as("v")))
    val t0 = System.nanoTime()
    val out = PageRank.run(edges, iters = 20).as[(Long, Long, Long)].collect()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.length == 50)
    // regular graph: the fixpoint is uniform rank
    assert(out.map(_._3).distinct.length == 1)
    assert(sec < 30.0, f"20 iterations took $sec%.1fs — lineage is growing")
  }
}
