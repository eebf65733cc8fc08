package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RrfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fuse(rows: Seq[(Long, Long, Long)], k0: Int = 60, topK: Int = 5) =
    Rrf.fuse(rows.toDF("qid", "id", "rank"), k0, topK)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

  test("a doc ranked by both lists beats a higher single-list rank") {
    // doc 10: rank 2 in both lists -> 2 * (1e6 div 62) = 32258
    // doc 20: rank 1 in one list   -> 1e6 div 61       = 16393
    val rows = Seq(
      (1L, 20L, 1L), (1L, 10L, 2L),   // list A
      (1L, 30L, 1L), (1L, 10L, 2L))   // list B
    val out = fuse(rows)
    assert(out.head == ((1L, 1L, 10L, 2 * (1000000L / 62), 2L)))
    // 20 and 30 tie on score (16393); tie broken by id
    assert(out(1)._3 == 20L && out(2)._3 == 30L)
    assert(out(1)._4 == 1000000L / 61)
  }

  test("contributions are the exact floor divisions of the paper formula") {
    val out = fuse(Seq((1L, 5L, 1L)), k0 = 60)
    assert(out.head._4 == 16393L) // floor(1e6 / 61)
    val out0 = fuse(Seq((1L, 5L, 3L)), k0 = 0)
    assert(out0.head._4 == 333333L) // floor(1e6 / 3)
  }

  test("topK truncates per query independently") {
    val rows = for (q <- 1L to 2L; i <- 1L to 10L) yield (q, i, i)
    val out = fuse(rows, topK = 3)
    assert(out.length == 6)
    assert(out.count(_._1 == 1L) == 3)
    assert(out.filter(_._1 == 2L).map(_._2).toSeq == Seq(1L, 2L, 3L))
  }

  test("n_lists counts list memberships") {
    val rows = Seq((1L, 9L, 1L), (1L, 9L, 4L), (1L, 9L, 2L))
    assert(fuse(rows).head._5 == 3L)
  }
}
