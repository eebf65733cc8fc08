package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class HitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scores(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("star buyer dominates hubs; the shared supplier dominates authorities") {
    // buyer 1 buys from everyone; buyers 2-4 each buy only supplier 10.
    val edges = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 10L), (3L, 10L), (4L, 10L)).toDF("u", "v")
    val got = scores(Hits.run(edges, iters = 2))
    assert(got(("hub", 1L)) == 1000000L)
    assert(got(("auth", 10L)) == 1000000L)
    // niche suppliers are seen only by the big hub: equal, below the max
    assert(got(("auth", 11L)) == got(("auth", 12L)))
    assert(got(("auth", 11L)) < 1000000L)
    // narrow buyers score below the star buyer
    assert(got(("hub", 2L)) < 1000000L)
    assert(got(("hub", 2L)) == got(("hub", 3L)))
  }

  test("disconnected components are scored independently but on one scale") {
    val edges = Seq(
      (1L, 10L), (2L, 10L),            // popular supplier
      (5L, 20L)).toDF("u", "v")        // lone pair
    val got = scores(Hits.run(edges, iters = 1))
    assert(got(("auth", 10L)) == 1000000L)
    assert(got(("auth", 20L)) == 500000L)  // indeg 1 vs 2 after round 1
  }

  test("partition invariance") {
    val edges = (0L until 120L).map(i => (i % 20, 100L + (i * 7) % 11))
      .toDF("u", "v").distinct()
    val a = scores(Hits.run(edges.repartition(1), 2))
    val b = scores(Hits.run(edges.repartition(13), 2))
    assert(a == b && a.nonEmpty)
  }
}
