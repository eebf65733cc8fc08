package graft.operators

import org.apache.spark.sql.functions._
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

  test("decimal mode is bit-identical to long mode") {
    val edges = (0L until 120L).map(i => (i % 20, 100L + (i * 7) % 11))
      .toDF("u", "v").distinct()
    assert(scores(Hits.run(edges, 3)) ==
      scores(Hits.run(edges, 3, decimal = true)))
  }

  test("overflow boundary: long mode fails LOUDLY past the degree bound; decimal succeeds") {
    // a star with max_degree just over Long.MaxValue / Scale^2 (~9.2e6):
    // in long mode the renormalize multiply would exceed 2^63
    val over = Hits.LongModeMaxDegree + 1
    val star = spark.range(over)
      .select(col("id").as("u"), lit(-1L).as("v"))
    val e = intercept[IllegalArgumentException](Hits.run(star, 1))
    assert(e.getMessage.contains("decimal = true"))
    // decimal mode computes through it: the hub side all ties at 1e6
    // (every u has out-degree 1), the single authority maxes out
    val got = Hits.run(star, 1, decimal = true)
      .filter(col("side") === "auth").collect()
    assert(got.length == 1 && got.head.getLong(2) == 1000000L)
    // and just UNDER the bound long mode runs (guard passes; the sums
    // here stay tiny because scores renormalize each half-round)
    val under = Seq((1L, 10L), (2L, 10L)).toDF("u", "v")
    assert(scores(Hits.run(under, 1)).nonEmpty)
  }

  test("partition invariance") {
    val edges = (0L until 120L).map(i => (i % 20, 100L + (i * 7) % 11))
      .toDF("u", "v").distinct()
    val a = scores(Hits.run(edges.repartition(1), 2))
    val b = scores(Hits.run(edges.repartition(13), 2))
    assert(a == b && a.nonEmpty)
  }
}
