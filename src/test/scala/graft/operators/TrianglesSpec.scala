package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side brute force: count node triples with all three edges. */
  private def bruteTriangles(edges: Seq[(Long, Long)]): Long = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    nodes.combinations(3).count { case Seq(x, y, z) =>
      es((x, y)) && es((x, z)) && es((y, z))
    }
  }

  private def summaryMap(edges: Seq[(Long, Long)]): Map[String, Long] =
    Triangles.summary(edges.toDF("a", "b"))
      .as[(String, Long)].collect().toMap

  test("K4 has 4 triangles, C5 has none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val s4 = summaryMap(k4)
    assert(s4("n_edges") == 6 && s4("n_triangles") == 4)
    val c5 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    val s5 = summaryMap(c5)
    assert(s5("n_edges") == 5 && s5("n_triangles") == 0)
  }

  test("hub-and-spoke star yields zero triangles despite max skew") {
    // degree orientation must not enumerate the hub's neighbor pairs:
    // all edges point INTO the hub, so the wedge set is empty
    val star = (2L to 40L).map(i => (1L, i))
    val s = summaryMap(star)
    assert(s("n_wedges") == 0 && s("n_triangles") == 0)
  }

  test("triangle rows are oriented uniquely and match brute force") {
    // two triangles sharing an edge plus a pendant
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (3L, 4L), (4L, 5L))
    val tri = Triangles.triangles(g.toDF("a", "b"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(tri.size == tri.distinct.size)
    assert(tri.size == bruteTriangles(g))
  }

  test("random graph matches driver-side brute force") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 120).map(_ => (rnd.nextInt(20).toLong + 1,
      rnd.nextInt(20).toLong + 1))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val s = summaryMap(edges)
    assert(s("n_triangles") == bruteTriangles(edges))
  }
}
