package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def counts = Seq(
    ("L1", "a", 5L), ("L1", "b", 3L), ("L1", "c", 3L), ("L1", "d", 1L),
    ("L2", "x", 2L)).toDF("loc", "item", "count")

  test("ranks are strictly sequential 1..k even on tied counts") {
    val out = TopK.perGroup(counts, Seq(col("loc")),
        Seq(col("count").desc, col("item").asc), k = 3, rankCol = "r")
      .filter(col("loc") === "L1").orderBy("r")
      .select("r", "item").as[(Int, String)].collect()
    // b and c tie on count; row_number still assigns distinct sequential
    // ranks with the asc item tie-break (reference invariant:
    // ParquetCombinerRDDIntegrationTest.scala:253-264)
    assert(out.toSeq == Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("topX greater than available items returns all items (reference :631-664)") {
    val out = TopK.perGroup(counts, Seq(col("loc")),
      Seq(col("count").desc, col("item").asc), k = 100, rankCol = "r")
    assert(out.filter(col("loc") === "L1").count() == 4)
    assert(out.filter(col("loc") === "L2").count() == 1)
  }

  test("empty input yields empty output (reference :357-377)") {
    val out = TopK.perGroup(counts.filter(col("loc") === "missing"),
      Seq(col("loc")), Seq(col("count").desc), k = 5, rankCol = "r")
    assert(out.count() == 0)
  }

  test("rows per group == min(k, group size) across random fixtures") {
    // property sweep (deterministic seeds): 1..8 groups of 0..12 rows, k 1..6
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val k = 1 + rnd.nextInt(6)
      val rows = for {
        g <- 0 until (1 + rnd.nextInt(8))
        i <- 0 until rnd.nextInt(13)
      } yield (s"g$g", s"i$i", rnd.nextInt(100).toLong)
      if (rows.nonEmpty) {
        val df = rows.toDF("loc", "item", "count")
        val expected = rows.groupBy(_._1).view.mapValues(v => math.min(k, v.size)).toMap
        val got = TopK.perGroup(df, Seq(col("loc")),
            Seq(col("count").desc, col("item").asc), k, "r")
          .groupBy("loc").count().as[(String, Long)].collect().toMap
        assert(got == expected.map { case (g, n) => g -> n.toLong }.filter(_._2 > 0))
      }
    }
  }
}
