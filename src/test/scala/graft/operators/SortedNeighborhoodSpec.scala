package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SortedNeighborhoodSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("window of w emits exactly the pairs within w positions") {
    // keys sort as id order: positions are 0..9
    val df = (0L until 10L).map(i => (i, i * 10)).toDF("id", "key")
    val got = pairs(SortedNeighborhood.candidates(
      df, "id", Seq(col("key"), col("id")), w = 2, numPartitions = 3))
    val want = (for {
      a <- 0L until 10L
      b <- (a + 1) to math.min(a + 2, 9L)
    } yield (a, b)).toSet
    assert(got == want)
  }

  test("two-phase positions equal a literal global row_number at any partitioning") {
    val df = (0L until 97L).map(i => (i, (i * 37) % 50)).toDF("id", "key")
    val expected = {
      val pos = df.withColumn("p",
        row_number().over(Window.orderBy(col("key"), col("id"))) - 1)
      pos.as("a").join(pos.as("b"),
          col("b.p") > col("a.p") && col("b.p") <= col("a.p") + 4)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    for (np <- Seq(1, 5, 32)) {
      val got = pairs(SortedNeighborhood.candidates(
        df, "id", Seq(col("key"), col("id")), w = 4, numPartitions = np))
      assert(got == expected, s"numPartitions=$np")
    }
  }

  test("skewed key: candidates stay O(n*w) even when one key value dominates") {
    // 500 rows share ONE key value; hash blocking would emit 500^2/2
    // pairs — sorted-neighborhood emits exactly n*w bounded pairs
    val df = (0L until 500L).map(i => (i, 7L)).toDF("id", "key")
    val got = SortedNeighborhood.candidates(
      df, "id", Seq(col("key"), col("id")), w = 3)
    assert(got.count() == (499 + 498 + 497))
  }

  test("positions returned are 0-based and adjacent pairs differ by at most w") {
    val df = (0L until 20L).map(i => (i, i)).toDF("id", "key")
    val out = SortedNeighborhood.candidates(
      df, "id", Seq(col("key"), col("id")), w = 1).collect()
    assert(out.forall(r => r.getAs[Long]("pos_b") - r.getAs[Long]("pos_a") == 1L))
    assert(out.map(_.getAs[Long]("pos_a")).min == 0L)
  }
}
