package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class JoinStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile total equals the actually-executed join cardinality") {
    val a = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("ka")
    val b = Seq(1L, 2L, 2L, 2L, 4L).toDF("kb")
    val prof = JoinStats.profile(a, "ka", b, "kb").collect()
    val actual = a.join(b, col("ka") === col("kb")).count()
    assert(prof.head.getAs[Long]("total_pairs") == actual)
    assert(actual == 3L * 1 + 1L * 3) // key 1: 3x1, key 2: 1x3
  }

  test("the hot key ranks first with its exact fan-out") {
    // key 7 on both sides 20x30 = 600 pairs; everything else tiny
    val a = (Seq.fill(20)(7L) ++ (100L until 110L)).toDF("k")
    val b = (Seq.fill(30)(7L) ++ (100L until 105L)).toDF("k")
    val prof = JoinStats.profile(a, "k", b, "k", topK = 3).collect()
    assert(prof.head.getAs[Long]("k") == 7L)
    assert(prof.head.getAs[Long]("n_a") == 20L)
    assert(prof.head.getAs[Long]("n_b") == 30L)
    assert(prof.head.getAs[Long]("pairs") == 600L)
    assert(prof.head.getAs[Long]("rnk") == 1L)
    assert(prof.length == 3)
    assert(prof.head.getAs[Long]("total_pairs") == 605L)
  }

  test("disjoint key spaces profile to an empty frame (join would be empty)") {
    val a = Seq(1L, 2L).toDF("k")
    val b = Seq(3L, 4L).toDF("k")
    assert(JoinStats.profile(a, "k", b, "k").isEmpty)
  }
}
