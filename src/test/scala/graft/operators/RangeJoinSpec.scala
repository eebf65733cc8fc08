package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches exactly the pairs a nested-loop BETWEEN join would") {
    val rnd = new scala.util.Random(5)
    val points = Seq.tabulate(200)(i => (i.toLong, rnd.nextDouble() * 100))
      .toDF("pid", "x")
    val intervals = Seq.tabulate(30) { i =>
      val lo = rnd.nextDouble() * 90
      (i.toLong, lo, lo + rnd.nextDouble() * 15)
    }.toDF("iid", "lo", "hi")
    for (w <- Seq(0.5, 7.0, 200.0)) { // narrow, typical, one-bin-fits-all
      val binned = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val naive = points.join(intervals, col("x") >= col("lo") && col("x") <= col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(binned == naive, s"binWidth=$w")
      assert(naive.nonEmpty)
    }
  }

  test("closed bounds, null and inverted intervals") {
    val points = Seq((1L, 10.0), (2L, 20.0), (3L, Double.NaN)).toDF("pid", "x")
      .withColumn("x", when(col("pid") === 3L, lit(null)).otherwise(col("x")))
    val intervals = Seq(
      (1L, Some(10.0), Some(20.0)),  // closed: both endpoints match
      (2L, Some(30.0), Some(25.0)),  // inverted: never matches
      (3L, None, Some(50.0)))        // null bound: never matches
      .toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", 5.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L), (2L, 1L)))
  }

  test("plans as a shuffled equi-join on the bin, not a nested loop") {
    val points = Seq((1L, 10.0)).toDF("pid", "x")
    val intervals = Seq((1L, 5.0, 15.0)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
