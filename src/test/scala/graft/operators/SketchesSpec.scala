package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import Sketches._

  test("BottomKAgg keeps the k lexicographically-smallest (ord, id) pairs") {
    val agg = BottomKAgg(3)
    val items = Seq(("d", 4L), ("a", 1L), ("c", 3L), ("b", 2L), ("e", 5L))
    val b = items.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) == Seq(1L, 2L, 3L))
  }

  test("merge is order-independent (mergeable sketch property)") {
    val agg = BottomKAgg(4)
    val items = (1L to 40L).map(i => (f"${(i * 37) % 41}%02d", i))
    val whole = items.foldLeft(agg.zero)(agg.reduce)
    // arbitrary 3-way split, merged in both orders
    val parts = items.grouped(13).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val m1 = parts.foldLeft(agg.zero)(agg.merge)
    val m2 = parts.reverse.foldLeft(agg.zero)(agg.merge)
    assert(agg.finish(m1) == agg.finish(whole))
    assert(agg.finish(m2) == agg.finish(whole))
  }

  test("merging sketches of OVERLAPPING sets does not double-insert members") {
    val agg = BottomKAgg(2)
    val b1 = Seq(("a", 1L)).foldLeft(agg.zero)(agg.reduce)
    val b2 = Seq(("a", 1L), ("b", 2L)).foldLeft(agg.zero)(agg.reduce)
    // union semantics: {1} ∪ {1, 2} = {1, 2}, not [1, 1]
    assert(agg.finish(agg.merge(b1, b2)) == Seq(1L, 2L))
    assert(agg.finish(agg.merge(b2, b1)) == Seq(1L, 2L))
  }

  test("hash ties break on the payload id") {
    val agg = BottomKAgg(2)
    val b = Seq(("x", 9L), ("x", 2L), ("x", 5L)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) == Seq(2L, 5L))
  }

  test("distributed result equals single-pass result over any partitioning") {
    val data = (0L until 200L).map(i => ("g" + (i % 3), i))
    val agg = udaf(BottomKAgg(5))
    def run(parts: Int): Map[String, Seq[Long]] = data.toDF("g", "id")
      .repartition(parts)
      .select(col("g"), substring(md5(col("id").cast("string")), 1, 16).as("ord"), col("id"))
      .groupBy("g").agg(agg(col("ord"), col("id")).as("s"))
      .as[(String, Seq[Long])].collect().toMap
    assert(run(1) == run(7))
  }
}
