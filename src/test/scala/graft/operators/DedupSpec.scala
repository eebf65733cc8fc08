package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("byKeyMin keeps the row minimal under the tie-break, per key") {
    val df = Seq(
      (1L, 30L, "c"), (1L, 10L, "a"), (1L, 20L, "b"),
      (2L, 5L, "x")).toDF("k", "ts", "v")
    val out = Dedup.byKeyMin(df, Seq("k"), Seq("ts")).orderBy("k")
      .as[(Long, Long, String)].collect()
    assert(out.toSeq == Seq((1L, 10L, "a"), (2L, 5L, "x")))
  }

  test("byKeyMin multi-column tie-break is lexicographic") {
    val df = Seq(
      (1L, 10L, "b"), (1L, 10L, "a"), (1L, 9L, "z")).toDF("k", "ts", "v")
    val out = Dedup.byKeyMin(df, Seq("k"), Seq("ts", "v"))
      .as[(Long, Long, String)].collect()
    assert(out.toSeq == Seq((1L, 9L, "z")))
  }

  test("byKeyArbitrary yields exactly one row per key") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (3L, "e"))
      .toDF("k", "v")
    val out = Dedup.byKeyArbitrary(df, Seq("k"))
    assert(out.count() == 3)
    assert(out.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("exactByContent collapses equal content to the smallest id") {
    val df = Seq(
      (5L, "same text"), (2L, "same text"), (9L, "same text"),
      (7L, "other")).toDF("id", "text")
    val out = Dedup.exactByContent(df, "id", Seq("text"))
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(2L, 7L))
  }

  test("exactByContent NUL-join keeps column boundaries distinct") {
    // ("a","bc") must NOT collide with ("ab","c")
    val df = Seq((1L, "a", "bc"), (2L, "ab", "c")).toDF("id", "c1", "c2")
    assert(Dedup.exactByContent(df, "id", Seq("c1", "c2")).count() == 2)
  }

  test("exactByContent treats null content as its own group") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]), (3L, "t"))
      .toDF("id", "text")
    val out = Dedup.exactByContent(df, "id", Seq("text"))
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L))
  }
}
