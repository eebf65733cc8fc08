package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap

  test("boilerplate lines are stripped, content survives in order") {
    // 7 docs share HEADER and FOOTER (df=7 > maxDf=2); "dup" is in 3 docs
    // (df=3 > 2); each doc's own content lines are unique (df=1).
    val docsDf = (0L until 7L).map { i =>
      (i, Seq("HEADER", s"body $i one", "dup", s"body $i two", "FOOTER")
        .filter(l => l != "dup" || i < 3))
    }.toDF("id", "lines")
    val out = toMap(LineDedup.clean(docsDf, "id", col("lines"), maxDf = 2L))
    assert(out.size == 7)
    (0L until 3L).foreach { i =>
      assert(out(i) == ((5L, 2L, s"body $i one\nbody $i two")))
    }
    (3L until 7L).foreach { i =>
      assert(out(i) == ((4L, 2L, s"body $i one\nbody $i two")))
    }
  }

  test("a doc that is ALL boilerplate stays in the output, empty") {
    val docsDf = Seq(
      (1L, Seq("X", "keep me")),
      (2L, Seq("X")),
      (3L, Seq("X")),
      (4L, Seq("X"))).toDF("id", "lines")
    val out = toMap(LineDedup.clean(docsDf, "id", col("lines"), maxDf = 3L))
    assert(out(2L) == ((1L, 0L, "")))
    assert(out(1L) == ((2L, 1L, "keep me")))
  }

  test("df counts documents, not occurrences: intra-doc repeats don't ban a line") {
    // "x" appears 3 times but only in doc 1 → df=1 <= maxDf=2 → kept.
    val docsDf = Seq(
      (1L, Seq("x", "x", "x")),
      (2L, Seq("other"))).toDF("id", "lines")
    val out = toMap(LineDedup.clean(docsDf, "id", col("lines"), maxDf = 2L))
    assert(out(1L) == ((3L, 3L, "x\nx\nx")))
  }

  test("partition invariance") {
    val base = (0L until 40L).map { i =>
      (i, Seq("COMMON", s"u$i a", s"u$i b"))
    }
    val a = toMap(LineDedup.clean(base.toDF("id", "lines").repartition(1),
      "id", col("lines"), maxDf = 5L))
    val b = toMap(LineDedup.clean(base.toDF("id", "lines").repartition(13),
      "id", col("lines"), maxDf = 5L))
    assert(a == b && a.size == 40)
  }
}
