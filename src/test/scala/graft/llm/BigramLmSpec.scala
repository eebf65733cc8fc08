package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def surpMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("hand-checked surprisal bits on a 3-doc corpus") {
    // bigrams: d0: (a b)(b a)(a b)  d1: (a b)(b c)  d2: (c c)
    // c(a,b)=3 c(b,a)=1 c(b,c)=1 c(c,c)=1 ; c_x: a=3(wait) ...
    // contexts: a appears as first in (a,b)x3 -> c_a=3; b first in
    // (b,a),(b,c) -> c_b=2; c first in (c,c) -> c_c=1.
    // bits(a,b)=floor(log2(3/3))=0; bits(b,a)=floor(log2(2/1))=1;
    // bits(b,c)=1; bits(c,c)=0.
    val docs = Seq(
      (0L, "a b a b"),   // bigrams (a,b)(b,a)(a,b) -> 0+1+0 = 1
      (1L, "a b c"),     // (a,b)(b,c) -> 0+1 = 1
      (2L, "c c")        // (c,c) -> 0
    ).toDF("doc_id", "text")
    val out = surpMap(BigramLm.surprisal(docs, "doc_id", col("text")))
    assert(out(0L) == ((3L, 1L, 33L)))  // 1*100 div 3
    assert(out(1L) == ((2L, 1L, 50L)))
    assert(out(2L) == ((1L, 0L, 0L)))
  }

  test("single-token docs stay in the output with zeros") {
    val docs = Seq((0L, "only"), (1L, "a b")).toDF("doc_id", "text")
    val out = surpMap(BigramLm.surprisal(docs, "doc_id", col("text")))
    assert(out(0L) == ((0L, 0L, 0L)))
    assert(out(1L) == ((1L, 0L, 0L)))
  }

  test("floor-log2 identity: bitlength(a div b) - 1 == floor(log2(a/b))") {
    for (a <- 1L to 64L; b <- 1L to a) {
      val viaBits = java.lang.Long.toBinaryString(a / b).length - 1
      val viaLog = math.floor(math.log(a.toDouble / b) / math.log(2)).toInt
      assert(viaBits == viaLog, s"a=$a b=$b")
    }
  }

  test("pmi ranks the exclusive pair above the promiscuous one") {
    // (x1 y1) always co-occur and appear nowhere else; 'the' pairs with
    // everything. PMI must rank (x1,y1) strictly above any 'the' bigram.
    val rows = (0L until 30L).map { i =>
      (i, s"x1 y1 the w$i the v${i % 3}")
    }
    val docs = rows.toDF("doc_id", "text")
    val top = BigramLm.pmiTopK(docs, "doc_id", col("text"),
      minCount = 5L, k = 5).collect()
    assert(top.head.getString(0) == "x1" && top.head.getString(1) == "y1")
    val pmiTop = top.head.getLong(5)
    assert(top.tail.forall(_.getLong(5) <= pmiTop))
  }

  test("surprisal is partition-invariant") {
    val rows = (0L until 50L).map(i => (i, s"w${i % 7} q${i % 3} w${i % 7} z"))
    val a = surpMap(BigramLm.surprisal(
      rows.toDF("doc_id", "text").repartition(1), "doc_id", col("text")))
    val b = surpMap(BigramLm.surprisal(
      rows.toDF("doc_id", "text").repartition(17), "doc_id", col("text")))
    assert(a == b && a.size == 50)
  }
}
