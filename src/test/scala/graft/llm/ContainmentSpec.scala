package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b", "cont_x100").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("a snippet is contained in its source, not vice versa") {
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val snip = (5 to 14).map(i => s"w$i").mkString(" ")   // 10 words inside
    val docs = Seq((1L, long), (2L, snip), (3L, "x y z q r s t u v"))
      .toDF("doc_id", "text")
    val got = pairs(Containment.containedPairs(docs, "doc_id", "text"))
    // snippet: 8 distinct shingles, all inside doc 1 -> containment 100
    assert(got.contains((2L, 1L, 100L)))
    // the reverse (28 shingles, 8 shared) is 8*100 div 28 = 28 < 80
    assert(!got.exists { case (a, b, _) => a == 1L && b == 2L })
    assert(!got.exists { case (a, b, _) => a == 3L || b == 3L })
  }

  test("exact duplicates contain each other both ways") {
    val t = "alpha beta gamma delta epsilon zeta"
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val got = pairs(Containment.containedPairs(docs, "doc_id", "text"))
    assert(got == Set((1L, 2L, 100L), (2L, 1L, 100L)))
  }

  test("matches brute force on a random-ish corpus (prefix is lossless)") {
    val rows = (0L until 60L).map { i =>
      val words = (0 to 10 + (i % 7).toInt)
        .map(j => s"w${(i * 13 + j * 7) % 31}")
      (i, words.mkString(" "))
    }
    val docs = rows.toDF("doc_id", "text")
    val fast = pairs(Containment.containedPairs(docs, "doc_id", "text",
      thresholdPct = 70))
    // brute force: all ordered pairs, exact containment
    val sets = docs.select(col("doc_id"),
      array_distinct(graft.functions.TextFunctions
        .wordShingles(col("text"), 3)).as("sh"))
    val brute = sets.as("a").crossJoin(sets.as("b"))
      .filter(col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))) * 100 /
          size(col("a.sh"))).cast("long").as("cont_x100"))
      .filter(col("cont_x100") >= 70)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast.map { case (a, b, _) => (a, b) } == brute)
  }

  test("short documents (under n words) degrade to whole-text shingles") {
    val docs = Seq((1L, "ab"), (2L, "ab"), (3L, "cd")).toDF("doc_id", "text")
    val got = pairs(Containment.containedPairs(docs, "doc_id", "text"))
    assert(got == Set((1L, 2L, 100L), (2L, 1L, 100L)))
  }
}
