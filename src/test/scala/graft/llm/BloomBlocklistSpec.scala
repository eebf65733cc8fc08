package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BloomBlocklistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("classify is exact: contaminated shingle counts match brute force; clean docs report 0") {
    val dir = java.nio.file.Files.createTempDirectory("bl-spec").toString
    val blocklist = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    BloomBlocklist.build(blocklist, "text", n = 3, path = dir,
      expectedItems = 1000L)
    val batch = Seq(
      // shares "the quick brown", "quick brown fox" 3-grams
      (10L, "look the quick brown fox ran away"),
      // verbatim blocklist text: every shingle contaminated
      (11L, "pack my box with five dozen liquor jugs"),
      // clean
      (12L, "completely unrelated sentence about spark plans"),
      // short doc (< 3 tokens -> whole-text shingle), clean
      (13L, "tiny doc")).toDF("doc_id", "text")
    val out = BloomBlocklist.classify(batch, "doc_id", "text", n = 3, dir)
      .select("doc_id", "n_bloom_hits", "n_contaminated")
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // brute force for doc 10: 3-grams of the batch text vs blocklist
    // 3-grams -> "the quick brown" and "quick brown fox" match. Exact
    // counts assert on the VERIFIED column; bloom hits may carry
    // (deterministic) false positives, so only the funnel bound holds.
    assert(out(0)._1 == 10L && out(0)._3 == 2L)
    assert(out(1)._1 == 11L && out(1)._3 == 6L) // 8 tokens -> 6 shingles
    assert(out(2)._1 == 12L && out(2)._3 == 0L)
    assert(out(3)._1 == 13L && out(3)._3 == 0L)
    // Funnel invariant: the Bloom may over-flag but never under-flag.
    assert(out.forall { case (_, hits, confirmed) => hits >= confirmed })
  }

  test("the persisted bitmap round-trips: a fresh load classifies identically") {
    val dir = java.nio.file.Files.createTempDirectory("bl-rt").toString
    val blocklist = (1L to 50L)
      .map(i => (i, s"benchmark question number $i about topic ${i % 7}"))
      .toDF("doc_id", "text")
    BloomBlocklist.build(blocklist, "text", n = 3, path = dir,
      expectedItems = 5000L)
    val batch = (100L to 120L)
      .map(i => (i, if (i % 2 == 0) s"benchmark question number ${i - 99} about topic ${(i - 99) % 7}"
                    else s"novel content $i")).toDF("doc_id", "text")
    val a = BloomBlocklist.classify(batch, "doc_id", "text", 3, dir)
      .select("doc_id", "n_contaminated").as[(Long, Long)].collect().toMap
    val b = BloomBlocklist.classify(batch, "doc_id", "text", 3, dir)
      .select("doc_id", "n_contaminated").as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.values.exists(_ > 0) && a.values.exists(_ == 0))
  }
}
