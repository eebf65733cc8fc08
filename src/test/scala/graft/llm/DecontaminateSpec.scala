package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(corpus: Seq[(Long, String)], bench: Seq[(Long, String)],
      n: Int = 3) =
    Decontaminate.overlap(corpus.toDF("doc_id", "text"),
      bench.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a doc quoting one benchmark shingle is flagged; clean docs are absent") {
    val bench = Seq((1L, "what is the capital of france"))
    val corpus = Seq(
      // embeds "the capital of" (one 3-shingle of the question) in
      // otherwise unrelated text — the leak near-dup thresholds miss
      (100L, "today we discuss the capital of a struggling startup firm"),
      (101L, "entirely unrelated content about databases and joins"))
    val got = run(corpus, bench)
    assert(got.keySet == Set(100L))
    assert(got(100L) == 1L)
  }

  test("overlap counts DISTINCT shared shingles, not occurrences") {
    val bench = Seq((1L, "a b c d"))       // shingles: abc, bcd
    val corpus = Seq(
      (100L, "a b c a b c a b c"),         // abc repeats -> counts once (+ bca, cab)
      (101L, "x a b c d y"))               // xab, abc, bcd, cdy -> 2 shared
    val got = run(corpus, bench)
    assert(got == Map(100L -> 1L, 101L -> 2L))
  }

  test("a verbatim benchmark copy overlaps on its full shingle set") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon"))
    val corpus = Seq((100L, "alpha beta gamma delta epsilon"))
    // 5 words -> 3 shingles, all shared
    assert(run(corpus, bench) == Map(100L -> 3L))
  }

  test("normalization matches the near-dup tier (case and whitespace)") {
    val bench = Seq((1L, "The   Quick Brown Fox"))
    val corpus = Seq((100L, "the quick brown fox jumps"))
    assert(run(corpus, bench).contains(100L))
  }

  test("report: per-eval-doc overlap fraction, clean docs emitted as zero") {
    val train = Seq(
      (100L, "one two three four five six unrelated tail here"),
      (101L, "completely different training content with no shared runs")
    ).toDF("doc_id", "text")
    val ref = Seq(
      // 8 tokens -> 3 distinct 6-grams, 2 of which ("one..six" window)
      // appear verbatim in train doc 100
      (1L, "one two three four five six seven eight"),
      (2L, "zero grams of this appear anywhere in the training side")
    ).toDF("doc_id", "text")
    val got = Decontaminate.report(train, ref, "doc_id", "text", n = 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // ref 1: 6-grams = {1..6, 2..7, 3..8}; train 100 contains 1..6 only
    assert(got(1L) == ((3L, 1L, 0.333333)))
    // clean doc present with zero overlap, not absent
    assert(got(2L)._2 == 0L && got(2L)._3 == 0.0)
  }

  test("report: short reference text falls back to the whole-text shingle") {
    val train = Seq((100L, "tiny doc")).toDF("doc_id", "text")
    val ref = Seq((1L, "tiny doc"), (2L, "other snippet")).toDF("doc_id", "text")
    val got = Decontaminate.report(train, ref, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((1L, 1L)), 2L -> ((1L, 0L))))
  }
}
