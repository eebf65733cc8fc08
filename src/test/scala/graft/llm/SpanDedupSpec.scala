package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  // Shared passage long enough to qualify (30 tokens ≥ minSpan 20).
  private val shared = words("dup", 30)

  test("a shared passage is found at the right offset in BOTH docs, every occurrence cut") {
    val a = (words("ua", 20) ++ shared ++ words("za", 10)).mkString(" ")
    val b = (shared ++ words("ub", 25)).mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("id", "text")

    val sp = SpanDedup.spans(docs, "id", "text", k = 8, minSpanTokens = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // In doc 1 the shared tokens sit at [20, 50); grams fully inside the
    // passage start at 20..42 (23 grams) → 23 + 7 = 30 tokens. Doc 2: [0, 30).
    assert(sp == Set((1L, 20L, 30L), (2L, 0L, 30L)))

    val out = SpanDedup.cleanse(docs, "id", "text", k = 8, minSpanTokens = 20)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == ((60L, 1L, 30L,
      (words("ua", 20) ++ words("za", 10)).mkString(" "))))
    assert(out(2L) == ((55L, 1L, 30L, words("ub", 25).mkString(" "))))
  }

  test("intra-document repeats count toward the occurrence threshold") {
    val x = words("self", 25)
    val doc = (x ++ words("mid", 10) ++ x).mkString(" ")
    val docs = Seq((7L, doc)).toDF("id", "text")
    val out = SpanDedup.cleanse(docs, "id", "text", k = 8, minSpanTokens = 20)
      .collect().head
    // Both copies of x are cut; only the 10 middle tokens survive.
    assert(out.getLong(1) == 60L && out.getLong(2) == 2L)
    assert(out.getLong(3) == 50L)
    assert(out.getString(4) == words("mid", 10).mkString(" "))
  }

  test("runs below minSpanTokens are reported by duplicatedRuns but not cut") {
    val short = words("s", 12) // 12-token shared run: 5 grams at k=8
    val docs = Seq(
      (1L, (short ++ words("p", 20)).mkString(" ")),
      (2L, (words("q", 20) ++ short).mkString(" "))).toDF("id", "text")
    val runs = SpanDedup.duplicatedRuns(docs, "id", "text", k = 8).count()
    assert(runs == 2L)
    val out = SpanDedup.cleanse(docs, "id", "text", k = 8, minSpanTokens = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L))
  }

  test("whole-corpus duplicate: doc cut to empty, short exact dup below floor kept") {
    val long = words("w", 40).mkString(" ")
    val tiny = words("t", 5).mkString(" ") // < k tokens: single whole-text gram
    val docs = Seq((1L, long), (2L, long), (3L, tiny), (4L, tiny))
      .toDF("id", "text")
    val out = SpanDedup.cleanse(docs, "id", "text", k = 8, minSpanTokens = 20)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == ((40L, "")) && out(2L) == ((40L, "")))
    // the 5-token exact dup IS detected (whole-text gram) but its span
    // (5 tokens) is under the 20-token cut threshold
    assert(out(3L) == ((0L, tiny)) && out(4L) == ((0L, tiny)))
  }

  test("overlapping mutations split runs: only the verbatim stretches qualify") {
    // B = A with one token changed in the middle of the passage → the run
    // splits at the mutation; each half is 19 tokens < 20 → nothing cut.
    val base = words("v", 40)
    val mutated = base.updated(19, "CHANGED")
    val docs = Seq(
      (1L, (base ++ words("fa", 3)).mkString(" ")),
      (2L, (mutated ++ words("fb", 3)).mkString(" "))).toDF("id", "text")
    // doc1 vs doc2 share [0,19) and [20,40) — 19 and 20 tokens. The
    // second stretch has 20 − 8 + 1 = 13 grams → exactly 20 tokens → cut;
    // the first has 12 grams → 19 tokens → kept.
    val sp = SpanDedup.spans(docs, "id", "text", k = 8, minSpanTokens = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sp == Set((1L, 20L, 20L), (2L, 20L, 20L)))
  }

  test("cleanseAgainst cuts only reference-verbatim spans, not corpus-internal dups") {
    val quote = words("bench", 22)
    val selfDup = words("selfdup", 24)
    val bench = Seq((100L, (words("bq", 5) ++ quote).mkString(" ")))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, (words("c1", 8) ++ quote ++ words("c1t", 4)).mkString(" ")),
      (2L, selfDup.mkString(" ")), // duplicated WITHIN corpus (docs 2+3)
      (3L, (selfDup ++ words("c3", 6)).mkString(" ")),
      (4L, words("c4", 30).mkString(" "))).toDF("doc_id", "text")
    val out = SpanDedup.cleanseAgainst(corpus, "doc_id", "text",
        bench, "doc_id", "text", k = 8, minSpanTokens = 20)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // doc 1 loses exactly the 22-token quote; the corpus-internal dup
    // (docs 2/3) is NOT benchmark material and survives untouched
    assert(out(1L) == ((1L, 22L,
      (words("c1", 8) ++ words("c1t", 4)).mkString(" "))))
    assert(out(2L) == ((0L, 0L, selfDup.mkString(" "))))
    assert(out(3L)._2 == 0L && out(4L)._2 == 0L)
    assert(!out.contains(100L)) // rows cover the corpus side only
  }

  test("null and blank text degrade to null/zero rows, not errors") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "   "),
      (3L, words("ok", 25).mkString(" "))).toDF("id", "text")
    val out = SpanDedup.cleanse(docs, "id", "text", 8, 20)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).isNullAt(1) && out(1L).getLong(2) == 0L)
    assert(out(2L).getLong(1) == 0L && out(2L).getString(4) == "")
    assert(out(3L).getLong(3) == 0L)
  }
}
