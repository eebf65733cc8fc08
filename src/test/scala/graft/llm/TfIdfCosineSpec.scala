package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TfIdfCosineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3))).toMap

  test("exact duplicates score cos2 = 1e6; disjoint docs never pair") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta")).toDF("doc_id", "text")
    val got = pairs(TfIdfCosine.similarPairs(docs, "doc_id", "text",
      thresholdPct = 50))
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L))._2 == 1000000L)
  }

  test("weighted overlap beats unweighted: rare-term sharers outrank stop-word sharers") {
    // docs 1,2 share the corpus-rare word; docs 1,3 share only the
    // word present in EVERY doc (minimal idf)
    val docs = Seq(
      (1L, "the xylophone"),
      (2L, "the xylophone"),
      (3L, "the common words here"),
      (4L, "the more filler text"),
      (5L, "the other doc entirely")).toDF("doc_id", "text")
    val all = pairs(TfIdfCosine.similarPairs(docs, "doc_id", "text",
      thresholdPct = 1))
    val rare = all((1L, 2L))._2
    assert(rare == 1000000L)
    assert(all.filter(_._1 != ((1L, 2L))).values.forall(_._2 < rare))
  }

  test("stop-term cap drops pairs that share ONLY over-cap terms (defined, not silent)") {
    val boiler = (10L until 20L).map(i => (i, s"click here u$i"))
    val docs = (Seq((1L, "click here"), (2L, "click here please")) ++ boiler)
      .toDF("doc_id", "text")
    val capped = pairs(TfIdfCosine.similarPairs(docs, "doc_id", "text",
      thresholdPct = 10, maxDocFreq = 5))
    // 'click'/'here' have df=12 > 5 -> dropped; doc 1 has no terms left
    assert(!capped.keySet.exists { case (a, b) => a == 1L || b == 1L })
    val uncapped = pairs(TfIdfCosine.similarPairs(docs, "doc_id", "text",
      thresholdPct = 10))
    assert(uncapped.keySet.exists { case (a, b) => a == 1L && b == 2L })
  }

  test("hotTerms reports exactly the over-cap terms with their df") {
    val boiler = (10L until 20L).map(i => (i, s"click here u$i"))
    val docs = (Seq((1L, "click here"), (2L, "click here please")) ++ boiler)
      .toDF("doc_id", "text")
    val hot = TfIdfCosine.hotTerms(docs, "doc_id", "text", maxDocFreq = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'click'/'here' appear in all 12 docs; every other term is rare
    assert(hot == Map("click" -> 12L, "here" -> 12L))
    // df counts DOCS, not occurrences: repeating a term within one doc
    // must not push it over the cap
    val rep = Seq((1L, "dup dup dup dup dup dup solo"), (2L, "other text"))
      .toDF("doc_id", "text")
    assert(TfIdfCosine.hotTerms(rep, "doc_id", "text", maxDocFreq = 5).isEmpty)
    // default cap on a clean corpus: empty report = capped == uncapped
    assert(TfIdfCosine.hotTerms(docs, "doc_id", "text").isEmpty)
  }

  test("partition invariance") {
    val docs = (0L until 60L).map(i =>
      (i, (0 to (i % 5).toInt).map(j => s"w${(i * 7 + j * 3) % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    def run(np: Int) = pairs(TfIdfCosine.similarPairs(
      docs.repartition(np), "doc_id", "text", thresholdPct = 40))
    assert(run(1) == run(13) && run(1).nonEmpty)
  }
}
