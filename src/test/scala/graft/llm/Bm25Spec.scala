package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana cherry date"),
    (2L, "apple apple apple banana"),
    (3L, "cherry cherry plum plum"),
    (4L, "kiwi mango papaya guava")).toDF("doc_id", "text")

  private def results(q: Seq[(Long, String)], k: Int = 4) =
    Bm25.search(docs, "doc_id", "text",
      q.toDF("qid", "qtext"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("a unique term retrieves exactly its document, first") {
    val got = results(Seq((0L, "kiwi")))
    assert(got.length == 1 && got.head._3 == 4L)
  }

  test("rare terms outscore common ones; repetition saturates, not dominates") {
    // "plum" (df=1) must outrank docs matched only via "apple" (df=2)
    val got = results(Seq((0L, "apple plum")))
    assert(got.head._3 == 3L, s"rare-term doc first, got ${got.toSeq}")
    // doc 2 has tf(apple)=3 vs doc 1's tf=1: higher, but less than 3x
    val byDoc = got.map(r => r._3 -> r._4).toMap
    assert(byDoc(2L) > byDoc(1L))
    assert(byDoc(2L) < 3L * byDoc(1L), "tf saturation must cap repetition")
  }

  test("multi-term queries sum per-term contributions; k caps output") {
    val got = results(Seq((0L, "apple cherry")), k = 2)
    assert(got.length == 2)
    assert(got.map(_._2).toSeq == Seq(1L, 2L))
    // docs 1 (both terms) beats any single-term match
    assert(got.head._3 == 1L)
  }

  test("query terms absent from the corpus contribute nothing") {
    val got = results(Seq((0L, "dragonfruit")))
    assert(got.isEmpty)
  }

  test("emitEmpty keeps zero-result qids as (rank 0, NULL, NULL) markers") {
    val q = Seq((1L, "apple"), (2L, "dragonfruit"), (3L, "zzz qqq"))
      .toDF("qid", "qtext")
    // default mode: all-OOV qids vanish (the documented contract)
    assert(Bm25.search(docs, "doc_id", "text", q, k = 2)
      .select("qid").distinct().collect().map(_.getLong(0)).toSet == Set(1L))
    val kept = Bm25.search(docs, "doc_id", "text", q, k = 2, emitEmpty = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    // every input qid present; hitless ones carry exactly one marker row
    assert(kept.map(_._1).toSet == Set(1L, 2L, 3L))
    assert(kept.filter(_._1 == 2L).toSeq == Seq((2L, 0L, -1L, -1L)))
    assert(kept.filter(_._1 == 3L).toSeq == Seq((3L, 0L, -1L, -1L)))
    // real hits are identical to the default mode (rank still starts at 1)
    assert(kept.filter(_._1 == 1L).map(x => (x._2, x._3, x._4)).toSet ==
      results(Seq((1L, "apple")), k = 2).map(x => (x._2, x._3, x._4)).toSet)
  }
}
