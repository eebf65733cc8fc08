package graft.llm

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** Generative invariants for the BM25 index's delete/fold lifecycle:
  * any batch split followed by any tombstone set must score exactly
  * like a one-shot build over the surviving corpus — the contract the
  * q226 oracle pins once, here swept over random corpora (including
  * deletes that empty a term's postings entirely, so the df>0 filter
  * edge is exercised).
  */
object Bm25IndexProperties extends Properties("graft.llm.Bm25Index") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "rare1", "rare2")

  private val genCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(4, 16)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(2, 8)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "rank", "did", "score_x1000").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  property("split ⊕ delete == one-shot over survivors") =
    forAll(genCorpus, Gen.choose(1, 15), Gen.choose(0, 100)) {
      (corpus, splitAt, delSeed) =>
        val df = corpus.toDF("doc_id", "text")
        val cut = splitAt % corpus.size
        val path = graft.queries.Scratch.dir("bm25idx-prop")
        Bm25Index.build(df.filter(col("doc_id") <= cut), path,
          "doc_id", "text")
        if (cut < corpus.size - 1)
          Bm25Index.addBatch(spark, path, df.filter(col("doc_id") > cut),
            "doc_id", "text")
        // delete roughly a third of the ids (plus one id that never
        // existed, which must be a no-op)
        val dels = corpus.map(_._1).filter(id => (id + delSeed) % 3 == 0)
        Bm25Index.deleteDocs(spark, path,
          (dels :+ 99999L).toDF("doc_id"))
        val queries = Seq((0L, s"${vocab(delSeed % vocab.size)} alpha"))
          .toDF("qid", "qtext")
        val survivors = df.filter(!col("doc_id").isin(dels: _*))
        val viaIndex = rows(Bm25Index.search(spark, path, queries, k = 4))
        val oneShot =
          if (dels.size == corpus.size) Set.empty[(Long, Long, Long, Long)]
          else rows(Bm25.search(survivors, "doc_id", "text", queries, k = 4))
        viaIndex == oneShot
    }
}
