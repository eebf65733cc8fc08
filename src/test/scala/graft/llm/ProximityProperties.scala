package graft.llm

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.TestSpark

/** Generative check of the merge-scan minimum-distance claim: over
  * random docs and random multi-term queries, [[Proximity.minDistances]]
  * must equal the brute-force minimum over ALL cross occurrence pairs
  * (the O(occ×occ) form the merge scan replaces). The 6-token alphabet
  * forces heavy repetition — many occurrences per term per doc — which
  * is exactly where an adjacency-only scan could go wrong.
  */
object ProximityProperties extends Properties("graft.llm.Proximity") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Sentinel = 1000000L

  private val genDoc: Gen[Seq[String]] =
    Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 5).map(i => s"t$i")))

  private val genCorpusAndQueries
      : Gen[(List[(Long, Seq[String])], List[(Long, Seq[String])])] = for {
    nDocs <- Gen.choose(2, 6)
    docs <- Gen.listOfN(nDocs, genDoc)
    nQ <- Gen.choose(1, 3)
    qs <- Gen.listOfN(nQ, Gen.choose(2, 4).flatMap(m =>
      Gen.listOfN(m, Gen.choose(0, 5).map(i => s"t$i"))))
  } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) },
    qs.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private def brute(docs: List[(Long, Seq[String])],
      queries: List[(Long, Seq[String])]): Set[(Long, Long, Int, Long)] =
    (for {
      (qid, qtoks) <- queries
      qt = qtoks.distinct
      if qt.size >= 2
      (pr, (t1, t2)) <- qt.zip(qt.tail).zipWithIndex.map {
        case (p, i) => (i + 1, p)
      }
      (did, dtoks) <- docs
    } yield {
      val p1 = dtoks.zipWithIndex.collect { case (w, i) if w == t1 => i }
      val p2 = dtoks.zipWithIndex.collect { case (w, i) if w == t2 => i }
      val d =
        if (p1.isEmpty || p2.isEmpty) Sentinel
        else (for (a <- p1; b <- p2) yield math.abs(a - b).toLong).min
      (qid, did, pr, d)
    }).toSet

  property("merge-scan min distance equals the cross-product minimum") =
    forAll(genCorpusAndQueries) { case (docs, queries) =>
      val corpusDf = docs.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val queriesDf = queries.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("qid", "qtext")
      val cand = docs.flatMap { case (did, _) =>
        queries.map { case (qid, _) => (qid, did) }
      }.toDF("qid", "did")
      val pairs = Proximity.adjacentPairs(queriesDf, "qid", "qtext")
      val got = Proximity
        .minDistances(corpusDf, "doc_id", "text", cand, pairs, Sentinel)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .toSet
      got == brute(docs, queries)
    }
}
