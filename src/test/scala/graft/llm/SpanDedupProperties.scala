package graft.llm

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** Generative invariants for exact-span dedup: the WHOLE pass
  * (duplicate detection → run merge → clip → threshold → cut) compared
  * against an independent brute-force model on small corpora drawn from
  * a 6-token alphabet (heavy gram collisions by construction: short
  * docs, whole-doc duplicates, overlapping and adjacent runs all occur
  * naturally), and batch-split independence of the persisted index.
  */
object SpanDedupProperties extends Properties("graft.llm.SpanDedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 3
  private val MinSpan = 5

  private val genDoc: Gen[Seq[String]] = for {
    len <- Gen.choose(2, 30) // 2 exercises the sub-k whole-text gram
    toks <- Gen.listOfN(len, Gen.choose(0, 5).map(i => s"t$i"))
  } yield toks

  private val genCorpus: Gen[List[(Long, Seq[String])]] = for {
    nDocs <- Gen.choose(3, 8)
    docs <- Gen.listOfN(nDocs, genDoc)
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** Independent model of the full pass, straight from the contract. */
  private def brute(corpus: List[(Long, Seq[String])])
      : Map[Long, (Long, Long, Long, String)] = {
    val grams = corpus.flatMap { case (id, t) =>
      if (t.size < K) Seq((id, 0L, t.mkString(" ")))
      else (0 to t.size - K).map(p => (id, p.toLong, t.slice(p, p + K).mkString(" ")))
    }
    val occ = grams.groupBy(_._3).view.mapValues(_.size).toMap
    corpus.map { case (id, t) =>
      val ntok = t.size.toLong
      val dupPos = grams.collect {
        case (i, p, g) if i == id && occ(g) >= 2 => p
      }.sorted
      val runs = dupPos.foldLeft(List.empty[(Long, Long)]) {
        case ((s, n) :: rest, p) if p == s + n => (s, n + 1) :: rest
        case (acc, p) => (p, 1L) :: acc
      }
      val spans = runs.map { case (s, n) =>
        (s, math.min(s + n + K - 1, ntok) - s)
      }.filter(_._2 >= MinSpan)
      val covered = spans.flatMap { case (s, l) => s until (s + l) }.toSet
      val kept = t.zipWithIndex.collect {
        case (w, i) if !covered.contains(i.toLong) => w
      }
      id -> ((ntok, spans.size.toLong, covered.size.toLong, kept.mkString(" ")))
    }.toMap
  }

  private def collectCleanse(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap

  property("cleanse matches the brute-force model on collision-heavy corpora") =
    forAll(genCorpus) { corpus =>
      val df = corpus.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
      collectCleanse(SpanDedup.cleanse(df, "doc_id", "text", K, MinSpan)) ==
        brute(corpus)
    }

  /** cleanseAgainst model: duplicated = gram present in the reference. */
  private def bruteAgainst(corpus: List[(Long, Seq[String])],
      ref: List[Seq[String]]): Map[Long, (Long, Long, Long, String)] = {
    val refGrams = ref.flatMap { t =>
      if (t.size < K) Seq(t.mkString(" "))
      else (0 to t.size - K).map(p => t.slice(p, p + K).mkString(" "))
    }.toSet
    corpus.map { case (id, t) =>
      val ntok = t.size.toLong
      val grams =
        if (t.size < K) Seq((0L, t.mkString(" ")))
        else (0 to t.size - K).map(p => (p.toLong, t.slice(p, p + K).mkString(" ")))
      val dupPos = grams.collect { case (p, g) if refGrams(g) => p }.sorted
      val runs = dupPos.foldLeft(List.empty[(Long, Long)]) {
        case ((s, n) :: rest, p) if p == s + n => (s, n + 1) :: rest
        case (acc, p) => (p, 1L) :: acc
      }
      val spans = runs.map { case (s, n) =>
        (s, math.min(s + n + K - 1, ntok) - s)
      }.filter(_._2 >= MinSpan)
      val covered = spans.flatMap { case (s, l) => s until (s + l) }.toSet
      val kept = t.zipWithIndex.collect {
        case (w, i) if !covered.contains(i.toLong) => w
      }
      id -> ((ntok, spans.size.toLong, covered.size.toLong, kept.mkString(" ")))
    }.toMap
  }

  property("cleanseAgainst matches its brute-force model (reference-keyed cuts)") =
    forAll(genCorpus, Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genDoc))) {
      (corpus, ref) =>
        val corpusDf = corpus.map { case (id, t) => (id, t.mkString(" ")) }
          .toDF("doc_id", "text")
        val refDf = ref.zipWithIndex
          .map { case (t, i) => (1000L + i, t.mkString(" ")) }
          .toDF("rid", "rtext")
        collectCleanse(SpanDedup.cleanseAgainst(corpusDf, "doc_id", "text",
          refDf, "rid", "rtext", K, MinSpan)) == bruteAgainst(corpus, ref)
    }

  property("index split into arbitrary disjoint batches reproduces one-shot") =
    forAll(genCorpus, Gen.choose(2, 3)) { (corpus, nb) =>
      val df = corpus.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("graft-sdprop").toString
      // doc 0 anchors batch 0 so build never sees an empty frame;
      // remaining docs land on id % nb (some batches may be empty)
      SpanDedupIndex.build(
        df.filter(col("doc_id") % nb === 0), s"$dir/idx", "doc_id", "text", K)
      (1 until nb).foreach { b =>
        SpanDedupIndex.addBatch(spark, s"$dir/idx",
          df.filter(col("doc_id") % nb === b), "doc_id", "text", K)
      }
      collectCleanse(SpanDedupIndex.cleanseWith(
        spark, s"$dir/idx", df, "doc_id", "text", K, MinSpan)) == brute(corpus)
    }
}
