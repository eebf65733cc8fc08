package graft.llm

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** Generative parity for the exact-integer NB: on ANY random labeled
  * corpus and ANY probe set (in-vocabulary, OOV, and mixed tokens),
  * classify must equal the plain-Scala whole-bit model — training
  * counts, Laplace quotients, bitlength floors, prior bits, OOV
  * fallback, and the (score, label) tie order all at once.
  */
object NaiveBayesProperties extends Properties("graft.llm.NaiveBayes") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val words = Vector("w0", "w1", "w2", "w3", "w4", "w5", "zz")
  private val labels = Vector("a", "b", "c")

  private val genCorpus: Gen[List[(Long, String, String)]] = for {
    n <- Gen.choose(3, 14)
    rows <- Gen.listOfN(n, for {
      l <- Gen.oneOf(labels)
      k <- Gen.choose(1, 6)
      ws <- Gen.listOfN(k, Gen.oneOf(words))
    } yield (l, ws.mkString(" ")))
  } yield rows.zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }

  private val genProbe: Gen[String] = for {
    k <- Gen.choose(1, 5)
    ws <- Gen.listOfN(k, Gen.oneOf(words :+ "oov_token"))
  } yield ws.mkString(" ")

  private def bits(q: Long): Long =
    (64 - java.lang.Long.numberOfLeadingZeros(q) - 1).toLong

  private def brute(corpus: List[(Long, String, String)],
      probe: String): (String, Long) = {
    val toks = corpus.flatMap { case (_, l, t) => t.split(" ").map(l -> _) }
    val vocab = toks.map(_._2).distinct.size
    val nCt = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nTok = toks.groupBy(_._1).map { case (l, v) => l -> v.size.toLong }
    val nDocs = corpus.groupBy(_._2).map { case (l, v) => l -> v.size.toLong }
    val d = corpus.size.toLong
    nTok.keys.toSeq.map { l =>
      val score = bits(d / nDocs(l)) + probe.split(" ").map { t =>
        bits((nTok(l) + vocab) / (nCt.getOrElse((l, t), 0L) + 1L))
      }.sum
      (l, score)
    }.sortBy { case (l, s) => (s, l) }.head
  }

  property("classify == plain-Scala whole-bit model on random corpora") =
    forAll(genCorpus, Gen.listOfN(3, genProbe)) { (corpus, probes) =>
      val (classes, tokenBits) = NaiveBayes.train(
        corpus.toDF("id", "label", "text"), "id", "label", col("text"))
      val tests = probes.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = NaiveBayes.classify(tests.toDF("id", "text"), "id",
          col("text"), classes, tokenBits)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
        .toMap
      tests.forall { case (id, t) => got(id) == brute(corpus, t) }
    }
}
