package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class NaiveBayesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def train = Seq(
    (1L, "spam", "buy cheap pills now buy"),
    (2L, "spam", "cheap pills cheap deal"),
    (3L, "ham", "meeting notes for the quarter"),
    (4L, "ham", "quarter results and notes"),
    (5L, "ham", "the meeting moved")).toDF("id", "label", "text")

  /** Plain-Scala reference: whole-bit Laplace NB, same arithmetic. */
  private def brute(trainRows: Seq[(Long, String, String)],
      text: String): Map[String, Long] = {
    val toks = trainRows.flatMap { case (_, l, t) => t.split(" ").map(l -> _) }
    val vocab = toks.map(_._2).distinct.size
    val nCt = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nTok = toks.groupBy(_._1).map { case (l, v) => l -> v.size.toLong }
    val nDocs = trainRows.groupBy(_._2).map { case (l, v) => l -> v.size.toLong }
    val d = trainRows.size.toLong
    def bits(q: Long) = (64 - java.lang.Long.numberOfLeadingZeros(q) - 1).toLong
    nTok.keys.map { l =>
      val prior = bits(d / nDocs(l))
      val tok = text.split(" ").map { t =>
        bits((nTok(l) + vocab) / (nCt.getOrElse((l, t), 0L) + 1L))
      }.sum
      l -> (prior + tok)
    }.toMap
  }

  test("classify matches the plain-Scala whole-bit model, OOV included") {
    val (classes, tokenBits) = NaiveBayes.train(train, "id", "label",
      col("text"))
    val tests = Seq(
      (10L, "cheap pills deal"),         // spam-shaped
      (11L, "meeting notes quarter"),    // ham-shaped
      (12L, "zzz completely novel xxx")) // all-OOV -> priors + defaults
    val got = NaiveBayes.classify(tests.toDF("id", "text"), "id",
        col("text"), classes, tokenBits)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val trainRows = Seq(
      (1L, "spam", "buy cheap pills now buy"),
      (2L, "spam", "cheap pills cheap deal"),
      (3L, "ham", "meeting notes for the quarter"),
      (4L, "ham", "quarter results and notes"),
      (5L, "ham", "the meeting moved"))
    tests.foreach { case (id, text) =>
      val ref = brute(trainRows, text)
      val expected = ref.toSeq.sortBy { case (l, b) => (b, l) }.head
      assert(got(id) == expected, s"doc $id: got ${got(id)}, ref $ref")
    }
    assert(got(10L)._1 == "spam" && got(11L)._1 == "ham")
  }

  test("scores surface: one row per (doc, class); classify is its argmin") {
    val (classes, tokenBits) = NaiveBayes.train(train, "id", "label",
      col("text"))
    val t = Seq((20L, "cheap meeting")).toDF("id", "text")
    val sc = NaiveBayes.scores(t, "id", col("text"), classes, tokenBits)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(sc.keySet == Set("spam", "ham"))
    val pred = NaiveBayes.classify(t, "id", col("text"), classes, tokenBits)
      .collect().head
    assert(pred.getLong(2) == sc.values.min)
  }

  test("ties break by label ascending") {
    val sym = Seq(
      (1L, "a", "x"), (2L, "b", "y")).toDF("id", "label", "text")
    val (classes, tokenBits) = NaiveBayes.train(sym, "id", "label",
      col("text"))
    // token "z" is OOV for both classes; everything is symmetric, so
    // the scores tie and 'a' must win deterministically
    val pred = NaiveBayes.classify(Seq((9L, "z")).toDF("id", "text"),
        "id", col("text"), classes, tokenBits)
      .collect().head
    assert(pred.getString(1) == "a")
  }
}
