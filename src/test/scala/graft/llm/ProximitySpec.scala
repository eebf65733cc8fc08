package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ProximitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dists(corpus: org.apache.spark.sql.DataFrame,
      cand: org.apache.spark.sql.DataFrame,
      pairs: org.apache.spark.sql.DataFrame) =
    Proximity.minDistances(corpus, "doc_id", "text", cand, pairs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)) -> r.getLong(3))
      .toMap

  test("adjacentPairs: distinct terms in first-occurrence order") {
    val q = Seq((1L, "big apple big pie"), (2L, "solo"), (3L, "a b c"))
      .toDF("qid", "qtext")
    val got = Proximity.adjacentPairs(q, "qid", "qtext").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSet
    // duplicates collapse ("big" once), single-term queries emit nothing
    assert(got == Set((1L, 1, "big", "apple"), (1L, 2, "apple", "pie"),
      (3L, 1, "a", "b"), (3L, 2, "b", "c")))
  }

  test("merge-scan min distance equals the brute-force minimum") {
    val corpus = Seq(
      (10L, "x new q q q york x new x"), // new@1,7; york@5 -> min 2
      (11L, "york a b c d e f new"),     // |0-7| = 7
      (12L, "new only here"),            // york missing -> sentinel
      (13L, "nothing relevant")).toDF("doc_id", "text")
    val cand = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L))
      .toDF("qid", "did")
    val pairs = Seq((1L, 1, "new", "york")).toDF("qid", "pr", "t1", "t2")
    assert(dists(corpus, cand, pairs) == Map(
      (1L, 10L, 1) -> 2L, (1L, 11L, 1) -> 7L,
      (1L, 12L, 1) -> 1000000L, (1L, 13L, 1) -> 1000000L))
  }

  test("pathological doc: 1,000 repeats of both terms stays linear") {
    // occ(t1) x occ(t2) = 1e6 pairs under a positional product; the
    // merge scan sees 2,000 window rows. Alternating layout -> min 1.
    val text = (0 until 1000).map(_ => "new york").mkString(" ")
    val corpus = Seq((10L, text), (11L, "new z z z york")).toDF("doc_id", "text")
    val cand = Seq((1L, 10L), (1L, 11L)).toDF("qid", "did")
    val pairs = Seq((1L, 1, "new", "york")).toDF("qid", "pr", "t1", "t2")
    val got = dists(corpus, cand, pairs)
    assert(got == Map((1L, 10L, 1) -> 1L, (1L, 11L, 1) -> 4L))
  }

  test("multi-pair query: per-pair minima are independent") {
    val corpus = Seq(
      (10L, "a x x b x x x x c"), // (a,b): 3, (b,c): 5
      (11L, "c b a")).toDF("doc_id", "text") // (a,b): 1, (b,c): 1
    val q = Seq((1L, "a b c")).toDF("qid", "qtext")
    val cand = Seq((1L, 10L), (1L, 11L)).toDF("qid", "did")
    val pairs = Proximity.adjacentPairs(q, "qid", "qtext")
    assert(dists(corpus, cand, pairs) == Map(
      (1L, 10L, 1) -> 3L, (1L, 10L, 2) -> 5L,
      (1L, 11L, 1) -> 1L, (1L, 11L, 2) -> 1L))
  }

  test("matches q190's positional-product formulation on random docs") {
    val rng = new scala.util.Random(42)
    val words = Vector("new", "york", "a", "b", "c")
    val corpus = (0L until 40L).map { i =>
      (i, (0 until 30).map(_ => words(rng.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val cand = (0L until 40L).map(i => (1L, i)).toDF("qid", "did")
    val pairs = Seq((1L, 1, "new", "york")).toDF("qid", "pr", "t1", "t2")
    // brute force: the occ x occ join the operator replaces
    val pos = corpus.select(col("doc_id").as("did"),
      posexplode(split(col("text"), " ")).as(Seq("p", "t")))
    val brute = corpus.select(col("doc_id").as("did"))
      .join(pos.filter(col("t") === "new")
        .select(col("did"), col("p").as("p1")), Seq("did"), "left")
      .join(pos.filter(col("t") === "york")
        .select(col("did").as("d2"), col("p").as("p2")),
        col("did") === col("d2"), "left")
      .groupBy("did")
      .agg(coalesce(min(abs(col("p1") - col("p2"))), lit(1000000L))
        .cast("long").as("bd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = dists(corpus, cand, pairs).map { case ((_, d, _), v) => d -> v }
    assert(got == brute && got.nonEmpty)
  }
}
