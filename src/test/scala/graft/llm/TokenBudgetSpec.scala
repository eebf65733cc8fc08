package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TokenBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, tokens, quality) — quality spread across bucket boundaries so
  // the two-phase path exercises multiple buckets
  private def corpus = Seq(
    (1L, 10L, 0.90), (2L, 20L, 0.80), (3L, 30L, 0.70),
    (4L, 40L, 0.60), (5L, 50L, 0.50), (6L, 60L, 0.40),
    (7L, 10L, 0.90), (8L, 5L, 0.05)).toDF("doc_id", "w", "q")

  private def fill(budget: Long) =
    TokenBudget.fill(corpus, "doc_id", col("w"), col("q"), budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)

  test("two-phase cumsum equals the literal global rank order") {
    // rank order: (1,10) (7,10) (2,20) (3,30) (4,40) (5,50) (6,60) (8,5)
    // cums:        10     20     40     70     110    160    220    225
    assert(fill(110).toSeq == Seq((1L, 10L, 10L), (2L, 20L, 40L),
      (3L, 30L, 70L), (4L, 40L, 110L), (7L, 10L, 20L)))
  }

  test("strict prefix: the first overflow cuts everything ranked below") {
    // budget 100: doc 4 (cum 110) overflows; doc 8 (w=5) would fit in
    // the residue but ranks below the overflow — strict prefix excludes it
    assert(fill(100).map(_._1).toSeq == Seq(1L, 2L, 3L, 7L))
    // raising the budget only adds documents (monotone selection)
    assert(fill(100).map(_._1).toSet.subsetOf(fill(160).map(_._1).toSet))
  }

  test("ties on quality break by id; null quality ranks last") {
    val withNull = corpus.union(Seq((9L, 1L, Double.NaN)).toDF()
      .select(col("_1"), col("_2"), lit(null).cast("double").as("_3")))
    val out = TokenBudget.fill(withNull, "doc_id", col("w"), col("q"), 225L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // doc 9 (null -> 0.0) ranks after doc 8 (0.05): cum 225 + 1 = 226 > 225
    assert(!out.contains(9L) && out(8L) == 225L)
    // quality ties (1 and 7, both 0.90): id order pins 1 before 7
    assert(out(1L) == 10L && out(7L) == 20L)
  }
}
