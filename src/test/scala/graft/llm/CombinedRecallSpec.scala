package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.SortedNeighborhood

/** Pins the complementarity claim behind q194: sorted-neighborhood
  * blocking and MinHash-LSH banding have INDEPENDENT failure modes, so
  * each generator alone misses a true near-dup pair the other catches,
  * and the union catches both.
  */
class CombinedRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // doc 1 == doc 20 verbatim (jaccard 1.0), but 18 same-length fillers
  // sort between them in the (n_chars, doc_id) order — 19 positions
  // apart, far outside the w=5 window. docs 30/31 share 4 of their
  // 8 distinct word-3-shingles (jaccard exactly 0.5) and hold unique
  // adjacent lengths, so they are SNB-adjacent.
  private lazy val fixture = {
    val twin = "identical twin document body here"
    val fillers = (2L until 20L).map { i =>
      (i, f"filler number $i%02d content words aa") // same length as twin
    }
    val docs = (Seq((1L, twin), (20L, twin),
      (30L, "alpha beta gamma delta epsilon zeta eta theta"),
      (31L, "alpha beta gamma delta epsilon zeta mm nn")) ++ fillers)
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    // fixture sanity: all fillers and the twins share one length
    val twinLen = twin.length.toLong
    assert(docs.filter(col("doc_id").between(2L, 20L))
      .select("n_chars").distinct().collect().map(_.getLong(0)).toSet
      == Set(twinLen))
    docs
  }

  private def snbPairs = SortedNeighborhood
    .candidates(fixture, "doc_id", Seq(col("n_chars"), col("doc_id")), w = 5)
    .select(least(col("id_a"), col("id_b")).as("id_a"),
      greatest(col("id_a"), col("id_b")).as("id_b"))

  private def lshPairs = MinHashDedup
    .candidatePairs(fixture, "doc_id", "text")

  private def toSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("SNB misses the far-apart identical pair; LSH catches it") {
    assert(!toSet(snbPairs).contains((1L, 20L)))
    assert(toSet(lshPairs).contains((1L, 20L)))
  }

  test("LSH banding misses the borderline pair; SNB catches it") {
    // jaccard(30, 31) = 0.5: banding probability 1-(1-0.5^4)^8 ~= 0.40,
    // and the SEEDED signatures deterministically land on a miss for
    // this fixture — exactly the recall hole SNB covers
    assert(!toSet(lshPairs).contains((30L, 31L)))
    assert(toSet(snbPairs).contains((30L, 31L)))
  }

  test("the union, exact-verified, holds both pairs") {
    val got = JaccardVerify
      .verify(snbPairs.unionByName(lshPairs).distinct(),
        fixture, "doc_id", "text", threshold = 0.5)
    val pairs = got.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.keySet.contains((1L, 20L)) && pairs((1L, 20L)) == 1.0)
    assert(pairs.keySet.contains((30L, 31L)) && pairs((30L, 31L)) == 0.5)
    // and nothing below threshold leaks through verification
    assert(pairs.values.forall(_ >= 0.5))
  }
}
