package graft.llm

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** Generative invariants for token-budget selection: the two-phase
  * bucketed cumsum against the literal global rank order computed in
  * plain Scala, on corpora whose qualities deliberately straddle
  * bucket boundaries (exact k/256 values occur with high probability,
  * so the floor-boundary edge is exercised), plus per-group isolation.
  */
object TokenBudgetProperties extends Properties("graft.llm.TokenBudget") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genCorpus: Gen[List[(Long, Long, Double, String)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      w <- Gen.choose(1L, 50L)
      // mix exact bucket-boundary qualities (k/256) with arbitrary ones
      q <- Gen.oneOf(Gen.choose(0, 256).map(_ / 256.0),
        Gen.choose(0.0, 1.0))
      src <- Gen.oneOf("a", "b", "c")
    } yield (w, q, src))
  } yield rows.zipWithIndex.map { case ((w, q, s), i) => (i.toLong, w, q, s) }

  /** The contract, literally: global (quality desc, id asc) rank order,
    * strict prefix of cumulative weights within budget.
    */
  private def brute(rows: List[(Long, Long, Double, String)],
      budget: Long): Map[Long, Long] = {
    val ranked = rows.sortBy { case (id, _, q, _) => (1.0 - q, id) }
    val cums = ranked.scanLeft(0L) { case (c, (_, w, _, _)) => c + w }.tail
    ranked.zip(cums).collect { case ((id, _, _, _), c) if c <= budget =>
      id -> c
    }.toMap
  }

  property("two-phase fill == literal global rank order") =
    forAll(genCorpus, Gen.choose(1L, 600L)) { (rows, budget) =>
      val df = rows.toDF("doc_id", "w", "q", "src")
      val got = TokenBudget.fill(df, "doc_id", col("w"), col("q"), budget)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      got == brute(rows, budget)
    }

  property("per-group fill == literal model applied group by group") =
    forAll(genCorpus, Gen.choose(1L, 300L)) { (rows, budget) =>
      val df = rows.toDF("doc_id", "w", "q", "src")
      val got = TokenBudget.fillPerGroup(df, "doc_id", col("w"), col("q"),
          budget, Seq("src"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
        .toMap
      val want = rows.groupBy(_._4).flatMap { case (src, grp) =>
        brute(grp, budget).map { case (id, c) => (src, id) -> c }
      }
      got == want
    }
}
