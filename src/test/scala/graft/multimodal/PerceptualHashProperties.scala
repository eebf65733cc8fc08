package graft.multimodal

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.TestSpark

/** Generative check of the banding-completeness claim: at radius ≤ 3,
  * any pair within radius differs in at most 3 of the 4 disjoint
  * 16-bit blocks, so block-equality candidates are COMPLETE and
  * [[PerceptualHash.nearDupPairs]] must equal brute-force all-pairs
  * Hamming. Hash tables are built as random base hashes plus
  * explicit near-copies with k ≤ 6 random bit flips, so both
  * within-radius and just-outside pairs occur every run.
  */
object PerceptualHashProperties
    extends Properties("graft.multimodal.PerceptualHash") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genTable: Gen[List[(Long, Long, Long)]] = for {
    nBase <- Gen.choose(2, 5)
    bases <- Gen.listOfN(nBase,
      Gen.zip(Gen.choose(0L, (1L << 32) - 1), Gen.choose(0L, (1L << 32) - 1)))
    variants <- Gen.listOfN(nBase, for {
      k <- Gen.choose(0, 6)
      flips <- Gen.listOfN(k, Gen.choose(0, 63))
    } yield flips)
  } yield {
    val rows = bases.zipWithIndex.map { case ((h1, h2), i) =>
      (i.toLong, h1, h2)
    } ++ bases.zip(variants).zipWithIndex.map {
      case (((h1, h2), flips), i) =>
        val (f1, f2) = flips.foldLeft((h1, h2)) { case ((a, b), bit) =>
          if (bit < 32) (a ^ (1L << bit), b) else (a, b ^ (1L << (bit - 32)))
        }
        (100L + i, f1, f2)
    }
    rows
  }

  private def brute(rows: List[(Long, Long, Long)], radius: Int) =
    (for {
      (ia, a1, a2) <- rows; (ib, b1, b2) <- rows
      if ia < ib
      d = java.lang.Long.bitCount(a1 ^ b1) + java.lang.Long.bitCount(a2 ^ b2)
      if d <= radius
    } yield (ia, ib, d.toLong)).toSet

  property("nearDupPairs equals brute-force all-pairs Hamming at radius 3") =
    forAll(genTable) { rows =>
      val df = rows.toDF("id", "h1", "h2")
      val got = PerceptualHash.nearDupPairs(df, "id", radius = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got == brute(rows, 3)
    }
}
