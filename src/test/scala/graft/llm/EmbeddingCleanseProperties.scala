package graft.llm

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** Generative invariants for semantic decontamination: both cleanse
  * forms (one-shot [[EmbeddingKnn.cleanseAgainst]] and index-backed
  * [[EmbeddingLshIndex.cleanseWith]]) against an independent plain-Scala
  * model of the contract — banded-LSH candidacy AND rounded cosine ≥ t
  * against ANY reference vector drops the row. Components are small
  * integers, so every dot/norm is exact in double and the model cannot
  * drift from the engine on FP grounds.
  */
object EmbeddingCleanseProperties
    extends Properties("graft.llm.EmbeddingCleanse") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = 4
  private val Tables = 4
  private val Planes = 3

  private val genVec: Gen[Seq[Float]] =
    Gen.listOfN(Dim, Gen.choose(-2, 2).map(_.toFloat)).map(_.toSeq)

  private def genSet(ids: Range): Gen[List[(Long, Seq[Float])]] = for {
    n <- Gen.choose(1, ids.size)
    vs <- Gen.listOfN(n, genVec)
  } yield vs.zipWithIndex.map { case (v, i) => (ids.start + i.toLong, v) }

  /** The contract, independently: signature per table from the same
    * deterministic planes, candidate iff some table matches, drop iff a
    * candidate reference vector clears the rounded cosine.
    */
  private def bruteSurvivors(corpus: List[(Long, Seq[Float])],
      ref: List[(Long, Seq[Float])], t: Double): Set[Long] = {
    def sigs(v: Seq[Float]): Seq[Long] =
      (0 until Tables).map { tb =>
        val planes = EmbeddingKnn.rademacherPlanes(Planes, Dim, 42L,
          planeOffset = tb * Planes)
        planes.zipWithIndex.map { case (p, i) =>
          val dot = p.zip(v).map { case (a, b) => a * b.toDouble }.sum
          if (dot >= 0.0) 1L << i else 0L
        }.sum
      }
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0.0 || nb == 0.0) 0.0
      else BigDecimal(a.zip(b).map { case (x, y) => x.toDouble * y }.sum
        / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val refSigs = ref.map { case (_, v) => (v, sigs(v)) }
    corpus.collect { case (id, v)
        if !refSigs.exists { case (rv, rs) =>
          sigs(v).zip(rs).exists { case (a, b) => a == b } && cos(v, rv) >= t
        } => id
    }.toSet
  }

  private val genCase = for {
    corpus <- genSet(0 until 12)
    ref <- genSet(100 until 106)
    t <- Gen.oneOf(0.5, 0.9)
  } yield (corpus, ref, t)

  property("cleanseAgainst == independent banded-cosine model") =
    forAll(genCase) { case (corpus, ref, t) =>
      val got = EmbeddingKnn.cleanseAgainst(
          corpus.toDF("vec_id", "embedding"), ref.toDF("vec_id", "embedding"),
          threshold = t, tables = Tables, planesPerTable = Planes, dim = Dim)
        .select("vec_id").as[Long].collect().toSet
      got == bruteSurvivors(corpus, ref, t)
    }

  property("index-backed cleanseWith == the same model (probe-only)") =
    forAll(genCase) { case (corpus, ref, t) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-clnprop").toString
      EmbeddingLshIndex.build(ref.toDF("vec_id", "embedding"), s"$dir/idx",
        tables = Tables, planesPerTable = Planes, dim = Dim)
      val got = EmbeddingLshIndex.cleanseWith(spark, s"$dir/idx",
          corpus.toDF("vec_id", "embedding"),
          threshold = t, tables = Tables, planesPerTable = Planes, dim = Dim)
        .select("vec_id").as[Long].collect().toSet
      got == bruteSurvivors(corpus, ref, t)
    }
}
