package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.SamplingQueries

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weighted sample is deterministic and partition-invariant") {
    val df = (1L to 500L).map(i => (i, if (i % 2 == 0) "a" else "b", i % 50 + 1))
      .toDF("id", "stratum", "w")
    val s1 = SamplingQueries.weightedSample(df, "stratum", "id", "w", 10)
      .select("stratum", "rk", "id").as[(String, Long, Long)].collect().toSet
    val s2 = SamplingQueries.weightedSample(df.repartition(17), "stratum", "id", "w", 10)
      .select("stratum", "rk", "id").as[(String, Long, Long)].collect().toSet
    assert(s1 == s2, "sample must not depend on partitioning")
    assert(s1.groupBy(_._1).forall(_._2.size == 10))
  }

  test("weighted sample biases toward heavy rows and drops non-positive weights") {
    // Two weight classes in one stratum: weight 1000 vs weight 1. A
    // priority u/w sample of 50 from 100+100 rows must draw the heavy
    // class far more often (each heavy priority is ~1000x smaller).
    val df = ((1L to 100L).map(i => (i, "s", 1000L)) ++
      (101L to 200L).map(i => (i, "s", 1L)) ++ Seq((201L, "s", 0L))).toDF("id", "stratum", "w")
    val got = SamplingQueries.weightedSample(df, "stratum", "id", "w", 50)
      .select("id").as[Long].collect()
    assert(got.length == 50)
    assert(!got.contains(201L), "zero-weight rows must never be sampled")
    val heavy = got.count(_ <= 100L)
    assert(heavy >= 45, s"heavy class drew only $heavy of 50")
  }

  test("int8 codes match a hand quantization, saturate at +/-127, and zero-map zero vectors") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(-2.0f, 1.0f, 0.5f, -0.004f))).toDF("id", "vec")
    val got = df.select(col("id"), SamplingQueries.int8Codes(col("vec")).as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    // max|x|=1.0: floor(x*127+0.5) -> 64, -127, 32, 0
    assert(got(1L) == Seq(64L, -127L, 32L, 0L))
    assert(got(2L) == Seq(0L, 0L, 0L, 0L))
    // max|x|=2.0: scale 63.5 -> -127, 64 (floor(63.5+0.5)), 32, 0 (floor(-0.254+0.5))
    assert(got(3L) == Seq(-127L, 64L, 32L, 0L))
    assert(got.values.flatten.forall(q => q >= -127L && q <= 127L))
  }

  test("oov profile counts tokens outside the top-k vocab") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "zebra quark"),
      (4L, "   ")).toDF("doc_id", "text")
    // Corpus counts: the=3, sat=2, cat/on/mat/dog/zebra/quark=1.
    // vocabSize=2 -> vocab {the, sat}.
    val rows = SamplingQueries.oovProfile(df, "doc_id", "text", 2)
      .select("doc_id", "n_tokens", "n_oov").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(1L) == ((6L, 3L)))
    assert(rows(2L) == ((3L, 1L)))
    assert(rows(3L) == ((2L, 2L)))
    assert(!rows.contains(4L), "all-whitespace docs contribute no token rows")
  }
}
