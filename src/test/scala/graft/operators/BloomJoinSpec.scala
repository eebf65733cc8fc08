package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val large = (1L to 2000L).map(i => (i, i % 7)).toDF("k", "pay")
  private lazy val small = (1L to 2000L).filter(_ % 50 == 0)
    .map(i => (i, "dim")).toDF("dk", "name")

  test("semiJoin equals the plain exact semi-join (false positives removed)") {
    val bloom = BloomJoin.semiJoin(large, "k", small, "dk",
        expectedItems = 100, fpp = 0.05)
      .select("k").as[Long].collect().sorted.toSeq
    val exact = large.join(small.select(col("dk").as("k")), Seq("k"), "left_semi")
      .select("k").as[Long].collect().sorted.toSeq
    assert(bloom == exact)
    assert(exact == (1L to 2000L).filter(_ % 50 == 0))
  }

  test("prefilter passes every true match and prunes most non-matches") {
    val pre = BloomJoin.prefilter(large, "k", small, "dk",
      expectedItems = 100, fpp = 0.01)
    val preKeys = pre.select("k").as[Long].collect().toSet
    val trueKeys = (1L to 2000L).filter(_ % 50 == 0).toSet
    assert(trueKeys.subsetOf(preKeys), "Bloom must never drop a true match")
    // 40 true keys of 2000; at fpp=1% expect ≈ 40 + ~20 FPs. Generous bound:
    assert(preKeys.size < 200,
      s"prefilter should prune the large side aggressively, kept ${preKeys.size}")
  }

  test("null keys on the large side are dropped by the prefilter (semi-join semantics)") {
    val withNull = large.withColumn("k",
      when(col("k") === 13, lit(null).cast("long")).otherwise(col("k")))
    val out = BloomJoin.semiJoin(withNull, "k", small, "dk",
      expectedItems = 100, fpp = 0.01)
    assert(out.filter(col("k").isNull).count() == 0)
  }
}
