package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class EpochShardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = (0L until 200L)
    .map(i => (i, 5L + i % 17)).toDF("id", "tokens")

  test("each epoch is a complete permutation; shards are budget-balanced") {
    val out = EpochShards.plan(docs, "id", col("tokens"),
      epochs = 3, budget = 300L).cache()
    assert(out.count() == 600)
    // every doc exactly once per epoch
    assert(out.groupBy("epoch").agg(countDistinct("id").as("n"))
      .collect().forall(_.getLong(1) == 200L))
    // every non-final shard's token span reaches into [budget-maxw, budget)
    val sums = out.groupBy("epoch", "shard").agg(sum("w").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val maxShard = sums.groupBy(_._1).map { case (e, s) => e -> s.map(_._2).max }
    val maxW = 21L
    sums.foreach { case (e, sh, t) =>
      if (sh < maxShard(e))
        assert(t > 300L - maxW && t < 300L + maxW, s"epoch $e shard $sh t=$t")
    }
    out.unpersist()
  }

  test("two-phase cumsum equals the naive global window") {
    val naive = docs
      .withColumn("epoch", lit(0L))
      .withColumn("pr", md5(concat(lit("ep0:"), col("id").cast("string"))))
      .withColumn("cb", coalesce(sum("tokens").over(
        org.apache.spark.sql.expressions.Window.orderBy("pr", "id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("id"), expr("cb div 250").as("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val fast = EpochShards.plan(docs, "id", col("tokens"), 1, 250L)
      .select("id", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fast == naive)
  }

  test("epochs get different orders (permutation actually reshuffles)") {
    val out = EpochShards.plan(docs, "id", col("tokens"), 2, 200L)
      .select("epoch", "id", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val moved = (0L until 200L).count(i => out((0L, i)) != out((1L, i)))
    assert(moved > 50, s"only $moved docs changed shard between epochs")
  }

  test("partition invariance") {
    def run(parts: Int) =
      EpochShards.plan(docs.repartition(parts), "id", col("tokens"), 2, 300L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(run(1) == run(13))
  }
}
