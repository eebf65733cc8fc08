package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SplitPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("split assignment is total, pure, and stable under repartitioning") {
    val df = (1L to 2000L).toDF("id")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val a = DatasetSplit.assign(df, "id", "s1", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = DatasetSplit.assign(df.repartition(13), "id", "s1", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b, "assignment must not depend on partitioning")
    assert(a.size == 2000 && a.values.forall(Set("train", "val", "test")))
  }

  test("split fractions land near the spec and respond to the salt") {
    val df = (1L to 20000L).toDF("id")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val byName = DatasetSplit.assign(df, "id", "s1", splits)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    // 205/25/26 of 256 buckets ≈ .801/.098/.102; md5 is uniform.
    assert(math.abs(byName("train") / 20000.0 - 0.80) < 0.02)
    assert(math.abs(byName("val") / 20000.0 - 0.10) < 0.02)
    assert(math.abs(byName("test") / 20000.0 - 0.10) < 0.02)
    val other = DatasetSplit.assign(df, "id", "other-salt", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    val same = DatasetSplit.assign(df, "id", "s1", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(other != same, "a different salt must re-deal the assignment")
  }

  test("split is append-stable: a doc's split never changes when the corpus grows") {
    val splits = Seq(("train", 0.9), ("holdout", 0.1))
    val small = DatasetSplit.assign((1L to 100L).toDF("id"), "id", "s", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    val grown = DatasetSplit.assign((1L to 10000L).toDF("id"), "id", "s", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(small.forall { case (id, sp) => grown(id) == sp })
  }

  test("pack assignment: hand-computed concat-and-split layout") {
    // budget 10; tokens 4,4,4,6,12 → cum 4,8,12,18,30
    // starts 0,4,8,12,18 → packs 0,0,0,1,1; straddlers: doc3 (8→11),
    // doc5 (18→29 crosses 20).
    val df = Seq(
      ("g", 1L, 4L), ("g", 2L, 4L), ("g", 3L, 4L), ("g", 4L, 6L),
      ("g", 5L, 12L)).toDF("src", "id", "toks")
    val out = SequencePack.assign(df, "src", "id", "toks", budget = 10L)
      .orderBy("id").select("pack_id", "crosses")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 0L), (0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
  }

  test("pack summary aggregates docs, tokens, straddlers per pack") {
    val df = Seq(
      ("g", 1L, 4L), ("g", 2L, 4L), ("g", 3L, 4L), ("g", 4L, 6L),
      ("g", 5L, 12L)).toDF("src", "id", "toks")
    val out = SequencePack.packs(df, "src", "id", "toks", budget = 10L)
      .orderBy("pack_id")
      .select("pack_id", "n_docs", "n_tokens", "n_straddlers")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 3L, 12L, 1L), (1L, 2L, 18L, 1L)))
  }

  test("pack: zero-token docs never count as straddlers; groups are independent") {
    val df = Seq(
      ("a", 1L, 0L), ("a", 2L, 10L), ("a", 3L, 0L),
      ("b", 1L, 10L)).toDF("src", "id", "toks")
    val out = SequencePack.assign(df, "src", "id", "toks", budget = 10L)
      .orderBy("src", "id").select("src", "pack_id", "crosses")
      .as[(String, Long, Long)].collect().toSeq
    // "a": starts 0,0,10 → packs 0,0,1; no straddlers (0-token docs and
    // an exactly-budget doc). "b" restarts at pack 0.
    assert(out == Seq(("a", 0L, 0L), ("a", 0L, 0L), ("a", 1L, 0L),
      ("b", 0L, 0L)))
  }
}
