package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BloomSkipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String = {
    val dir = graft.queries.Scratch.dir("bloomskip") + "/t"
    (0L until 4000L).map(i => (i, s"p$i"))
      .toDF("k", "payload")
      .repartitionByRange(8, col("k"))
      .write.parquet(dir)
    dir
  }

  test("readIn equals the unpruned filter; present keys prune to few files") {
    val dir = freshTable()
    BloomSkip.write(spark, dir, "k", expectedItemsPerFile = 1000L)
    val nFiles = BloomSkip.manifest(spark, dir, "k").count()
    assert(nFiles == 8L)
    // n_rows accounts for every row exactly once
    assert(BloomSkip.manifest(spark, dir, "k")
      .agg(sum("n_rows")).first().getLong(0) == 4000L)
    val keys = Seq(5L, 1999L, 3777L)
    val got = BloomSkip.readIn(spark, dir, "k", keys)
      .select("k", "payload").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = spark.read.parquet(dir).filter(col("k").isin(keys: _*))
      .select("k", "payload").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want && got.size == 3)
    // range layout puts the 3 keys in 3 distinct files; Bloom FPs can
    // only ADD files, and at fpp 0.01 x 8 files they essentially never do
    val cand = BloomSkip.candidateFiles(spark, dir, "k", keys)
    assert(cand.size >= 3 && cand.size < 8, s"candidates=${cand.size}")
  }

  test("absent keys prune everything (empty frame keeps the schema)") {
    val dir = freshTable()
    BloomSkip.write(spark, dir, "k", expectedItemsPerFile = 1000L)
    val cand = BloomSkip.candidateFiles(spark, dir, "k", Seq(999999L, -5L))
    assert(cand.size <= 1, s"expected ~0 FP candidates, got ${cand.size}")
    val out = BloomSkip.readIn(spark, dir, "k", Seq(999999L))
    assert(out.isEmpty)
    assert(out.columns.toSeq == Seq("k", "payload"))
  }

  test("append folds only new files; point lookups reach both batches") {
    val dir = freshTable()
    BloomSkip.write(spark, dir, "k", expectedItemsPerFile = 1000L)
    assert(BloomSkip.append(spark, dir, "k", expectedItemsPerFile = 1000L) == 0)
    (4000L until 5000L).map(i => (i, s"p$i")).toDF("k", "payload")
      .repartitionByRange(2, col("k"))
      .write.mode("append").parquet(dir)
    assert(BloomSkip.append(spark, dir, "k", expectedItemsPerFile = 1000L) == 2)
    assert(BloomSkip.manifest(spark, dir, "k").count() == 10L)
    val got = BloomSkip.readIn(spark, dir, "k", Seq(100L, 4500L))
      .select("k").as[Long].collect().toSet
    assert(got == Set(100L, 4500L))
  }

  test("no false negatives: every key of the table finds its row via the index") {
    val dir = freshTable()
    BloomSkip.write(spark, dir, "k", expectedItemsPerFile = 1000L)
    val probe = (0L until 4000L by 97L).toSeq
    val got = BloomSkip.readIn(spark, dir, "k", probe)
      .select("k").as[Long].collect().toSet
    assert(got == probe.toSet)
  }
}
