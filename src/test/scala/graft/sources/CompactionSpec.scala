package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("compaction merges a small-file directory, preserving every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val li = Tables.lineitem(spark, sf)
    // simulate the streaming-writer failure mode: 16 tiny files
    li.repartition(16).write.parquet(s"$dir/frag")

    val stats = Compaction.compact(spark, s"$dir/frag", s"$dir/merged")
    assert(stats.filesBefore == 16L)
    assert(stats.filesAfter < stats.filesBefore)
    assert(stats.rows == li.count())
    // content identical, not just cardinality
    assert(spark.read.parquet(s"$dir/merged").exceptAll(li).isEmpty)
    assert(li.exceptAll(spark.read.parquet(s"$dir/merged")).isEmpty)
  }

  test("target size controls output file count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact2").toString
    Tables.lineitem(spark, sf).repartition(8).write.parquet(s"$dir/frag")
    val (_, bytes) = {
      val s = Compaction.compact(spark, s"$dir/frag", s"$dir/one")
      (s.filesAfter, s.bytesBefore)
    }
    // a target of half the input bytes must produce exactly 2 files
    val stats = Compaction.compact(spark, s"$dir/frag", s"$dir/two",
      targetFileBytes = (bytes + 1) / 2)
    assert(stats.filesAfter == 2L)
  }

  test("sorted compaction yields disjoint per-file key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact3").toString
    val li = Tables.lineitem(spark, sf)
    li.repartition(16).write.parquet(s"$dir/frag")
    val stats = Compaction.compact(spark, s"$dir/frag", s"$dir/sorted",
      targetFileBytes = stats0(spark, s"$dir/frag") / 3,
      sortCols = Seq("l_orderkey"))
    assert(stats.rows == li.count())
    // per-file [min, max] of the sort key must not overlap
    val ranges = spark.read.parquet(s"$dir/sorted")
      .select(input_file_name().as("f"), col("l_orderkey"))
      .groupBy("f").agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .orderBy("lo")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  private def stats0(s: org.apache.spark.sql.SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    bytes
  }
}
