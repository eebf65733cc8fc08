package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class PartitionedSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("partitioned write prunes directories at read time (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-psink").toString
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_returnflag", "l_quantity", "l_shipdate")
    PartitionedSink.writePartitioned(li, s"$dir/li",
      partitionCols = Seq("l_returnflag"), sortCols = Seq("l_shipdate"))

    val back = spark.read.parquet(s"$dir/li").filter(col("l_returnflag") === "R")
    val plan = back.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("l_returnflag"),
      s"expected a partition filter on l_returnflag, plan:\n$plan")
    // pruning must not change semantics
    assert(back.count() == li.filter(col("l_returnflag") === "R").count())
  }

  test("rows inside each partition's file are sorted by the sort key") {
    val dir = java.nio.file.Files.createTempDirectory("graft-psink3").toString
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_returnflag", "l_shipdate")
    PartitionedSink.writePartitioned(li, s"$dir/li",
      partitionCols = Seq("l_returnflag"), sortCols = Seq("l_shipdate"))
    val files = new java.io.File(s"$dir/li").listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      // read ONE physical file: its row order is the written order
      // l_shipdate is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP (the
      // session TZ is pinned UTC so the cast is order-preserving)
      val dates = spark.read.parquet(f.getAbsolutePath)
        .select(unix_micros(col("l_shipdate").cast("timestamp")))
        .collect().map(_.getLong(0))
      assert(dates.sameElements(dates.sorted),
        s"${f.getName} not sorted by l_shipdate")
    }
  }

  test("one file per hive partition (no small-files explosion)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-psink2").toString
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_returnflag")
    PartitionedSink.writePartitioned(li, s"$dir/li", Seq("l_returnflag"))
    val nFlags = li.select("l_returnflag").distinct().count()
    val files = new java.io.File(s"$dir/li").listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(files == nFlags, s"expected $nFlags parquet files, got $files")
  }
}
