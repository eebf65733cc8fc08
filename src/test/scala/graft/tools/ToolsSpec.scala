package graft.tools

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Pipeline, TestSpark}

class ToolsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("generator: row count, duplicate rate, skew, camera grouping") {
    val c = GenerateData.Config(dataARows = 2000L, dataBRows = 8,
      duplicationRate = 0.15, skewLocationId = 3L, skewFactor = 5.0)
    val (dataA, dataB) = GenerateData.generate(spark, c)
    val n = dataA.count()
    assert(math.abs(n - 2000L) < 200) // sampled dup count is approximate
    val distinct = dataA.select("detection_oid").distinct().count()
    val dupRate = 1.0 - distinct.toDouble / n
    assert(dupRate > 0.08 && dupRate < 0.22)
    // skew: location 3 must dominate (~0.58 share at factor 5)
    val byLoc = dataA.groupBy("geographical_location_oid").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byLoc(3L).toDouble / n > 0.4)
    assert(byLoc.keySet.subsetOf((1L to 8L).toSet))
    // cameras grouped 10-per-location
    val badCams = dataA.filter(
      col("video_camera_oid") <= col("geographical_location_oid") * 10 ||
      col("video_camera_oid") > col("geographical_location_oid") * 10 + 10).count()
    assert(badCams == 0)
    assert(dataB.count() == 8)
    // duplicates share detection_oid but differ in timestamp -> full-row
    // distinct under-deduplicates (the property dedup must rely on)
    assert(dataA.distinct().count() > distinct)
  }

  test("generator is reproducible for a fixed seed") {
    val c = GenerateData.Config(dataARows = 500L, dataBRows = 4)
    val a1 = GenerateData.detections(spark, c)
    val a2 = GenerateData.detections(spark, c)
    assert(a1.except(a2).count() == 0 && a2.except(a1).count() == 0)
  }

  test("generated data drives the reference pipeline end-to-end") {
    val dir = Files.createTempDirectory("graft-tools-spec").toString
    val c = GenerateData.Config(outputDir = dir, dataARows = 1000L, dataBRows = 5)
    val (dataA, dataB) = GenerateData.generate(spark, c)
    dataA.write.mode("overwrite").parquet(s"$dir/dataA")
    dataB.write.mode("overwrite").parquet(s"$dir/dataB")
    val out = Pipeline.processParquetFiles(spark,
      s"$dir/dataA", s"$dir/dataB", s"$dir/out", topX = 3)
    assert(out.count() > 0)
    // every location emits at most topX rows and ranks start at "1"
    val caps = out.groupBy("geographical_location").count()
      .filter(col("count") > 3).count()
    assert(caps == 0)
    assert(out.filter(col("item_rank") === "1").count() ==
      out.select("geographical_location").distinct().count())
  }

  test("inspector sniffs all three reference file types plus generic") {
    import spark.implicits._
    val dataA = Seq((1L, 11L, 1L, "a", 1L)).toDF("geographical_location_oid",
      "video_camera_oid", "detection_oid", "item_name", "timestamp_detected")
    val dataB = Seq((1L, "x")).toDF("geographical_location_oid", "geographical_location")
    val outDf = Seq(("x", "1", "a")).toDF("geographical_location", "item_rank", "item_name")
    val other = Seq((1, "y")).toDF("a", "b")
    assert(InspectParquet.determineFileType(dataA) == InspectParquet.Detections)
    assert(InspectParquet.determineFileType(dataB) == InspectParquet.Locations)
    assert(InspectParquet.determineFileType(outDf) == InspectParquet.PipelineOutput)
    assert(InspectParquet.determineFileType(other) == InspectParquet.Generic)
  }

  test("generator CLI parser: defaults, flags, unknown flag rejection") {
    assert(GenerateData.parseArgs(Array()) == GenerateData.Config())
    val c = GenerateData.parseArgs(Array("--data-a-rows", "99", "--skew-factor", "2.5"))
    assert(c.dataARows == 99L && c.skewFactor == 2.5)
    intercept[IllegalArgumentException] {
      GenerateData.parseArgs(Array("--nope", "1"))
    }
  }
}
