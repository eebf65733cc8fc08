package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** E2E: write parquet fixtures, run the product pipeline, read the output
  * back and assert the reference's integration invariants
  * (ParquetCombinerRDDIntegrationTest.scala:136-378).
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withPipelineRun(topX: Int)(check: org.apache.spark.sql.DataFrame => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-pipeline-spec").toString
    val dataA = Seq(
      (1L, 10L, 100L, "apple", 1000L),
      (1L, 10L, 101L, "banana", 1001L),
      (1L, 11L, 101L, "banana", 1900L), // duplicate detection, jittered ts
      (1L, 11L, 102L, "apple", 1002L),
      (1L, 12L, 103L, "cherry", 1003L),
      (1L, 12L, 104L, "durian", 1004L),
      (2L, 20L, 200L, "apple", 2000L),
      (9L, 90L, 900L, "fig", 9000L) // location absent from dataB
    ).toDF("geographical_location_oid", "video_camera_oid", "detection_oid",
      "item_name", "timestamp_detected")
    val dataB = Seq((1L, "Loc1"), (2L, "Loc2"), (3L, "Loc3"))
      .toDF("geographical_location_oid", "geographical_location")
    dataA.write.mode("overwrite").parquet(s"$dir/a.parquet")
    dataB.write.mode("overwrite").parquet(s"$dir/b.parquet")
    val out = Pipeline.processParquetFiles(spark,
      s"$dir/a.parquet", s"$dir/b.parquet", s"$dir/out.parquet", topX)
    check(out)
  }

  test("output schema is the reference contract: three nullable strings") {
    withPipelineRun(5) { out =>
      assert(out.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
        Seq(("geographical_location", "string"), ("item_rank", "string"),
          ("item_name", "string")))
    }
  }

  test("per-location row caps, dedup, Unknown default, absent-location rules") {
    withPipelineRun(3) { out =>
      val byLoc = out.groupBy("geographical_location").count()
        .as[(String, Long)].collect().toMap
      // Loc1 has 4 distinct items but topX=3 caps it; Loc2 one item;
      // loc 9 missing from dim -> "Unknown"; Loc3 has no detections -> absent
      assert(byLoc == Map("Loc1" -> 3L, "Loc2" -> 1L, "Unknown" -> 1L))
      // dedup: banana counted once -> apple (count 2) must rank "1" in Loc1
      val top = out.filter(col("geographical_location") === "Loc1" &&
        col("item_rank") === "1").select("item_name").as[String].head()
      assert(top == "apple")
    }
  }

  test("sequential-rank invariant via SparkSQL over the written parquet (reference :243-264)") {
    withPipelineRun(3) { out =>
      out.createOrReplaceTempView("pipeline_out")
      val bad = spark.sql(
        """SELECT geographical_location, count(DISTINCT item_rank) AS n_ranks,
          |       min(CAST(item_rank AS INT)) AS min_r, max(CAST(item_rank AS INT)) AS max_r,
          |       count(*) AS n
          |FROM pipeline_out GROUP BY geographical_location
          |HAVING n_ranks != n OR min_r != 1 OR max_r != n""".stripMargin)
      assert(bad.count() == 0)
    }
  }

  test("parseArgs applies positional defaults (reference :44-51)") {
    assert(Pipeline.parseArgs(Array()) == Pipeline.Args())
    assert(Pipeline.parseArgs(Array("x", "y", "z", "7")) ==
      Pipeline.Args("x", "y", "z", 7))
  }
}
