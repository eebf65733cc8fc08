package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Reference-parity invariants for the string-keyed aggregation registry
  * (reference AggregationFactory + Aggregations; unit tests
  * ParquetCombinerRDDUnitTest.scala).
  */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dataA = Seq(
    // (loc, camera, detection, item, ts) — detection 101 duplicated with
    // jittered timestamps (the generator's duplicate shape)
    (1L, 10L, 100L, "apple", 1000L),
    (1L, 10L, 101L, "banana", 1001L),
    (1L, 11L, 101L, "banana", 1500L),
    (1L, 11L, 102L, "apple", 1002L),
    (1L, 11L, 103L, "cherry", 1003L),
    (2L, 20L, 200L, "apple", 2000L),
    (2L, 20L, 201L, null.asInstanceOf[String], 2001L)
  ).toDF("geographical_location_oid", "video_camera_oid", "detection_oid",
    "item_name", "timestamp_detected")

  private def dataB = Seq((1L, "Loc1"), (3L, "Loc3"))
    .toDF("geographical_location_oid", "geographical_location")

  test("unknown aggregation name throws IllegalArgumentException (reference :380-406)") {
    val e = intercept[IllegalArgumentException] {
      AggregationRegistry.create("NOPE")
    }
    assert(e.getMessage.contains("NOPE"))
  }

  test("all advertised aggregations dispatch") {
    AggregationRegistry.available.foreach { name =>
      assert(AggregationRegistry.create(name) != null)
    }
  }

  test("itemCounts dedups by detection_oid before counting (reference :409-459)") {
    val out = ReferenceAggregations.itemCounts(dataA, dataB, Map.empty)
      .filter(col("geographical_location_oid") === 1L)
      .select("item_name", "count").as[(String, Long)].collect().toMap
    // banana appears twice but shares detection_oid 101 -> counted once
    assert(out == Map("apple" -> 2L, "banana" -> 1L, "cherry" -> 1L))
  }

  test("topItems: ranks are sequential strings, missing location name becomes Unknown") {
    val out = ReferenceAggregations.topItems(dataA, dataB, Map("topX" -> 2))
    assert(out.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("geographical_location", "string"), ("item_rank", "string"),
        ("item_name", "string")))
    val loc1 = out.filter(col("geographical_location") === "Loc1")
      .orderBy("item_rank").as[(String, String, String)].collect()
    assert(loc1.map(_._2).toSeq == Seq("1", "2"))
    assert(loc1.head._3 == "apple") // count 2 beats the 1-count items
    // location 2 missing from dataB -> "Unknown" rows, not dropped
    assert(out.filter(col("geographical_location") === "Unknown").count() == 2)
    // location 3 has no detections -> contributes nothing
    assert(out.filter(col("geographical_location") === "Loc3").count() == 0)
  }

  test("topItems keeps null item_name as a legitimate key (reference :667-702)") {
    val out = ReferenceAggregations.topItems(dataA, dataB, Map("topX" -> 5))
    assert(out.filter(col("item_name").isNull).count() == 1)
  }

  test("topItems topX accepts string params (untyped Map contract)") {
    val out = ReferenceAggregations.topItems(dataA, dataB, Map("topX" -> "1"))
    assert(out.filter(col("geographical_location") === "Loc1").count() == 1)
  }

  test("locationStats: totals, uniques (nulls counted), deterministic argmax camera") {
    val out = ReferenceAggregations.locationStats(dataA, dataB, Map.empty)
      .orderBy("geographical_location_oid")
      .as[(Long, Long, Long, Long)].collect()
    // loc 1: 4 deduped detections; 3 unique items; cameras 10 and 11 tie
    // at 2 deduped detections each -> smallest oid 10 wins
    assert(out(0) == (1L, 4L, 3L, 10L))
    // loc 2: null item_name counts as a distinct item -> 2 uniques
    assert(out(1) == (2L, 2L, 2L, 20L))
  }
}
