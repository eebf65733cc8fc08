package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference-parity aggregation surface (SURVEY.md §2.10): a string-keyed
  * registry of named aggregations over the detections/locations domain
  * (reference `AggregationFactory.scala:29-38`, unknown name →
  * IllegalArgumentException), each taking the two input frames plus an
  * untyped params map with defaults (reference `Aggregations.scala:38`).
  *
  * Expected input schemas (reference `Models.scala:12-24`):
  *  - dataA (detections): geographical_location_oid LONG, video_camera_oid
  *    LONG, detection_oid LONG, item_name STRING (nullable — null/empty are
  *    legitimate group keys), timestamp_detected LONG
  *  - dataB (locations): geographical_location_oid LONG,
  *    geographical_location STRING
  */
object AggregationRegistry {
  type AggOp = (DataFrame, DataFrame, Map[String, Any]) => DataFrame

  val TopItems = "TOP_ITEMS"
  val ItemCount = "ITEM_COUNT"
  val LocationStats = "LOCATION_STATS"

  def create(name: String): AggOp = name match {
    case TopItems      => ReferenceAggregations.topItems
    case ItemCount     => ReferenceAggregations.itemCounts
    case LocationStats => ReferenceAggregations.locationStats
    case other =>
      throw new IllegalArgumentException(s"Unknown aggregation type: $other")
  }

  def available: Seq[String] = Seq(TopItems, ItemCount, LocationStats)
}

/** The three reference aggregations (`Aggregations.scala:32-136`),
  * re-expressed as Catalyst-planned DataFrame transforms.
  *
  * Determinism pins (SURVEY.md §7.3 — refinements of the reference's
  * deliberately-arbitrary choices, every pinned output is a valid
  * reference output):
  *  - dedup survivor  = min (timestamp_detected, video_camera_oid)
  *  - rank tie-break  = count desc, then item_name asc (nulls first)
  *  - arg-max tie-break = smallest camera oid
  */
object ReferenceAggregations {
  private val Loc = "geographical_location_oid"

  /** Dedup-by-detection_oid, deterministic survivor (reference A1). */
  def dedupDetections(dataA: DataFrame): DataFrame =
    Dedup.byKeyMin(dataA, Seq("detection_oid"),
      Seq("timestamp_detected", "video_camera_oid"))

  /** ITEM_COUNT (reference A2, `Aggregations.scala:77-96`): per-location
    * item counts after dedup.
    */
  def itemCounts(dataA: DataFrame, dataB: DataFrame, params: Map[String, Any]): DataFrame =
    dedupDetections(dataA)
      .groupBy(col(Loc), col("item_name"))
      .agg(count(lit(1)).as("count"))

  /** TOP_ITEMS (reference A4, `Aggregations.scala:32-70` + the author's own
    * DataFrame mapping in joins.pdf p.4): per-location top-X items by
    * deduped count, ranks as sequential strings "1".."k", location names
    * from a broadcast left join with "Unknown" default. Locations with no
    * detections produce no rows.
    */
  def topItems(dataA: DataFrame, dataB: DataFrame, params: Map[String, Any]): DataFrame = {
    val topX = params.getOrElse("topX", 5) match {
      case i: Int => i
      case s: String => s.toInt
      case other => throw new IllegalArgumentException(s"topX: $other")
    }
    val counts = itemCounts(dataA, dataB, params)
    val ranked = TopK.perGroup(
      counts,
      partitionCols = Seq(col(Loc)),
      orderCols = Seq(col("count").desc, col("item_name").asc_nulls_first),
      k = topX,
      rankCol = "item_rank")
    Joins
      .enrichLeftBroadcast(ranked, dataB, Loc, Loc,
        defaults = Map("geographical_location" -> "Unknown"))
      .select(
        col("geographical_location"),
        col("item_rank").cast("string").as("item_rank"),
        col("item_name"))
  }

  /** LOCATION_STATS (reference `Aggregations.scala:99-136`): per location —
    * total deduped detections, distinct items, most active camera (ties →
    * smallest oid; reference emits -1 for "no camera" which cannot occur
    * after a scan, so no special case survives here).
    */
  def locationStats(dataA: DataFrame, dataB: DataFrame, params: Map[String, Any]): DataFrame = {
    val dd = dedupDetections(dataA)
    // countDistinct(col) would skip NULL item names, but the reference
    // counts null as a distinct item (`Aggregations.scala:123` toSet on
    // raw values; null keys are legitimate per its tests) — wrapping in a
    // struct makes the aggregation key non-null so nulls are counted.
    val stats = dd
      .groupBy(col(Loc))
      .agg(
        count(lit(1)).as("total_detections"),
        countDistinct(struct(col("item_name"))).as("unique_items"))
    // arg-max camera: count per (loc, camera), then min_by over
    // (-count, camera) = max count with smallest-oid tie-break; stays a
    // two-phase hash aggregate (no window sort).
    val cam = dd
      .groupBy(col(Loc), col("video_camera_oid"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(Loc))
      .agg(min_by(col("video_camera_oid"),
        struct((-col("cnt")).as("negCnt"), col("video_camera_oid"))).as("most_active_camera"))
    stats.join(cam, Seq(Loc))
  }
}
