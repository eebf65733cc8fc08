package graft

/** Typed record schemas for the reference domain — the case-class layer
  * for users who want `Dataset[T]` type safety at the pipeline edges
  * (reference `Models.scala:12-57`; snake_case names match the on-disk
  * column contract). The engine's internals stay DataFrame/Catalyst;
  * these are boundary types: `Tables`-style loads via `.as[DetectionRecord]`
  * and result reads via the `Results` converters.
  */
object Models {

  /** DataA: one detection event (item_name nullable — null is a
    * legitimate group key).
    */
  final case class DetectionRecord(
      geographical_location_oid: Long,
      video_camera_oid: Long,
      detection_oid: Long,
      item_name: String,
      timestamp_detected: Long)

  /** DataB: the broadcastable location dim. */
  final case class LocationRecord(
      geographical_location_oid: Long,
      geographical_location: String)

  /** Pipeline output row — item_rank is a STRING by contract ("1".."k"). */
  final case class TopItemRow(
      geographical_location: String,
      item_rank: String,
      item_name: String)

  final case class ItemCountRow(
      geographical_location_oid: Long,
      item_name: String,
      count: Long)

  final case class LocationStatsRow(
      geographical_location_oid: Long,
      total_detections: Long,
      unique_items: Long,
      most_active_camera: Long)
}

/** Typed views over the registry's DataFrame results. */
object Results {
  import org.apache.spark.sql.{Dataset, DataFrame, Encoder, Encoders}
  import Models._

  implicit val topItemEnc: Encoder[TopItemRow] = Encoders.product[TopItemRow]
  implicit val itemCountEnc: Encoder[ItemCountRow] = Encoders.product[ItemCountRow]
  implicit val locationStatsEnc: Encoder[LocationStatsRow] = Encoders.product[LocationStatsRow]

  def topItems(df: DataFrame): Dataset[TopItemRow] = df.as[TopItemRow]
  def itemCounts(df: DataFrame): Dataset[ItemCountRow] = df.as[ItemCountRow]
  def locationStats(df: DataFrame): Dataset[LocationStatsRow] = df.as[LocationStatsRow]
}
