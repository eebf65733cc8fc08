package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * Reference semantics: the reference deduplicates detections by
  * `detection_oid` with an arbitrary survivor
  * (`reduceByKey((a,_) => a)`, reference `Aggregations.scala:41-46`) —
  * duplicates are NOT bit-identical rows (jittered timestamps,
  * `GenerateParquet.scala:264-276`), so key-based dedup is required and
  * full-row `distinct()` would under-deduplicate.
  *
  * Scale posture: both forms below compile to hash aggregation with
  * map-side partial aggregation (no whole-table window sort, no per-group
  * materialization), so they shuffle each key once and spill gracefully.
  */
object Dedup {

  /** Arbitrary-survivor dedup by key — exact reference semantics.
    * `dropDuplicates` plans as an Aggregate over the key with `first()`
    * of the remaining columns (partial + final HashAggregate).
    */
  def byKeyArbitrary(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Deterministic dedup: per key keep the row minimal under `tieBreak`
    * (lexicographic struct comparison). Uses `min_by` rather than a
    * `row_number()` window: the struct-typed aggregation buffer makes
    * Spark pick SortAggregate (not HashAggregate), but it still runs as
    * partial → final aggregation — each mapper reduces to one row per key
    * BEFORE the shuffle, which a window formulation cannot do (it must
    * shuffle every duplicate and sort whole partitions). At 100 TB the
    * shuffle-volume difference dominates the local sort cost.
    *
    * `tieBreak` must be a total order within each key group for the
    * result to be deterministic (it is for every use in this repo).
    */
  def byKeyMin(df: DataFrame, keys: Seq[String], tieBreak: Seq[String]): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    val ord = struct(tieBreak.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(min_by(payload, ord).as("__survivor"))
      .select("__survivor.*")
  }

  /** 32-byte content fingerprint: md5 over the NUL-joined content columns
    * (NUL keeps (a,"bc") distinct from ("ab",c); SOH keeps NULL distinct
    * from ""). The aggregation/state key stays 32 bytes regardless of
    * document size — shared by [[exactByContent]] and the streaming
    * content dedup.
    */
  def contentFingerprint(contentCols: Seq[String]): Column =
    md5(concat_ws("\u0000", contentCols.map(c => coalesce(col(c), lit("\u0001"))): _*))

  /** Exact content dedup (documents-style): one surviving row per distinct
    * content, survivor = smallest `idCol`.
    */
  def exactByContent(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame = {
    val fp = contentFingerprint(contentCols)
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(fp.as("__fp"))
      .agg(min_by(payload, col(idCol)).as("__survivor"))
      .select("__survivor.*")
  }

  /** Near-duplicate GROUP dedup — the last stage of the fuzzy-dedup
    * pipeline. Near-dup similarity is not transitive (a~b and b~c does
    * not imply a~c), so pairwise output alone can't answer "which rows do
    * I keep": the standard resolution is to treat pairs as edges, take
    * connected components as the duplicate groups, and keep one survivor
    * per group. Survivor = the minimum `idCol` of the group (== the
    * component representative); rows in no pair survive untouched.
    *
    * Scale shape: CC runs over the pair graph only (edges, typically ≪
    * the corpus), then one left-anti equi-join of the corpus against the
    * non-survivor id set.
    */
  def byNearDupPairs(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val losers = ConnectedComponents.run(pairs.select(aCol, bCol), aCol, bCol)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
