package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join operators.
  *
  * Reference J1 (`ParquetCombinerRDD.scala:177-191`) is a hand-rolled
  * broadcast hash join: dim table collected to the driver, broadcast, and
  * looked up map-side with a default for missing keys. The semantics to
  * preserve (SURVEY.md §2.3): fact rows always survive (missing dim key →
  * default value), dim rows without facts produce NO output — i.e. a
  * left-outer join from the facts side plus coalesce, never inner/right.
  */
object Joins {

  /** Broadcast left-outer enrich of `facts` with columns from `dim`,
    * defaulting `defaults` columns when the dim key is absent. The
    * `broadcast()` hint pins BroadcastHashJoin regardless of statistics —
    * correct whenever the dim side is small (reference: 10k rows ≪ 10 MB).
    */
  def enrichLeftBroadcast(
      facts: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      defaults: Map[String, String] = Map.empty): DataFrame = {
    val joined = facts.join(broadcast(dim), facts(factKey) === dim(dimKey), "left")
    val withDefaults = defaults.foldLeft(joined) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), lit(v)))
    }
    withDefaults.drop(dim(dimKey))
  }
}
