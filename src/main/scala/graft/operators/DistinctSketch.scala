package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Flajolet-Martin register sketch for distinct counting — the
  * cardinality member of the mergeable-sketch family ([[CountMin]] =
  * frequency, [[Sketches.BottomKAgg]] = coordinated sampling, this =
  * distinct), built PORTABLE: every ingredient is integer arithmetic an
  * external engine replays bit-for-bit, unlike
  * `approx_count_distinct`'s opaque HLL++ binary.
  *
  * Per key: `register = polyHash(k) mod m` picks one of `m` registers
  * and `rho = tz(h2) + 1` (trailing zeros of an independent affine
  * rehash `h2 = (31·polyHash + 7) mod p`, the [[CountMin]] row-hash
  * family) is the observation; each register keeps `max(rho)`. The
  * trailing-zero count is the branch-free identity
  * `bit_count(h2 XOR (h2-1)) - 1` — pure int64 ops on both engines.
  *
  * The register table IS the sketch: `max` is partially aggregable
  * (map-side combine, one row per register leaves each mapper — the
  * same scale posture as every aggregation here), and two sketches
  * merge by per-register max, so per-segment sketches roll up without
  * rescanning history (pinned in the spec: halves merged == full).
  * Cardinality scales as `m · 2^(mean rho)`; [[summarize]] reports the
  * integer-exact pieces (occupied registers, `Σ 2^rho`, max rho) and
  * leaves the float constant to the consumer — keeping the ENTIRE
  * pipeline, sketch and summary both, hash-replayable.
  */
object DistinctSketch {

  /** `(register, max_rho)` over the distinct values of `key` — one
    * row per occupied register, at most `m` rows total.
    */
  def build(df: DataFrame, key: Column, m: Int = 64): DataFrame = {
    require(m > 0, "register count must be positive")
    val h = TextFunctions.polyHash(key.cast("string"))
    val h2 = (h * 31L + 7L) % 1000000007L
    // h2 = 0 has no lowest set bit; tz defined as 0 there (rho 1)
    val tz = when(h2 === 0L, lit(0L))
      .otherwise(bit_count(h2.bitwiseXOR(h2 - 1L)) - 1L)
    df.select(pmod(h, lit(m.toLong)).as("register"), (tz + 1L).as("rho"))
      .groupBy("register")
      .agg(max("rho").as("max_rho"))
  }

  /** Merge any number of register tables: per-register max. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("register")
      .agg(max("max_rho").as("max_rho"))

  /** One-row integer-exact summary of a sketch: occupied register
    * count, `Σ 2^max_rho` (the FM mean's numerator, exact in int64 for
    * rho ≤ 62), and the max rho observed.
    */
  def summarize(sketch: DataFrame): DataFrame =
    sketch.agg(
      count(lit(1)).as("n_occupied"),
      // SQL shiftleft takes a column shift amount (the Scala helper
      // only accepts a literal); exact int64 for rho <= 62
      sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(max_rho AS INT))"))
        .as("sum_pow2_rho"),
      max("max_rho").as("max_rho"))
}
