package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-prefiltered semi-join: build a Bloom filter over the small
  * side's keys, filter the large side with it BEFORE the shuffle, then
  * run the exact semi-join over the survivors. The result is exact (the
  * final equi-join removes Bloom false positives); the Bloom's job is
  * purely to cut shuffle volume — at 100 TB the win is that non-matching
  * rows (often 90%+ of a fact table probed against a filtered dimension)
  * are dropped at the scan stage instead of being hashed, serialized,
  * and shuffled.
  *
  * This is the manual, deterministic form of what AQE's runtime bloom
  * filter injection (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
  * does opportunistically; an explicit operator lets a pipeline rely on
  * it regardless of conf/plan shape.
  *
  * Scale posture: the filter is built DISTRIBUTED (`stat.bloomFilter` is
  * a treeAggregate of fixed-size bitmaps); only the final ~MB bitmap
  * lands on the driver, sized by `expectedItems`/`fpp`, independent of
  * large-side size. It ships to executors once via a broadcast variable.
  * The probe is a native codegen'd expression over the broadcast value
  * ([[graft.plans.BloomMightContainLong]]) sitting on the scan side of
  * the shuffle, where it replaces far more expensive exchange work.
  */
object BloomJoin {

  /** Exact left-semi join of `large` to `small`, Bloom-prefiltered.
    * Keys must be LONG-typed columns (the common fact/dim key case;
    * `BloomFilter.putLong` hashing).
    */
  def semiJoin(
      large: DataFrame,
      largeKey: String,
      small: DataFrame,
      smallKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val prefiltered = prefilter(large, largeKey, small, smallKey, expectedItems, fpp)
    prefiltered.join(small.select(col(smallKey).as(largeKey)), Seq(largeKey), "left_semi")
  }

  /** Just the prefilter stage (may contain Bloom false positives) —
    * exposed for testing the funnel.
    */
  def prefilter(
      large: DataFrame,
      largeKey: String,
      small: DataFrame,
      smallKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf: BloomFilter = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bcast = large.sparkSession.sparkContext.broadcast(bf)
    // native codegen'd probe (graft.plans.BloomMightContainLong), not a
    // udf: the probe stays inside whole-stage codegen at the scan. A
    // null key evaluates to null, which the filter drops — exactly the
    // semi-join semantics (null matches no dimension row).
    import org.apache.spark.sql.graft.ColumnBridge
    large.filter(ColumnBridge.column(graft.plans.BloomMightContainLong(
      ColumnBridge.expression(col(largeKey).cast("long")), bcast)))
  }
}
