package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted gram-occurrence index — exact duplicated-span dedup
  * ([[SpanDedup]]) as an INCREMENTAL maintenance problem, joining the
  * parity-EXACT wing of the persisted-index tier ([[LineDedupIndex]],
  * [[CmsIndex]], [[Bm25Index]]): the index is the k-gram occurrence
  * count table `(f, n_occ)`, and occurrence-count merge is addition, so
  * `build(b₁) ⊕ addBatch(b₂)` equals a from-scratch count over b₁ ∪ b₂
  * fingerprint-for-fingerprint — PROVIDED batches are disjoint in
  * documents (a re-delivered doc would double its grams' counts; same
  * precondition as the rest of the exact wing).
  *
  * [[cleanseWith]] then runs SpanDedup's run-merge and span cut over
  * any document set using the INDEXED global counts — so a span a new
  * batch shares with last month's corpus is found and cut without
  * rescanning last month (the one-shot pass would have to). Cutting
  * the WHOLE corpus through the index reproduces the one-shot
  * [[SpanDedup.cleanse]] bit-for-bit (pinned in the spec and in
  * q201's oracle, which replays the one-shot SQL).
  *
  * Scale posture shared with [[LineDedupIndex]]: the table is
  * vocabulary-sized (one row per distinct gram — the same table the
  * one-shot pass shuffles to build), each add aggregates only the new
  * batch and merges copy-on-write into `v=N+1`, and reads see only
  * `_SUCCESS`-committed versions ([[IndexVersions]]), so a torn write
  * is invisible and healed by the retry's overwrite.
  */
object SpanDedupIndex {

  /** Latest COMMITTED version (crash-consistent: see [[IndexVersions]]). */
  def latestVersion(path: String): Option[Int] = IndexVersions.latest(path)

  private def gramCounts(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    SpanDedup.gramPositions(docs, idCol, textCol, k)
      .groupBy("f").agg(count(lit(1)).as("n_occ"))

  /** Start the index (v=1) from an initial document batch. Overwrite
    * mode heals a torn `v=1` left by a crashed earlier attempt.
    */
  def build(docs: DataFrame, path: String, idCol: String, textCol: String,
      k: Int = 8): Unit =
    gramCounts(docs, idCol, textCol, k)
      .write.mode("overwrite").parquet(s"$path/v=1")

  /** Fold a new DISJOINT document batch into the index: aggregate the
    * batch alone, merge by addition into `v = latest committed + 1`.
    */
  def addBatch(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String, k: Int = 8): Unit = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no SpanDedupIndex at $path"))
    val cur = spark.read.parquet(s"$path/v=$v")
    gramCounts(docs, idCol, textCol, k).unionByName(cur)
      .groupBy("f").agg(sum(col("n_occ")).as("n_occ"))
      .write.mode("overwrite").parquet(s"$path/v=${v + 1}")
  }

  /** The duplicated-fingerprint set per the INDEXED global counts. */
  def duplicatedFingerprints(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no SpanDedupIndex at $path"))
    spark.read.parquet(s"$path/v=$v")
      .filter(col("n_occ") >= 2).select("f")
  }

  /** Cut duplicated spans out of `docs` using the indexed occurrence
    * counts — the batch form of [[SpanDedup.cleanse]] where "appears
    * twice anywhere" means anywhere in INDEXED HISTORY, not just in
    * this batch. Output schema matches SpanDedup.cleanse. `docs` must
    * already be indexed (cleansing an unindexed batch would miss its
    * intra-batch duplicates; index first, then cleanse).
    */
  def cleanseWith(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String, k: Int = 8,
      minSpanTokens: Int = 20): DataFrame = {
    val g = SpanDedup.gramPositions(docs, idCol, textCol, k)
    val runs = SpanDedup.runsFrom(g, duplicatedFingerprints(spark, path), idCol)
    SpanDedup.cleanseFromSpans(
      SpanDedup.spansFromRuns(runs, docs, idCol, textCol, k, minSpanTokens),
      docs, idCol, textCol)
  }
  /** Delete superseded versions in place (reads touch only the latest
    * committed version, so `v < latest` is dead weight — see
    * [[IndexMaintenance.vacuumChain]] for the full safety contract).
    * Returns the number of directories removed.
    */
  def vacuum(spark: SparkSession, path: String): Int =
    IndexMaintenance.vacuumChain(spark, path)
}
