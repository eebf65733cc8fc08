package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted line-frequency index — corpus boilerplate detection
  * ([[LineDedup]]) as an INCREMENTAL maintenance problem, joining the
  * persisted-index tier ([[MinHashIndex]]/[[SimHashIndex]]/
  * [[WinnowIndex]] near-dup, [[IvfIndex]] ANN, [[CmsIndex]] frequency).
  *
  * The index is the line document-frequency table `(line, df)`. Like
  * [[CmsIndex]] — and unlike the capped near-dup indexes — incremental
  * maintenance is parity-EXACT by construction: df merge is addition,
  * so build(b₁) ⊕ add(b₂) equals a from-scratch count over b₁ ∪ b₂
  * line-for-line, PROVIDED batches are disjoint in documents (the same
  * precondition WinnowIndex enforces with an id anti-join; here a
  * re-delivered doc would double its lines' df). Each add aggregates
  * only the NEW batch and unions with the current table; the corpus is
  * never rescanned.
  *
  * Unlike CmsIndex's ≤1024-row cells, the df table is vocabulary-sized
  * (one row per distinct line). At 100 TB that is still the right shape:
  * it is the SAME table LineDedup's one-shot pass shuffles to build, and
  * only the `df > maxDf` slice — small by construction — ever leaves the
  * index for the broadcast anti-join in `cleanWith`.
  *
  * Versioned `v=N` writes, copy-on-write, Hadoop-FS listing — the shared
  * posture of the index family.
  */
object LineDedupIndex {

  /** Latest COMMITTED version (see [[IndexVersions]]: a crashed write
    * leaves a `v=N` dir without `_SUCCESS`, which is invisible here and
    * healed by the next add's overwrite).
    */
  def latestVersion(path: String): Option[Int] = IndexVersions.latest(path)

  private def dfTable(docs: DataFrame, idCol: String, linesCol: Column) =
    LineDedup.lineDf(docs, idCol, linesCol)

  /** Start the index (v=1) from an initial document batch. Overwrite
    * mode heals a torn `v=1` left by a crashed earlier attempt.
    */
  def build(docs: DataFrame, path: String, idCol: String,
      linesCol: Column): Unit =
    dfTable(docs, idCol, linesCol)
      .write.mode("overwrite").parquet(s"$path/v=1")

  /** Fold a new DISJOINT document batch into the index (caller
    * guarantees no doc id was indexed before — re-delivery would
    * double-count df, same contract as WinnowIndex's precondition).
    * The target version is `latest committed + 1`, so a crash-retry
    * overwrites only the torn, never-readable directory.
    */
  def addBatch(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, linesCol: Column): Unit = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no LineDedupIndex at $path"))
    val cur = spark.read.parquet(s"$path/v=$v")
    dfTable(docs, idCol, linesCol).unionByName(cur)
      .groupBy("line").agg(sum(col("df")).as("df"))
      .write.mode("overwrite").parquet(s"$path/v=${v + 1}")
  }

  /** The current boilerplate set: lines with indexed df > maxDf. */
  def boilerplate(spark: SparkSession, path: String, maxDf: Long): DataFrame = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no LineDedupIndex at $path"))
    spark.read.parquet(s"$path/v=$v")
      .filter(col("df") > maxDf).select("line")
  }

  /** Clean a document batch against the INDEXED df (not the batch's
    * own): the streaming-ingest form of [[LineDedup.clean]], where the
    * boilerplate decision uses all history without rescanning it.
    * Output schema matches LineDedup.clean.
    */
  def cleanWith(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, linesCol: Column, maxDf: Long): DataFrame = {
    val boiler = boilerplate(spark, path, maxDf)
    val withLines = docs.select(col(idCol), linesCol.as("_lines"))
    val ex = withLines.select(col(idCol),
      posexplode(col("_lines")).as(Seq("pos", "line")))
    ex.join(broadcast(boiler), Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")),
          "\n").as("clean_text"))
      .join(withLines.select(col(idCol),
        size(col("_lines")).cast("long").as("_nl")), Seq(idCol), "right_outer")
      .select(
        col(idCol),
        col("_nl").as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
  /** Delete superseded versions in place (reads touch only the latest
    * committed version, so `v < latest` is dead weight — see
    * [[IndexMaintenance.vacuumChain]] for the full safety contract).
    * Returns the number of directories removed.
    */
  def vacuum(spark: SparkSession, path: String): Int =
    IndexMaintenance.vacuumChain(spark, path)
}
