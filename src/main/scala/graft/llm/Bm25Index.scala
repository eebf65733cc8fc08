package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted incremental inverted index for [[Bm25]] retrieval — the
  * lexical-search member of the persisted-index tier
  * ([[MinHashIndex]]/[[SimHashIndex]]/[[WinnowIndex]] near-dup,
  * [[IvfIndex]] ANN, [[CmsIndex]]/[[LineDedupIndex]] frequency).
  *
  * Like [[LineDedupIndex]] — and unlike the capped near-dup indexes —
  * incremental maintenance is parity-EXACT by construction, PROVIDED
  * batches are doc-disjoint (a re-delivered doc would double its
  * postings; same contract as LineDedupIndex). The moving parts:
  *
  *  - `post/v=N`, `dlen/v=N`: batch N's (did, t, tf) postings and
  *    (did, len) lengths. APPEND-shaped — disjoint batches mean the
  *    full tables are the plain union of all versions, so adding a
  *    batch writes only that batch (the corpus is never rescanned and
  *    never rewritten; at 100 TB the postings ARE the big table and
  *    copy-on-write would be a full-corpus write per batch).
  *  - `df/v=N`, `stats/v=N`: cumulative document-frequency
  *    (vocabulary-sized) and 1-row corpus stats. Merge is addition, so
  *    these are copy-on-write like LineDedupIndex's df table — small by
  *    construction, and reading ONLY the latest version gives the
  *    whole-corpus values without touching the postings.
  *
  * Search loads the union of postings, latest df/stats, and runs the
  * SAME scoring join as the one-shot path (`Bm25.score`), so
  * build(b₁) ⊕ add(b₂) then search == Bm25.search(b₁ ∪ b₂) row-for-row
  * — the exactness class the q181 oracle pins by reusing q173's SQL.
  */
object Bm25Index {

  /** Latest COMMITTED version: a version exists only once its df dir is
    * fully written (`_SUCCESS` present — [[IndexVersions]]); df is the
    * last dir [[writeBatch]] writes, making it the commit marker.
    */
  def latestVersion(path: String): Option[Int] =
    IndexVersions.latest(s"$path/df")

  /** Commit protocol: `df/v=N` is the COMMIT MARKER — it is written
    * LAST, and `latestVersion` / `search` treat a version as existing
    * only once its df dir is complete (`_SUCCESS` present, so even a
    * crash mid-df-write leaves the version uncommitted). A crash
    * mid-batch leaves orphan post/dlen/stats (or torn df) dirs for an
    * uncommitted version; `search` ignores them (it reads only
    * committed versions by explicit path) and a retried `addBatch`
    * overwrites them — overwrite of a version number `latestVersion`
    * never returned cannot clobber readable data.
    */
  private def writeBatch(path: String, v: Int,
      tf: DataFrame, len: DataFrame, df: DataFrame, stats: DataFrame): Unit = {
    tf.write.mode("overwrite").parquet(s"$path/post/v=$v")
    len.write.mode("overwrite").parquet(s"$path/dlen/v=$v")
    stats.write.mode("overwrite").parquet(s"$path/stats/v=$v")
    df.write.mode("overwrite").parquet(s"$path/df/v=$v")
  }

  /** Start the index (v=1) from an initial document batch.
    *
    * The batch is cached for the duration of the fold: four consumers
    * derive from it (postings write, lengths write, df aggregate,
    * stats aggregate), and without the cache each one re-executes the
    * source scan — measured as 4x the admitted rows on the streaming
    * ingest path. Batches are bounded (admission-controlled) by
    * contract, so the cache is executor-memory-safe.
    */
  def build(docs: DataFrame, path: String,
      idCol: String, textCol: String): Unit = {
    val cached = docs.persist()
    try {
      val (tf, len) = Bm25.postings(cached, idCol, textCol)
      val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
      val stats = len.agg(count(lit(1)).as("n_docs"),
        sum("len").as("total_len"))
      writeBatch(path, 1, tf, len, df, stats)
    } finally cached.unpersist()
  }

  /** Fold a new DOC-DISJOINT batch into the index: postings/lengths
    * appended as the new version's partition, df and stats merged by
    * addition into a new cumulative version.
    */
  def addBatch(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String): Unit = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no Bm25Index at $path"))
    val cached = docs.persist() // see build() — four consumers, one scan
    try {
      val (tf, len) = Bm25.postings(cached, idCol, textCol)
      val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
        .unionByName(spark.read.parquet(s"$path/df/v=$v"))
        .groupBy("t").agg(sum("df").as("df"))
      val stats = len.agg(count(lit(1)).as("n_docs"),
          sum("len").as("total_len"))
        .unionByName(spark.read.parquet(s"$path/stats/v=$v"))
        .agg(sum("n_docs").as("n_docs"), sum("total_len").as("total_len"))
      writeBatch(path, v + 1, tf, len, df, stats)
    } finally cached.unpersist()
  }

  /** Score `queries` (qid, qtext) against the INDEX — same output
    * contract (same dropped-qid caveat and same `emitEmpty` escape
    * hatch) as [[Bm25.search]].
    */
  def search(spark: SparkSession, path: String,
      queries: DataFrame, k: Int = 5,
      emitEmpty: Boolean = false): DataFrame = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no Bm25Index at $path"))
    // the union of all COMMITTED versions IS the full table (batches
    // are doc-disjoint). Versions are enumerated from the df commit
    // markers and read by explicit path, so orphan post/dlen dirs left
    // by a crashed addBatch are never scored against stale df/stats.
    val committed = IndexVersions.committed(s"$path/df").sorted.filter(_ <= v)
    val tf = committed.map(i => spark.read.parquet(s"$path/post/v=$i"))
      .reduce(_ unionByName _)
    val len = committed.map(i => spark.read.parquet(s"$path/dlen/v=$i"))
      .reduce(_ unionByName _)
    val df = spark.read.parquet(s"$path/df/v=$v")
    val stats = spark.read.parquet(s"$path/stats/v=$v")
    Bm25.withEmpty(Bm25.score(tf, len, df, stats, queries, k),
      queries, emitEmpty)
  }
}
