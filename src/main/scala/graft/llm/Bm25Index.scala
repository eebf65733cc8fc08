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
      // enforce (not just document) the no-re-add-while-tombstoned
      // contract: a violating re-add would both hide the new postings
      // (the search anti-join filters them) and inflate df/stats with
      // contributions scoring never sees — a silent parity break. The
      // check costs nothing on the common no-deletes path (tombstones
      // is None) and one small broadcast semi-join count otherwise.
      tombstones(spark, path,
          IndexVersions.committed(s"$path/df").sorted.filter(_ <= v))
        .foreach { dd =>
          val n = cached.select(col(idCol).cast("long").as("did")).distinct()
            .join(broadcast(dd), Seq("did"), "left_semi").count()
          require(n == 0L, s"addBatch: $n batch doc ids are live-" +
            s"tombstoned at $path — re-adding while the tombstone is " +
            "live silently breaks scoring parity (compact first to " +
            "materialize the deletes and free the ids)")
        }
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
    *
    * `asOf` reads the index AS OF a committed version — a snapshot
    * search over exactly the batches folded through that version
    * (post/dlen versions ≤ asOf, the asOf df/stats). Versions are
    * immutable once committed, so the snapshot is stable under
    * concurrent `addBatch`es — the time-travel read the lakehouse
    * tables ([[graft.sources.DeletionVectors]]-style) get from
    * snapshot isolation, here for free from the version chain.
    */
  def search(spark: SparkSession, path: String,
      queries: DataFrame, k: Int = 5,
      emitEmpty: Boolean = false,
      asOf: Option[Int] = None): DataFrame = {
    val latest = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no Bm25Index at $path"))
    val v = asOf match {
      case None => latest
      case Some(a) =>
        require(IndexVersions.committed(s"$path/df").contains(a),
          s"asOf version $a is not committed at $path (latest=$latest)")
        a
    }
    // the union of all COMMITTED versions IS the full table (batches
    // are doc-disjoint). Versions are enumerated from the df commit
    // markers and read by explicit path, so orphan post/dlen dirs left
    // by a crashed addBatch are never scored against stale df/stats.
    val committed = IndexVersions.committed(s"$path/df").sorted.filter(_ <= v)
    val del = tombstones(spark, path, committed)
    def live(t: DataFrame) =
      del.map(dd => t.join(broadcast(dd), Seq("did"), "left_anti")).getOrElse(t)
    val tf = live(committed.map(i => spark.read.parquet(s"$path/post/v=$i"))
      .reduce(_ unionByName _))
    val len = live(committed.map(i => spark.read.parquet(s"$path/dlen/v=$i"))
      .reduce(_ unionByName _))
    val df = spark.read.parquet(s"$path/df/v=$v")
    val stats = spark.read.parquet(s"$path/stats/v=$v")
    Bm25.withEmpty(Bm25.score(tf, len, df, stats, queries, k),
      queries, emitEmpty)
  }

  /** Union of the tombstone tables (`del/v=i`) among `versions`, or
    * None when no delete was ever committed in that range. A del dir
    * is complete whenever its version's df commit marker is ([[deleteDocs]]
    * writes df last), so a plain existence check suffices here.
    */
  private def tombstones(spark: SparkSession, path: String,
      versions: Seq[Int]): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(s"$path/del")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = versions.map(i => s"$path/del/v=$i")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (dirs.isEmpty) None
    else Some(dirs.map(spark.read.parquet(_)).reduce(_ unionByName _))
  }

  /** TOMBSTONE-delete documents from the index — the takedown/GDPR
    * path. At 100 TB the postings ARE the big table and a physical
    * delete would rewrite the corpus, so deletion is a new version
    * carrying (a) the tombstoned ids (`del/v=N+1`, anti-joined —
    * broadcast, the set is small by construction — against the
    * postings/lengths union at search time), and (b) cumulative
    * df/stats with the deleted docs' contributions SUBTRACTED
    * (computed from the index's own postings — the raw corpus is never
    * touched), so scoring stays parity-EXACT with a one-shot build
    * over the surviving corpus. `post/dlen` for the delete version are
    * empty placeholders keeping the every-version-has-all-tables
    * layout uniform. [[compact]] materializes tombstones (filters the
    * postings, drops the del dirs); `search(asOf)` on a pre-delete
    * version still sees the document — deletion is itself versioned.
    *
    * Ids never indexed, or already tombstoned, are ignored
    * (re-delivering a delete cannot subtract df twice). `ids`' first
    * column is taken as the document id. One extra contract beside
    * addBatch's doc-disjointness: a tombstoned id must not be re-added
    * while its tombstone is live — the anti-join would silently hide
    * the new postings ([[addBatch]] enforces this with a runtime
    * guard). After a [[compact]] the tombstone is gone and the id is
    * free again.
    */
  def deleteDocs(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no Bm25Index at $path"))
    val committed = IndexVersions.committed(s"$path/df").sorted.filter(_ <= v)
    def union(sub: String) = committed
      .map(i => spark.read.parquet(s"$path/$sub/v=$i"))
      .reduce(_ unionByName _)
    val lens = union("dlen")
    val requested = ids
      .select(col(ids.columns.head).cast("long").as("did")).distinct()
      .join(lens.select("did"), Seq("did"), "semi")
    val target = tombstones(spark, path, committed)
      .fold(requested)(dd => requested.join(dd, Seq("did"), "left_anti"))
      .persist() // three consumers below; Scratch-sized by contract
    try {
      val dfDelta = union("post").join(target, Seq("did"), "semi")
        .groupBy("t").agg(count(lit(1)).as("ddf"))
      val newDf = spark.read.parquet(s"$path/df/v=$v")
        .join(dfDelta, Seq("t"), "left")
        .select(col("t"),
          (col("df") - coalesce(col("ddf"), lit(0L))).as("df"))
        .filter(col("df") > 0)
      val newStats = spark.read.parquet(s"$path/stats/v=$v")
        .crossJoin(lens.join(target, Seq("did"), "semi")
          .agg(count(lit(1)).as("dn"),
            coalesce(sum("len"), lit(0L)).as("dl")))
        .select((col("n_docs") - col("dn")).as("n_docs"),
          (col("total_len") - col("dl")).as("total_len"))
      // same commit ordering as writeBatch: df lands LAST
      union("post").limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$path/post/v=${v + 1}")
      lens.limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$path/dlen/v=${v + 1}")
      target.coalesce(1)
        .write.mode("overwrite").parquet(s"$path/del/v=${v + 1}")
      newStats.coalesce(1)
        .write.mode("overwrite").parquet(s"$path/stats/v=${v + 1}")
      newDf.write.mode("overwrite").parquet(s"$path/df/v=${v + 1}")
    } finally { target.unpersist(); () }
  }

  /** Compact the whole version chain into a SUCCESSOR index at
    * `outPath` (v=1, `targetFiles` files per table), contents
    * score-identical: `search(outPath)` == `search(path)` row for row,
    * and `addBatch(outPath)` continues the chain at v=2.
    *
    * This is the maintenance valve the APPEND-shaped member of the
    * index family needs that the copy-on-write members don't: every
    * committed post/dlen version stays LIVE forever (search unions
    * them all), so a streamed ingest accumulates one
    * shuffle-partition-count of small files per microbatch AND an
    * O(versions) directory listing per search. Compaction folds the
    * union back to one version. Superseded df/stats versions — dead
    * weight in the original — simply don't carry over.
    *
    * Successor-directory semantics, not an in-place swap (the
    * [[IndexMaintenance]] contract): the original is never written, a
    * crashed/retried compact just overwrites the half-built successor,
    * and callers flip their index pointer (then drop the predecessor
    * directory — that drop IS this index's vacuum) only after compact
    * returns. In-place vacuum of superseded df/stats versions is
    * deliberately NOT offered: `df/v=N` doubles as the commit marker
    * for `post/v=N`, so deleting an old df dir would orphan a live
    * postings version.
    */
  def compact(spark: SparkSession, path: String, outPath: String,
      targetFiles: Int = 1): Unit = {
    require(targetFiles >= 1)
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no Bm25Index at $path"))
    val committed = IndexVersions.committed(s"$path/df").sorted.filter(_ <= v)
    val del = tombstones(spark, path, committed)
    def union(sub: String) = {
      val t = committed
        .map(i => spark.read.parquet(s"$path/$sub/v=$i"))
        .reduce(_ unionByName _)
      // compaction MATERIALIZES tombstones: deleted dids are filtered
      // out of the rewrite and no del dirs carry over — the successor
      // starts with a clean chain (df/stats already exclude them)
      del.map(dd => t.join(broadcast(dd), Seq("did"), "left_anti"))
        .getOrElse(t)
    }
    // df last: the successor is committed (visible to latestVersion)
    // only once all four tables are fully written
    union("post").coalesce(targetFiles)
      .write.mode("overwrite").parquet(s"$outPath/post/v=1")
    union("dlen").coalesce(targetFiles)
      .write.mode("overwrite").parquet(s"$outPath/dlen/v=1")
    spark.read.parquet(s"$path/stats/v=$v").coalesce(1)
      .write.mode("overwrite").parquet(s"$outPath/stats/v=1")
    spark.read.parquet(s"$path/df/v=$v").coalesce(targetFiles)
      .write.mode("overwrite").parquet(s"$outPath/df/v=1")
  }
}
