package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions

/** Persisted visited-URL index — the crawl loop's seen-filter: each
  * round's candidate frontier (sitemap walks, page links) anti-joins
  * the URLs every previous round already fetched WITHOUT rescanning
  * crawl history. Reference behavior studied from the frontier
  * dedup every production crawler runs (the reference engine has no
  * crawl tier; this is the 100-TB surface on top of it).
  *
  * Layout is the versioned-exact-index family's ([[IndexVersions]]'
  * `v=N` + `_SUCCESS` commit discipline): `v=1` holds the seed
  * round's distinct canonical URLs, each [[addBatch]] appends ONLY
  * the batch's novel URLs as `v=N+1` — versions are disjoint by
  * construction, per-batch write ∝ batch's novelty (append-shaped:
  * every version stays live, like [[Bm25Index]]'s postings), and the
  * live set is the plain union of committed versions. Admission is
  * one url-keyed left-anti join — shuffle-partitioned on the key,
  * no window, no all-pairs; at 100 TB the visited table is big but
  * the join stays linear and AQE-splittable.
  *
  * Re-crawl admission is tombstone-shaped ([[IndexMaintenance]]'s
  * `_dels` idiom, applied twice): [[forgetUrls]] appends exact URL
  * tombstones, [[forgetHosts]] appends host tombstones (purge a whole
  * site for refetch), and [[visited]] subtracts both. Same caveat as
  * the wing tables: while a tombstone is live, a re-ADDED url stays
  * hidden from [[visited]] — re-crawl flows should admit → fetch →
  * [[compact]] (which materializes the subtracted set into a fresh
  * chain, freeing the tombstones) before re-indexing the url.
  *
  * URLs should arrive CANONICALIZED ([[graft.functions.UrlFunctions
  * .normalize]]) — the index stores byte-exact keys and does not
  * re-normalize.
  */
object FrontierIndex {

  def latestVersion(path: String): Option[Int] = IndexVersions.latest(path)

  private def urlsOf(df: DataFrame, urlCol: String): DataFrame =
    df.select(col(urlCol).as("url")).filter(col("url").isNotNull).distinct()

  /** Seed the index (v=1) with the first round's URLs. Returns the
    * committed version.
    */
  def build(urls: DataFrame, path: String, urlCol: String): Int = {
    urlsOf(urls, urlCol).write.mode("overwrite").parquet(s"$path/v=1")
    1
  }

  /** Append `urls`' NOVEL members (not in [[visited]]) as the next
    * version. Torn writes heal by overwrite (the target version was
    * never committed). Returns the committed version.
    */
  def addBatch(spark: SparkSession, path: String, urls: DataFrame,
      urlCol: String): Int = {
    val v = latestVersion(path).getOrElse(0) + 1
    urlsOf(urls, urlCol)
      .join(visited(spark, path), Seq("url"), "left_anti")
      .write.mode("overwrite").parquet(s"$path/v=$v")
    v
  }

  /** The live visited set `(url)`: every committed version minus URL
    * and host tombstones.
    */
  def visited(spark: SparkSession, path: String): DataFrame = {
    val versions = IndexVersions.committed(path).sorted
    if (versions.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("url",
            org.apache.spark.sql.types.StringType))))
    val all = versions.map(v => spark.read.parquet(s"$path/v=$v"))
      .reduce(_ unionByName _)
    val minusUrls = sidecar(spark, s"$path/_dels")
      .map(d => all.join(broadcast(d.select(col("url"))), Seq("url"),
        "left_anti"))
      .getOrElse(all)
    sidecar(spark, s"$path/_host_dels")
      .map(h => minusUrls.join(
        broadcast(h.select(col("host").as("__del_host"))),
        UrlFunctions.host(col("url")) === col("__del_host"), "left_anti"))
      .getOrElse(minusUrls)
  }

  /** Frontier admission: `candidates` rows whose `urlCol` is NOT in
    * [[visited]] — the rows a crawler actually fetches this round.
    * Candidate-internal duplicates are kept (the caller's rows are
    * the unit); one left-anti equi-join, linear in candidates.
    *
    * NULL-url candidates are EXCLUDED: they are unfetchable, the
    * index can never hold them ([[build]]/[[addBatch]] drop nulls),
    * and an anti-join would otherwise re-admit them every round
    * forever — an unkillable dispatch loop with no quarantine signal.
    * Callers wanting to count them filter `urlCol IS NULL` upstream.
    */
  def admit(spark: SparkSession, path: String, candidates: DataFrame,
      urlCol: String): DataFrame = {
    // rename the visited side: callers routinely name their column
    // `url` too, and a same-name join condition is ambiguous
    val seen = visited(spark, path).select(col("url").as("__seen_url"))
    candidates.filter(candidates(urlCol).isNotNull)
      .join(seen, candidates(urlCol) === col("__seen_url"), "left_anti")
  }

  /** Tombstone exact URLs for re-crawl (idempotent append; duplicates
    * absorbed by the anti-join).
    */
  def forgetUrls(urls: DataFrame, path: String, urlCol: String): Unit =
    urls.select(col(urlCol).as("url")).distinct()
      .coalesce(1).write.mode("append").parquet(s"$path/_dels")

  /** Tombstone whole hosts (every indexed URL of the host drops from
    * [[visited]] — the purge-a-site re-crawl).
    */
  def forgetHosts(hosts: DataFrame, path: String, hostCol: String): Unit =
    hosts.select(col(hostCol).as("host")).distinct()
      .coalesce(1).write.mode("append").parquet(s"$path/_host_dels")

  /** Fold the whole chain (tombstones applied) into a one-version
    * successor at `outPath` with `targetFiles` files — the small-files
    * + dead-tombstone reclaim after streamed ingest. The predecessor
    * is never touched; adopt the successor with
    * [[IndexMaintenance.commitLivePointer]].
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFiles: Int): Unit =
    visited(spark, inPath).repartition(targetFiles)
      .write.mode("overwrite").parquet(s"$outPath/v=1")

  // Deliberately NOT IndexMaintenance.tombstones/appendTombstones:
  // those hardcode the wing tables' long-`id` column and single
  // `_dels` sidecar, while this index keys on STRING urls and carries
  // two tombstone kinds (url + host). Generalizing the shared helpers
  // would touch every wing caller for two ten-line readers; revisit if
  // a third string-keyed index appears.
  private def sidecar(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (!p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)) None
    else Some(spark.read.parquet(path))
  }
}
