package graft.llm

import org.apache.spark.sql.SparkSession

/** Shared version-chain listing for the persisted exact indexes
  * ([[LineDedupIndex]], [[CmsIndex]], [[Bm25Index]]): `v=N` subdirs,
  * monotonically increasing, COMMITTED iff Spark's `_SUCCESS` job
  * marker is present.
  *
  * The `_SUCCESS` check is the crash-consistency half of the contract:
  * a writer dying mid-job leaves a `v=N+1` directory without the
  * marker (the committer only materializes it after every task commit
  * lands), and treating that torn directory as the latest version
  * would make every subsequent read silently partial — worse than the
  * crash itself for a parity-EXACT index, because nothing downstream
  * can tell. Listing only committed versions makes a torn write
  * invisible, and writers heal it by OVERWRITING the uncommitted
  * directory on retry (overwrite of a version number that `committed`
  * never returned cannot clobber readable data).
  *
  * Hadoop-FS listing, not java.io.File: the writers go through Spark's
  * resolved filesystem, so on HDFS/S3 a local-File listing would
  * report "no index" for an index that exists (StreamMerge.versions
  * handles this the same way).
  */
private[llm] object IndexVersions {

  /** Version numbers under `path` whose directories carry `_SUCCESS`. */
  def committed(path: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v=") &&
        fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toInt)
  }

  def latest(path: String): Option[Int] = committed(path).sorted.lastOption
}
