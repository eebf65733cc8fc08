package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CountMin

/** Persisted count-min sketch index — corpus-wide frequency estimates as
  * an INCREMENTAL maintenance problem, extending the persisted-index
  * tier ([[MinHashIndex]]/[[SimHashIndex]]/[[WinnowIndex]] for near-dup,
  * [[IvfIndex]] for ANN, [[CmsIndex]] for frequencies).
  *
  * The index is the materialized cell table `(j, cell, cnt)` of a
  * [[CountMin]] sketch — at the default 4×256 it is ≤ 1024 rows no
  * matter the corpus size. Because count-min merge is elementwise
  * addition, incremental maintenance is parity-EXACT by construction:
  * build(batch₁) ⊕ add(batch₂) produces cell-for-cell the counters of a
  * from-scratch build over batch₁ ∪ batch₂ (pinned in CmsIndexSpec) —
  * no recall caveat like the capped near-dup indexes. Each add is one
  * vocabulary-sized aggregation over the NEW batch plus a union with the
  * ≤1024-row current cells; history is never rescanned.
  *
  * Writes are versioned (`v=N` subdirs, monotonically increasing) so an
  * add never overwrites the directory it is reading — the same
  * copy-on-write posture as the streaming MERGE sink, minus its vacuum
  * machinery (a 1024-row table per version costs nothing to keep).
  *
  * Estimates never undercount (CMS guarantee); probes hashing to cells
  * the corpus never touched estimate 0 via the left join.
  */
object CmsIndex {

  val Depth = 4
  val Width = 256

  /** Cell index expression for poly-hashed key column `h`, row `j`. */
  private def cellExpr(j: org.apache.spark.sql.Column,
      h: org.apache.spark.sql.Column) =
    pmod(pmod((lit(31L) + lit(2L) * j) * h + lit(7L) + lit(97L) * j,
      lit(CountMin.Mod)), lit(Width.toLong)).cast("int")

  /** Sketch cells of a token batch: two-phase — collapse to the
    * vocabulary grain FIRST, then fan out ×depth — so the ×4 row
    * expansion happens on distinct tokens, not the corpus stream.
    */
  def cells(toks: DataFrame): DataFrame =
    toks.groupBy("h").agg(count(lit(1)).as("n"))
      .select(col("h"), col("n"),
        explode(sequence(lit(0), lit(Depth - 1))).as("j"))
      .select(col("j").cast("int").as("j"),
        cellExpr(col("j"), col("h")).as("cell"), col("n"))
      .groupBy("j", "cell").agg(sum(col("n")).as("cnt"))

  // Hadoop-FS listing, not java.io.File: build/addBatch write through
  // Spark's resolved filesystem, so on HDFS/S3 a local-File listing
  // would report "no index" for an index that exists (StreamMerge
  // .versions handles this the same way).
  private def versionDirs(path: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toInt)
  }

  def latestVersion(path: String): Option[Int] =
    versionDirs(path).sorted.lastOption

  /** Build the index from an initial batch of poly-hashed tokens
    * (column `h`); starts the version chain at v=1.
    */
  def build(toks: DataFrame, path: String): Unit =
    cells(toks).write.mode("errorifexists").parquet(s"$path/v=1")

  /** Fold a new batch into the index: new cells ⊕ current cells →
    * next version. Exact — see the scaladoc.
    */
  def addBatch(spark: SparkSession, path: String, toks: DataFrame): Unit = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no CmsIndex at $path"))
    val cur = spark.read.parquet(s"$path/v=$v")
    cells(toks).unionByName(cur)
      .groupBy("j", "cell").agg(sum(col("cnt")).as("cnt"))
      .write.mode("errorifexists").parquet(s"$path/v=${v + 1}")
  }

  /** Frequency estimates for a probe frame carrying key column `w` and
    * its poly-hash `h`: min over the depth rows, 0 for untouched cells.
    */
  def estimates(spark: SparkSession, path: String, probes: DataFrame): DataFrame = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no CmsIndex at $path"))
    val cur = spark.read.parquet(s"$path/v=$v")
    probes
      .withColumn("j", explode(sequence(lit(0), lit(Depth - 1))))
      .withColumn("j", col("j").cast("int"))
      .withColumn("cell", cellExpr(col("j"), col("h")))
      .join(broadcast(cur), Seq("j", "cell"), "left")
      .groupBy("w")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
