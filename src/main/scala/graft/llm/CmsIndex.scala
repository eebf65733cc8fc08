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

  /** Latest COMMITTED version (see [[IndexVersions]]: a crashed write
    * leaves a `v=N` dir without `_SUCCESS`, which is invisible here and
    * healed by the next add's overwrite).
    */
  def latestVersion(path: String): Option[Int] = IndexVersions.latest(path)

  /** Build the index from an initial batch of poly-hashed tokens
    * (column `h`); starts the version chain at v=1. Overwrite mode
    * heals a torn `v=1` left by a crashed earlier attempt.
    */
  def build(toks: DataFrame, path: String): Unit =
    cells(toks).write.mode("overwrite").parquet(s"$path/v=1")

  /** Fold a new batch into the index: new cells ⊕ current cells →
    * next version. Exact — see the scaladoc. The target version is
    * `latest committed + 1`, so a retry after a crash overwrites only
    * the torn, never-readable directory.
    */
  def addBatch(spark: SparkSession, path: String, toks: DataFrame): Unit = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no CmsIndex at $path"))
    val cur = spark.read.parquet(s"$path/v=$v")
    cells(toks).unionByName(cur)
      .groupBy("j", "cell").agg(sum(col("cnt")).as("cnt"))
      .write.mode("overwrite").parquet(s"$path/v=${v + 1}")
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
  /** Delete superseded versions in place (reads touch only the latest
    * committed version, so `v < latest` is dead weight — see
    * [[IndexMaintenance.vacuumChain]] for the full safety contract).
    * Returns the number of directories removed.
    */
  def vacuum(spark: SparkSession, path: String): Int =
    IndexMaintenance.vacuumChain(spark, path)
}
