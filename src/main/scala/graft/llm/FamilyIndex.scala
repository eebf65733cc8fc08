package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted incremental duplicate-FAMILY index — the connected-
  * components closure (q42/q43's pairs → families → survivor) as an
  * INCREMENTAL maintenance problem, completing the persisted-index
  * tier's dedup story: the band indexes ([[MinHashIndex]] and
  * siblings) already generate each arriving batch's near-dup PAIRS
  * incrementally; this index folds those pairs into a cumulative
  * family assignment without ever re-running connected components
  * over the corpus's full edge set.
  *
  * The index is the assignment table `(id, family)`, `family` = the
  * minimum id reachable in the pair graph — exactly
  * [[graft.operators.ConnectedComponents.run]]'s contract, so
  * survivor selection ([[graft.operators.Dedup.byNearDupPairs]]'
  * min-id rule) and leakage-safe splitting (q183) read it directly.
  *
  * The fold exploits that min-closure is ASSOCIATIVE under vertex
  * contraction: an already-assigned endpoint can be replaced by its
  * family representative, and CC then runs on the CONTRACTED edge
  * list — (family(a), family(b)) for old endpoints, raw ids for new
  * ones — whose size is bounded by the BATCH's pairs, never the
  * corpus. A batch edge that links two old families triggers a
  * REASSIGNMENT of both families' members to the merged minimum,
  * implemented as a broadcast remap join over the assignment table.
  * Representatives are min-ids, so the contracted minimum IS the
  * global minimum of the merged component: parity with a one-shot CC
  * over the union of all folded pairs is EXACT, id for id (pinned in
  * FamilyIndexSpec against random graphs, and by q229's oracle).
  *
  * Scale shape per batch: one broadcast semi-join to pull the touched
  * assignment rows (batch-bounded), CC on the contracted graph
  * (batch-bounded), one scan-plus-broadcast-remap rewrite of the
  * assignment table. Nothing shuffles at corpus size — the rewrite is
  * a map-side job — but it IS a corpus-sized WRITE per batch
  * (copy-on-write, the [[LineDedupIndex]] posture). At extreme batch
  * cadence, persist the remaps as deltas instead and compose them at
  * read time; the copy-on-write form is the parity-obvious one.
  *
  * Versioned `v=N` writes with `_SUCCESS` commit markers
  * ([[IndexVersions]]); [[vacuum]] reclaims superseded versions
  * ([[IndexMaintenance.vacuumChain]] — reads touch only the latest).
  */
object FamilyIndex {

  /** Latest COMMITTED version (see [[IndexVersions]]). */
  def latestVersion(path: String): Option[Int] = IndexVersions.latest(path)

  /** Start the index (v=1) from an initial pair batch `(id_a, id_b)`.
    * Ids in no pair don't appear — read-side callers left-join and
    * `coalesce(family, id)`, same universe contract as CC itself.
    */
  def build(pairs: DataFrame, path: String): Unit =
    graft.operators.ConnectedComponents.run(pairs, "id_a", "id_b")
      .withColumnRenamed("component", "family")
      .write.mode("overwrite").parquet(s"$path/v=1")

  /** Fold a new pair batch into the index. Pairs may touch old ids,
    * new ids, or bridge the two; old families linked by a batch edge
    * are merged to their common minimum.
    */
  def addBatch(spark: SparkSession, path: String, pairs: DataFrame): Unit = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no FamilyIndex at $path"))
    val cur = spark.read.parquet(s"$path/v=$v")
    val p = pairs.select("id_a", "id_b").localCheckpoint()
    val ids = p.select(col("id_a").as("id"))
      .union(p.select(col("id_b").as("id"))).distinct()
    // assignment rows of batch-touched OLD ids: batch-bounded, pulled
    // with a broadcast semi-join (the corpus table only streams past)
    val touched = cur.join(broadcast(ids), Seq("id"), "left_semi")
      .localCheckpoint()
    // contract old endpoints to their family representative
    val contracted = p
      .join(broadcast(touched.select(col("id").as("id_a"),
        col("family").as("fa"))), Seq("id_a"), "left")
      .join(broadcast(touched.select(col("id").as("id_b"),
        col("family").as("fb"))), Seq("id_b"), "left")
      .select(coalesce(col("fa"), col("id_a")).as("id_a"),
        coalesce(col("fb"), col("id_b")).as("id_b"))
    // CC over the batch-bounded contracted graph: nodes are old family
    // reps and genuinely new ids
    val merged = graft.operators.ConnectedComponents
      .run(contracted, "id_a", "id_b")
      .withColumnRenamed("component", "family")
      .localCheckpoint()
    // old members follow their rep through the merge (broadcast remap;
    // families untouched by the batch keep their family unchanged)
    val remap = merged.select(col("id").as("family"),
      col("family").as("new_family"))
    val updatedOld = cur.join(broadcast(remap), Seq("family"), "left")
      .select(col("id"),
        coalesce(col("new_family"), col("family")).as("family"))
    // contracted nodes that are NOT old family reps are the new ids
    val newIdRows = merged.join(
      broadcast(touched.select(col("family").as("id")).distinct()),
      Seq("id"), "left_anti")
    updatedOld.unionByName(newIdRows)
      .write.mode("overwrite").parquet(s"$path/v=${v + 1}")
  }

  /** The current assignment `(id, family)` — every id that ever
    * appeared in a folded pair.
    */
  def assignment(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no FamilyIndex at $path"))
    spark.read.parquet(s"$path/v=$v")
  }

  /** Delete superseded versions in place (reads touch only the latest
    * committed version — see [[IndexMaintenance.vacuumChain]]).
    */
  def vacuum(spark: SparkSession, path: String): Int =
    IndexMaintenance.vacuumChain(spark, path)
}
