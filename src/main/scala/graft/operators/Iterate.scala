package graft.operators

import org.apache.spark.sql.Dataset

/** Materialization policy point for every lineage-truncation site in the
  * engine (iterative operators, model tables, landed batch frames).
  *
  * Why this exists: iterative dataflow (PageRank, connected components,
  * label propagation, k-core, HITS, BPE merges, k-means) doubles the
  * analyzed plan per round unless each round's result is materialized
  * with its lineage cut. `Dataset.localCheckpoint()` does that with
  * executor-local blocks — perfect in local mode, but on a real cluster
  * a lost executor takes its blocks with it, and a truncated plan has
  * nothing to recompute from: the job dies at iteration 18 of 20.
  * `Dataset.checkpoint()` writes the blocks to the (HDFS-grade)
  * checkpoint directory instead — executor loss just re-reads the files.
  *
  * Every operator calls [[materialize]] (usually via the
  * [[Iterate.MaterializeOps.materialized]] extension) instead of picking
  * one of the two primitives, and the choice is made ONCE, from config:
  *
  *   - reliable `checkpoint()` when `spark.graft.checkpoint.reliable=true`
  *     OR a SparkContext checkpoint dir is set (`sc.setCheckpointDir`) —
  *     the cluster posture;
  *   - `localCheckpoint()` otherwise — the local/bench posture, identical
  *     to the pre-seam behavior (zero plan or timing change);
  *   - `spark.graft.checkpoint.reliable=false` forces local mode even
  *     with a checkpoint dir set (e.g. a dir configured for streaming
  *     state on a session that also runs cheap local iteration).
  *
  * Both primitives run EAGERLY (the default for each), so call sites keep
  * the "each round executes now" semantics their loop-cost comments rely
  * on. Results are bitwise-identical across modes — the mode changes
  * where blocks LIVE, never what they contain — pinned by
  * IterateSpec (same hashes in both modes, plus a blocks-killed test
  * proving reliable mode survives what local mode cannot).
  */
object Iterate {

  /** True when [[materialize]] will write reliable checkpoints. */
  def reliable(ds: Dataset[_]): Boolean = {
    val spark = ds.sparkSession
    spark.conf.getOption("spark.graft.checkpoint.reliable") match {
      case Some(v) => v.trim.equalsIgnoreCase("true")
      case None    => spark.sparkContext.getCheckpointDir.isDefined
    }
  }

  /** Eagerly materialize `ds` with lineage truncated, per the policy
    * above. Reliable mode requires a checkpoint dir; failing fast with
    * the remedy beats dying 18 iterations in.
    */
  def materialize[T](ds: Dataset[T]): Dataset[T] =
    if (reliable(ds)) {
      if (ds.sparkSession.sparkContext.getCheckpointDir.isEmpty)
        throw new IllegalStateException(
          "spark.graft.checkpoint.reliable=true but no checkpoint dir is " +
            "set — call sc.setCheckpointDir(<fault-tolerant path>) first")
      ds.checkpoint()
    } else ds.localCheckpoint()

  /** `df.materialized` — chain-position replacement for
    * `df.localCheckpoint()` at all call sites.
    */
  implicit class MaterializeOps[T](private val ds: Dataset[T]) extends AnyVal {
    def materialized: Dataset[T] = Iterate.materialize(ds)
  }
}
