package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join: logical node + planner strategy + physical
  * sort-merge operator — the SURVEY §2 "custom operator, preference (c)"
  * path (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan` via
  * `SparkSessionExtensions`), used where composition genuinely leaves
  * efficiency on the table.
  *
  * Versus the union+window formulation ([[graft.operators.AsOfJoin]]):
  * both shuffle each side once by key, but the window must buffer and
  * sort the UNION (left rows carry null right-payloads through the
  * shuffle and the running `last()` scan), while this operator shuffles
  * each side in its native shape and streams a two-pointer merge per
  * partition — no widened rows, no window buffer, O(1) state per key.
  * Plan shape: two hash exchanges + two sorts + AsOfJoinExec; Spark's
  * EnsureRequirements aligns the partitioning exactly as it does for
  * SortMergeJoin.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute)
  extends BinaryNode {

  // left outer: right side columns go nullable
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Column pruning through [[AsOfJoinNode]]: Catalyst's ColumnPruning
  * only understands built-in operators, so a custom node is a pruning
  * barrier — a projection of two columns above it would still scan every
  * column of both inputs. This rule narrows each child to the columns
  * the parent projection (plus the join keys/timestamps) actually uses;
  * FileSourceStrategy then folds the inserted child Projects into the
  * scan's ReadSchema. Runs to fixpoint (a second pass finds nothing to
  * remove). Injected with `injectOptimizerRule` — the custom-Rule leg of
  * the SparkSessionExtensions trio (function, strategy, rule).
  */
object AsOfJoinPruningRule extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, aj: AsOfJoinNode) =>
      val used = AttributeSet(p.references ++
        Seq(aj.leftKey, aj.rightKey, aj.leftTs, aj.rightTs))
      val lNeeded = aj.left.output.filter(used.contains)
      val rNeeded = aj.right.output.filter(used.contains)
      if (lNeeded.length == aj.left.output.length &&
          rNeeded.length == aj.right.output.length) p
      else p.copy(child = aj.copy(
        left = if (lNeeded.length == aj.left.output.length) aj.left
               else Project(lNeeded, aj.left),
        right = if (rNeeded.length == aj.right.output.length) aj.right
                else Project(rNeeded, aj.right)))
  }
}

/** Plans [[AsOfJoinNode]] — broadcast variant when the right side fits
  * under `spark.sql.autoBroadcastJoinThreshold` (the same sizing rule the
  * built-in join selection uses), sort-merge otherwise. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions) or
  * `spark.experimental.extraStrategies` at runtime.
  *
  * The broadcast path is the 100 TB shape for dim-sized right sides: the
  * fact-table left keeps its partitioning — NO exchange and NO sort of
  * the big side — while sort-merge must shuffle and sort both.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts) =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      if (threshold > 0 && r.stats.sizeInBytes <= threshold)
        BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
      else
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

/** Broadcast as-of join: the right side arrives whole via broadcast
  * (EnsureRequirements inserts the BroadcastExchange for the
  * `BroadcastDistribution(IdentityBroadcastMode)` requirement), each task
  * indexes it per key with ts-sorted arrays, and every left row resolves
  * by hash lookup + binary search (greatest rightTs <= leftTs). The left
  * child's distribution is unconstrained and its partitioning/ordering
  * are preserved — the property that makes this the right plan when the
  * left is the 100 TB side.
  *
  * Same semantics and caveats as [[AsOfJoinExec]]: left outer, null
  * key/ts never matches, right (key, ts) ties resolve to whichever sorts
  * last (pre-dedup for full determinism).
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute)
  extends BinaryExecNode {

  import org.apache.spark.sql.catalyst.expressions.UnsafeRow
  import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val tsOrd = PhysicalDataType.ordering(rightTs.dataType)
      .asInstanceOf[Ordering[Any]]
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIter =>
      // built once per EXECUTOR (memoized on the broadcast id), not once
      // per left task — with a 100 TB left side there are thousands of
      // tasks per executor and the O(|R| log |R|) build must not repeat
      val index = BroadcastAsOfJoinExec.cachedIndex(broadcastRows.id) {
        val rKeyProj = UnsafeProjection.create(Seq(rightKey), rOut)
        val rTsProj = UnsafeProjection.create(Seq(rightTs), rOut)
        // per-key ts-sorted candidate arrays; keyed by the single-field
        // UnsafeRow of the key (byte-equal across sides for equal values
        // of the same data type, which the API requires)
        val idx = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]]()
        broadcastRows.value.foreach { r =>
          val k = rKeyProj(r)
          val t = rTsProj(r)
          if (!k.isNullAt(0) && !t.isNullAt(0)) { // null key/ts never matches
            val kc = k.copy()
            var buf = idx.get(kc)
            if (buf == null) {
              buf = new scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]()
              idx.put(kc, buf)
            }
            buf += ((t.copy().get(0, rightTs.dataType), r))
          }
        }
        idx.values().forEach { buf =>
          buf.sortInPlace()(Ordering.by[(Any, InternalRow), Any](_._1)(tsOrd))
          ()
        }
        idx
      }

      val lKeyProj = UnsafeProjection.create(Seq(leftKey), lOut)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), lOut)
      // same nullability-widening requirement as AsOfJoinExec's outProj
      val outProj = UnsafeProjection.create(
        allOut, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = lTsProj(l)
        var matchRow: InternalRow = null
        if (!lk.isNullAt(0) && !lt.isNullAt(0)) {
          val buf = index.get(lk)
          if (buf != null) {
            val ltv = lt.copy().get(0, leftTs.dataType)
            // greatest idx with ts <= ltv (binary search, upper bound)
            var lo = 0
            var hi = buf.length // exclusive
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (tsOrd.compare(buf(mid)._1, ltv) <= 0) lo = mid + 1
              else hi = mid
            }
            if (lo > 0) matchRow = buf(lo - 1)._2
          }
        }
        outProj(joined(l, if (matchRow != null) matchRow else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object BroadcastAsOfJoinExec {
  private type Index =
    java.util.HashMap[org.apache.spark.sql.catalyst.expressions.UnsafeRow,
      scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]]

  /** Executor-local memo of built right-side indexes, keyed by broadcast
    * id (a broadcast value is one-per-executor; the built index should be
    * too). Bounded LRU — an entry only pins rows the broadcast variable
    * itself already holds in memory. Build runs under the lock: concurrent
    * first tasks wait instead of duplicating the work.
    */
  private val cacheMax = 8
  private val indexCache =
    new java.util.LinkedHashMap[Long, Index](cacheMax, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Long, Index]): Boolean =
        size() > cacheMax
    }

  private[plans] def cachedIndex(id: Long)(build: => Index): Index =
    indexCache.synchronized {
      val hit = indexCache.get(id)
      if (hit != null) hit
      else {
        val built = build
        indexCache.put(id, built)
        built
      }
    }
}

/** Streaming two-pointer merge per co-partitioned (key, ts)-sorted
  * partition pair. For every left row: the greatest right row with equal
  * key and `rightTs <= leftTs` (nulls → no match; a null left key/ts
  * matches nothing, mirroring SQL equality).
  *
  * Rows sharing (key, ts) on the right resolve to whichever sorts last —
  * callers wanting full determinism dedup the right side per (key, ts)
  * first (the q45 pipeline does), same caveat as DuckDB's native ASOF.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = PhysicalDataType.ordering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val tsOrd = PhysicalDataType.ordering(leftTs.dataType)
      .asInstanceOf[Ordering[Any]]
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(leftKey), lOut)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rightKey), rOut)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), rOut)
      // input schema must carry the widened nullability: binding uses the
      // INPUT attribute's nullable flag, and a non-nullable BoundReference
      // skips the null check — the null-padded right side would read as 0s
      val outProj = UnsafeProjection.create(
        allOut, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      // current right-side candidate: the greatest (key, ts) right row
      // consumed so far (its key/ts cached as values, row copied)
      var candKey: Any = null
      var candTs: Any = null
      var candRow: InternalRow = null
      var rHead: InternalRow = null
      var rHeadKey: Any = null
      var rHeadTs: Any = null

      def advanceRight(): Unit = {
        rHead = null
        while (rHead == null && rIter.hasNext) {
          val r = rIter.next()
          val k = rKeyProj(r)
          val t = rTsProj(r)
          if (!k.isNullAt(0) && !t.isNullAt(0)) { // null key/ts never matches
            rHead = r
            rHeadKey = k.copy().get(0, rightKey.dataType)
            rHeadTs = t.copy().get(0, rightTs.dataType)
          }
        }
      }
      advanceRight()

      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = lTsProj(l)
        if (lk.isNullAt(0) || lt.isNullAt(0)) {
          outProj(joined(l, nullRight))
        } else {
          val lkv = lk.copy().get(0, leftKey.dataType)
          val ltv = lt.copy().get(0, leftTs.dataType)
          // consume right rows with key < lkv (never needed again: left
          // keys are ascending) or key == lkv and ts <= ltv (candidates)
          var continue = rHead != null
          while (continue) {
            val c = keyOrd.compare(rHeadKey, lkv)
            if (c < 0 || (c == 0 && tsOrd.compare(rHeadTs, ltv) <= 0)) {
              if (c == 0) {
                candKey = rHeadKey; candTs = rHeadTs; candRow = rHead.copy()
              }
              advanceRight()
              continue = rHead != null
            } else continue = false
          }
          val matched = candRow != null && keyOrd.compare(candKey, lkv) == 0 &&
            tsOrd.compare(candTs, ltv) <= 0
          outProj(joined(l, if (matched) candRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
