package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Physical-plan scale audit — the checks PlanSpec pins for this repo's
  * own queries, packaged as a library surface any pipeline can run on
  * its own DataFrames before launching a 100 TB job (the plan-level
  * sibling of [[InspectParquet]], which audits the data side).
  *
  * What it counts and why it matters at scale:
  *   - shuffle / broadcast exchanges — each shuffle is a full
  *     rewrite+transfer of its input; knowing the count (and trending it
  *     across code changes) catches accidental co-location loss;
  *   - nested-loop / cartesian joins — the two shapes that turn a plan
  *     from O(n) to O(n·m); almost always an un-pushed join predicate;
  *   - scan width per source — a scan reading 11 columns for a
  *     2-column projection means pruning broke (schema evolution, UDF
  *     opacity, a missing select);
  *   - pushed-filter presence per scan — a filter evaluated post-scan
  *     reads 100% of the data to drop most of it;
  *   - whole-stage-codegen coverage — nodes outside codegen run on the
  *     volcano iterator path (per-row virtual calls).
  *
  * Call [[audit]] AFTER an action ON THE SAME DataFrame when AQE is on:
  * the adaptive plan is only final once executed (pre-execution it
  * reports the initial, pre-codegen plan). `df.collect()`/`df.write`
  * finalize it; `df.count()` does NOT — count builds a separate plan
  * with its own query execution.
  */
object PlanAudit {

  case class ScanInfo(
      source: String,
      readColumns: Int,
      pushedFilters: Boolean)

  case class PlanReport(
      shuffles: Int,
      broadcasts: Int,
      nestedLoopJoins: Int,
      cartesianProducts: Int,
      scans: Seq[ScanInfo],
      codegenNodes: Int,
      totalNodes: Int) {
    /** No quadratic join shapes anywhere in the plan. */
    def scaleSafe: Boolean = nestedLoopJoins == 0 && cartesianProducts == 0
    def codegenCoverage: Double =
      if (totalNodes == 0) 0.0 else codegenNodes.toDouble / totalNodes
  }

  /** Flatten the plan, following AQE's final-plan indirection and into
    * materialized query stages (whose plans are fields, not children).
    */
  private def allNodes(plan: SparkPlan): Seq[SparkPlan] = plan match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: allNodes(q.plan)
    case n => n +: n.children.flatMap(allNodes)
  }

  /** Nodes genuinely inside one codegen region: descent stops at
    * InputAdapter, whose subtree runs OUTSIDE the generated function.
    */
  private def codegenSpan(p: SparkPlan): Int = p match {
    case _: org.apache.spark.sql.execution.InputAdapter => 0
    case n => 1 + n.children.map(codegenSpan).sum
  }

  def audit(df: DataFrame): PlanReport = {
    val nodes = allNodes(df.queryExecution.executedPlan)
    val scans = nodes.collect {
      case f: FileSourceScanExec =>
        ScanInfo(
          source = f.relation.fileFormat.toString,
          readColumns = f.requiredSchema.size,
          pushedFilters = f.metadata.get("PushedFilters").exists(s =>
            s.nonEmpty && s != "[]"))
      case b: BatchScanExec =>
        ScanInfo(
          source = b.scan.getClass.getSimpleName,
          readColumns = b.output.size,
          pushedFilters = false)
    }
    val inCodegen = nodes.collect { case w: WholeStageCodegenExec =>
      codegenSpan(w.child)
    }.sum
    PlanReport(
      shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec]),
      broadcasts = nodes.count(_.isInstanceOf[BroadcastExchangeExec]),
      nestedLoopJoins = nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      cartesianProducts = nodes.count(_.isInstanceOf[CartesianProductExec]),
      scans = scans,
      codegenNodes = inCodegen,
      totalNodes = nodes.size)
  }

  /** CI-style gate: throws with the offending plan when a quadratic
    * join shape is present.
    */
  def assertScaleSafe(df: DataFrame): PlanReport = {
    val report = audit(df)
    require(report.scaleSafe,
      s"plan contains ${report.nestedLoopJoins} nested-loop and " +
        s"${report.cartesianProducts} cartesian joins:\n" +
        df.queryExecution.executedPlan.toString)
    report
  }
}
