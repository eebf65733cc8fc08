package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, Levenshtein, RegExpExtract, RegExpExtractAll, RegExpReplace}
import org.apache.spark.sql.catalyst.plans.logical.Filter
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

  /** One duplicated-expensive-predicate finding: the same expensive
    * subtree appears `occurrences` times inside ONE Filter condition.
    */
  case class DuplicatedExpensiveFilter(
      expression: String,
      occurrences: Int,
      condition: String)

  /** Is this node itself an expensive kernel — a graft native
    * expression (codec/parse/shingle/hash chains) or one of the
    * built-in heavyweights (regexp engines, edit distance)? The cost
    * model is per-NODE, not per-subtree: the duplicated unit the
    * pushdown trap re-evaluates is always anchored at one of these.
    */
  private def isExpensiveNode(e: Expression): Boolean =
    e.getClass.getName.startsWith("graft.plans.") ||
      e.isInstanceOf[RegExpReplace] || e.isInstanceOf[RegExpExtract] ||
      e.isInstanceOf[RegExpExtractAll] || e.isInstanceOf[Levenshtein]

  /** The derived-column pushdown trap, detected mechanically: a
    * `.filter()` above a Project deriving an expensive column gets
    * pushed BELOW it by PushDownPredicates, which substitutes the
    * alias into every predicate leg — so the optimized plan holds a
    * Filter whose condition contains the SAME expensive subtree once
    * per leg, and the whole derivation chain re-executes per leg
    * (measured 16× on q245's gzip→parse→extract gate before it was
    * rewritten as conditional aggregation). Boolean short-circuiting
    * blocks common-subexpression elimination inside Filter conditions,
    * so the duplication is real work, not a codegen artifact.
    *
    * Flags every Filter in the OPTIMIZED logical plan whose condition
    * contains ≥2 canonically-identical expensive nodes. Fix shapes:
    * conditional aggregation (q245), or materializing the derivation
    * at a job boundary before filtering (q251's landed corpus).
    */
  def duplicatedExpensiveFilters(df: DataFrame): Seq[DuplicatedExpensiveFilter] = {
    def safeSql(e: Expression): String =
      try e.sql catch { case scala.util.control.NonFatal(_) => e.toString }
    df.queryExecution.optimizedPlan.collect {
      case f: Filter =>
        f.condition.collect {
          case e if isExpensiveNode(e) => e
        }
          .groupBy(_.canonicalized)
          .collect { case (_, os) if os.size >= 2 =>
            DuplicatedExpensiveFilter(safeSql(os.head), os.size,
              safeSql(f.condition))
          }
    }.flatten
  }

  /** CI-style gate: throws with the offending plan when a quadratic
    * join shape or a duplicated-expensive-predicate Filter (the
    * derived-column pushdown trap) is present.
    */
  def assertScaleSafe(df: DataFrame): PlanReport = {
    val report = audit(df)
    require(report.scaleSafe,
      s"plan contains ${report.nestedLoopJoins} nested-loop and " +
        s"${report.cartesianProducts} cartesian joins:\n" +
        df.queryExecution.executedPlan.toString)
    val dups = duplicatedExpensiveFilters(df)
    require(dups.isEmpty,
      s"plan re-evaluates an expensive expression across Filter " +
        s"predicate legs (the derived-column pushdown trap — express " +
        s"the gate as conditional aggregation or materialize first):\n" +
        dups.map(d => s"  ${d.occurrences}x ${d.expression}").mkString("\n"))
    report
  }
}
