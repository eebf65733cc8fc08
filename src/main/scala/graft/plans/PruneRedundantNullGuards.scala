package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, IsNotNull, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Drop `IsNotNull(expensive_expr)` conjuncts a sibling predicate
  * already makes redundant — the cleanup for a duplication Catalyst
  * itself introduces on derived-column pipelines.
  *
  * The shape: `InferFiltersFromConstraints` synthesizes
  * `IsNotNull(e)` next to a real predicate like `size(e) > 0` after
  * predicate pushdown has substituted the alias `e` (say, a shingle
  * array derived from text). For an ATTRIBUTE that guard is free; for
  * a substituted EXPRESSION it re-evaluates the whole derivation chain
  * a second time per row — Filter predicates evaluate left-to-right
  * with short-circuiting, so common-subexpression elimination cannot
  * always fold them (the same class of waste as the q245 pushdown
  * trap, here optimizer-made rather than user-made).
  *
  * Soundness: if another conjunct `c` reaches `e` through a path of
  * null-intolerant operators, then `e` being null makes `c` evaluate
  * to null, and a null conjunct drops the row exactly as the false
  * `IsNotNull` would — so removing the guard never changes which rows
  * survive the Filter.
  *
  * Registered via `spark.experimental.extraOptimizations` (the
  * [[GraftExtensions]] runtime path) — runs after the main optimizer
  * batches, i.e. after both the inference and the pushdown that
  * create the shape.
  */
object PruneRedundantNullGuards extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val pruned = conjuncts.filterNot {
        case IsNotNull(e) if !e.isInstanceOf[Attribute] =>
          conjuncts.exists { c =>
            !isBareGuard(c) && reachesNullIntolerantly(c, e)
          }
        case _ => false
      }
      if (pruned.length == conjuncts.length || pruned.isEmpty) f
      else Filter(pruned.reduce(And), child)
  }

  private def isBareGuard(c: Expression): Boolean = c.isInstanceOf[IsNotNull]

  /** Does `c` contain `e` at a position where every ancestor on the
    * path is null-intolerant (null in ⇒ null out)? Then `e` null ⇒
    * `c` null ⇒ the row is dropped by the Filter regardless of the
    * guard.
    */
  private def reachesNullIntolerantly(c: Expression, e: Expression): Boolean =
    if (c.semanticEquals(e)) true
    else if (!nullInNullOut(c)) false
    else c.children.exists(reachesNullIntolerantly(_, e))

  /** `nullIntolerant` plus the opt-outs that are intolerant in their
    * non-legacy configuration: `size(null)` is NULL unless
    * legacySizeOfNull reinstates the -1 behavior.
    */
  private def nullInNullOut(c: Expression): Boolean = c match {
    case s: org.apache.spark.sql.catalyst.expressions.Size =>
      !s.legacySizeOfNull
    case other => other.nullIntolerant
  }
}
