package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, Levenshtein, NamedExpression, RegExpExtract, RegExpExtractAll, RegExpReplace}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Hoist an expensive expression that appears MORE THAN ONCE inside a
  * Filter condition into a Project below the Filter, replacing every
  * occurrence with one attribute reference.
  *
  * Why this exists: PushDownPredicates substitutes a derived alias
  * into every predicate leg that references it, so a quality gate like
  * `n_tokens BETWEEN … AND alpha_ratio >= … AND top_bigram_frac <= …`
  * over signals derived from one tokenization chain becomes a Filter
  * that re-evaluates that chain once per leg (8× for the q48 gate;
  * the q245 incident measured 16× on a gzip→parse→extract chain).
  * Filter predicates evaluate with short-circuit semantics, which
  * blocks reliable common-subexpression elimination — so the
  * duplication is real per-row work. After hoisting, the chain runs
  * once per row in the Project (where codegen-level subexpression
  * elimination also applies across hoisted aliases), and the Filter
  * tests cheap attribute references.
  *
  * Short-circuit guard: hoisting evaluates expressions on EVERY row,
  * while short-circuiting could skip them all on rows a cheap earlier
  * conjunct rejects. The rule therefore fires only when the FIRST
  * conjunct (always evaluated) itself contains an expensive node —
  * then every row pays for the derivation chain regardless, and
  * hoisting the filter's duplicates turns 2+ evaluations on surviving
  * rows into 1 on all rows (the win that measured 16× on q245's
  * shape) — and, within such a filter, hoists only duplicates whose
  * expensive content is ENTIRELY anchored to that leading conjunct:
  * every expensive node in the duplicate is either shared with the
  * leading leg or an ancestor of shared work (so the hoist's marginal
  * cost above the per-row floor is bounded by the residue steps, not
  * an unbounded independent chain). A filter whose expensive
  * duplicates hide entirely behind a CHEAP leading leg, an
  * INDEPENDENT expensive chain duplicated only in short-circuited
  * later legs, or a duplicate CARRYING an independent expensive chain
  * alongside the shared one (levenshtein(sharedChain, otherChain)) is
  * left alone — hoisting there could multiply work by the leading
  * leg's selectivity — and stays FLAGGED by
  * PlanAudit.duplicatedExpensiveFilters, surfacing the reorder-or-
  * restructure decision to the author instead of guessing.
  *
  * Runs in `spark.experimental.extraOptimizations` (after the main
  * optimizer's pushdown fixed point); idempotent, so the user-batch
  * fixed point terminates immediately on the second pass.
  */
object HoistExpensiveFilterPredicates extends Rule[LogicalPlan] {

  /** The per-node cost anchors worth hoisting: graft native kernels
    * (codec/parse/shingle/hash chains) and the built-in heavyweights.
    * Must stay in sync with PlanAudit's audit-side definition.
    */
  private def isExpensiveNode(e: Expression): Boolean =
    e.getClass.getName.startsWith("graft.plans.") ||
      e.isInstanceOf[RegExpReplace] || e.isInstanceOf[RegExpExtract] ||
      e.isInstanceOf[RegExpExtractAll] || e.isInstanceOf[Levenshtein]

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      // the leading conjunct is evaluated on every row regardless of
      // short-circuiting — only expressions it contains are hoistable
      // without ever increasing per-row work
      val firstConjunct = cond match {
        case org.apache.spark.sql.catalyst.expressions.And(l, _) =>
          var h: Expression = l
          while (h.isInstanceOf[org.apache.spark.sql.catalyst.expressions.And])
            h = h.asInstanceOf[org.apache.spark.sql.catalyst.expressions.And].left
          h
        case other => other
      }
      val leadingLegIsExpensive = firstConjunct.exists(isExpensiveNode)
      // every-row cost anchor: only work the LEADING conjunct itself
      // evaluates is already paid on every row. An INDEPENDENT
      // expensive chain duplicated only in later, short-circuited
      // conjuncts goes from ~0 evaluations/row (behind a selective
      // leading leg) to 1 on every row if hoisted — a regression, not
      // a win — so the dup collection is restricted to expressions
      // that SHARE an expensive subtree with the leading conjunct:
      // either their own canonical form occurs there, or their
      // derivation chain does (a gate leg like repetition_stats(
      // split(CHAIN)) whose CHAIN the first leg evaluates anyway only
      // adds its marginal cost above the per-row floor, while leaving
      // it duplicated re-runs the whole chain per leg). Independent
      // later-leg duplicates stay flagged by PlanAudit for the author
      // to reorder.
      val leadingCanon: Set[Expression] =
        if (!leadingLegIsExpensive) Set.empty
        else firstConjunct.collect {
          case e if isExpensiveNode(e) => e.canonicalized
        }.toSet
      // An expression shares the leading conjunct's work only when its
      // ENTIRE expensive content is anchored to it: every expensive
      // node inside it is either itself in leadingCanon or an ANCESTOR
      // of a leadingCanon subtree (the marginal-step shape — e.g.
      // repetition_stats(split(CHAIN)) where CHAIN leads: the extra
      // cost above the per-row floor is one kernel over already-paid
      // input). An expensive node that neither is shared nor contains
      // shared work is an INDEPENDENT chain riding inside the
      // duplicate — e.g. levenshtein(sharedChain, otherChain) — and
      // hoisting the duplicate would force that whole independent
      // chain onto every row behind a possibly-selective leading leg.
      // Such duplicates stay unhoisted and flagged by PlanAudit.
      def sharesLeadingWork(e: Expression): Boolean = {
        val expensive = e.collect { case x if isExpensiveNode(x) => x }
        expensive.exists(x => leadingCanon.contains(x.canonicalized)) &&
          expensive.forall(x =>
            x.exists(d => leadingCanon.contains(d.canonicalized)))
      }
      // hoistable = deterministic and computable from the child's
      // output alone (an expression under a higher-order-function
      // lambda references lambda variables and cannot move)
      val dup = if (!leadingLegIsExpensive) Seq.empty[Expression]
      else cond.collect {
        case e if isExpensiveNode(e) && e.deterministic &&
          sharesLeadingWork(e) &&
          e.references.subsetOf(child.outputSet) => e
      }.groupBy(_.canonicalized).values
        .collect { case es if es.size >= 2 => es.head }
        .toSeq
        // outermost-first: replacing a larger duplicated subtree first
        // removes the smaller duplicates nested inside its occurrences
        .sortBy(e => (-e.collect { case x => x }.size, e.toString))
      if (dup.isEmpty) f
      else {
        val aliases = dup.zipWithIndex.map { case (e, i) =>
          Alias(e, s"__hoisted_$i")()
        }
        val byCanon: Map[Expression, Attribute] =
          dup.zip(aliases).map { case (e, a) =>
            e.canonicalized -> a.toAttribute
          }.toMap
        val newCond = cond.transformDown {
          case e if byCanon.contains(e.canonicalized) => byCanon(e.canonicalized)
        }
        val below = Project(
          child.output.map(a => a: NamedExpression) ++ aliases, child)
        Project(f.output.map(a => a: NamedExpression),
          Filter(newCond, below))
      }
  }
}
