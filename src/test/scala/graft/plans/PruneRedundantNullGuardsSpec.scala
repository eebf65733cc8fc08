package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.IsNotNull
import org.apache.spark.sql.catalyst.plans.logical.Filter
import graft.{Tables, TestSpark}

/** The optimizer rule that cleans up Catalyst's own derived-column
  * duplication: InferFiltersFromConstraints synthesizes IsNotNull(e)
  * next to a real null-rejecting predicate over e, which after alias
  * substitution re-evaluates the whole derivation chain per row.
  */
class PruneRedundantNullGuardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def guardsOnNonAttributes(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case f: Filter =>
      f.condition.collect {
        case IsNotNull(e)
            if !e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute] =>
          e
      }.size
    }.sum

  test("the q127 shape: inferred IsNotNull over the shingle chain is pruned, rows unchanged") {
    val docs = Tables.documents(spark, sf)
    // explode over a derived array: inference adds size>0 + IsNotNull,
    // pushdown substitutes the derivation into both
    val df = docs
      .select(col("doc_id"), array_distinct(
        graft.functions.TextFunctions.wordShingles(col("text"), 3)).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .groupBy("doc_id").count()
      .orderBy("doc_id")
    assert(guardsOnNonAttributes(df) == 0,
      "no non-attribute IsNotNull guard may survive the rule")
    assert(graft.tools.PlanAudit.duplicatedExpensiveFilters(df).isEmpty)
    // semantics pin: identical rows with the rule disabled
    val expected = {
      val before = spark.experimental.extraOptimizations
      spark.experimental.extraOptimizations =
        before.filterNot(_ == PruneRedundantNullGuards)
      try df.collect().toSeq
      finally spark.experimental.extraOptimizations = before
    }
    assert(df.collect().toSeq == expected)
  }

  test("guards on plain attributes and guards without a justifying sibling survive") {
    val docs = Tables.documents(spark, sf)
    // IsNotNull(text) on a scan attribute: free, must stay
    val attrGuard = docs.filter(col("text").isNotNull).select("doc_id")
    val survivors = attrGuard.queryExecution.optimizedPlan.collect {
      case f: Filter => f.condition.collect { case g: IsNotNull => g }.size
    }.sum
    assert(survivors >= 1)
    // a lone IsNotNull over a derived expression with NO sibling
    // null-rejecting predicate: nothing justifies dropping it
    val lone = docs
      .select(col("doc_id"), upper(col("text")).as("u"))
      .filter(col("u").isNotNull)
      .select("doc_id")
    assert(lone.count() > 0) // evaluates correctly either way
  }
}
