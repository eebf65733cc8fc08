package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("flagship-shaped join audits clean: broadcast, pruned scans, pushed filter, codegen") {
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 10)
      .select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
    val joined = li.join(broadcast(ord),
      col("l_orderkey") === col("o_orderkey"))
    joined.collect() // finalize THIS plan (count() would build a separate one)
    val r = PlanAudit.audit(joined)
    assert(r.scaleSafe)
    assert(r.broadcasts >= 1)
    assert(r.scans.nonEmpty)
    assert(r.scans.forall(_.readColumns <= 2),
      s"projection must reach the scans: ${r.scans}")
    assert(r.scans.exists(_.pushedFilters),
      s"the quantity filter must reach a scan: ${r.scans}")
    assert(r.codegenNodes > 0 && r.codegenCoverage > 0.2,
      s"codegen must cover the scan->filter->project path: $r")
  }

  test("a shuffle aggregation reports its exchange") {
    val agg = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(count(lit(1)))
    agg.collect()
    assert(PlanAudit.audit(agg).shuffles >= 1)
  }

  test("the derived-column pushdown trap is flagged; the conditional-aggregation form is clean") {
    // the q245 shape: a Filter ABOVE a Project deriving `t` through an
    // expensive chain — PushDownPredicates substitutes the alias into
    // every predicate leg, so the optimized Filter holds the chain
    // once per leg and re-executes it per leg at runtime
    graft.plans.GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sf)
    val derived = docs
      .withColumn("t", expr(
        "decode(gunzip_all(gzip_bytes(encode(text, 'utf-8'))), 'utf-8')"))
    val trapped = derived
      .filter(length(col("t")) > 10 && col("t").startsWith("a"))
      .select("doc_id")
    // the HoistExpensiveFilterPredicates rule auto-fixes this shape;
    // disable it to demonstrate the raw trap the detector exists for
    val rules = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = rules.filterNot(
      _ == graft.plans.HoistExpensiveFilterPredicates)
    try {
      val findings = PlanAudit.duplicatedExpensiveFilters(trapped)
      assert(findings.nonEmpty, "the pushed-down duplicated chain must flag")
      assert(findings.head.occurrences >= 2)
      intercept[IllegalArgumentException] {
        PlanAudit.assertScaleSafe(trapped)
      }
    } finally spark.experimental.extraOptimizations = rules
    // with the rule active the SAME query plans clean — the chain is
    // hoisted to one evaluation below the filter. (A fresh DataFrame:
    // QueryExecution caches the optimized plan per Dataset object.)
    val rehoisted = derived
      .filter(length(col("t")) > 10 && col("t").startsWith("a"))
      .select("doc_id")
    assert(PlanAudit.duplicatedExpensiveFilters(rehoisted).isEmpty,
      "the hoist rule must neutralize the trap")
    assert(rehoisted.collect().toSeq.sortBy(_.getLong(0)) ==
      trapped.collect().toSeq.sortBy(_.getLong(0)))
    // the fix shape: conditional aggregation — no Filter node exists,
    // the chain is evaluated once inside the aggregate
    val fixed = derived
      .groupBy(col("source"))
      .agg(count(when(length(col("t")) > 10 && col("t").startsWith("a"), 1))
        .as("n_kept"))
    assert(PlanAudit.duplicatedExpensiveFilters(fixed).isEmpty)
    fixed.collect()
    PlanAudit.assertScaleSafe(fixed)
    // a SINGLE-leg filter over the chain is also clean: evaluating the
    // derivation once per row to decide the row is the honest cost
    val single = derived.filter(length(col("t")) > 10).select("doc_id")
    assert(PlanAudit.duplicatedExpensiveFilters(single).isEmpty)
  }

  test("an independent expensive chain behind the leading leg is NOT hoisted — stays flagged") {
    // the hoist rule's soundness boundary: chain B is duplicated only
    // in later, short-circuited conjuncts and shares NO expensive
    // subtree with the leading conjunct's chain A — hoisting it would
    // turn ~0 evaluations/row (behind a selective leading leg) into 1
    // on every row, so the rule must leave it alone and the detector
    // must surface it to the author
    graft.plans.GraftExtensions.register(spark)
    val derived = Tables.documents(spark, sf)
      .withColumn("a", expr(
        "decode(gunzip_all(gzip_bytes(encode(text, 'utf-8'))), 'utf-8')"))
      .withColumn("b", expr(
        "decode(gunzip_all(gzip_bytes(encode(source, 'utf-8'))), 'utf-8')"))
    val mixed = derived
      .filter(length(col("a")) > 10 &&
        length(col("b")) > 1 && col("b").startsWith("w"))
      .select("doc_id")
    val findings = PlanAudit.duplicatedExpensiveFilters(mixed)
    assert(findings.nonEmpty,
      "the independent later-leg duplicate must remain flagged, not hoisted")
    // whereas a later-leg expression BUILT ON the leading chain (shares
    // its derivation) IS hoisted along with it — the q251 gate shape
    val shared = derived
      .filter(length(col("a")) > 10 &&
        substring(col("a"), 1, 3) === "abc" && col("a").endsWith("z"))
      .select("doc_id")
    assert(PlanAudit.duplicatedExpensiveFilters(shared).isEmpty,
      "duplicates sharing the leading conjunct's chain must hoist clean")
  }

  test("a duplicate CARRYING an independent expensive chain is NOT hoisted — stays flagged") {
    // the round-12 tightening: the duplicated expression touches the
    // leading conjunct's chain A, but ALSO embeds independent chain B
    // (levenshtein(A, B) — B appears nowhere in the leading leg).
    // Hoisting the duplicate would force B's whole derivation onto
    // every row behind the leading leg's selectivity, so the rule must
    // decline and the detector must keep the author in the loop.
    graft.plans.GraftExtensions.register(spark)
    val derived = Tables.documents(spark, sf)
      .withColumn("a", expr(
        "decode(gunzip_all(gzip_bytes(encode(text, 'utf-8'))), 'utf-8')"))
      .withColumn("b", expr(
        "decode(gunzip_all(gzip_bytes(encode(source, 'utf-8'))), 'utf-8')"))
    val carrying = derived
      .filter(length(col("a")) > 10 &&
        levenshtein(col("a"), col("b")) > 2 &&
        levenshtein(col("a"), col("b")) < 1000)
      .select("doc_id")
    val findings = PlanAudit.duplicatedExpensiveFilters(carrying)
    assert(findings.nonEmpty,
      "a duplicate embedding an independent expensive chain must stay flagged")
  }

  test("quadratic join shapes are flagged and assertScaleSafe refuses them") {
    val a = (1L to 10L).toDF("x")
    val b = (1L to 10L).toDF("y")
    val cart = a.crossJoin(b)
    cart.collect()
    val r = PlanAudit.audit(cart)
    assert(!r.scaleSafe)
    assert(r.nestedLoopJoins + r.cartesianProducts >= 1)
    intercept[IllegalArgumentException] {
      PlanAudit.assertScaleSafe(cart)
    }
  }
}
