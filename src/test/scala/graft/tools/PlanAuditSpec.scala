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
