package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class JoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("facts with missing dim key survive with the default; dim rows without facts emit nothing") {
    val facts = Seq((1L, "r1"), (2L, "r2")).toDF("loc", "payload")
    val dim = Seq((1L, "Loc1"), (3L, "Loc3")).toDF("loc_d", "name")
    val out = Joins.enrichLeftBroadcast(facts, dim, "loc", "loc_d",
        Map("name" -> "Unknown"))
      .select("loc", "name").as[(Long, String)].collect().toMap
    // loc 2 absent from dim -> "Unknown" (reference ParquetCombinerRDD.scala:189);
    // dim loc 3 has no facts -> no row (reference UnitTest :594-628)
    assert(out == Map(1L -> "Loc1", 2L -> "Unknown"))
  }

  test("plan uses a broadcast hash join") {
    val facts = Seq((1L, "r1")).toDF("loc", "payload")
    val dim = Seq((1L, "Loc1")).toDF("loc_d", "name")
    val plan = Joins.enrichLeftBroadcast(facts, dim, "loc", "loc_d")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
