package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class StatsAndSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("describeNumeric: count/min/max/mean on known values") {
    val df = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 60.0)).toDF("a", "b")
    val out = Stats.describeNumeric(df, Seq("a", "b")).orderBy("column_name")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out(0) == ("a", 3L, 1.0, 3.0, 2.0))
    assert(out(1) == ("b", 3L, 10.0, 60.0, 30.0))
  }

  test("saltedCount equals the plain grouped count, including a hot key") {
    val rows = (1L to 500L).map(i => (if (i <= 450) 1L else i, i)) // key 1 dominates
    val df = rows.toDF("k", "id")
    val salted = SkewedAgg.saltedCount(df, Seq("k"), col("id"), numSalts = 8)
      .as[(Long, Long)].collect().toMap
    val plain = df.groupBy("k").count().as[(Long, Long)].collect().toMap
    assert(salted == plain)
    assert(salted(1L) == 450L)
  }

  test("saltedCount rejects non-positive salt counts") {
    val df = Seq((1L, 1L)).toDF("k", "id")
    intercept[IllegalArgumentException] {
      SkewedAgg.saltedCount(df, Seq("k"), col("id"), numSalts = 0)
    }
  }
}
