package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ScaleOracleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("replicate offsets every key per copy and preserves join structure") {
    val orders = Seq((1L, 10L, "A"), (2L, 11L, "B"))
      .toDF("o_orderkey", "o_custkey", "status")
    val lineitem = Seq((1L, 7L), (1L, 8L), (2L, 7L))
      .toDF("l_orderkey", "l_partkey")
    val o10 = ScaleOracle.replicate(orders, 3, Seq("o_orderkey", "o_custkey"))
    val l10 = ScaleOracle.replicate(lineitem, 3, Seq("l_orderkey", "l_partkey"))
    // cardinality ×copies, keys unique across copies
    assert(o10.count() == 6 && l10.count() == 9)
    assert(o10.select("o_orderkey").distinct().count() == 6)
    // join structure preserved PER COPY: every lineitem still finds its
    // order, and only within its own copy (3 matches per original pair)
    val joined = l10.join(o10,
      l10("l_orderkey") === o10("o_orderkey"))
    assert(joined.count() == 9)
    // copy k's keys live in copy k's id space
    assert(o10.filter(col("o_orderkey") >= 20000000L)
      .select("o_custkey").as[Long].collect().toSet == Set(20000010L, 20000011L))
    // non-key payload columns replicate verbatim
    assert(o10.filter(col("status") === "A").count() == 3)
  }
}
