package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals the plain join on a skewed key (with dup rows both sides)") {
    // key 1 is hot on the left; key 2 duplicated on BOTH sides to pin
    // that replication doesn't multiply matches
    val left = ((1 to 100).map(i => (1L, i.toLong)) ++
      Seq((2L, 200L), (2L, 201L), (3L, 300L))).toDF("k", "lv")
    val right = Seq((1L, "a"), (2L, "b"), (2L, "c"), (4L, "d")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).orderBy("k", "lv", "rv").collect()
    val salted = SaltedJoin.inner(left, right, Seq("k"), col("lv"), numSalts = 4)
      .orderBy("k", "lv", "rv").collect()
    assert(salted.sameElements(plain))
    // key 2 must appear exactly 2x2=4 times, key 4 zero times
    assert(salted.count(_.getLong(0) == 2L) == 4)
    assert(!salted.exists(_.getLong(0) == 4L))
  }

  test("a NULL salt source still routes the row (semantics preserved)") {
    val left = Seq((1L, Some(10L)), (1L, None), (2L, Some(20L)))
      .toDF("k", "lv")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).orderBy("k", "lv").collect()
    val salted = SaltedJoin.inner(left, right, Seq("k"), col("lv"), numSalts = 4)
      .orderBy("k", "lv").collect()
    assert(salted.sameElements(plain) && salted.length == 3)
  }

  test("inputs that already carry a __salt column are rejected loudly") {
    val left = Seq((1L, 0)).toDF("k", "__salt")
    val right = Seq((1L, "x")).toDF("k", "rv")
    intercept[IllegalArgumentException] {
      SaltedJoin.inner(left, right, Seq("k"), col("k"), numSalts = 2)
    }
  }

  test("numSalts larger than the data is harmless") {
    val left = Seq((1L, 10L)).toDF("k", "lv")
    val right = Seq((1L, "x")).toDF("k", "rv")
    val out = SaltedJoin.inner(left, right, Seq("k"), col("lv"), numSalts = 64)
      .collect()
    assert(out.length == 1)
  }

  test("salt column does not leak into the output schema") {
    val left = Seq((1L, 10L)).toDF("k", "lv")
    val right = Seq((1L, "x")).toDF("k", "rv")
    val out = SaltedJoin.inner(left, right, Seq("k"), col("lv"), numSalts = 4)
    assert(out.columns.toSeq == Seq("k", "lv", "rv"))
  }
}
