package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), 10L),
    (2L, Some("b"), 20L),
    (3L, None, 20L),
    (4L, Some("a"), 30L)).toDF("id", "tag", "v")

  test("profile: exact counts, nulls, distincts and envelopes per column") {
    val p = Profile.profile(df, Seq("id", "tag", "v")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("tag") == ((4L, 1L, 2L, "a", "b")))
    assert(p("v") == ((4L, 0L, 3L, "10", "30")))
  }

  test("drift: added/removed/kept statuses and basis-point deltas") {
    val before = Profile.profile(df, Seq("id", "tag", "v"))
    val after = Profile.profile(
      df.filter(col("id") <= 2)
        .select(col("id"), lit(null).cast("string").as("tag"),
          (col("v") * 10).as("w")),
      Seq("id", "tag", "w"))
    val got = Profile.drift(before, after).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("v").getString(1) == "removed")
    assert(got("w").getString(1) == "added")
    assert(got("id").getString(1) == "kept")
    // tag: 1/4 nulls (2500 bp) -> 2/2 nulls (10000 bp): delta +7500
    assert(got("tag").getLong(10) == 7500L)
    // removed column reports zero on the absent side
    assert(got("v").getLong(3) == 0L)
  }

  test("profile of an empty frame is all zeros with null envelopes") {
    val p = Profile.profile(df.filter(col("id") > 100), Seq("id", "tag"))
      .collect()
    assert(p.length == 2)
    assert(p.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L &&
      r.getLong(3) == 0L && r.isNullAt(4) && r.isNullAt(5)))
  }
}
