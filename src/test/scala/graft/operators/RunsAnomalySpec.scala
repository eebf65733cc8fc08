package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RunsAnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("collapse numbers runs 1..n per key and records length and bounds") {
    // key 1: a a b a  → runs (a,2) (b,1) (a,1); key 2: x → one run
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 4L, "a"),
      (2L, 1L, "x")).toDF("k", "t", "v")
    val out = Runs.collapse(df, "k", Seq("t"), "v")
      .orderBy("k", "version")
      .select("k", "version", "v", "n_rows", "run_start", "run_end")
      .as[(Long, Long, String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, "a", 2L, 1L, 2L),
      (1L, 2L, "b", 1L, 3L, 3L),
      (1L, 3L, "a", 1L, 4L, 4L),
      (2L, 1L, "x", 1L, 1L, 1L)))
  }

  test("collapse handles a null-leading value sequence (version stays 1-based)") {
    val df = Seq(
      (1L, 1L, None), (1L, 2L, None), (1L, 3L, Some("a")))
      .toDF("k", "t", "v")
    val out = Runs.collapse(df, "k", Seq("t"), "v")
      .orderBy("version")
      .select("version", "n_rows").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (2L, 1L)))
  }

  test("anomaly flags a spike against a full trailing baseline, not before") {
    // Baseline of eight 10s, then a spike; the spike's z is unbounded
    // (σ=0). Rows 1..8 have n_base < 8 and must never be flagged.
    val rows = (1 to 8).map(i => (1L, i.toLong, 10L)) :+ (1L, 9L, 500L)
    val out = Anomaly.flag(rows.toDF("k", "t", "v"), "k", Seq("t"), "v",
        lookback = 8, tau = 3)
      .orderBy("t").select("n_base", "is_anomaly")
      .as[(Long, Long)].collect().toSeq
    assert(out.take(8).forall(_._2 == 0L))
    assert(out.take(8).map(_._1) == (0L to 7L))
    assert(out.last == ((8L, 1L)))
  }

  test("anomaly does not flag values inside tau sigma; exact integer boundary") {
    // Baseline alternating 0/20 (μ=10, σ²=100 ⇒ σ=10, n=8): x=40 gives
    // z=3 exactly — NOT flagged (strict >); x=41 is.
    val base = (1 to 8).map(i => (1L, i.toLong, if (i % 2 == 0) 20L else 0L))
    def lastFlag(x: Long): Long =
      Anomaly.flag((base :+ ((1L, 9L, x))).toDF("k", "t", "v"),
          "k", Seq("t"), "v", lookback = 8, tau = 3)
        .orderBy("t").select("is_anomaly").as[Long].collect().last
    assert(lastFlag(40L) == 0L)
    assert(lastFlag(41L) == 1L)
  }

  test("anomaly baseline is trailing only: the point does not contaminate it") {
    // If the window included the current row, the σ of the spike row's
    // own window would explode and mask the spike.
    val rows = (1 to 8).map(i => (2L, i.toLong, 10L)) :+ (2L, 9L, 11L)
    val out = Anomaly.flag(rows.toDF("k", "t", "v"), "k", Seq("t"), "v",
        lookback = 8, tau = 3)
      .orderBy("t").select("is_anomaly").as[Long].collect().toSeq
    // 11 vs constant-10 baseline: σ=0, any deviation flags.
    assert(out.last == 1L)
  }
}
