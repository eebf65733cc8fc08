package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class GapFillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private def run(rows: Seq[(String, Timestamp, Double)]) =
    GapFill.linear(rows.toDF("series", "ts", "value"), "series", "ts", "value")
      .orderBy("series", "b")
      .as[(String, Timestamp, Long, Option[Double], String)]
      .collect().toSeq

  test("interior gaps interpolate linearly between neighbors") {
    // observed hours 0, 1, 4 with values 1, 2, 5 — slope is exactly
    // 1/hour across the gap, so hours 2 and 3 must fill to 3 and 4
    val out = run(Seq(("a", ts(0), 1.0), ("a", ts(1), 2.0), ("a", ts(4), 5.0)))
    assert(out.map(_._2) == (0 to 4).map(h => ts(h)))
    assert(out.map(_._4.get) == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    assert(out.map(_._5) == Seq("obs", "obs", "interp", "interp", "obs"))
    assert(out.map(_._3) == Seq(1L, 1L, 0L, 0L, 1L))
  }

  test("multiple observations in one bucket average before filling") {
    val out = run(Seq(("a", ts(0, 10), 1.0), ("a", ts(0, 50), 3.0),
      ("a", ts(2), 6.0)))
    assert(out.map(_._4.get) == Seq(2.0, 4.0, 6.0))
    assert(out.map(_._5) == Seq("obs", "interp", "obs"))
  }

  test("null values join neither the average nor n_obs; all-null buckets fill as gaps") {
    val rows = Seq(
      ("a", ts(0), Some(2.0)), ("a", ts(0, 30), None),
      ("a", ts(1), None),
      ("a", ts(2), Some(6.0)))
    val out = GapFill.linear(rows.toDF("series", "ts", "value"),
        "series", "ts", "value")
      .orderBy("b")
      .as[(String, Timestamp, Long, Option[Double], String)]
      .collect().toSeq
    // hour 0: the null row is excluded from the average (2.0, not 1.0)
    // and from n_obs; hour 1 is all-null -> a gap, interpolated
    assert(out == Seq(
      ("a", ts(0), 1L, Some(2.0), "obs"),
      ("a", ts(1), 0L, Some(4.0), "interp"),
      ("a", ts(2), 1L, Some(6.0), "obs")))
  }

  test("series are independent; a single-bucket series emits one obs row") {
    val out = run(Seq(("a", ts(0), 1.0), ("a", ts(2), 3.0), ("b", ts(5), 9.0)))
    val (as, bs) = out.partition(_._1 == "a")
    assert(as.size == 3 && as(1)._5 == "interp" && as(1)._4.get == 2.0)
    assert(bs == Seq(("b", ts(5), 1L, Some(9.0), "obs")))
  }
}
