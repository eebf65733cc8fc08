package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the log-bucketed quantile sketch's algebra: the bucket id is
  * monotone and its [lb, ub] envelope always contains the value, the
  * envelope honors the 2^-k relative-error bound, merge-of-parts ==
  * whole, partition invariance, and every exact nearest-rank percentile
  * lands inside the sketch's answer envelope.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Scala replica of the column math, for hand-checking. */
  private def bucketOf(v: Long, k: Int = 5): Long = {
    val b = 1L << k
    if (v < b) v
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      (e.toLong - k) * b + (v >> (e - k))
    }
  }

  test("bucket id is monotone and exact below 2^k (hand-checked sweep)") {
    val vs = (0L to 300L) ++ Seq(1000L, 65535L, 65536L, 1L << 40)
    val ids = vs.map(bucketOf(_))
    assert(ids == ids.sorted, "bucket id must be monotone in v")
    (0L until 32L).foreach(v => assert(bucketOf(v) == v))
    val got = QuantileSketch.build(vs.toDF("v"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = vs.groupBy(bucketOf(_)).view.mapValues(_.size.toLong).toMap
    assert(got == expected)
  }

  test("every value sits inside its bucket's [lb, ub] envelope at < 2^-k error") {
    val vs = Seq(0L, 1L, 31L, 32L, 63L, 64L, 100L, 999L, 12345L,
      (1L << 30) + 7, (1L << 52) + 123456789L)
    vs.foreach { v =>
      val id = bucketOf(v)
      val (lb, ub) = if (id < 32) (id, id) else {
        val s = (id >> 5) - 1
        ((id - s * 32) << s, ((id - s * 32 + 1) << s) - 1)
      }
      assert(lb <= v && v <= ub, s"v=$v escaped [$lb, $ub]")
      assert(ub - lb <= math.max(1L, v) / 32 + 1,
        s"v=$v bucket width ${ub - lb} breaks the 2^-5 relative bound")
    }
  }

  test("merging per-segment sketches equals sketching the whole corpus") {
    val all = (1 to 5000).map(_.toLong * 37 % 100000).toDF("v")
    val whole = QuantileSketch.build(all, col("v"))
    val parts = (0 until 4).map(p =>
      QuantileSketch.build(all.filter(pmod(col("v"), lit(4)) === p), col("v")))
    val merged = QuantileSketch.merge(parts: _*)
    assert(whole.except(merged).count() == 0 && merged.except(whole).count() == 0)
  }

  test("partition layout cannot change the sketch") {
    val df = (1 to 3000).map(i => (i.toLong * i) % 77777).toDF("v")
    val a = QuantileSketch.build(df.repartition(1), col("v")).collect().toSet
    val b = QuantileSketch.build(df.repartition(17), col("v")).collect().toSet
    assert(a == b)
  }

  test("exact nearest-rank percentiles land inside the sketch envelopes") {
    val data = (1 to 10000).map(i => (i.toLong * 2654435761L) % 1000000L)
    val sk = QuantileSketch.build(data.toDF("v"), col("v"))
    val ps = Seq(1, 25, 50, 75, 90, 99, 100)
    val est = QuantileSketch.quantiles(sk, ps)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sorted = data.sorted
    ps.foreach { p =>
      val exact = sorted((data.size * p + 99) / 100 - 1)
      val (lb, ub) = est(p.toLong)
      assert(lb <= exact && exact <= ub,
        s"p$p exact=$exact escaped envelope [$lb, $ub]")
    }
  }

  test("negative values are excluded, zero is kept") {
    val sk = QuantileSketch.build(Seq(-5L, -1L, 0L, 3L).toDF("v"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sk == Map(0L -> 1L, 3L -> 1L))
  }

  test("grouped sketch: per-group envelopes contain per-group exact percentiles") {
    val rows = (for (g <- Seq("a", "b", "c"); i <- 1 to 200)
      yield (g, (i.toLong * (g(0) - 'a' + 1) * 7) % 5000)).toSeq
    val df = rows.toDF("g", "v")
    val sk = QuantileSketch.buildBy(df, Seq("g"), col("v"))
    val est = QuantileSketch.quantilesBy(sk, Seq("g"), Seq(50, 90, 99))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    for (g <- Seq("a", "b", "c"); p <- Seq(50, 90, 99)) {
      val vs = rows.filter(_._1 == g).map(_._2).sorted
      val exact = vs((vs.size * p + 99) / 100 - 1)
      val (lb, ub) = est((g, p.toLong))
      assert(lb <= exact && exact <= ub, s"g=$g p=$p exact=$exact in [$lb,$ub]")
    }
  }

  test("grouped sketch equals per-group global sketches") {
    val rows = (for (g <- Seq("x", "y"); i <- 1 to 150)
      yield (g, i.toLong * 13 % 999)).toSeq
    val df = rows.toDF("g", "v")
    val grouped = QuantileSketch.buildBy(df, Seq("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val perGroup = Seq("x", "y").flatMap { g =>
      QuantileSketch.build(df.filter(col("g") === g).select("v"), col("v"))
        .collect().map(r => (g, r.getLong(0), r.getLong(1)))
    }.toSet
    assert(grouped == perGroup)
  }
}
