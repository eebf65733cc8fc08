package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the FM register sketch's algebra: duplicate-insensitivity,
  * merge-of-parts == whole, partition invariance, and the trailing-zero
  * identity on hand-checked values.
  */
class DistinctSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sketch depends only on the distinct key set (duplicates are free)") {
    val once = DistinctSketch.build(
      (1 to 500).map(i => s"k$i").toDF("k"), col("k"))
    val thrice = DistinctSketch.build(
      ((1 to 500) ++ (1 to 500) ++ (1 to 500)).map(i => s"k$i").toDF("k"), col("k"))
    assert(once.except(thrice).count() == 0 && thrice.except(once).count() == 0)
  }

  test("merging per-segment sketches equals sketching the whole corpus") {
    val all = (1 to 2000).map(i => s"key-$i").toDF("k")
    val whole = DistinctSketch.build(all, col("k"))
    val parts = (0 until 4).map(p =>
      DistinctSketch.build(all.filter(length(col("k")) % 4 === p), col("k")))
    val merged = DistinctSketch.merge(parts: _*)
    assert(whole.except(merged).count() == 0 && merged.except(whole).count() == 0)
  }

  test("partition layout cannot change the sketch") {
    val df = (1 to 1000).map(i => s"v$i").toDF("k")
    val a = DistinctSketch.build(df.repartition(1), col("k")).collect().toSet
    val b = DistinctSketch.build(df.repartition(17), col("k")).collect().toSet
    assert(a == b)
  }

  test("rho is trailing-zeros-plus-one of the rehash (hand-checked)") {
    // replicate the column math in Scala for a few keys
    def polyHash(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 131 + c.toInt) % 1000000007L)
    val keys = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val expected = keys.map { k =>
      val h = polyHash(k)
      val h2 = (h * 31 + 7) % 1000000007L
      val rho = (if (h2 == 0) 0 else java.lang.Long.numberOfTrailingZeros(h2)) + 1L
      (h % 64, rho)
    }.groupBy(_._1).map { case (r, vs) => (r, vs.map(_._2).max) }
    val got = DistinctSketch.build(keys.toDF("k"), col("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  test("estimate tracks cardinality across a decade (sanity, not precision)") {
    def estimate(n: Int): Double = {
      val s = DistinctSketch.summarize(
        DistinctSketch.build((1 to n).map(i => s"item$i").toDF("k"), col("k")))
        .head()
      // FM mean-of-2^rho estimator with the classic 0.77351 correction
      64 * (s.getAs[Long]("sum_pow2_rho").toDouble / 64) / 0.77351 / 2
    }
    val e1k = estimate(1000)
    val e10k = estimate(10000)
    // register sketches at m=64 are coarse; a decade apart must separate
    assert(e10k > e1k * 3, s"estimates failed to separate: $e1k vs $e10k")
  }
}
