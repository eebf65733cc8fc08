package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the zone-map skipping contract: conservative candidate
  * selection (intersecting envelopes kept, null envelopes kept),
  * row-exact reads, and — the point — files actually skipped on a
  * layout-clustered table.
  */
class ZoneMapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def clusteredTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-zonemap").toString
    import spark.implicits._
    // four slices with disjoint [i*100, i*100+99] envelopes, one file each
    (0 until 4).foreach { i =>
      (i * 100 until (i + 1) * 100).map(k => (k.toLong, s"v$k")).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    ZoneMap.write(spark, dir, Seq("k"))
    dir
  }

  test("candidate selection prunes provably-disjoint files and keeps the rest") {
    val dir = clusteredTable()
    assert(ZoneMap.manifest(spark, dir).count() == 4)
    val mid = ZoneMap.candidateFiles(spark, dir, "k", lit(150L), lit(250L))
    assert(mid.size == 2, s"expected slices 1 and 2 only, got $mid")
    val all = ZoneMap.candidateFiles(spark, dir, "k", lit(0L), lit(399L))
    assert(all.size == 4)
    val none = ZoneMap.candidateFiles(spark, dir, "k", lit(10000L), lit(20000L))
    assert(none.isEmpty)
  }

  test("readRange equals the unpruned filter row-for-row; empty prune keeps schema") {
    val dir = clusteredTable()
    val pruned = ZoneMap.readRange(spark, dir, "k", lit(150L), lit(250L))
    val full = spark.read.parquet(dir).filter(col("k") >= 150L && col("k") <= 250L)
    assert(pruned.count() == 101)
    assert(pruned.except(full).count() == 0 && full.except(pruned).count() == 0)
    val empty = ZoneMap.readRange(spark, dir, "k", lit(10000L), lit(20000L))
    assert(empty.count() == 0)
    assert(empty.columns.toSet == Set("k", "v"))
  }

  test("readBox intersects per-dimension candidates on a quadrant-clustered layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zonemap-box").toString
    import spark.implicits._
    // four files = four quadrants of a 200x200 grid: a box inside one
    // quadrant must open exactly one file
    for (qx <- 0 until 2; qy <- 0 until 2) {
      (for (x <- qx * 100 until (qx + 1) * 100; y <- qy * 100 until (qy + 1) * 100 if (x + y) % 37 == 0)
        yield (x.toLong, y.toLong)).toDF("x", "y")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    ZoneMap.write(spark, dir, Seq("x", "y"))
    // each 1-D prune keeps TWO files (a column range spans two quadrants)
    val cx = ZoneMap.candidateFiles(spark, dir, "x", lit(120L), lit(180L))
    val cy = ZoneMap.candidateFiles(spark, dir, "y", lit(20L), lit(80L))
    assert(cx.size == 2 && cy.size == 2)
    assert((cx.toSet intersect cy.toSet).size == 1)
    // the 2-D intersection keeps ONE: multiplicative pruning
    val box = ZoneMap.readBox(spark, dir,
      Seq(("x", lit(120L), lit(180L)), ("y", lit(20L), lit(80L))))
    val full = spark.read.parquet(dir)
      .filter(col("x").between(120L, 180L) && col("y").between(20L, 80L))
    assert(box.except(full).count() == 0 && full.except(box).count() == 0)
    assert(box.count() == full.count() && full.count() > 0)
  }

  test("append folds ONLY the new files into the manifest; result equals a full rebuild") {
    val dir = clusteredTable()
    import spark.implicits._
    // manifest current -> append is a no-op
    assert(ZoneMap.append(spark, dir, Seq("k")) == 0)
    // two new slices arrive
    (4 until 6).foreach { i =>
      (i * 100 until (i + 1) * 100).map(k => (k.toLong, s"v$k")).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    assert(ZoneMap.append(spark, dir, Seq("k")) == 2)
    assert(ZoneMap.manifest(spark, dir).count() == 6)
    // incrementally-maintained manifest == full rebuild, row for row
    val inc = ZoneMap.manifest(spark, dir)
      .collect().map(_.toSeq).toSet
    ZoneMap.write(spark, dir, Seq("k"))
    val full = ZoneMap.manifest(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(inc == full)
    // and the skipping read spans old and new slices exactly
    val got = ZoneMap.readRange(spark, dir, "k", lit(350L), lit(450L))
      .select("k").as[Long].collect().toSet
    assert(got == (350L to 450L).toSet)
  }

  test("null envelopes are conservative: an all-null chunk survives every prune") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zonemap-null").toString
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((null.asInstanceOf[java.lang.Long], "n1"),
      (null.asInstanceOf[java.lang.Long], "n2"))
      .toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    ZoneMap.write(spark, dir, Seq("k"))
    // the range excludes file 1's envelope but the null file must remain
    val cands = ZoneMap.candidateFiles(spark, dir, "k", lit(100L), lit(200L))
    assert(cands.size == 1, s"only the all-null file should survive, got $cands")
    // and a range HITTING file 1 keeps both
    assert(ZoneMap.candidateFiles(spark, dir, "k", lit(0L), lit(5L)).size == 2)
  }
}
