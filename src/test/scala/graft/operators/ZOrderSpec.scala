package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side reference interleave: bit b of dim i → position b*dims+i. */
  private def zRef(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    for ((v, i) <- vals.zipWithIndex; b <- 0 until bits)
      z |= (((v >> b) & 1L) << (b * vals.size + i))
    z
  }

  test("zValue interleaves bits (worked 2-dim example)") {
    // a=3 (011), b=5 (101), 3 bits: a→positions 0,2; b→positions 1,5
    val out = Seq((3L, 5L)).toDF("a", "b")
      .select(ZOrder.zValue(Seq(col("a"), col("b")), bits = 3).as("z"))
      .head().getLong(0)
    assert(out == zRef(Seq(3L, 5L), 3))
    assert(out == ((1L << 0) | (1L << 2) | (1L << 1) | (1L << 5)))
  }

  test("zValue matches the reference interleave on random 3-dim inputs") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(64)((rnd.nextInt(4096).toLong,
      rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
    val got = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        ZOrder.zValue(Seq(col("a"), col("b"), col("c")), bits = 12).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) == zRef(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 12))
    }
  }

  test("zValue masks dimensions wider than `bits` instead of corrupting high bits") {
    val got = Seq((0x1234L, 7L)).toDF("a", "b")
      .select(ZOrder.zValue(Seq(col("a"), col("b")), bits = 4).as("z"))
      .head().getLong(0)
    assert(got == zRef(Seq(0x1234L & 0xfL, 7L), 4))
  }

  test("zValueSql computes the same values as the Column form (engine-internal parity)") {
    val df = spark.sql(
      "SELECT id AS a, (id * 37) % 1024 AS b FROM range(0, 256)")
    df.createOrReplaceTempView("zorder_probe")
    val viaSql = spark.sql(
      s"SELECT ${ZOrder.zValueSql(Seq("a", "b"), 10)} AS z FROM zorder_probe ORDER BY a")
      .collect().map(_.getLong(0))
    val viaCol = df.orderBy("a")
      .select(ZOrder.zValue(Seq(col("a"), col("b")), 10)).collect().map(_.getLong(0))
    assert(viaSql.sameElements(viaCol))
  }

  test("cluster() gives output files pairwise-disjoint z-ranges (multi-dim skipping layout)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val df = spark.sql(
      "SELECT (id * 131) % 1024 AS x, (id * 17) % 1024 AS y FROM range(0, 4096)")
    ZOrder.cluster(df, Seq("x", "y"), bits = 10, numFiles = 4)
      .write.mode("overwrite").parquet(s"$dir/t")
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 2, "expected a multi-file clustered layout")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .select(min(ZOrder.zValue(Seq(col("x"), col("y")), 10)),
          max(ZOrder.zValue(Seq(col("x"), col("y")), 10))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2,
        s"file z-ranges overlap: $hi > $lo2 — clustering is not range-partitioned")
      case _ =>
    }
  }
}
