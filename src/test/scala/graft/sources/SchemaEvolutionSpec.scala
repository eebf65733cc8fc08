package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Schema evolution at the parquet source: a table directory whose files
  * were written across schema versions (columns added over time) must
  * read as the superset schema with nulls for the missing columns — the
  * posture a long-lived 100 TB table needs, since rewriting history on
  * every schema change is off the table.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("mergeSchema reads v1+v2 files as the superset with nulls for absent columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(s"$dir/t")
    Seq((3L, "c", 0.5), (4L, "d", 0.9))
      .toDF("id", "name", "score")
      .write.mode("append").parquet(s"$dir/t")

    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    assert(merged.count() == 4)
    // v1 rows surface the added column as null, v2 rows keep values
    val byId = merged.select("id", "score").as[(Long, Option[Double])]
      .collect().toMap
    assert(byId(1L).isEmpty && byId(2L).isEmpty)
    assert(byId(3L).contains(0.5) && byId(4L).contains(0.9))
  }

  test("explicit superset schema reads old files without mergeSchema (cheap steady-state path)") {
    // mergeSchema footer-merges EVERY file at planning time — fine for a
    // migration read, wasteful as the default. The steady-state pattern
    // pins the current schema explicitly; old files again null-fill.
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve2").toString
    Seq((1L, "a")).toDF("id", "name").write.mode("append").parquet(s"$dir/t")
    val full = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, name STRING, score DOUBLE")
    val read = spark.read.schema(full).parquet(s"$dir/t")
    assert(read.columns.toSeq == Seq("id", "name", "score"))
    assert(read.select("score").as[Option[Double]].collect().toSeq == Seq(None))
  }
}
