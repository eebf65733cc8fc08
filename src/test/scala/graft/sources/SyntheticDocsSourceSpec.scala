package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SyntheticDocsSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def synth(rows: Long, partitions: Int = 4) = spark.read
    .format("graft.sources.SyntheticDocsSource")
    .option("rows", rows).option("partitions", partitions).option("seed", 42)
    .load()

  test("row count and id range are exact across uneven partitions") {
    val df = synth(1003, partitions = 4)
    assert(df.count() == 1003L)
    val r = df.agg(min("doc_id"), max("doc_id"), countDistinct("doc_id")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (0L, 1002L, 1003L))
  }

  test("generation is deterministic and partition-count independent") {
    val a = synth(200, partitions = 2).orderBy("doc_id").collect()
    val b = synth(200, partitions = 7).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("column pruning reaches the scan (pruned columns never computed)") {
    val df = synth(100).select("doc_id")
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name) == Seq("doc_id"),
      s"scan should output only doc_id, got ${scan.output}")
    assert(scan.toString.contains("pruned=doc_id"), scan.toString)
  }

  test("a user-supplied schema is honored when a compatible projection") {
    import org.apache.spark.sql.types._
    val projected = spark.read
      .format("graft.sources.SyntheticDocsSource")
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType))))
      .option("rows", 50).load()
    assert(projected.columns.toSeq == Seq("doc_id", "lang"))
    assert(projected.count() == 50)
  }

  test("a divergent user-supplied schema fails loudly, not silently") {
    import org.apache.spark.sql.types._
    def read(s: StructType) = spark.read
      .format("graft.sources.SyntheticDocsSource").schema(s)
      .option("rows", 10).load().collect()
    val unknownCol = intercept[Exception] {
      read(StructType(Seq(StructField("nope", LongType))))
    }
    assert(unknownCol.getMessage.contains("nope"))
    val wrongType = intercept[Exception] {
      read(StructType(Seq(StructField("doc_id", StringType))))
    }
    assert(wrongType.getMessage.toLowerCase.contains("doc_id"))
  }

  test("generated text is a plausible corpus (tokens in vocab, 20-60 words)") {
    import spark.implicits._
    val lens = synth(500)
      .select(size(split(col("text"), " ")).as("n")).as[Int].collect()
    assert(lens.forall(n => n >= 20 && n <= 60))
    val langs = synth(500).select("lang").distinct()
      .as[String].collect().toSet
    assert(langs == Set("en", "de", "es", "fr", "zh"))
  }
}
