package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

/** Format breadth beyond parquet (the reference is parquet-only;
  * SURVEY.md §2.1): CSV and JSON-lines roundtrips with explicit schemas,
  * plus the corrupt-record handling a real ingest path needs.
  */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("JSON-lines roundtrip preserves rows and schema (explicit schema read)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    val docs = Tables.documents(spark, sf)
    docs.write.json(s"$dir/docs")
    val back = spark.read.schema(docs.schema).json(s"$dir/docs")
    assert(back.schema == docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("CSV roundtrip with quoting preserves free-text rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val docs = Tables.documents(spark, sf)
    docs.write.option("header", "true").option("quoteAll", "true")
      .csv(s"$dir/docs")
    val back = spark.read.option("header", "true").schema(docs.schema)
      .csv(s"$dir/docs")
    assert(back.count() == docs.count())
    // free text with commas/quotes survives the quoted roundtrip
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("corrupt JSON records are quarantined, not silently dropped (PERMISSIVE)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-badrec").toString
    val f = new java.io.PrintWriter(s"$dir/in.jsonl")
    f.println("""{"id": 1, "v": 10.0}""")
    f.println("""{"id": 2, "v": """) // truncated
    f.println("""{"id": 3, "v": 30.0}""")
    f.close()
    val schema = "id LONG, v DOUBLE, _corrupt_record STRING"
    val df = spark.read.schema(schema).json(s"$dir/in.jsonl").cache()
    try {
      assert(df.count() == 3)
      assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
      assert(df.filter(col("_corrupt_record").isNull)
        .agg(sum("v")).head().getDouble(0) == 40.0)
    } finally df.unpersist()
  }

  test("FAILFAST read rejects the corrupt file loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-badrec2").toString
    val f = new java.io.PrintWriter(s"$dir/in.jsonl")
    f.println("""{"id": 1}""")
    f.println("""not json at all""")
    f.close()
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.schema("id LONG").option("mode", "FAILFAST")
        .json(s"$dir/in.jsonl").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed")
      || Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("catalog tables: saveAsTable + SQL over the catalog + DESCRIBE") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    docs.write.mode("overwrite").saveAsTable("graft_docs_cat")
    try {
      val viaSql = spark.sql(
        "SELECT lang, count(*) AS n FROM graft_docs_cat GROUP BY lang")
      val direct = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      assert(viaSql.exceptAll(direct).isEmpty && direct.exceptAll(viaSql).isEmpty)
      val cols = spark.sql("DESCRIBE TABLE graft_docs_cat")
        .select("col_name").collect().map(_.getString(0)).toSet
      assert(Set("doc_id", "lang", "n_chars").subsetOf(cols))
      assert(spark.catalog.tableExists("graft_docs_cat"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_docs_cat")
  }
}
