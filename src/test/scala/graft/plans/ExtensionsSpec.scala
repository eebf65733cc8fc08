package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The SQL registration surface: graft's native expressions must be
  * callable from pure SQL once GraftExtensions is installed.
  */
class ExtensionsSpec extends AnyFunSuite {

  // the shared test session already exists, so withExtensions would be
  // silently ignored by getOrCreate — use the runtime registration path
  // (which is also what notebook/REPL users need)
  private lazy val spark: SparkSession = {
    val s = graft.TestSpark.spark
    GraftExtensions.register(s)
    s
  }

  test("simhash64 / dot_product / sum_of_squares are SQL-callable") {
    val row = spark.sql(
      """SELECT
        |  simhash64(array('a', 'b')) AS sh,
        |  dot_product(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |              CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS dp,
        |  sum_of_squares(CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS sq
        |""".stripMargin).collect()(0)
    assert(row.getAs[Double]("dp") == 11.0)
    assert(row.getAs[Double]("sq") == 25.0)
    // same value the Column API produces
    val viaColumn = {
      import org.apache.spark.sql.functions._
      spark.range(1).select(
        graft.llm.SimHashDedup.simhash64(array(lit("a"), lit("b"))).as("sh"))
        .collect()(0).getAs[Long]("sh")
    }
    assert(row.getAs[Long]("sh") == viaColumn)
  }

  test("every registered SQL function resolves and evaluates") {
    // one SQL probe per catalog entry, so adding a function without a
    // working builder can't slip through
    val probes = Map(
      "simhash64" -> "simhash64(array('a'))",
      "dot_product" -> "dot_product(CAST(array(1.0) AS ARRAY<DOUBLE>), CAST(array(2.0) AS ARRAY<DOUBLE>))",
      "sum_of_squares" -> "sum_of_squares(CAST(array(2.0) AS ARRAY<DOUBLE>))",
      "word_shingles" -> "word_shingles('a b c', 2)",
      "jaccard_similarity" -> "jaccard_similarity(array('a'), array('a'))",
      "lang_id" -> "lang_id('the cat and the dog is here')",
      "repetition_stats" -> "repetition_stats(array('a', 'b', 'a', 'b')).top_bigram_frac",
      "minhash_signature" -> "minhash_signature(array('a', 'b'), 4)",
      "winnow_fingerprints" -> "winnow_fingerprints(array('a', 'b', 'c'), 2)",
      "media_meta" -> "media_meta(CAST('nonsense' AS BINARY)).format",
      "av_meta" -> "av_meta(CAST('nonsense' AS BINARY)).format",
      "warc_records" -> "size(warc_records(CAST('junk' AS BINARY)))",
      "tar_entries" -> "size(tar_entries(CAST('junk' AS BINARY)))",
      "gzip_bytes" -> "octet_length(gzip_bytes(encode('x', 'utf-8')))",
      "gunzip_all" ->
        "decode(gunzip_all(gzip_bytes(encode('x', 'utf-8'))), 'utf-8')",
      "zstd_bytes" -> "octet_length(zstd_bytes(encode('x', 'utf-8')))",
      "unzstd_all" ->
        "decode(unzstd_all(zstd_bytes(encode('x', 'utf-8'))), 'utf-8')",
      "http_parts" ->
        ("http_parts(encode('HTTP/1.1 200 OK' || chr(13) || chr(10) ||" +
          " chr(13) || chr(10) || 'body', 'utf-8')).status"),
      "decode_charset" ->
        "decode_charset(encode('x', 'utf-8'), 'text/plain').text",
      "html_unescape" -> "html_unescape('a &amp; b')")
    // generators can't alias to a single column — probed separately below
    val generators = Set("shingle_generate")
    val registered = GraftExtensions.functions.map(_._1.funcName).toSet
    assert(registered == probes.keySet ++ generators,
      s"probe map out of sync with the catalog: $registered vs ${probes.keySet ++ generators}")
    probes.foreach { case (name, expr) =>
      val r = spark.sql(s"SELECT $expr AS v").collect()(0)
      assert(r.get(0) != null, name)
    }
    val gen = spark.sql("SELECT shingle_generate('a b c', 2)").collect()
    assert(gen.length == 2 &&
      gen.map(_.getString(1)).toSeq == Seq("a b", "b c"))
  }

  test("wrong arity fails analysis with the function's own message") {
    val e = intercept[Exception] {
      spark.sql("SELECT dot_product(array(1.0))").collect()
    }
    assert(e.getMessage.contains("dot_product"))
  }

  test("typed models round-trip the registry outputs") {
    import spark.implicits._
    val dataA = Seq(
      graft.Models.DetectionRecord(1L, 10L, 100L, "apple", 1000L),
      graft.Models.DetectionRecord(1L, 10L, 101L, "pear", 1001L)).toDS().toDF()
    val dataB = Seq(graft.Models.LocationRecord(1L, "Loc1")).toDS().toDF()
    val typed = graft.Results.topItems(
      graft.operators.ReferenceAggregations.topItems(dataA, dataB,
        Map[String, Any]("topX" -> 5)))
    val rows = typed.collect().sortBy(_.item_rank)
    assert(rows.map(_.geographical_location).toSet == Set("Loc1"))
    assert(rows.map(_.item_rank).toSeq == Seq("1", "2"))
  }
}
