package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TextPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog while the cat naps and " +
      "the sun shines over the quiet green valley beyond the old stone bridge"

  test("qualityFilter: each rule rejects its own failure mode, good text passes") {
    val docs = Seq(
      (1L, good),                                        // passes every cut
      (2L, "short text only"),                           // too few tokens
      (3L, Array.fill(30)("spam").mkString(" ")),        // diversity + repetition
      (4L, good.replaceAll("[aeiou]", "1")),             // alpha ratio
      (5L, ""),                                          // empty: null signals
      (6L, Array.fill(30)("xq zv").mkString(" "))        // no lang markers -> und
    ).toDF("doc_id", "text")
    val kept = TextPipeline.qualityFilter(docs, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("withQualitySignals annotates without dropping rows") {
    val docs = Seq((1L, good), (2L, "")).toDF("doc_id", "text")
    val out = TextPipeline.withQualitySignals(docs, "text")
    assert(out.count() == 2)
    assert(out.columns.toSet.contains("n_tokens") &&
      out.columns.toSet.contains("lang_id") &&
      out.columns.toSet.contains("top_bigram_frac"))
    // empty doc: null ratios, zero tokens — annotated, not errored
    val empty = out.filter(col("doc_id") === 2L)
      .select("n_tokens", "alpha_ratio").collect()(0)
    assert(empty.getLong(0) == 0L && empty.isNullAt(1))
  }
}
