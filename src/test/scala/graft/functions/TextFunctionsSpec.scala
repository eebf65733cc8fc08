package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(Tuple1(text)).toDF("t").select(c.as("r")).collect()(0).getAs[T]("r")

  test("tokenCount: empty, blank, multi-space") {
    assert(one[Long](TextFunctions.tokenCount(col("t")), "") == 0L)
    assert(one[Long](TextFunctions.tokenCount(col("t")), "   ") == 0L)
    assert(one[Long](TextFunctions.tokenCount(col("t")), " a  b\tc ") == 3L)
  }

  test("normalized collapses whitespace and case") {
    assert(one[String](TextFunctions.normalized(col("t")), "  A  b\t C ") == "a b c")
  }

  test("fingerprint is normalization-invariant") {
    val df = Seq(("A  b", "a b")).toDF("x", "y")
    val r = df.select(
      (TextFunctions.fingerprint(col("x")) === TextFunctions.fingerprint(col("y"))).as("eq"))
      .collect()(0).getBoolean(0)
    assert(r)
  }

  test("literalCount counts non-overlapping occurrences") {
    assert(one[Long](TextFunctions.literalCount(col("t"), "ab"), "ababab") == 3L)
    assert(one[Long](TextFunctions.literalCount(col("t"), " the "), " the the ") == 1L)
  }

  test("langId picks marker-argmax with fixed tie order and und fallback") {
    assert(one[String](TextFunctions.langId(col("t")),
      "the cat and the dog is here") == "en")
    assert(one[String](TextFunctions.langId(col("t")),
      "der Hund und die Katze ist hier") == "de")
    assert(one[String](TextFunctions.langId(col("t")), "xyz qrs") == "und")
    assert(one[String](TextFunctions.langId(col("t")), "这是一个测试 的 文本") == "zh")
  }

  private def seqOf(c: org.apache.spark.sql.Column, text: String): Seq[String] =
    Seq(Tuple1(text)).toDF("t").select(c.as("r")).collect()(0).getSeq[String](0).toList

  test("wordShingles: n-grams, short-text degenerate case") {
    assert(seqOf(TextFunctions.wordShingles(col("t"), 3), "a b c d") ==
      Seq("a b c", "b c d"))
    assert(seqOf(TextFunctions.wordShingles(col("t"), 3), "a b") == Seq("a b"))
  }

  test("charShingles over normalized text") {
    assert(seqOf(TextFunctions.charShingles(col("t"), 2), "AB c") ==
      Seq("ab", "b ", " c"))
    assert(seqOf(TextFunctions.charShingles(col("t"), 5), "ab") == Seq("ab"))
  }

  test("bpeTokenCount: contractions, digit runs, punctuation runs") {
    // "it's 2024, really!" -> [it][,s][ 2024][,][ really][!] = 6
    assert(one[Long](TextFunctions.bpeTokenCount(col("t")), "it's 2024, really!") == 6L)
    assert(one[Long](TextFunctions.bpeTokenCount(col("t")), "") == 0L)
    assert(one[Long](TextFunctions.bpeTokenCount(col("t")), "plain words here") == 3L)
  }

  test("qualityColumns: zero-length and zero-token guards return null, not error") {
    val out = Seq(Tuple1("")).toDF("t")
      .select(TextFunctions.qualityColumns(col("t")): _*).collect()(0)
    assert(out.getAs[Long]("len_chars") == 0L)
    assert(out.isNullAt(out.fieldIndex("alpha_ratio")))
    assert(out.isNullAt(out.fieldIndex("mean_token_len")))
  }
}
