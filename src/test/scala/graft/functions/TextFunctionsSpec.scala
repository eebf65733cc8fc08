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

  test("native wordShingles equals the composed-builtin reference formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
      .unionByName(Seq("", "   ", "one", "one two", "a\tb\nc  d", " A  b\t C ",
        "这是 一个 测试 的 文本 here").map(Tuple1(_)).toDF("text"))
    for (n <- Seq(1, 3, 5)) {
      val diff = docs.select(
          TextFunctions.wordShingles(col("text"), n).as("native"),
          TextFunctions.wordShinglesComposed(col("text"), n).as("composed"))
        .filter(not(col("native") <=> col("composed")))
      assert(diff.count() == 0, s"n=$n")
    }
  }

  test("shingleGenerate generator equals posexplode(wordShingles)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((9001L, ""), (9002L, "one two"),
        (9003L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    for (n <- Seq(2, 5)) {
      val gen = docs.select(col("doc_id"),
        TextFunctions.shingleGenerate(col("text"), n).as(Seq("pos", "shingle")))
      val ref = docs.select(col("doc_id"),
        posexplode(TextFunctions.wordShingles(col("text"), n)).as(Seq("pos", "shingle")))
      assert(gen.exceptAll(ref).isEmpty && ref.exceptAll(gen).isEmpty, s"n=$n")
      // null text emits no rows (generator contract)
      assert(gen.filter(col("doc_id") === 9003L).count() == 0)
    }
  }

  test("native repetitionStats equals the composed-builtin reference formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
      .unionByName(Seq("", "   ", "one", "one one", "one two one two",
        "a a a a", "x y x y x", "这是 一个 的 的 的").map(Tuple1(_)).toDF("text"))
    val w = TextFunctions.tokens(TextFunctions.normalized(col("text")))
    val diff = docs
      .select(w.as("__w"))
      .select(col("__w"), TextFunctions.wordBigrams(col("__w")).as("__bg"),
        TextFunctions.repetitionStats(col("__w")).as("rep"))
      .select(
        col("rep.distinct_word_ratio").as("n_dwr"),
        col("rep.top_bigram_frac").as("n_tbf"),
        TextFunctions.distinctWordRatioComposed(col("__w")).as("c_dwr"),
        TextFunctions.topBigramFracComposed(col("__bg")).as("c_tbf"))
      .filter(not(col("n_dwr") <=> col("c_dwr")) || not(col("n_tbf") <=> col("c_tbf")))
    assert(diff.count() == 0)
  }

  test("repetitionStats known values") {
    val w = TextFunctions.tokens(TextFunctions.normalized(col("t")))
    val rep = TextFunctions.repetitionStats(w)
    // "a b a b a": 2 distinct / 5 words; bigrams [ab, ba, ab, ba] -> 2/4
    assert(one[Double](rep.getField("distinct_word_ratio"), "a b a b a") == 0.4)
    assert(one[Double](rep.getField("top_bigram_frac"), "a b a b a") == 0.5)
    // single word: no bigrams -> null
    assert(one[java.lang.Double](rep.getField("top_bigram_frac"), "solo") == null)
  }

  test("native JaccardSimilarity equals intersect/union on shingle sets") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sets = docs.limit(40).select(col("doc_id"),
      TextFunctions.wordShingles(col("text"), 3).as("sh"))
    val pairs = sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
    def native(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.plans.JaccardSimilarity(
          org.apache.spark.sql.graft.ColumnBridge.expression(a),
          org.apache.spark.sql.graft.ColumnBridge.expression(b)))
    val diff = pairs.select(
        native(col("a.sh"), col("b.sh")).as("nat"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("comp"))
      .filter(not(col("nat") <=> col("comp")))
    assert(diff.count() == 0)
  }

  test("native langId equals the composed-builtin reference formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((-1L, null: String), (-2L, ""), (-3L, " the und der "),
        (-4L, "el la the que los"), (-5L, "的是 le les 了")).toDF("doc_id", "text"))
    val diff = docs.select(
        TextFunctions.langId(col("text")).as("native"),
        TextFunctions.langIdComposed(col("text")).as("composed"))
      .filter(not(col("native") <=> col("composed")))
    assert(diff.count() == 0)
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

  test("polyHash is the pinned base-131 fold (portable constant)") {
    // ((0*131+97)*131+98)*131+99 mod 1e9+7 — 'abc'
    val out = Seq(("abc"), ("")).toDF("s")
      .select(TextFunctions.polyHash(col("s"))).as[Long].collect()
    assert(out.toSeq == Seq(1677554L, 0L))
  }

  test("winnowing guarantee: a shared 6-word run yields a shared fingerprint") {
    // window 4 over 3-word shingles: a common run of 4+3-1 = 6 words
    // gives 4 consecutive identical shingle hashes — a full window —
    // so both docs must keep the same min-hash fingerprint
    val common = "alpha beta gamma delta epsilon zeta"
    val fps = Seq(
        (1L, s"one two $common three"),
        (2L, s"nine eight seven $common six five"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextFunctions.winnowedFingerprints(col("text")).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
    // and fingerprints are a strict subset of the shingle hash count
    assert(fps(1L).size < 8)
  }

  test("native winnow kernel equals the composed-builtin formulation") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three"), (3L, "short"), (4L, ""),
      (5L, "repeat repeat repeat repeat repeat repeat repeat"))
      .toDF("doc_id", "text")
    val both = docs.select(
        TextFunctions.winnowedFingerprints(col("text")).as("native"),
        TextFunctions.winnowedFingerprintsComposed(col("text")).as("composed"))
      .as[(Seq[Long], Seq[Long])].collect()
    both.foreach { case (n, c) => assert(n == c) }
  }
}
