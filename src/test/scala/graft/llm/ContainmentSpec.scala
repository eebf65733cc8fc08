package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b", "cont_x100").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("a snippet is contained in its source, not vice versa") {
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val snip = (5 to 14).map(i => s"w$i").mkString(" ")   // 10 words inside
    val docs = Seq((1L, long), (2L, snip), (3L, "x y z q r s t u v"))
      .toDF("doc_id", "text")
    val got = pairs(Containment.containedPairs(docs, "doc_id", "text"))
    // snippet: 8 distinct shingles, all inside doc 1 -> containment 100
    assert(got.contains((2L, 1L, 100L)))
    // the reverse (28 shingles, 8 shared) is 8*100 div 28 = 28 < 80
    assert(!got.exists { case (a, b, _) => a == 1L && b == 2L })
    assert(!got.exists { case (a, b, _) => a == 3L || b == 3L })
  }

  test("exact duplicates contain each other both ways") {
    val t = "alpha beta gamma delta epsilon zeta"
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val got = pairs(Containment.containedPairs(docs, "doc_id", "text"))
    assert(got == Set((1L, 2L, 100L), (2L, 1L, 100L)))
  }

  test("matches brute force on a random-ish corpus (prefix is lossless)") {
    val rows = (0L until 60L).map { i =>
      val words = (0 to 10 + (i % 7).toInt)
        .map(j => s"w${(i * 13 + j * 7) % 31}")
      (i, words.mkString(" "))
    }
    val docs = rows.toDF("doc_id", "text")
    val fast = pairs(Containment.containedPairs(docs, "doc_id", "text",
      thresholdPct = 70))
    // brute force: all ordered pairs, exact containment
    val sets = docs.select(col("doc_id"),
      array_distinct(graft.functions.TextFunctions
        .wordShingles(col("text"), 3)).as("sh"))
    val brute = sets.as("a").crossJoin(sets.as("b"))
      .filter(col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))) * 100 /
          size(col("a.sh"))).cast("long").as("cont_x100"))
      .filter(col("cont_x100") >= 70)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast.map { case (a, b, _) => (a, b) } == brute)
  }

  test("hot-shingle cap bounds candidate width and reports what it dropped") {
    // 1000 docs all share one boilerplate trigram ("click here now"); each
    // also has a unique tail so no real containment exists between them.
    // Two extra docs are true duplicates that share only RARE shingles.
    val boiler = (0L until 1000L).map(i =>
      (i, s"click here now u${i}a u${i}b u${i}c u${i}d u${i}e"))
    val dup = Seq((5001L, "rare one two three four five"),
      (5002L, "rare one two three four five"))
    val docs = (boiler ++ dup).toDF("doc_id", "text")
    // cap = 10: the 1000-doc boilerplate shingle is dropped from the index
    val got = pairs(Containment.containedPairs(docs, "doc_id", "text",
      maxDocFreq = 10L))
    // true duplicates (rare shingles) still found both ways
    assert(got.contains((5001L, 5002L, 100L)))
    assert(got.contains((5002L, 5001L, 100L)))
    // no boilerplate-only pair survives: each boiler doc has 6 distinct
    // shingles, only 1 shared -> containment 16 < 80 even uncapped, and
    // with the cap no candidate forms at all
    assert(!got.exists { case (a, b, _) => a < 1000L && b < 1000L })
    // the divergence report names exactly the one over-cap key
    val report = Containment.hotShingles(docs, "doc_id", "text",
      maxDocFreq = 10L).collect()
    assert(report.length == 1)
    assert(report.head.getAs[Long]("occupancy") == 1000L)
    // and with the default cap (100k) the report is empty on this corpus
    assert(Containment.hotShingles(docs, "doc_id", "text").isEmpty)
  }

  test("capped run drops pairs that share ONLY the hot shingle (observable trade)") {
    // doc 1 is contained in doc 2 via a single shared shingle that is
    // also present in 20 other docs; cap = 5 drops that shingle, so the
    // pair is lost — and the report makes the loss observable.
    val shared = "alpha beta gamma"
    val others = (100L until 120L).map(i =>
      (i, s"$shared filler${i}x filler${i}y filler${i}z"))
    val docs = (Seq((1L, shared), (2L, s"$shared tail1 tail2 tail3"))
      ++ others).toDF("doc_id", "text")
    val uncapped = pairs(Containment.containedPairs(docs, "doc_id", "text",
      maxDocFreq = 1000000L))
    assert(uncapped.contains((1L, 2L, 100L)))
    val capped = pairs(Containment.containedPairs(docs, "doc_id", "text",
      maxDocFreq = 5L))
    assert(!capped.exists { case (a, b, _) => a == 1L && b == 2L })
    assert(Containment.hotShingles(docs, "doc_id", "text", maxDocFreq = 5L)
      .count() == 1L)
  }

  test("integer prefix bound equals exact rational ceil at every size and threshold") {
    // keep = sz - ceil(t*sz) + 1 with ceil computed as (sz*T + 99) div 100
    for (sz <- 1 to 200; t <- Seq(1, 33, 50, 66, 80, 99, 100)) {
      val exact = math.ceil(sz.toDouble * t / 100.0).toLong
      val integer = (sz.toLong * t + 99) / 100
      assert(integer == exact, s"sz=$sz t=$t: $integer != $exact")
    }
  }

  test("short documents (under n words) degrade to whole-text shingles") {
    val docs = Seq((1L, "ab"), (2L, "ab"), (3L, "cd")).toDF("doc_id", "text")
    val got = pairs(Containment.containedPairs(docs, "doc_id", "text"))
    assert(got == Set((1L, 2L, 100L), (2L, 1L, 100L)))
  }
}
