package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus bigram language model — the exact-integer core of two
  * training-data passes:
  *
  *  - **Surprisal scoring** (the cheap, fully deterministic cousin of
  *    KenLM-perplexity filtering à la CCNet): score every document by the
  *    bits needed to predict each token from its predecessor under the
  *    corpus's own bigram distribution. Gibberish scores high, boilerplate
  *    scores low. Per-bigram surprisal is the integer
  *    `floor(log2(c(x) / c(x,y)))`, computed WITHOUT log():
  *    `length(bin(c_x div c_xy)) - 1`. This is exact —
  *    for q = floor(a/b) >= 1 the real ratio a/b lies in [q, q+1), an
  *    interval that never crosses a power of two, so
  *    floor(log2(a/b)) == bitlength(q) - 1.
  *  - **PMI collocations**: rank adjacent pairs by pointwise mutual
  *    information. PMI = log(c_xy·N / (r_x·c_y)) is monotone in the ratio,
  *    so ranking needs no log at all: the scaled integer
  *    `c_xy·N·1e6 div (r_x·c_y)` orders identically and replays exactly
  *    in any engine with 64-bit integers (overflow-safe while
  *    c_xy·N·1e6 < 2^63, i.e. corpora up to ~1.5e6 bigrams at worst-case
  *    skew; the 100 TB path swaps the multiply chain to DECIMAL(38,0)).
  *
  * Both passes train on the corpus being scored, so every observed bigram
  * has c(x,y) >= 1 and no smoothing is needed; held-out scoring would
  * add-one-smooth the join's misses.
  *
  * Scale posture: one per-doc window (lead) to form bigrams, two
  * count shuffles (map-side combine collapses the Zipf head), then a
  * fact-to-counts join keyed on the bigram — no corpus self-join. The
  * count tables are vocabulary-sized, usually broadcastable; Spark's CBO/
  * AQE picks that up from size, we don't force it (vocab CAN be huge at
  * 100 TB).
  */
object BigramLm {

  /** Adjacent-token pairs of each document: (idCol, pos, x, y). */
  def bigrams(docs: DataFrame, idCol: String, textCol: Column): DataFrame = {
    val tok = docs.select(
      col(idCol),
      posexplode(split(textCol, " ")).as(Seq("pos", "x")))
    tok
      .withColumn("y", lead("x", 1).over(
        Window.partitionBy(idCol).orderBy("pos")))
      .filter(col("y").isNotNull)
  }

  /** Per-document total surprisal under the corpus bigram LM:
    * (idCol, n_bigrams, total_bits, bits_x100) where bits_x100 is the
    * floor-scaled mean bits-per-bigram. Total over `docs` — documents
    * with fewer than two tokens appear with zeros.
    */
  def surprisal(docs: DataFrame, idCol: String, textCol: Column): DataFrame = {
    val b = bigrams(docs, idCol, textCol)
    val cxy = b.groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
    val cx = b.groupBy("x").agg(count(lit(1)).as("c_x"))
    val scored = b
      .join(cxy, Seq("x", "y"))
      .join(cx, Seq("x"))
      .select(col(idCol),
        (length(bin(expr("c_x div c_xy"))) - 1).cast("long").as("bits"))
    val agg = scored
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum("bits").as("total_bits"))
      .withColumn("bits_x100", expr("total_bits * 100 div n_bigrams"))
    docs.select(col(idCol)).distinct()
      .join(agg, Seq(idCol), "left_outer")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("total_bits"), lit(0L)).as("total_bits"),
        coalesce(col("bits_x100"), lit(0L)).as("bits_x100"))
  }

  /** Top-`k` collocations by PMI among bigrams with c_xy >= minCount:
    * (x, y, c_xy, r_x, c_y, pmi_x1e6) — r_x/c_y are the first/second
    * position marginals, pmi_x1e6 the scaled integer ratio (see object
    * doc). Total order: (pmi_x1e6 desc, x, y).
    */
  def pmiTopK(
      docs: DataFrame,
      idCol: String,
      textCol: Column,
      minCount: Long = 5L,
      k: Int = 20): DataFrame = {
    val b = bigrams(docs, idCol, textCol)
    val n = b.agg(count(lit(1)).as("n_big"))
    val cxy = b.groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
    val rx = b.groupBy("x").agg(count(lit(1)).as("r_x"))
    val cy = b.groupBy("y").agg(count(lit(1)).as("c_y"))
    cxy
      .filter(col("c_xy") >= minCount)
      .join(rx, Seq("x"))
      .join(cy, Seq("y"))
      .crossJoin(broadcast(n))
      // the c_xy·n_big·1e6 chain runs in DECIMAL(38,0): in long math it
      // wraps (non-ANSI) or errors (ANSI) past ~3e6 bigrams at worst-case
      // skew; decimal keeps it exact to 1e38 and `div` lands back in long
      .withColumn("pmi_x1e6",
        expr("CAST(c_xy AS DECIMAL(38,0)) * n_big * 1000000" +
          " div (CAST(r_x AS DECIMAL(38,0)) * c_y)"))
      .select("x", "y", "c_xy", "r_x", "c_y", "pmi_x1e6")
      .orderBy(col("pmi_x1e6").desc, col("x"), col("y"))
      .limit(k)
  }
}
