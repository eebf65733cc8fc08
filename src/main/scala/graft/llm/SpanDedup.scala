package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact duplicated-SPAN dedup — the substring-level member of the dedup
  * family (document-level = [[graft.operators.Dedup]], line-level =
  * [[LineDedup]], approximate span = winnowing/[[WinnowIndex]]): find
  * every maximal run of tokens whose normalized form appears verbatim at
  * least twice anywhere in the corpus, and cut the runs of at least
  * `minSpanTokens` tokens out of every document carrying them.
  *
  * Published shape: ExactSubstr dedup (Lee et al., ACL 2022,
  * "Deduplicating Training Data Makes Language Models Better"), there
  * built on a monolithic suffix array. A suffix array is the wrong
  * structure for a distributed engine; the declarative equivalent rests
  * on the k-gram identity: a duplicated token span of length s ≥ k
  * duplicates all s−k+1 of its constituent k-grams, so maximal
  * duplicated spans are exactly maximal runs of CONSECUTIVE gram
  * positions whose k-gram occurs ≥ 2 times corpus-wide, extended by the
  * k−1 trailing tokens of the last gram (clipped to the document end).
  * Spans shorter than k are invisible — k is the detection floor, and
  * `minSpanTokens ≥ k` makes the floor explicit in the contract.
  *
  * Like the published tool, EVERY occurrence of a qualifying span is cut
  * — no survivor election (two docs sharing a passage both lose it).
  * Run document-level [[graft.operators.Dedup]] first when a canonical
  * copy must survive; intra-document repeats count toward the ≥ 2
  * occurrence threshold by design (self-plagiarized boilerplate is still
  * boilerplate).
  *
  * Scale: the occurrence count is a map-side-combinable groupBy on a
  * 128-bit gram fingerprint; only positions whose fingerprint survives
  * the ≥ 2 filter re-join (postings-join shape, same as
  * [[Containment]]); run-merge is a per-document window and the cut is a
  * per-row array lambda against that document's own (small) span list.
  * No step holds driver state, and nothing is quadratic in document
  * length — a hot gram shared by many documents costs its posting list,
  * which the ≥ 2 filter cannot bound; corpora with template boilerplate
  * should pre-strip it with [[LineDedup]] (df-capped) first.
  */
object SpanDedup {

  /** Positional gram fingerprints: `(id, pos, f)` with `f` = md5 of the
    * normalized k-gram starting at 0-based token position `pos` (texts
    * shorter than k tokens yield one whole-text gram at pos 0).
    */
  private[llm] def gramPositions(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "gram width must be at least 2")
    docs
      .select(col(idCol),
        TextFunctions.shingleGenerate(col(textCol), k).as(Seq("pos", "shingle")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        md5(col("shingle")).as("f"))
  }

  /** Merge duplicated gram positions `(id, pos)` into maximal runs. */
  private[llm] def mergeRuns(dp: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy("pos")
    dp.withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("grp"))
      .agg(min("pos").as("span_start"), count(lit(1)).as("n_grams"))
      .drop("grp")
  }

  /** Runs from an EXTERNAL duplicated-fingerprint set `dupF` (the
    * index-backed path — see [[SpanDedupIndex]]).
    */
  private[llm] def runsFrom(
      g: DataFrame, dupF: DataFrame, idCol: String): DataFrame =
    mergeRuns(g.join(dupF, "f").select(col(idCol), col("pos")), idCol)

  /** Maximal runs of duplicated k-gram positions per document:
    * `(id, span_start, n_grams)` with `span_start` the 0-based token
    * position of the run's first gram and `n_grams` the run length in
    * gram positions. Token extent = `n_grams + k − 1`, clipped to the
    * document end (see [[spans]]).
    *
    * The occurrence count rides a `count over (partition by f)` window
    * rather than a groupBy + self-join: one corpus scan (the shingle
    * kernel runs once) and one shuffle by fingerprint, where the
    * aggregate-then-rejoin form scans and shingles the corpus twice for
    * the same shuffle volume.
    */
  def duplicatedRuns(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8): DataFrame = {
    val g = gramPositions(docs, idCol, textCol, k)
    val dp = g
      .withColumn("n_occ", count(lit(1)).over(Window.partitionBy("f")))
      .filter(col("n_occ") >= 2)
      .select(col(idCol), col("pos"))
    mergeRuns(dp, idCol)
  }

  /** Qualifying spans in token units: `(id, span_start, span_tokens)`
    * for every duplicated run whose clipped token extent reaches
    * `minSpanTokens`.
    */
  def spans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minSpanTokens: Int = 20): DataFrame =
    spansFromRuns(duplicatedRuns(docs, idCol, textCol, k),
      docs, idCol, textCol, k, minSpanTokens)

  /** Token-unit qualifying spans from an externally produced run table
    * (one-shot or index-backed — see [[SpanDedupIndex]]).
    */
  private[llm] def spansFromRuns(
      runs: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minSpanTokens: Int): DataFrame = {
    require(minSpanTokens >= k,
      s"minSpanTokens ($minSpanTokens) below the k-gram detection floor ($k)")
    val nt = docs.select(col(idCol),
      TextFunctions.tokenCount(TextFunctions.normalized(col(textCol)))
        .as("ntok"))
    runs
      .join(nt, idCol)
      .withColumn("span_tokens",
        least(col("span_start") + col("n_grams") + lit((k - 1).toLong),
          col("ntok")) - col("span_start"))
      .filter(col("span_tokens") >= minSpanTokens)
      .select(col(idCol), col("span_start"), col("span_tokens"))
  }

  /** Cut every qualifying span out of every document. One row per input
    * document: `(id, ntok, n_spans, dup_tokens, kept_text)` where
    * `kept_text` is the surviving tokens rejoined with single spaces
    * (empty string when the whole document was duplicated; null when
    * the text column was null).
    */
  def cleanse(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minSpanTokens: Int = 20): DataFrame =
    cleanseFromSpans(spans(docs, idCol, textCol, k, minSpanTokens),
      docs, idCol, textCol)

  /** Span-surgical decontamination: cut from `docs` every span of at
    * least `minSpanTokens` tokens that appears VERBATIM in `reference`
    * (a held-out benchmark/eval set) — the span-level complement of
    * [[Decontaminate]]'s document-level flagging: drop only the leaked
    * passage, keep the document. Same machinery as [[cleanse]] with the
    * duplicated-fingerprint set swapped for the reference's distinct
    * gram fingerprints; like there, matching is exact string identity
    * on normalized k-grams (hashing is 128-bit md5 — a collision either
    * discards good data or leaks eval answers, so no narrower key).
    * Output schema matches [[cleanse]]; rows cover `docs` only.
    */
  def cleanseAgainst(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      reference: DataFrame,
      refIdCol: String,
      refTextCol: String,
      k: Int = 8,
      minSpanTokens: Int = 20): DataFrame = {
    val refF = gramPositions(reference, refIdCol, refTextCol, k)
      .select("f").distinct()
    val g = gramPositions(docs, idCol, textCol, k)
    cleanseFromSpans(
      spansFromRuns(runsFrom(g, refF, idCol),
        docs, idCol, textCol, k, minSpanTokens),
      docs, idCol, textCol)
  }

  /** The span cut itself, from an externally produced span table. */
  private[llm] def cleanseFromSpans(
      spansDf: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val sp = spansDf
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"),
        collect_list(struct(col("span_start"), col("span_tokens"))).as("sp"))
    docs
      .select(col(idCol),
        TextFunctions.tokens(TextFunctions.normalized(col(textCol))).as("w"))
      .join(sp, Seq(idCol), "left")
      .withColumn("sp", coalesce(col("sp"),
        array().cast("array<struct<span_start:bigint,span_tokens:bigint>>")))
      .withColumn("kept", expr(
        "filter(w, (x, i) -> NOT exists(sp, " +
          "s -> i >= s.span_start AND i < s.span_start + s.span_tokens))"))
      .select(col(idCol),
        size(col("w")).cast("long").as("ntok"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        (size(col("w")) - size(col("kept"))).cast("long").as("dup_tokens"),
        array_join(col("kept"), " ").as("kept_text"))
  }
}
