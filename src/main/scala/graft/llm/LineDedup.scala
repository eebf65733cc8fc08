package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate line removal (the CCNet/C4 pass that strips
  * headers, nav bars and footers BEFORE document-level dedup): a line that
  * appears in more than `maxDf` documents across the corpus is boilerplate
  * and is dropped from every document; surviving lines are reassembled in
  * their original order.
  *
  * Reference scope: the reference engine has no line-level pass at all
  * (its dedup is whole-record, `ParquetCombinerRDD.scala` dedup stage);
  * this operator is part of the training-data tier this engine adds on
  * top of parity.
  *
  * Scale posture (100 TB): one explode + one line-keyed count shuffle
  * (map-side partial agg does the heavy lifting — boilerplate lines are
  * exactly the ones that combine well), then the boilerplate SET — small
  * by construction, it is the lines repeated across > maxDf docs — comes
  * back as a broadcast anti-join at line granularity, and reassembly is
  * one groupBy(doc) with an in-group sort. No self-join of the corpus
  * against itself, no global sort.
  *
  * Determinism: df counting and set membership are exact; reassembly
  * sorts by the original line position, so output is partition-invariant.
  */
object LineDedup {

  /** Per-distinct-line document frequency over `docs`; `linesCol` is an
    * array<string> column of the document's lines. A line repeated within
    * ONE document counts once (df is a document frequency, not a term
    * frequency) — re-delivered duplicate lines inside a doc must not push
    * a legitimate line over the cutoff.
    */
  def lineDf(docs: DataFrame, idCol: String, linesCol: Column): DataFrame =
    docs
      .select(col(idCol).as("_ld_id"), explode(array_distinct(linesCol)).as("line"))
      .groupBy("line")
      .agg(count(lit(1)).as("df"))

  /** Strip corpus-boilerplate lines (df > maxDf) from every document.
    *
    * Returns one row per input document:
    * (idCol, n_lines: long, n_kept: long, clean_text: string) —
    * `clean_text` is the surviving lines joined with '\n' in original
    * order ("" when every line was boilerplate; the document row itself
    * is never dropped, so downstream accounting still sees it).
    */
  def clean(
      docs: DataFrame,
      idCol: String,
      linesCol: Column,
      maxDf: Long = 5L): DataFrame = {
    val withLines = docs.select(col(idCol), linesCol.as("_lines"))
    val boiler = lineDf(docs, idCol, linesCol)
      .filter(col("df") > maxDf)
      .select("line")

    val ex = withLines.select(
      col(idCol),
      posexplode(col("_lines")).as(Seq("pos", "line")))

    // The boilerplate side is small by construction: a line lands there
    // only by appearing in > maxDf distinct documents, so |boiler| <=
    // total_lines / maxDf distinct strings, and in real corpora the
    // high-df mass is a handful of templates. Broadcast anti-join keeps
    // the corpus-side pass shuffle-free here (the only shuffle is the df
    // count above and the final per-doc regroup).
    val kept = ex.join(broadcast(boiler), Seq("line"), "left_anti")

    kept
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")),
          "\n").as("clean_text"))
      // Docs whose every line was boilerplate vanish from `kept`; restore
      // them with an empty clean_text so the operator is total.
      .join(withLines.select(col(idCol), size(col("_lines")).cast("long").as("_nl")),
        Seq(idCol), "right_outer")
      .select(
        col(idCol),
        col("_nl").as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
