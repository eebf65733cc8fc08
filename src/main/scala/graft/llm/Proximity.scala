package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Positional proximity scoring — the positional-index stage stacked on
  * bag-of-words retrieval (the [[Bm25]] scorer can't tell "new york"
  * from "york … 40 words … new"). For each (query, candidate-doc) pair
  * and each ADJACENT pair of the query's distinct terms, computes the
  * minimum token distance between the two terms' occurrences in the
  * doc.
  *
  * The min distance is computed by a MERGE SCAN, not a positional
  * product: both terms' occurrence lists interleave in one
  * position-ordered window per (query, doc, pair), and the minimum
  * |p1 - p2| over ALL cross pairs is always attained at two positions
  * ADJACENT in that merged order with different terms — so one
  * `lag()` pass finds it. Work per candidate doc is
  * O(occ(t1) + occ(t2)) (sort + scan), where the naive two-sided join
  * is occ(t1) × occ(t2): a long doc stuffed with both terms (the
  * pathological case ProximitySpec pins at 1,000 repeats each) costs
  * 2,000 window rows here instead of 1,000,000 join rows.
  *
  * Scale shape: candidates are k·|queries| docs by construction (that
  * cut is what makes per-candidate positional scoring affordable at
  * any corpus size); postings are generated for candidate docs only
  * (`left_semi` before `posexplode`), and the cand×pairs side of the
  * term join is k·|queries|·pairs·2 rows — broadcast-sized.
  */
object Proximity {

  /** Adjacent pairs `(qid, pr, t1, t2)` of each query's DISTINCT terms
    * in first-occurrence order (`pr` 1-based): "big apple big pie" →
    * (1, big, apple), (2, apple, pie). Queries with fewer than two
    * distinct terms produce no rows.
    */
  def adjacentPairs(
      queries: DataFrame,
      qidCol: String,
      qtextCol: String): DataFrame =
    queries
      .select(col(qidCol).as("qid"),
        array_distinct(split(col(qtextCol), " ")).as("qt"))
      .filter(size(col("qt")) >= 2)
      .select(col("qid"), col("qt"),
        explode(sequence(lit(1), size(col("qt")) - 1)).as("pr"))
      .select(col("qid"), col("pr"),
        element_at(col("qt"), col("pr")).as("t1"),
        element_at(col("qt"), col("pr") + 1).as("t2"))

  /** Per (qid, did, pr): the minimum token distance in doc `did`
    * between occurrences of the pair's two terms, or `sentinel` when
    * either term is absent from the doc. `cand` carries (qid, did);
    * `pairs` is [[adjacentPairs]] output (or any (qid, pr, t1, t2)
    * with t1 != t2 per row). Result has one row per cand×pairs row
    * (inner on qid — candidates of a pairless query drop, matching
    * the rerank contract that such queries can't be proximity-scored).
    */
  def minDistances(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      cand: DataFrame,
      pairs: DataFrame,
      sentinel: Long = 1000000L): DataFrame = {
    val pos = corpus
      .select(col(idCol).as("did"),
        posexplode(split(col(textCol), " ")).as(Seq("p", "t")))
      .join(cand.select("did").distinct(), Seq("did"), "left_semi")
    // unpivot each pair into its two (side, term) probes so the
    // postings attach with one equi-join on (did, t)
    val terms = pairs.select(col("qid"), col("pr"), explode(array(
        struct(lit(1).as("side"), col("t1").as("t")),
        struct(lit(2).as("side"), col("t2").as("t")))).as("x"))
      .select(col("qid"), col("pr"), col("x.side").as("side"),
        col("x.t").as("t"))
    val occ = cand.select("qid", "did").join(terms, "qid")
      .join(pos, Seq("did", "t"))
      .select("qid", "did", "pr", "side", "p")
    // the merge scan: positions of both terms interleaved in order;
    // every adjacent different-side step is a candidate distance and
    // the true minimum is among them
    val w = Window.partitionBy("qid", "did", "pr").orderBy("p")
    val found = occ
      .withColumn("pside", lag("side", 1).over(w))
      .withColumn("pp", lag("p", 1).over(w))
      .filter(col("pside").isNotNull && col("pside") =!= col("side"))
      .groupBy("qid", "did", "pr")
      .agg(min(col("p") - col("pp")).cast("long").as("min_dist"))
    cand.select("qid", "did").join(pairs.select("qid", "pr"), "qid")
      .join(found, Seq("qid", "did", "pr"), "left")
      .withColumn("min_dist", coalesce(col("min_dist"), lit(sentinel)))
  }
}
