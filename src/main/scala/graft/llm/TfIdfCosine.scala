package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.BucketCaps

/** Sparse TF-IDF cosine similarity join — the weighted-term relatedness
  * axis between set Jaccard (which ignores term importance) and dense
  * embedding cosine (which needs a model): w(d,t) = tf(d,t) · idf_bits(t)
  * with the same exact-integer floor-log2 idf as [[Bm25]], similarity is
  * cosine over the sparse weight vectors.
  *
  * No square root is ever taken: with non-negative weights, dot >= 0 and
  * cos >= t ⟺ dot² >= t²·|A|²·|B|², so the threshold test and the
  * reported score run SQUARED in DECIMAL(38,0) —
  * `cos2_x1e6 = dot²·1e6 div (na2·nb2)` replays bit-for-bit relationally.
  *
  * The inverted-index join IS the computation (sparse matrix product):
  * postings of the same term pair up, partial products sum per (a, b).
  * No candidates-then-rescore pass exists because the join already
  * produces exact dots. Cost is Σ_t df(t)² — quadratic in a hot term's
  * document frequency — so the `maxDocFreq` stop-term cap (default 100k,
  * the repo-wide bucket bound) is the scale valve; dropped terms carry
  * the least idf weight by construction, and the cap is part of the
  * operator's definition (the oracle replays it), not a silent
  * approximation. [[hotTerms]] is the divergence report — non-empty
  * means dots on this corpus exclude exactly those terms' partial
  * products (same observability contract as [[Containment.hotShingles]]).
  */
object TfIdfCosine {

  /** Ordered pairs (id_a < id_b, dot, cos2_x1e6) with squared cosine at
    * least (thresholdPct/100)².
    */
  def similarPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      thresholdPct: Int = 60,
      maxDocFreq: Long = 100000L): DataFrame = {
    require(thresholdPct > 0 && thresholdPct <= 100)
    require(maxDocFreq > 0)
    val tok = docs.select(col(idCol).as("did"),
      explode(split(col(textCol), " ")).as("t"))
    val tf = tok.groupBy("did", "t").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("t").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
    val nd = tf.agg(countDistinct("did").as("n_docs"))
    val w = tf.join(dfT, "t")
      .crossJoin(broadcast(nd))
      .withColumn("w", expr("tf * (length(bin((n_docs * 64) div df)) - 1)"))
      .select("did", "t", "w")
    val nrm = w.groupBy("did").agg(sum(expr("w * w")).as("n2"))
    val dot = w.as("a")
      .join(w.as("b"),
        col("a.t") === col("b.t") && col("a.did") < col("b.did"))
      .select(col("a.did").as("id_a"), col("b.did").as("id_b"),
        (col("a.w") * col("b.w")).as("p"))
      .groupBy("id_a", "id_b")
      .agg(sum("p").as("dot"))
    dot
      .join(nrm.select(col("did").as("id_a"), col("n2").as("na2")), "id_a")
      .join(nrm.select(col("did").as("id_b"), col("n2").as("nb2")), "id_b")
      .withColumn("cos2_x1e6",
        expr("CAST(dot AS DECIMAL(38,0)) * dot * 1000000" +
          " div (CAST(na2 AS DECIMAL(38,0)) * nb2)"))
      .filter(col("cos2_x1e6") >=
        lit(thresholdPct.toLong * thresholdPct * 100))
      .select("id_a", "id_b", "dot", "cos2_x1e6")
  }

  /** Divergence report for the `maxDocFreq` stop-term cap: every term
    * whose document frequency exceeds the cap, with its occupancy (= df)
    * — exactly the terms [[similarPairs]] drops from the inverted index
    * before the Σ df² join. Empty ⇒ the capped run is identical to an
    * uncapped one on this corpus; non-empty ⇒ every reported dot product
    * excludes those terms' partial products (and pairs similar ONLY
    * through them are absent). Same shape as [[Containment.hotShingles]]
    * via `BucketCaps.overflowBuckets`, and the same df computation as
    * [[similarPairs]] (per-doc distinct terms, two-phase groupBy).
    */
  def hotTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDocFreq: Long = 100000L): DataFrame = {
    val perDoc = docs
      .select(col(idCol).as("did"),
        explode(split(col(textCol), " ")).as("t"))
      .distinct()
    BucketCaps.overflowBuckets(perDoc.select("t"), Seq(col("t")), maxDocFreq)
  }
}
