package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.operators.Stats

/** Sampling, quantization & governance tier: deterministic weighted
  * sampling, time-bucket OHLC downsampling, int8 embedding quantization,
  * a k-anonymity audit with a generalization ladder, and vocabulary /
  * OOV-rate profiling. These are the corpus-curation passes a training
  * pipeline runs between dedup and packing: pick a weighted subset,
  * compress embeddings for serving, check re-identification risk, and
  * size the tokenizer vocabulary. All DuckDB-oracle-checked; every
  * selection decision is driven by md5-derived integers or exact
  * integer arithmetic (plus single correctly-rounded IEEE divisions,
  * which agree bit-for-bit across engines) — never transcendental
  * functions, whose last-ulp differences would make hash-compare flaky.
  */
object SamplingQueries {

  import org.apache.spark.sql.{Column, DataFrame}

  /** Deterministic weighted priority sample: keep the `k` rows with the
    * smallest `uniform(md5(id)) / weight` per stratum. Reproducible,
    * partition-invariant, and append-stable for the surviving rows'
    * priorities (a new row only ever displaces the current rank-k).
    * Returns the input columns plus the `rk` rank (1-based, long).
    */
  def weightedSample(
      df: DataFrame, stratumCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8),
      16, 10).cast("long") + lit(1L)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("__priority"), col(idCol))
    df.filter(col(weightCol) > 0)
      .withColumn("__priority", u.cast("double") / col(weightCol))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .drop("__priority")
  }

  /** Symmetric int8 quantization codes for a float-vector column:
    * q_i = floor(x_i * 127 / max|x| + 0.5), all-zero vectors map to
    * all-zero codes. Elementwise and transcendental-free — codes agree
    * bit-for-bit across engines. Returns `array<long>` (int8 range).
    */
  def int8Codes(vec: Column): Column = {
    val e = transform(vec, x => x.cast("double"))
    val m = array_max(transform(e, x => abs(x)))
    when(m === 0d, transform(e, _ => lit(0L)))
      .otherwise(transform(e, x => floor(x * lit(127d) / m + lit(0.5d))))
  }

  /** Per-document vocabulary coverage: token count and out-of-vocabulary
    * count against the corpus's top-`vocabSize` words (count desc, word
    * asc — a total rank). The vocab is tiny relative to the corpus, so
    * it broadcasts; docs with no tokens produce no row.
    */
  def oovProfile(
      docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val toks = docs
      .select(col(idCol),
        explode(split(TextFunctions.normalized(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
    // (cnt desc, w asc) is a TOTAL order, so sort+limit picks the same
    // set as a rank cutoff — but compiles to TakeOrderedAndProject
    // (distributed per-partition top-K + driver merge of k rows), not a
    // single-partition global window over every distinct word.
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(vocabSize)
      .select(col("w"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  val queries: Map[String, Q] = Map(

    // Deterministic weighted priority sample: 20 docs per language,
    // weight = n_chars. Priority = (md5-derived uniform u in [1, 2^32])
    // / weight — heavier docs draw smaller priorities more often, and
    // one correctly-rounded double division keeps the ordering engine-
    // portable. (The exact-PPS Efraimidis-Spirakis key u^(1/w) needs
    // libm pow, whose last-ulp drift across engines breaks replayable
    // selection; this uniform-ratio priority keeps the same monotone
    // weight bias, reproducibility, and partition-invariance.) Scales:
    // the per-group top-K is a WindowGroupLimit, no global sort.
    "q133_weighted_sample" -> Q(
      (s, d) =>
        weightedSample(Tables.documents(s, d),
            stratumCol = "lang", idCol = "doc_id",
            weightCol = "n_chars", k = 20)
          .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"))
          .orderBy("lang", "rk"),
      Some("""WITH pri AS (
             |  SELECT lang, doc_id, n_chars,
             |    CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             |               AS BIGINT) + 1 AS DOUBLE) / n_chars AS priority
             |  FROM documents WHERE n_chars > 0),
             |rk AS (
             |  SELECT lang, doc_id, n_chars,
             |    row_number() OVER (PARTITION BY lang
             |                       ORDER BY priority, doc_id) AS rk
             |  FROM pri)
             |SELECT lang, rk, doc_id, n_chars FROM rk WHERE rk <= 20
             |ORDER BY lang, rk""".stripMargin)),

    // OHLC time-bucket downsampling: per (event_type, hour), the open /
    // close (first/last value by (ts, event_id) — tie-broken so the
    // pick is total even with equal timestamps), high/low, row count and
    // exact DECIMAL volume. The standard telemetry/market-data
    // downsample; one shuffle on the (type, bucket) grain, open/close
    // via two window passes over the same partitioning (no extra
    // exchange — the window and the aggregate share the hash key).
    "q134_ohlc_downsample" -> Q(
      (s, d) => {
        val part = Seq(col("event_type"), col("bucket"))
        val wAsc = Window.partitionBy(part: _*)
          .orderBy(col("ts").asc, col("event_id").asc)
        val wDesc = Window.partitionBy(part: _*)
          .orderBy(col("ts").desc, col("event_id").desc)
        Tables.events(s, d)
          .select(col("event_type"),
            date_trunc("hour", col("ts")).as("bucket"),
            col("ts"), col("event_id"), col("value"))
          .withColumn("o", first(col("value")).over(wAsc))
          .withColumn("c", first(col("value")).over(wDesc))
          .groupBy("event_type", "bucket")
          .agg(min("o").as("open_v"), min("c").as("close_v"),
            min("value").as("low_v"), max("value").as("high_v"),
            count(lit(1)).as("n_events"),
            Stats.decimalSum(col("value")).as("volume"))
          .orderBy("event_type", "bucket")
      },
      Some("""WITH b AS (
             |  SELECT event_type, date_trunc('hour', ts) AS bucket,
             |         ts, event_id, value
             |  FROM events),
             |w AS (
             |  SELECT event_type, bucket, value,
             |    first_value(value) OVER (PARTITION BY event_type, bucket
             |      ORDER BY ts ASC, event_id ASC) AS o,
             |    first_value(value) OVER (PARTITION BY event_type, bucket
             |      ORDER BY ts DESC, event_id DESC) AS c
             |  FROM b)
             |SELECT event_type, bucket, min(o) AS open_v, min(c) AS close_v,
             |  min(value) AS low_v, max(value) AS high_v,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS volume
             |FROM w GROUP BY event_type, bucket
             |ORDER BY event_type, bucket""".stripMargin)),

    // Symmetric int8 quantization of the embedding column (the serving
    // compression every vector index applies before ANN): per-vector
    // scale = max|x|/127, q_i = floor(x*127/max|x| + 0.5) — float->
    // double widening is exact and each *, /, + is one correctly-
    // rounded IEEE op, so the codes agree bit-for-bit with the oracle.
    // Output is integer code statistics (sum / min / max / saturation /
    // zero counts) — the checks a quantization QA pass actually reads.
    // Purely elementwise: no shuffle at all, scales linearly.
    "q135_int8_quantize" -> Q(
      (s, d) => {
        Tables.embeddings(s, d)
          .withColumn("qs", int8Codes(col("embedding")))
          .select(col("vec_id"),
            aggregate(col("qs"), lit(0L), (a, x) => a + x).as("q_sum"),
            array_min(col("qs")).as("q_min"),
            array_max(col("qs")).as("q_max"),
            size(filter(col("qs"), x => abs(x) === 127L)).cast("long")
              .as("n_sat"),
            size(filter(col("qs"), x => x === 0L)).cast("long").as("n_zero"))
          .orderBy("vec_id")
      },
      Some("""WITH e AS (
             |  SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
             |  FROM embeddings),
             |m AS (
             |  SELECT vec_id, ed,
             |    list_max(list_transform(ed, x -> abs(x))) AS m FROM e),
             |q AS (
             |  SELECT vec_id,
             |    CASE WHEN m = 0
             |      THEN list_transform(ed, x -> CAST(0 AS BIGINT))
             |      ELSE list_transform(ed,
             |             x -> CAST(floor(x * 127 / m + 0.5) AS BIGINT))
             |    END AS qs
             |  FROM m)
             |SELECT vec_id,
             |  CAST(list_sum(qs) AS BIGINT) AS q_sum,
             |  CAST(list_min(qs) AS BIGINT) AS q_min,
             |  CAST(list_max(qs) AS BIGINT) AS q_max,
             |  CAST(len(list_filter(qs, x -> abs(x) = 127)) AS BIGINT) AS n_sat,
             |  CAST(len(list_filter(qs, x -> x = 0)) AS BIGINT) AS n_zero
             |FROM q ORDER BY vec_id""".stripMargin)),

    // k-anonymity audit over quasi-identifiers (lang, source, coarse
    // size bucket): equivalence-class sizes, the at-risk classes
    // (k < 5), and the generalization ladder — what k becomes if
    // `source` is suppressed. The release-gate check a governance pass
    // runs before publishing a corpus slice. One aggregation plus a
    // window sum on a strict prefix of the same grouping key.
    "q136_kanonymity" -> Q(
      (s, d) => {
        val g = Tables.documents(s, d)
          .withColumn("size_bucket",
            floor(col("n_chars") / lit(256.0)).cast("long"))
          .groupBy("lang", "source", "size_bucket")
          .agg(count(lit(1)).as("k"))
        g.withColumn("k_generalized",
            sum(col("k")).over(Window.partitionBy("lang", "size_bucket")))
          .select(col("lang"), col("source"), col("size_bucket"), col("k"),
            col("k_generalized"),
            when(col("k") < 5, 1L).otherwise(0L).as("at_risk"),
            when(col("k") < 5 && col("k_generalized") >= 5, 1L).otherwise(0L)
              .as("fixed_by_generalizing"))
          .orderBy("lang", "source", "size_bucket")
      },
      Some("""WITH g AS (
             |  SELECT lang, source,
             |    CAST(floor(n_chars / 256.0) AS BIGINT) AS size_bucket,
             |    CAST(count(*) AS BIGINT) AS k
             |  FROM documents GROUP BY 1, 2, 3),
             |w AS (
             |  SELECT *, CAST(sum(k) OVER (PARTITION BY lang, size_bucket)
             |                 AS BIGINT) AS k_generalized
             |  FROM g)
             |SELECT lang, source, size_bucket, k, k_generalized,
             |  CAST(CASE WHEN k < 5 THEN 1 ELSE 0 END AS BIGINT) AS at_risk,
             |  CAST(CASE WHEN k < 5 AND k_generalized >= 5 THEN 1 ELSE 0 END
             |       AS BIGINT) AS fixed_by_generalizing
             |FROM w ORDER BY lang, source, size_bucket""".stripMargin)),

    // Vocabulary coverage / OOV-rate profiling: build the top-1000-word
    // vocabulary (count desc, word asc — a total, engine-portable rank)
    // and score every document's out-of-vocabulary token count — the
    // sizing pass run before committing to a tokenizer vocab. The
    // 1000-row vocab broadcasts; the only shuffles are the word count
    // and the per-doc reaggregation. Docs whose normalized text is
    // empty contribute no token rows (and hence no output row) — same
    // on both engines by construction.
    "q137_oov_rate" -> Q(
      (s, d) =>
        oovProfile(Tables.documents(s, d),
            idCol = "doc_id", textCol = "text", vocabSize = 1000)
          .orderBy("doc_id"),
      Some(s"""WITH t AS (
              |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS w
              |  FROM documents),
              |tf AS (SELECT doc_id, w FROM t WHERE w <> ''),
              |v AS (SELECT w, count(*) AS cnt FROM tf GROUP BY w),
              |r AS (SELECT w,
              |        row_number() OVER (ORDER BY cnt DESC, w) AS vrk
              |      FROM v),
              |iv AS (SELECT w FROM r WHERE vrk <= 1000)
              |SELECT tf.doc_id,
              |  CAST(count(*) AS BIGINT) AS n_tokens,
              |  CAST(sum(CASE WHEN iv.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_oov
              |FROM tf LEFT JOIN iv ON tf.w = iv.w
              |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin)),

    // Epoch shuffle + token-budget sharding (llm/EpochShards.scala):
    // two deterministic epoch permutations (md5 priorities) packed
    // greedily into 4096-token shards — the training-order plan a
    // trainer streams. The engine computes the GLOBAL cumulative sum
    // with the two-phase range-bucket form (256 hex-prefix buckets,
    // tiny offset window, partitioned in-bucket windows — no
    // single-task global sort); the ORACLE computes the same plan with
    // a literal global window, so the hash match is precisely the
    // proof that the scalable decomposition equals the naive cumsum.
    // Per-shard totals also pin the balance property (every non-final
    // shard within max-doc-tokens of the budget).
    "q165_epoch_shards" -> Q(
      (s, d) => {
        import graft.llm.EpochShards
        val weighted = Tables.documents(s, d)
          .select(col("doc_id"), size(split(col("text"), " ")).as("tokens"))
        EpochShards.plan(weighted, "doc_id", col("tokens"),
            epochs = 2, budget = 4096L)
          .groupBy("epoch", "shard")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("w").as("sum_tokens"),
            min("doc_id").as("min_doc"))
          .orderBy("epoch", "shard")
      },
      Some("""WITH w AS (SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w
             |  FROM documents),
             |p AS (SELECT epoch, doc_id, w,
             |    md5('ep' || epoch || ':' || doc_id) AS pr
             |  FROM w CROSS JOIN (SELECT unnest(range(2)) AS epoch)),
             |c AS (SELECT epoch, doc_id, w,
             |    CAST(COALESCE(sum(w) OVER (PARTITION BY epoch
             |      ORDER BY pr, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS cb
             |  FROM p)
             |SELECT epoch, cb // 4096 AS shard,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(w) AS BIGINT) AS sum_tokens,
             |  min(doc_id) AS min_doc
             |FROM c GROUP BY epoch, cb // 4096
             |ORDER BY epoch, shard""".stripMargin)))

  /** DuckDB-side text normalization, shared with [[LlmQueries]]. */
  private def normSql: String = LlmQueries.normSql
}
