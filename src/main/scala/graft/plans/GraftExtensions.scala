package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering graft's native expressions as
  * SQL functions, so `spark.sql("SELECT simhash64(tokens) ...")` works
  * anywhere the Scala `Column` API does — including pure-SQL clients.
  *
  * Wire up with either:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  * or `--conf spark.sql.extensions=graft.plans.GraftExtensions` on
  * spark-submit (the zero-code path for an existing deployment).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // whole-operator extensions (custom LogicalPlan -> SparkPlan), plus
    // the optimizer rule making the custom node transparent to pruning
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => AsOfJoinPruningRule)
    // drop optimizer-inferred IsNotNull guards that re-evaluate a
    // derived expression a sibling predicate already null-rejects.
    // (Removal is monotone, so the rule is safe inside the operator-
    // optimization fixed point this hook injects into.)
    ext.injectOptimizerRule(_ => PruneRedundantNullGuards)
    // HoistExpensiveFilterPredicates is deliberately NOT injected here:
    // this hook lands rules in the operator-optimization FIXED POINT,
    // where PushDownPredicates would substitute the hoisted aliases
    // back every iteration and the fresh Alias exprIds would keep the
    // plans from converging (maxIterations error). It must run AFTER
    // the pushdown fixed point — [[GraftExtensions.register]] places
    // it in experimental.extraOptimizations, which does exactly that.
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** The function catalog, shared by the extensions path and [[register]]. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash of a token array"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash64 takes exactly 1 argument")
        SimHash64(children.head)
      }),
    (FunctionIdentifier("dot_product"),
      info("dot_product",
        "dot_product(array<float|double>, array<float|double>) - dot product as double"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_product takes exactly 2 arguments")
        DotProduct(children(0), children(1))
      }),
    (FunctionIdentifier("sum_of_squares"),
      info("sum_of_squares",
        "sum_of_squares(array<float|double>) - sum of squared elements as double"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "sum_of_squares takes exactly 1 argument")
        SumOfSquares(children.head)
      }),
    (FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "word_shingles(string, n) - lowercase word n-gram shingles (< n tokens -> whole text)"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "word_shingles takes exactly 2 arguments")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"word_shingles n must be an integer literal, got $other")
        }
        WordShingles(children.head, n)
      }),
    (FunctionIdentifier("jaccard_similarity"),
      info("jaccard_similarity",
        "jaccard_similarity(array<string>, array<string>) - exact set Jaccard as double"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "jaccard_similarity takes exactly 2 arguments")
        JaccardSimilarity(children(0), children(1))
      }),
    (FunctionIdentifier("lang_id"),
      info("lang_id",
        "lang_id(string) - marker-count language-ID heuristic (en/de/es/fr/zh/und)"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "lang_id takes exactly 1 argument")
        LangId(children.head, graft.functions.TextFunctions.langMarkers)
      }),
    (FunctionIdentifier("repetition_stats"),
      info("repetition_stats",
        "repetition_stats(array<string>) - struct(distinct_word_ratio, top_bigram_frac)"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "repetition_stats takes exactly 1 argument")
        RepetitionStats(children.head)
      }),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(array<string>, k) - k-hash MinHash signature as array<bigint>"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "minhash_signature takes exactly 2 arguments")
        MinHashSignature(children.head, intLiteral("minhash_signature k", children(1)))
      }),
    (FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnow_fingerprints(array<string>, w) - winnowed (MOSS) fingerprint set as array<bigint>"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "winnow_fingerprints takes exactly 2 arguments")
        WinnowFingerprints(children.head, intLiteral("winnow_fingerprints w", children(1)))
      }),
    (FunctionIdentifier("shingle_generate"),
      info("shingle_generate",
        "shingle_generate(string, n) - generator: one (pos, shingle) row per word n-gram"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "shingle_generate takes exactly 2 arguments")
        ShingleGenerator(children.head, intLiteral("shingle_generate n", children(1)))
      }),
    (FunctionIdentifier("media_meta"),
      info("media_meta",
        "media_meta(binary) - struct(format, width, height, n_frames) from real container headers (BMP/PPM/PGM/PNG/JPEG/GIF/WAV/MP4/FLAC/Ogg/MP3)"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "media_meta takes exactly 1 argument")
        MediaMeta(children.head)
      }),
    (FunctionIdentifier("av_meta"),
      info("av_meta",
        "av_meta(binary) - struct(format, width, height, n_frames, sample_rate, " +
          "channels, duration_ticks, timescale) from A/V container headers"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "av_meta takes exactly 1 argument")
        AvMeta(children.head)
      }),
    (FunctionIdentifier("warc_records"),
      info("warc_records",
        "warc_records(binary) - array<struct(version, warc_type, record_id, " +
          "target_uri, warc_date, content_type, content_length, content)> " +
          "from uncompressed WARC (ISO 28500) bytes"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "warc_records takes exactly 1 argument")
        WarcRecords(children.head)
      }),
    (FunctionIdentifier("gzip_bytes"),
      info("gzip_bytes",
        "gzip_bytes(binary) - one gzip member (concatenate for .warc.gz framing)"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "gzip_bytes takes exactly 1 argument")
        GzipBytes(children.head)
      }),
    (FunctionIdentifier("gunzip_all"),
      info("gunzip_all",
        "gunzip_all(binary) - inflate concatenated gzip members; NULL on corrupt " +
          "bytes or decompression-bomb overflow"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "gunzip_all takes exactly 1 argument")
        GunzipAll(children.head)
      }),
    (FunctionIdentifier("zstd_bytes"),
      info("zstd_bytes",
        "zstd_bytes(binary) - one zstd frame (concatenate for .jsonl.zst shards)"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "zstd_bytes takes exactly 1 argument")
        ZstdBytes(children.head)
      }),
    (FunctionIdentifier("unzstd_all"),
      info("unzstd_all",
        "unzstd_all(binary) - inflate concatenated zstd frames; NULL on corrupt " +
          "bytes or decompression-bomb overflow"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "unzstd_all takes exactly 1 argument")
        UnzstdAll(children.head)
      }),
    (FunctionIdentifier("http_parts"),
      info("http_parts",
        "http_parts(binary) - struct(status, reason, headers map, body, " +
          "content_encoding, quarantine) " +
          "from an HTTP response message (chunked de-chunked, " +
          "Content-Length trimmed); NULL on malformed framing"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "http_parts takes exactly 1 argument")
        HttpParts(children.head)
      }),
    (FunctionIdentifier("decode_charset"),
      info("decode_charset",
        "decode_charset(binary, content_type) - struct(text, charset, " +
          "n_replaced): BOM > charset= param > meta sniff > UTF-8, " +
          "U+FFFD replacement counted"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "decode_charset takes exactly 2 arguments")
        DecodeCharset(children(0), children(1))
      }),
    (FunctionIdentifier("html_unescape"),
      info("html_unescape",
        "html_unescape(string) - decode HTML character references " +
          "(named core set + numeric dec/hex), single pass"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "html_unescape takes exactly 1 argument")
        HtmlUnescape(children.head)
      }),
    (FunctionIdentifier("tar_entries"),
      info("tar_entries",
        "tar_entries(binary) - array<struct(name, size, mtime, type_flag, " +
          "checksum, content)> from TAR bytes (v7 + USTAR; WebDataset shards)"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "tar_entries takes exactly 1 argument")
        TarEntries(children.head)
      }))

  private def intLiteral(what: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Runtime registration on an ALREADY-BUILT session — the path for
    * notebooks/REPLs where `getOrCreate()` would silently ignore
    * `withExtensions` because the session exists. Idempotent.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
    Seq(PruneRedundantNullGuards, HoistExpensiveFilterPredicates).foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
    }
  }
}
