package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for large-scale training-data pipelines: token
  * counting, quality ratios, language-ID heuristic, fingerprinting,
  * shingling. All pure `org.apache.spark.sql.functions` compositions —
  * codegen'd, no UDFs — and each designed to be reproducible in ANSI SQL
  * for oracle testing.
  */
object TextFunctions {

  /** Whitespace tokens (empty/blank text → empty array). */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Whitespace token count as LONG. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L)).otherwise(size(split(trim(c), "\\s+")).cast("long"))

  /** GPT-2-style pre-tokenizer pattern (simplified): contraction
    * suffixes, space-prefixed letter runs, digit runs, punctuation runs,
    * residual whitespace. Counting its matches approximates a BPE
    * tokenizer's token count well enough for length-based quality
    * filtering/budgeting without shipping a vocabulary. The pattern
    * avoids lookarounds and unicode classes so it means the same thing
    * in Java regex and RE2-style engines (oracle-portable).
    */
  val bpeTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+|\\s+"

  /** Approximate BPE token count (matches of [[bpeTokenPattern]]). */
  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit(bpeTokenPattern)).cast("long")

  /** Whitespace-normalized text: lowercase, runs of whitespace collapsed,
    * trimmed — the canonical form used for fingerprinting and exact dedup.
    */
  def normalized(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Document fingerprint: md5 (hex) of the normalized text. 128-bit, so
    * grouping/joining on it instead of the document body keeps shuffles
    * narrow at 100 TB.
    */
  def fingerprint(c: Column): Column = md5(normalized(c))

  /** Rabin-Karp polynomial hash of a string: fold (acc*131 + code) mod
    * 1e9+7 over the character codepoints. Unlike xxhash64/md5 this is
    * PORTABLE — plain int64 arithmetic any engine reproduces exactly —
    * so hash-derived structures (winnowed fingerprints) stay
    * oracle-replayable. All intermediates < 2^37: no ANSI overflow.
    */
  def polyHash(c: Column): Column = {
    val idxs = when(length(c) === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(1), length(c)))
    aggregate(idxs, lit(0L),
      (acc, i) => (acc * 131L + ascii(c.substr(i, lit(1))).cast("long"))
        % 1000000007L)
  }

  /** Winnowed rolling fingerprints (the MOSS scheme): [[polyHash]] each
    * word shingle, take the MIN hash of every sliding `window` of
    * consecutive shingle hashes, deduplicate. Guarantees any shared run
    * of `window + shingleWords - 1` words yields a shared fingerprint,
    * while keeping ~1/window of the shingle hashes — the standard
    * local-similarity fingerprint for plagiarism/near-dup detection.
    * Computed by the native `WinnowFingerprints` kernel, bit-compatible
    * with [[winnowedFingerprintsComposed]].
    */
  def winnowedFingerprints(
      text: Column, shingleWords: Int = 3, window: Int = 4): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.WinnowFingerprints(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          wordShingles(text, shingleWords)), window))

  /** The composed-builtin reference formulation of
    * [[winnowedFingerprints]] — per-shingle [[polyHash]] lambda, window
    * minima via `slice`/`array_min`, `array_distinct`. Semantically the
    * oracle's shape (and the parity pin for the native kernel), but the
    * interpreted per-character fold makes it ~4× slower at sf0.1.
    */
  def winnowedFingerprintsComposed(
      text: Column, shingleWords: Int = 3, window: Int = 4): Column = {
    val hs = transform(wordShingles(text, shingleWords), s => polyHash(s))
    array_distinct(transform(
      sequence(lit(1), greatest(size(hs) - (window - 1), lit(1))),
      j => array_min(slice(hs, j, lit(window)))))
  }

  /** Number of ASCII-alphabetic characters. */
  def alphaChars(c: Column): Column =
    length(regexp_replace(c, "[^A-Za-z]", "")).cast("long")

  /** Count of non-overlapping occurrences of literal `needle` — replace-
    * based so no regex-engine semantics are involved (portable to any SQL
    * oracle).
    */
  def literalCount(c: Column, needle: String): Column =
    ((length(c) - length(replace(c, lit(needle), lit("")))) / needle.length).cast("long")

  /** Quality-scoring ratio columns (select alongside the doc id):
    * alphabetic ratio, whitespace ratio, mean token length. Divisions are
    * exact-int → double, bit-stable across engines. Empty documents yield
    * NULL ratios — the zero-denominator guard matters because Spark 4 runs
    * ANSI mode by default, where an unguarded /0 fails the whole job.
    */
  def qualityColumns(text: Column): Seq[Column] = {
    val len = length(text).cast("long")
    val alpha = alphaChars(text)
    val spaces = (length(text) - length(replace(text, lit(" "), lit("")))).cast("long")
    val nTok = tokenCount(text)
    def ratio(num: Column, den: Column): Column =
      when(den === 0, lit(null).cast("double")).otherwise(num.cast("double") / den)
    Seq(
      len.as("len_chars"),
      nTok.as("n_tokens"),
      ratio(alpha, len).as("alpha_ratio"),
      ratio(spaces, len).as("space_ratio"),
      ratio(alpha, nTok).as("mean_token_len"))
  }

  /** Marker words per language for the language-ID heuristic. Counted as
    * literal " word "-padded substrings so the same logic is expressible
    * with `replace` in any SQL dialect.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "de" -> Seq(" der ", " und ", " die ", " ist "),
    "es" -> Seq(" el ", " la ", " que ", " los "),
    "fr" -> Seq(" le ", " les ", " des ", " est "),
    "zh" -> Seq("的", "是", "了", "在"))

  /** Language-ID heuristic: argmax of marker-word hit counts, ties broken
    * by the fixed order en > de > es > fr > zh, no hits at all → "und"
    * (undetermined). Deterministic and SQL-expressible.
    *
    * Backed by the native [[graft.plans.LangId]] expression: the composed
    * column form below generates thousands of lines of projection code
    * whose one-time janino+JIT cost (6-50 s per JVM) dominated the q22
    * bench; the native kernel is one static call. [[langIdComposed]] is
    * retained as the executable specification — TextFunctionsSpec pins
    * the two equal on every fixture.
    */
  def langId(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.LangId(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), langMarkers))

  /** Reference formulation of [[langId]] from built-in functions only.
    *
    * Shape matters even here: each score is packed once into an array of
    * (score, priority) structs and the argmax is `array_max` (lexicographic
    * struct compare, priority descending in marker order for ties). A naive
    * `when(s === greatest(...))` chain would inline every score tree into
    * every branch — ~7× the `replace` calls per row.
    */
  def langIdComposed(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val n = langMarkers.size
    val scored = array(langMarkers.zipWithIndex.map { case ((_, ms), i) =>
      struct(
        ms.map(m => literalCount(padded, m)).reduce(_ + _).as("s"),
        lit(n - 1 - i).as("p")) // earlier marker wins ties via larger p
    }: _*)
    val langsByP = array(langMarkers.reverse.map(m => lit(m._1)): _*)
    val best = array_max(scored)
    when(text.isNull, lit(null).cast("string")) // null doc → null lang (SQL CASE parity)
      .when(best.getField("s") === 0, lit("und"))
      .otherwise(element_at(langsByP, best.getField("p").cast("int") + 1))
  }

  /** Word n-gram shingles over whitespace tokens; texts shorter than n
    * tokens yield one shingle = the whole normalized text. Backed by the
    * native [[graft.plans.WordShingles]] kernel (one byte-scan per doc) —
    * the composed form below re-executed sequence/slice/concat trees in
    * every branch of the near-dup DAGs and dominated q23's profile.
    */
  def wordShingles(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.WordShingles(
        org.apache.spark.sql.graft.ColumnBridge.expression(c), n))

  /** Positional shingles as a GENERATOR column: `(pos, shingle)` rows
    * straight off the kernel, no intermediate array column — use with
    * `.as(Seq("pos", "shingle"))` like `posexplode`. Semantics ==
    * `posexplode(wordShingles(c, n))` (pinned in TextFunctionsSpec).
    */
  def shingleGenerate(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.ShingleGenerator(
        org.apache.spark.sql.graft.ColumnBridge.expression(c), n))

  /** Reference formulation of [[wordShingles]] from built-ins only;
    * TextFunctionsSpec pins the two equal on every fixture.
    */
  def wordShinglesComposed(c: Column, n: Int): Column = {
    val t = tokens(normalized(c))
    when(size(t) < n, array(concat_ws(" ", t)))
      .otherwise(transform(
        sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + lit(1), lit(n)))))
  }

  /** Repetition signals over a word-array column as ONE native kernel
    * call: `struct<distinct_word_ratio, top_bigram_frac>` (empty array →
    * null fields). Use this (staged once, then `.getField`) in anything
    * that FILTERS on the signals: optimizer inlining of the composed
    * array-lambda forms into a filter re-executes the whole
    * tokenize→bigram tree per array element (a measured 78 s cliff in
    * q48); the kernel is O(n) per row however often it's inlined.
    */
  def repetitionStats(w: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.RepetitionStats(
        org.apache.spark.sql.graft.ColumnBridge.expression(w)))

  /** Vocabulary-diversity ratio over a word-array column: distinct words
    * / total words (empty → NULL). Low values flag repetitive spam.
    * Composed executable spec of `repetitionStats.distinct_word_ratio`
    * (TextFunctionsSpec pins them equal).
    */
  def distinctWordRatioComposed(w: Column): Column =
    when(size(w) === 0, lit(null).cast("double"))
      .otherwise(round(size(array_distinct(w)).cast("double") / size(w), 6))

  /** Word bigrams (MULTISET — repetition counting needs duplicates, so
    * this is deliberately not the distinct-set `wordShingles`).
    */
  def wordBigrams(w: Column): Column =
    when(size(w) < 2, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(w) - 1),
        i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))

  /** Fraction of bigram mass held by the single most frequent bigram
    * (Gopher §A1.1-style repetition signal; empty → NULL). Composed
    * executable spec of `repetitionStats.top_bigram_frac`; O(d·n) per
    * row over the staged bigram array.
    */
  def topBigramFracComposed(bg: Column): Column =
    when(size(bg) === 0, lit(null).cast("double"))
      .otherwise(round(
        array_max(transform(array_distinct(bg),
          x => size(filter(bg, y => y === x)))).cast("double") / size(bg), 6))

  /** Character n-gram shingles of the normalized text. */
  def charShingles(c: Column, n: Int): Column = {
    val s = normalized(c)
    when(length(s) < n, array(s))
      .otherwise(transform(
        sequence(lit(0), length(s) - n),
        i => s.substr(i + lit(1), lit(n))))
  }
}
