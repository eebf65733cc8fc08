package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markup-stripping text extraction — the "HTML to training text" pass
  * every web-crawl pipeline runs before quality scoring (the
  * trafilatura/jusText problem, reduced to its deterministic core).
  * Everything is a codegen'd regexp over the Java/RE2 common subset so
  * the exact same patterns run on Spark (Java regex) and an external
  * RE2 engine: no DOM parse, no library dependency, and every derived
  * column is replayable bit-for-bit by the oracle.
  *
  * Extraction stages, in the order a pipeline applies them:
  *  1. [[stripActiveBlocks]] — script/style elements go away WITH their
  *     content (their text is code, not prose);
  *  2. [[stripTags]] — remaining tags become spaces (so adjacent words
  *     don't fuse), then [[squeeze]] normalizes runs of whitespace;
  *  3. [[mainBlock]] — the first paragraph element's inner text, the
  *     main-content heuristic for link-density boilerplate removal;
  *  4. [[title]], [[linkCount]], [[linkTextLen]] — the metadata and
  *     link-density signals a quality gate consumes.
  */
object HtmlFunctions {

  /** Drop script/style elements INCLUDING their content. Non-greedy so
    * two sibling scripts don't swallow the prose between them.
    */
  def stripActiveBlocks(html: Column): Column =
    regexp_replace(html, "<(script|style)[^>]*>[\\s\\S]*?</(script|style)>", " ")

  /** Replace every remaining tag with a space (space, not empty — tags
    * separate words; deleting them would fuse `...word</p><p>word...`).
    */
  def stripTags(html: Column): Column =
    regexp_replace(html, "<[^>]*>", " ")

  /** Collapse whitespace runs (ALL whitespace — tabs/CR/LF, plus the
    * no-break space `&nbsp;` decodes to, which Java's `\s` excludes)
    * to one space and trim — canonical text form.
    */
  def squeeze(text: Column): Column =
    trim(regexp_replace(text, "[\\s\\u00A0]+", " "))

  /** Decode HTML character references (named core set + numeric
    * dec/hex, single pass — [[graft.plans.HtmlUnescapeKernel]]): runs
    * AFTER tag stripping so `&lt;script&gt;` in page text stays text.
    */
  def decodeEntities(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.HtmlUnescape(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** Full extraction: active blocks out, tags to spaces, entities
    * decoded, squeezed.
    */
  def extractText(html: Column): Column =
    squeeze(decodeEntities(stripTags(stripActiveBlocks(html))))

  /** Inner text of the &lt;title&gt; element ("" when absent). */
  def title(html: Column): Column =
    regexp_extract(html, "<title>([^<]*)</title>", 1)

  /** Inner text of the FIRST &lt;p&gt; element — the main-content
    * heuristic (non-greedy: stops at the first close tag).
    */
  def mainBlock(html: Column): Column =
    regexp_extract(html, "<p>([\\s\\S]*?)</p>", 1)

  /** Number of anchor elements. */
  def linkCount(html: Column): Column =
    regexp_count(html, lit("<a [^>]*>")).cast("long")

  /** Total characters of anchor inner text — the numerator of the
    * link-density boilerplate signal (dense link text, low prose =>
    * navigation, not content).
    */
  def linkTextLen(html: Column): Column =
    length(array_join(regexp_extract_all(html,
      lit("<a [^>]*>([^<]*)</a>"), lit(1)), "")).cast("long")

  // ---- structured page metadata (OpenGraph / meta / canonical /
  // JSON-LD) — the signals canonical-URL dedup and quality routing
  // key on. Same Java∩RE2 regex battery as the extraction above: no
  // DOM parse, every field replayable relationally. Attribute ORDER
  // varies on real pages (key-first and content-first both ship), and
  // quote style varies per attribute (double, single, and the
  // cross-quoted mix), so each accessor tries both orders with a
  // both-quotes character class. Known, documented limits of the
  // regex subset: a value containing the OTHER quote character stops
  // at it, and with several candidate tags the FIRST match wins
  // (browsers and OG consumers take the first too). ----

  /** `content` of the first tag where `keyAttr="keyValue"` (either
    * attribute order, either/mixed quote style). NULL when absent.
    * `keyValue` is escaped, so literal values like `og:title` are safe.
    */
  private def metaContent(html: Column, keyAttr: String,
      keyValue: String): Column = {
    val kv = java.util.regex.Pattern.quote(keyValue)
    val q = "[\"']"
    val keyFirst =
      s"<meta[^>]*${keyAttr}=$q$kv$q[^>]*content=$q([^\"']*)$q"
    val contentFirst =
      s"<meta[^>]*content=$q([^\"']*)$q[^>]*${keyAttr}=$q$kv$q"
    firstByPosition(html, keyFirst, contentFirst)
  }

  /** Extract group 1 of whichever of two patterns matches EARLIEST in
    * the document — the first-match-wins contract must hold across
    * attribute orders too (a later key-first tag must not shadow an
    * earlier content-first tag; browsers take the first tag, period).
    * A start-position tie is impossible between the two orders (one
    * tag can't have both attribute orders), so `<=` is just the
    * determinizer. NULL when neither matches.
    */
  private def firstByPosition(html: Column, patA: String,
      patB: String): Column = {
    val posA = regexp_instr(html, lit(patA))
    val posB = regexp_instr(html, lit(patB))
    when(posA > 0 && (posB === 0 || posA <= posB),
      regexp_extract(html, patA, 1))
      .when(posB > 0, regexp_extract(html, patB, 1))
  }

  /** OpenGraph property (`<meta property="og:…" content=…>`). Pass the
    * full property name, e.g. `og:title`. NULL when absent.
    */
  def metaProperty(html: Column, prop: String): Column =
    metaContent(html, "property", prop)

  /** Named document metadata (`<meta name=… content=…>`), e.g.
    * `description`, `robots`. NULL when absent.
    */
  def metaNamed(html: Column, name: String): Column =
    metaContent(html, "name", name)

  /** `href` of `<link rel="canonical">` (either attribute order,
    * either quote style) — the page's self-declared canonical URL,
    * the strongest dedup-key signal a crawl gets. NULL when absent.
    * Compose with [[graft.functions.UrlFunctions.normalize]].
    */
  def canonicalUrl(html: Column): Column = {
    val q = "[\"']"
    val relFirst =
      s"<link[^>]*rel=${q}canonical$q[^>]*href=$q([^\"']*)$q"
    val hrefFirst =
      s"<link[^>]*href=$q([^\"']*)$q[^>]*rel=${q}canonical$q"
    firstByPosition(html, relFirst, hrefFirst)
  }

  /** Raw inner text of the FIRST `<script type="application/ld+json">`
    * block (non-greedy; NULL when absent) — JSON-LD structured data.
    * Pull fields with `get_json_object` downstream; this accessor
    * stays string-level so malformed JSON is the consumer's quarantine
    * decision, not a silent extraction miss.
    */
  def jsonLd(html: Column): Column = {
    val pat = "<script[^>]*type=[\"']application/ld\\+json[\"'][^>]*>" +
      "([\\s\\S]*?)</script>"
    when(regexp_like(html, lit(pat)), regexp_extract(html, pat, 1))
  }
}
