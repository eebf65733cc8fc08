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
}
