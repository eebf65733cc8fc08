package graft.crawl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.HtmlFunctions

/** Content-Type (MIME) routing for the crawl extraction chain — the
  * dispatch every production pipeline needs between `http_parts` and
  * text extraction. Real WARC response records are ~¼ non-HTML:
  * running HTML tag-stripping over JSON APIs, plain-text files, and
  * binary media yields garbage rows (or worse, plausible-looking
  * mojibake prose from a PNG) that then flow into the quality gate.
  * Reference behavior: crawl toolchains route on the media-type
  * "essence" (RFC 9110 §8.3 / WHATWG MIME sniffing's type/subtype) —
  * the charset parameter stays with [[Http.decodeCharset]].
  *
  * Everything here is a Column combinator over codegen'd built-ins
  * (split/lower/when) plus the existing [[graft.plans.DecodeCharset]]
  * kernel, so routing adds no new shuffle, no UDF, and the decode
  * only ever runs on the branch a row actually takes (CaseWhen
  * branches evaluate lazily) — a binary-skip row never pays charset
  * decoding at all.
  */
object ContentRoute {

  /** The media-type "essence": the Content-Type value up to the first
    * ';' parameter, lowercased and trimmed — `Text/HTML; charset=x` →
    * `text/html`. NULL/absent → '' (type unknown).
    */
  def essence(contentType: Column): Column =
    lower(trim(element_at(split(coalesce(contentType, lit("")), ";"), 1)))

  /** Route decision: 'html' | 'plain' | 'json' | 'skip'.
    *
    *  - text/html and application/xhtml+xml → 'html' (tag-stripping
    *    extraction); an ABSENT/empty type also routes 'html' — the
    *    browser-sniff posture [[Http.decodeCharset]] already takes for
    *    its meta prescan, and most unlabeled crawl payloads are pages;
    *  - text/plain → 'plain' (whitespace squeeze only — there are no
    *    tags to strip, and a '<' in prose must survive);
    *  - application/json, text/json and any `+json` structured-syntax
    *    suffix (ld+json, hal+json, …) → 'json' (field pull);
    *  - everything else (images, PDFs, fonts, octet-streams) →
    *    'skip': never run text extraction over binary.
    */
  def route(contentType: Column): Column = {
    val e = essence(contentType)
    when(e.isin("text/html", "application/xhtml+xml") || e === "",
      lit("html"))
      .when(e === "text/plain", lit("plain"))
      .when(e.isin("application/json", "text/json") ||
        e.endsWith("+json"), lit("json"))
      .otherwise(lit("skip"))
  }

  /** WHATWG "binary data byte" test over the body's prescan window,
    * per the spec's misinterpreted-for-compatibility order: a leading
    * UTF-16 (FF FE / FE FF) or UTF-8 (EF BB BF) BOM means TEXT —
    * checked FIRST, because UTF-16-encoded ASCII is half 0x00 bytes
    * and would otherwise always read as binary — then true when any
    * of the first 48 bytes is in 0x00–0x08, 0x0B, 0x0E–0x1A or
    * 0x1C–0x1F (UTF-8 and the 8-bit legacy families avoid these in
    * real pages — ESC/tab/newlines are excluded, so ISO-2022-JP
    * survives; media containers hit one in the first magic/length
    * fields). Implemented over hex pairs so the check is a codegen'd
    * regexp, not a UDF: `(..)*` anchors the alternation to even
    * offsets, i.e. whole bytes.
    */
  def looksBinary(body: Column): Column = {
    val h = hex(substring(body, 1, 48))
    !(h.startsWith("FFFE") || h.startsWith("FEFF") ||
      h.startsWith("EFBBBF")) &&
      regexp_like(h, lit("^([0-9A-F]{2})*(0[0-8]|0B|0E|0F|1[0-9A]|1[C-F])"))
  }

  /** Body-aware route: like [[route]], but a row whose Content-Type is
    * ABSENT/empty only keeps the default html route when its leading
    * bytes pass the WHATWG binary sniff — binary served without a type
    * (misconfigured servers, common at crawl scale) routes 'skip'
    * instead of flowing mojibake prose into the quality gate.
    */
  def route(contentType: Column, body: Column): Column = {
    val e = essence(contentType)
    when(e === "" && looksBinary(body), lit("skip"))
      .otherwise(route(contentType))
  }

  /** Why a row was skipped: its media-type essence (NULL on text
    * routes) — the rejects-table column that makes "¼ of the crawl
    * was binary" measurable instead of silently vanishing.
    */
  def skipReason(contentType: Column): Column =
    when(route(contentType) === "skip", essence(contentType))

  /** Body-aware skip reason: typed skips carry their essence; an
    * untyped body that failed the binary sniff carries
    * 'binary-no-type'.
    */
  def skipReason(contentType: Column, body: Column): Column =
    when(route(contentType) === "skip", essence(contentType))
      .when(route(contentType, body) === "skip", lit("binary-no-type"))

  /** Charset-decoded body text ([[Http.decodeCharset]] resolution
    * order), evaluated only when this row routes to a text branch.
    */
  private def decodedText(body: Column, contentType: Column): Column =
    ColumnBridge.column(graft.plans.DecodeCharset(
      ColumnBridge.expression(body),
      ColumnBridge.expression(contentType))).getField("text")

  /** The routed extraction: html → main-content extraction (first
    * paragraph block by default — pass `htmlExtract` to swap in
    * [[HtmlFunctions.extractText]] or a custom chain), plain →
    * whitespace squeeze, json → `$.jsonField` string pull, skip →
    * NULL. Decode and per-route transforms run on at most ONE branch
    * per row.
    */
  def extractedText(body: Column, contentType: Column,
      jsonField: String = "text",
      htmlExtract: Column => Column = HtmlFunctions.mainBlock): Column = {
    // body-aware: an untyped binary body must NOT reach the decode —
    // the sniff costs one bounded regexp on the (rare) untyped rows
    val r = route(contentType, body)
    val dec = decodedText(body, contentType)
    when(r === "html", htmlExtract(dec))
      .when(r === "plain", HtmlFunctions.squeeze(dec))
      .when(r === "json", get_json_object(dec, "$." + jsonField))
      .otherwise(lit(null).cast("string"))
  }
}
