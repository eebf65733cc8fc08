package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-frontier/dedup key problem: the
  * same resource arrives under case-varied schemes and hosts, default
  * ports, trailing slashes, tracking params, and fragments, and a
  * pipeline that doesn't canonicalize before grouping re-crawls and
  * re-trains on the same page N times. All pieces are regexps and
  * string algebra in the Java/RE2 common subset — no java.net.URI, so
  * the exact rules are visible, codegen'd, and replayable bit-for-bit
  * by an external engine ([[normalize]] is the composition used as the
  * dedup key; the component extractors are exposed for auditing).
  *
  * Canonicalization rules (the RFC 3986 §6 safe set plus the two
  * conventional crawl rules — www-strip and tracking-param removal):
  * scheme and host lowercased, `www.` prefix dropped, default port
  * dropped (`:443` for https, `:80` for http — a NON-default pairing
  * like `http://h:443` is kept), trailing path slashes trimmed (root
  * stays `/`), `utm_*` tracking params removed with the others' order
  * preserved, fragment dropped.
  */
object UrlFunctions {

  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z]+)://", 1))

  /** Hostname, lowercased, without port. */
  def host(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z]+://([^/:?#]+)", 1))

  /** Explicit port digits ("" when absent). */
  def port(url: Column): Column =
    regexp_extract(url, "^[A-Za-z]+://[^/:?#]+:([0-9]+)", 1)

  /** Path component ("" when absent, before normalization). */
  def path(url: Column): Column =
    regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)

  /** Raw query string without the '?' ("" when absent). */
  def query(url: Column): Column =
    regexp_extract(url, "\\?([^#]*)", 1)

  /** Last two host labels — the registered-domain grouping key (a
    * public-suffix list refines this; two labels is the deterministic
    * core).
    */
  def registeredDomain(url: Column): Column =
    regexp_extract(regexp_replace(host(url), "^www\\.", ""),
      "([^.]+\\.[^.]+)$", 1)

  /** Query string with `utm_*` params removed, other params' order
    * preserved ("" when nothing survives).
    */
  def cleanQuery(url: Column): Column =
    array_join(filter(split(query(url), "&"),
      p => !p.startsWith("utm_") && p =!= ""), "&")

  /** The full canonical form — the crawl-dedup key. */
  def normalize(url: Column): Column = {
    val sch = scheme(url)
    val h = regexp_replace(host(url), "^www\\.", "")
    val p = port(url)
    val keptPort = when(p === "", lit(""))
      .when(sch === "https" && p === "443", lit(""))
      .when(sch === "http" && p === "80", lit(""))
      .otherwise(concat(lit(":"), p))
    val trimmed = rtrim(path(url), "/")
    val normPath = when(trimmed === "", lit("/")).otherwise(trimmed)
    val cq = cleanQuery(url)
    concat(sch, lit("://"), h, keptPort, normPath,
      when(cq === "", lit("")).otherwise(concat(lit("?"), cq)))
  }
}
