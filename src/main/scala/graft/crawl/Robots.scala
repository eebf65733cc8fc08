package graft.crawl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt exclusion (RFC 9309) — the URL-frontier gate every crawl
  * pipeline runs before fetching: parse each host's robots.txt into
  * per-group rules, then decide allow/deny per URL for a given
  * user-agent by the longest-match rule. Everything is DataFrame
  * combinators over codegen'd built-ins (split/window/regexp), so both
  * halves replay relationally in the oracle and the decision join is a
  * host-keyed equi-join — rules tables are tiny per host, URLs scale.
  *
  * Semantics implemented (RFC 9309 §2, plus the de-facto extensions
  * every major crawler honors):
  *  - groups: consecutive `User-agent:` lines share one group; rules
  *    bind to the nearest preceding group;
  *  - group selection: ALL groups naming the crawler's product token
  *    (case-insensitive) combine; the `*` groups apply only when no
  *    specific group matches;
  *  - rule matching: byte-prefix match with `*` wildcards and a
  *    trailing `$` end anchor; the most specific (longest-pattern)
  *    matching rule wins, allow beating disallow on equal length;
  *  - empty rule values match nothing; unknown directives
  *    (Crawl-delay, Sitemap, …) are ignored; `#` comments stripped;
  *  - no matching rule → allowed (the RFC default).
  *
  * Out of scope (documented, not silently wrong): percent-encoding
  * normalization of rule paths vs URL paths — callers should feed
  * paths in one canonical encoding (pair with
  * [[graft.functions.UrlFunctions]]).
  */
object Robots {

  /** robots.txt path pattern → anchored regex in the Java∩RE2 common
    * subset: `*` → `.*`, a trailing `$` → end anchor, every other
    * regex metacharacter escaped as a literal.
    */
  def pathRegex(p: Column): Column = {
    val endAnchor = p.endsWith("$")
    val core = when(endAnchor, p.substr(lit(1), length(p) - 1)).otherwise(p)
    val esc = regexp_replace(core,
      "([\\.\\+\\?\\(\\)\\[\\]\\{\\}\\^\\|\\$\\\\])", "\\\\$1")
    val wild = regexp_replace(esc, "\\*", ".*")
    concat(lit("^"), wild, when(endAnchor, lit("$")).otherwise(lit("")))
  }

  /** All directive lines of every robots.txt, keyed and positioned:
    * (idCol, pos, key, value) — comments stripped, keys lowercased,
    * values trimmed with their internal ':' intact (Sitemap URLs).
    */
  private def parsedLines(robots: DataFrame, idCol: String,
      txtCol: String): DataFrame =
    robots.select(col(idCol),
      posexplode(split(col(txtCol), "\n")).as(Seq("pos", "raw")))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*", "")))
      .filter(col("line") =!= "")
      .withColumn("key",
        lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))))
      .withColumn("value",
        trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)))

  /** Group-membered directive lines with their group `section` — the
    * shared parse under [[rules]] and [[crawlDelays]]. Crawl-delay is
    * a group member here (the posture of the crawlers that honor it:
    * it binds to the nearest preceding User-agent group and ends a
    * consecutive-UA run, exactly like allow/disallow); truly unknown
    * directives and Sitemap (which is global, not group-scoped) stay
    * ignored by the grouping, per RFC 9309.
    */
  private def sectionedLines(robots: DataFrame, idCol: String,
      txtCol: String): DataFrame = {
    val lines = parsedLines(robots, idCol, txtCol)
      .filter(col("key").isin("user-agent", "allow", "disallow",
        "crawl-delay"))
    // group boundary: a User-agent line NOT preceded by another
    // User-agent line starts a new group (consecutive UA lines share)
    val w = Window.partitionBy(idCol).orderBy("pos")
    lines
      .withColumn("is_ua", (col("key") === "user-agent").cast("int"))
      .withColumn("prev_ua", lag(col("is_ua"), 1, 0).over(w))
      .withColumn("section",
        sum(when(col("is_ua") === 1 && col("prev_ua") === 0, 1)
          .otherwise(0)).over(w))
  }

  /** Parse robots.txt bodies into rule rows:
    * (idCol, section, agent, rule_pos, allow, path, rx) — one row per
    * (group agent × group rule). `idCol` identifies the host whose
    * robots.txt `txtCol` holds.
    */
  def rules(robots: DataFrame, idCol: String, txtCol: String): DataFrame = {
    val sectioned = sectionedLines(robots, idCol, txtCol)
    val agents = sectioned.filter(col("is_ua") === 1)
      .select(col(idCol), col("section"), lower(col("value")).as("agent"))
    // empty rule values match nothing — drop them here
    val ruleLines = sectioned
      .filter(col("is_ua") === 0 &&
        col("key").isin("allow", "disallow") && col("value") =!= "")
      .select(col(idCol), col("section"), col("pos").as("rule_pos"),
        (col("key") === "allow").as("allow"), col("value").as("path"))
      .withColumn("rx", pathRegex(col("path")))
    // LEFT join: a group with no effective rules (the ubiquitous
    // 'User-agent: x / Disallow:' allow-everything pattern) must still
    // EXIST — its presence suppresses the '*' fallback in decisions();
    // an inner join would erase it and wrongly subject the named
    // crawler to the '*' policy. Rule-less groups carry null path/rx
    // and never match a URL, which is exactly allow-everything.
    agents.join(ruleLines, Seq(idCol, "section"), "left")
  }

  /** Effective Crawl-delay per host for `userAgent`:
    * (idCol, crawl_delay_ms). Group selection mirrors [[decisions]] —
    * every group naming the crawler's token combines, `*` groups apply
    * only when none does; with several applicable delays the MAXIMUM
    * (most conservative) wins; unparseable or negative values are
    * ignored as the unknown directives they effectively are. Hosts
    * with no applicable delay are absent — callers supply their own
    * default. Fractional seconds (Yandex's documented `0.5`) are kept
    * via the millisecond unit.
    */
  def crawlDelays(robots: DataFrame, idCol: String, txtCol: String,
      userAgent: String): DataFrame = {
    val ua = userAgent.toLowerCase
    val sectioned = sectionedLines(robots, idCol, txtCol)
    val agents = sectioned.filter(col("is_ua") === 1)
      .select(col(idCol), col("section"), lower(col("value")).as("agent"))
    val delayLines = sectioned
      .filter(col("key") === "crawl-delay")
      // try_cast: a malformed delay value is an ignorable unknown
      // directive, not a task kill (ANSI cast would throw)
      .withColumn("delay_ms",
        (expr("try_cast(value AS DOUBLE)") * 1000).cast("long"))
      .filter(col("delay_ms").isNotNull && col("delay_ms") >= 0)
      .select(col(idCol), col("section"), col("delay_ms"))
    val grouped = agents.join(delayLines, Seq(idCol, "section"))
    // '*' fallback suppression keys on ANY group naming the token —
    // a specific group without a (valid) delay still means "this
    // crawler has its own policy; the '*' delay is not for it"
    val hasSpecific = agents.filter(col("agent") === ua)
      .select(col(idCol)).distinct().withColumn("__spec", lit(true))
    grouped
      .join(hasSpecific, Seq(idCol), "left")
      .filter(col("agent") === ua ||
        (col("agent") === "*" && col("__spec").isNull))
      .groupBy(idCol)
      .agg(max(col("delay_ms")).as("crawl_delay_ms"))
  }

  /** `Sitemap:` discovery lines — global per the sitemaps.org
    * extension (NOT group-scoped, listed anywhere in the file):
    * (idCol, sitemap_url), duplicates collapsed.
    */
  def sitemapUrls(robots: DataFrame, idCol: String,
      txtCol: String): DataFrame =
    parsedLines(robots, idCol, txtCol)
      .filter(col("key") === "sitemap" && col("value") =!= "")
      .select(col(idCol), col("value").as("sitemap_url"))
      .distinct()

  /** Deterministic politeness rate plan — the operator a crawler
    * dispatches from: each host's ALLOWED frontier rows are assigned
    * fetch slots `0,1,2,…` in `orderCol` order and a send-no-earlier-
    * than offset `fetch_at_ms = slot × delay_ms`, where `delay_ms` is
    * the host's effective Crawl-delay (from [[crawlDelays]]) or
    * `defaultDelayMs` when the host sets none. One host-keyed window
    * plus one broadcast-sized equi-join: delay tables are one row per
    * host, and the per-host window is exactly the per-host fetch queue
    * a frontier shard holds — scales with URL count, never all-pairs.
    */
  def schedule(allowedUrls: DataFrame, delays: DataFrame, idCol: String,
      orderCol: String, defaultDelayMs: Long): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(col(orderCol).asc)
    allowedUrls
      .join(broadcast(delays), Seq(idCol), "left")
      .withColumn("delay_ms",
        coalesce(col("crawl_delay_ms"), lit(defaultDelayMs)))
      .drop("crawl_delay_ms")
      .withColumn("slot", (row_number().over(w) - 1).cast("long"))
      .withColumn("fetch_at_ms", col("slot") * col("delay_ms"))
  }

  /** Frontier decisions for `userAgent`: every `urls` row gains
    * (matched_path, matched_allow, allowed). `urlKeyCol` must be
    * unique per URL row (the longest-match window partitions on it);
    * `idCol` joins URLs to their host's rules.
    */
  def decisions(ruleRows: DataFrame, urls: DataFrame, idCol: String,
      urlKeyCol: String, pathCol: String, userAgent: String): DataFrame = {
    val ua = userAgent.toLowerCase
    // RFC group selection: specific groups combine; '*' only if none
    val hasSpecific = ruleRows.filter(col("agent") === ua)
      .select(col(idCol)).distinct().withColumn("__spec", lit(true))
    val applicable = ruleRows
      .join(hasSpecific, Seq(idCol), "left")
      .filter(col("agent") === ua ||
        (col("agent") === "*" && col("__spec").isNull))
      .select(col(idCol), col("rule_pos"), col("allow"),
        col("path").as("__rule_path"), col("rx"))
    // host-keyed equi-join; the regex evaluates per (url, rule) pair —
    // rules per host are a handful, so this is linear in URLs
    val matched = urls.select(col(urlKeyCol), col(idCol), col(pathCol))
      .join(applicable, Seq(idCol))
      .filter(regexp_like(col(pathCol), col("rx")))
    // longest-match: pattern length desc, allow beats disallow on
    // ties, file order as the final determinizer
    val w = Window.partitionBy(urlKeyCol)
      .orderBy(length(col("__rule_path")).desc, col("allow").desc,
        col("rule_pos").asc)
    val best = matched
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(urlKeyCol), col("__rule_path").as("matched_path"),
        col("allow").as("matched_allow"))
    urls.join(best, Seq(urlKeyCol), "left")
      .withColumn("allowed", coalesce(col("matched_allow"), lit(true)))
  }
}
