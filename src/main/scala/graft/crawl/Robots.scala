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

  /** Parse robots.txt bodies into rule rows:
    * (idCol, section, agent, rule_pos, allow, path, rx) — one row per
    * (group agent × group rule). `idCol` identifies the host whose
    * robots.txt `txtCol` holds.
    */
  def rules(robots: DataFrame, idCol: String, txtCol: String): DataFrame = {
    val lines = robots.select(col(idCol),
      posexplode(split(col(txtCol), "\n")).as(Seq("pos", "raw")))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*", "")))
      .filter(col("line") =!= "")
      .withColumn("key",
        lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))))
      .withColumn("value",
        trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)))
      .filter(col("key").isin("user-agent", "allow", "disallow"))
    // group boundary: a User-agent line NOT preceded by another
    // User-agent line starts a new group (consecutive UA lines share)
    val w = Window.partitionBy(idCol).orderBy("pos")
    val sectioned = lines
      .withColumn("is_ua", (col("key") === "user-agent").cast("int"))
      .withColumn("prev_ua", lag(col("is_ua"), 1, 0).over(w))
      .withColumn("section",
        sum(when(col("is_ua") === 1 && col("prev_ua") === 0, 1)
          .otherwise(0)).over(w))
    val agents = sectioned.filter(col("is_ua") === 1)
      .select(col(idCol), col("section"), lower(col("value")).as("agent"))
    // empty rule values match nothing — drop them here
    val ruleLines = sectioned
      .filter(col("is_ua") === 0 && col("value") =!= "")
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
