package graft.crawl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RobotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val policy =
    """# comments are stripped   # even mid-line
      |User-agent: GraftBot
      |Disallow: /tmp/*.bak$
      |Allow: /tmp/keep/
      |Disallow:
      |Sitemap: https://h/x.xml
      |
      |User-agent: alpha
      |User-agent: beta
      |Disallow: /shared/
      |
      |User-agent: *
      |Disallow: /
      |Allow: /public/
      |""".stripMargin

  private def decide(ua: String, paths: Seq[String]) = {
    val robots = Seq(("h", policy)).toDF("host", "robots_txt")
    val rules = Robots.rules(robots, "host", "robots_txt")
    val urls = paths.zipWithIndex
      .map { case (p, i) => (i.toLong, "h", p) }
      .toDF("url_id", "host", "path")
    Robots.decisions(rules, urls, "host", "url_id", "path", ua)
      .orderBy("url_id")
      .select("path", "allowed", "matched_path")
      .collect()
      .map(r => (r.getString(0), r.getBoolean(1), Option(r.getString(2))))
  }

  test("group selection: specific token (case-insensitive) wins over '*'; unknown UA falls to '*'") {
    // graftbot: only its own group applies — '/' from the '*' group
    // must NOT block it; the empty Disallow matches nothing
    val g = decide("graftbot", Seq("/anything", "/tmp/a.bak", "/public/x"))
    assert(g(0) == ("/anything", true, None))
    assert(g(1) == ("/tmp/a.bak", false, Some("/tmp/*.bak$")))
    assert(g(2) == ("/public/x", true, None))
    // an unknown crawler gets the '*' group: / disallows, /public/ allows
    val u = decide("newbot", Seq("/anything", "/public/x"))
    assert(u(0) == ("/anything", false, Some("/")))
    assert(u(1) == ("/public/x", true, Some("/public/")))
  }

  test("consecutive User-agent lines share one group") {
    for (ua <- Seq("alpha", "beta")) {
      val r = decide(ua, Seq("/shared/doc", "/other"))
      assert(r(0) == ("/shared/doc", false, Some("/shared/")), ua)
      assert(r(1) == ("/other", true, None), ua)
    }
  }

  test("wildcards, end anchor, and longest-match with allow winning ties") {
    // '$' anchors: /tmp/a.bak blocked, /tmp/a.bak.txt not
    val r = decide("graftbot",
      Seq("/tmp/a.bak", "/tmp/a.bak.txt", "/tmp/keep/a.bak"))
    assert(r(0)._2 == false)
    assert(r(1)._2 == true)
    // /tmp/keep/a.bak matches both; disallow '/tmp/*.bak$' (11 chars)
    // beats allow '/tmp/keep/' (10) on length — most-specific wins
    assert(r(2) == ("/tmp/keep/a.bak", false, Some("/tmp/*.bak$")))
    // equal length: allow wins the tie
    val tie =
      """User-agent: bot
        |Disallow: /a/
        |Allow: /a/
        |""".stripMargin
    val rules = Robots.rules(Seq(("h", tie)).toDF("host", "t"), "host", "t")
    val out = Robots.decisions(rules,
        Seq((0L, "h", "/a/x")).toDF("url_id", "host", "path"),
        "host", "url_id", "path", "bot")
      .select("allowed").collect().head.getBoolean(0)
    assert(out)
  }

  test("a rule-less specific group still suppresses the '*' fallback (allow-everything)") {
    // the ubiquitous real-world pattern: 'graftbot may crawl
    // everything, others nothing' — the empty Disallow makes the
    // group rule-less, but its EXISTENCE must keep the '*' policy
    // away from graftbot (review finding: an inner join erased it and
    // blanked the whole host)
    val policy =
      """User-agent: graftbot
        |Disallow:
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    val rules = Robots.rules(
      Seq(("h", policy)).toDF("host", "t"), "host", "t")
    val out = Robots.decisions(rules,
        Seq((0L, "h", "/any/page"), (1L, "h", "/")).toDF(
          "url_id", "host", "path"),
        "host", "url_id", "path", "graftbot")
      .orderBy("url_id").select("allowed").collect()
    assert(out.forall(_.getBoolean(0)), "graftbot must be allowed everywhere")
    // and a crawler with NO group still gets the '*' policy
    val other = Robots.decisions(rules,
        Seq((0L, "h", "/any/page")).toDF("url_id", "host", "path"),
        "host", "url_id", "path", "newbot")
      .select("allowed").collect().head.getBoolean(0)
    assert(!other)
  }

  test("Crawl-delay: group binding, selection, max-wins, bad values ignored") {
    val txt =
      """User-agent: graftbot
        |Crawl-delay: 2
        |Disallow: /x/
        |
        |User-agent: graftbot
        |Crawl-delay: 0.5
        |
        |User-agent: slowbot
        |Crawl-delay: notanumber
        |
        |User-agent: *
        |Crawl-delay: 10
        |""".stripMargin
    val robots = Seq(("h", txt)).toDF("host", "robots_txt")
    def delayFor(ua: String): Option[Long] =
      Robots.crawlDelays(robots, "host", "robots_txt", ua)
        .collect().headOption.map(_.getAs[Long]("crawl_delay_ms"))
    // both graftbot groups combine; the max (most conservative) wins
    assert(delayFor("graftbot").contains(2000L))
    // slowbot's own group has only an unparseable delay -> NO delay
    // (its specific group still suppresses the '*' fallback)
    assert(delayFor("slowbot").isEmpty)
    // unknown crawler falls to '*'
    assert(delayFor("newbot").contains(10000L))
    // fractional seconds survive via the ms unit
    val frac = Seq(("h", "User-agent: a\nCrawl-delay: 0.5\n"))
      .toDF("host", "robots_txt")
    assert(Robots.crawlDelays(frac, "host", "robots_txt", "a")
      .collect().head.getAs[Long]("crawl_delay_ms") == 500L)
  }

  test("Crawl-delay coexists with rules without disturbing them; Sitemap lines are global") {
    // the q257 policy shape: a delay INSIDE the '*' group must not
    // change any allow/disallow decision, and a delay BETWEEN two UA
    // lines ends the consecutive-UA run (it is a group member for the
    // crawlers that honor it)
    val txt =
      """User-agent: a
        |Crawl-delay: 1
        |User-agent: b
        |Disallow: /only-b/
        |Sitemap: https://h/map1.xml
        |
        |User-agent: *
        |Disallow: /
        |Sitemap: https://h/map2.xml
        |""".stripMargin
    val robots = Seq(("h", txt)).toDF("host", "robots_txt")
    val rules = Robots.rules(robots, "host", "robots_txt")
    val urls = Seq((0L, "h", "/only-b/x")).toDF("url_id", "host", "path")
    // 'a' has its own (rule-less) group -> allowed everywhere;
    // 'b' started a NEW group holding the disallow
    assert(Robots.decisions(rules, urls, "host", "url_id", "path", "a")
      .collect().head.getAs[Boolean]("allowed"))
    assert(!Robots.decisions(rules, urls, "host", "url_id", "path", "b")
      .collect().head.getAs[Boolean]("allowed"))
    assert(Robots.crawlDelays(robots, "host", "robots_txt", "a")
      .collect().head.getAs[Long]("crawl_delay_ms") == 1000L)
    // sitemaps surface regardless of group position, deduped
    val maps = Robots.sitemapUrls(robots, "host", "robots_txt")
      .orderBy("sitemap_url").collect().map(_.getString(1)).toSeq
    assert(maps == Seq("https://h/map1.xml", "https://h/map2.xml"))
  }

  test("schedule: per-host slots and fetch offsets, default delay for silent hosts") {
    val allowed = Seq(
      (10L, "h1"), (20L, "h1"), (30L, "h1"),
      (10L, "h2"), (40L, "h2")).toDF("url_id", "host")
    val delays = Seq(("h1", 2000L)).toDF("host", "crawl_delay_ms")
    val plan = Robots.schedule(allowed, delays, "host", "url_id",
        defaultDelayMs = 700L)
      .orderBy("host", "slot")
      .select("host", "slot", "delay_ms", "fetch_at_ms")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(plan == Seq(
      ("h1", 0L, 2000L, 0L), ("h1", 1L, 2000L, 2000L),
      ("h1", 2L, 2000L, 4000L),
      ("h2", 0L, 700L, 0L), ("h2", 1L, 700L, 700L)))
  }

  test("pathRegex: metacharacters stay literal, '*' and trailing '$' translate") {
    val df = Seq("/a+b(c)/*x$", "/plain").toDF("p")
      .select(Robots.pathRegex(col("p")).as("rx")).collect()
    assert(df(0).getString(0) == "^/a\\+b\\(c\\)/.*x$")
    assert(df(1).getString(0) == "^/plain")
    // and the translated pattern actually matches as intended
    val m = Seq(("/a+b(c)/zzx", true), ("/a+b(c)/zzxy", false))
      .toDF("path", "want")
      .withColumn("rx", lit("^/a\\+b\\(c\\)/.*x$"))
      .withColumn("got", regexp_like(col("path"), col("rx")))
      .collect()
    m.foreach(r => assert(r.getBoolean(3) == r.getBoolean(1), r.getString(0)))
  }
}
