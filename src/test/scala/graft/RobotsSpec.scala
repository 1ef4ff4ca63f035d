package graft

import org.apache.spark.sql.functions._

import graft.operators.Robots

/** robots.txt parsing (RFC 9309 group structure) and the conservative
  * politeness screen: group selection, longest-prefix decisions,
  * allow-wins-ties, safe-direction wildcard handling, defaults.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  test("parseRobots: groups, comments, multi-agent headers, directives mid-group") {
    val txt =
      """# a comment line
        |User-agent: A
        |User-agent: B
        |Disallow: /x   # trailing comment
        |Crawl-delay: 10
        |Allow: /x/ok
        |
        |User-agent: *
        |Disallow: /y
        |Sitemap: http://s.example/map.xml
        |Disallow: /z
        |not a directive
        |Disallow
        |""".stripMargin
    val got = Robots.parseRobots("d.com", txt)
    // both agents of the first group carry both rules; the unknown
    // directives and malformed lines neither emit nor break the group
    assert(got.toSet == Set(
      Robots.RobotsRule("d.com", "a", "disallow", "/x"),
      Robots.RobotsRule("d.com", "b", "disallow", "/x"),
      Robots.RobotsRule("d.com", "a", "allow", "/x/ok"),
      Robots.RobotsRule("d.com", "b", "allow", "/x/ok"),
      Robots.RobotsRule("d.com", "*", "disallow", "/y"),
      Robots.RobotsRule("d.com", "*", "disallow", "/z")))
    // a user-agent line AFTER rules starts a NEW group
    val regroup = Robots.parseRobots("d.com",
      "User-agent: a\nDisallow: /1\nUser-agent: b\nDisallow: /2\n")
    assert(regroup.toSet == Set(
      Robots.RobotsRule("d.com", "a", "disallow", "/1"),
      Robots.RobotsRule("d.com", "b", "disallow", "/2")))
    // rules before any user-agent line are dropped; null text is empty
    assert(Robots.parseRobots("d.com", "Disallow: /x\n").isEmpty)
    assert(Robots.parseRobots("d.com", null).isEmpty)
  }

  private def screen(rulesTxt: Map[String, String], agent: String,
      urls: Seq[(Long, String, String)]): Map[Long, Boolean] = {
    val rules = Robots.rules(
      rulesTxt.toSeq.toDF("domain", "robots_txt"), "domain", "robots_txt")
    Robots.politenessScreen(
      urls.toDF("doc_id", "domain", "path"), rules, agent)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("allowed")).toMap
  }

  test("politenessScreen: longest prefix, allow-ties, wildcards, group selection, defaults") {
    val txt = Map("d.com" ->
      """User-agent: *
        |Disallow: /private
        |Allow: /private/ok
        |Disallow: /cgi*bin
        |Allow: /wild*card
        |Disallow: /wild
        |Disallow:
        |""".stripMargin)
    val got = screen(txt, "anybot", Seq(
      (0L, "d.com", "/private/x"),      // disallowed
      (1L, "d.com", "/private/ok/y"),   // longer allow wins
      (2L, "d.com", "/public/z"),       // no rule -> default allowed
      (3L, "d.com", "/cgi-bin/q"),      // wildcard disallow WIDENS to /cgi
      (4L, "d.com", "/wild-card/r"),    // wildcard allow DROPS; /wild disallows
      (5L, "e.com", "/private/x")))     // no robots for the domain -> allowed
    assert(got == Map(0L -> false, 1L -> true, 2L -> true, 3L -> false,
      4L -> false, 5L -> true))

    // the specific agent's group is used ALONE when present
    val grouped = Map("d.com" ->
      "User-agent: *\nDisallow: /\nUser-agent: me\nDisallow: /private\n")
    val sel = screen(grouped, "ME", Seq(
      (0L, "d.com", "/public/x"), (1L, "d.com", "/private/x")))
    assert(sel == Map(0L -> true, 1L -> false),
      "star group must be ignored when the specific group exists")

    // allow-wins-ties at EQUAL length; "Disallow: *" is the weakest
    // match-all, outranked by any longer allow
    val ties = Map("d.com" ->
      "User-agent: *\nDisallow: /a/b\nAllow: /a/c\nDisallow: *\n")
    val tied = screen(ties, "x", Seq(
      (0L, "d.com", "/a/b1"), (1L, "d.com", "/a/c1"), (2L, "d.com", "/q")))
    assert(tied == Map(0L -> false, 1L -> true, 2L -> false))
  }

  test("parseCrawlDelays: shared group walk, fractions, caps, invalid skipped") {
    val txt =
      """User-agent: A
        |User-agent: B
        |Crawl-delay: 2
        |Allow: /ok
        |
        |User-agent: *
        |Crawl-delay: 1.5
        |Crawl-delay: fast
        |Crawl-delay: -3
        |Crawl-delay: 90000
        |""".stripMargin
    val got = Robots.parseCrawlDelays("d.com", txt)
    assert(got.toSet == Set(
      ("d.com", "a", 2000L), ("d.com", "b", 2000L),
      ("d.com", "*", 1500L),
      ("d.com", "*", 3600000L))) // 90000 s caps at one hour
    // crawl-delay CLOSES a header run: a later User-agent starts the
    // NEXT group, exactly like allow/disallow (the shared walk)
    val regroup = Robots.parseCrawlDelays("d.com",
      "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nCrawl-delay: 2\n")
    assert(regroup.toSet == Set(("d.com", "a", 1000L), ("d.com", "b", 2000L)))
    // millisecond precision parses; sub-millisecond digits are out of
    // the 3-digit regex contract and the directive is skipped
    assert(Robots.parseCrawlDelays("d.com", "User-agent: *\nCrawl-delay: 0.25\n")
      == Seq(("d.com", "*", 250L)))
    assert(Robots.parseCrawlDelays("d.com", "User-agent: *\nCrawl-delay: 0.2500\n").isEmpty)
    assert(Robots.parseCrawlDelays("d.com", null).isEmpty)
  }

  test("a crawl-delay-only agent group still falls back to the * rules (conservative)") {
    // "User-agent: slowbot / Crawl-delay: 10" opens a group whose only
    // rule is the delay; parseRobots keeps no allow/disallow rows for
    // slowbot, so the SCREEN's group selection falls back to the `*`
    // rules and /private stays blocked — the over-block direction
    // (strict RFC group-used-alone would leave slowbot unrestricted)
    val txt = "User-agent: slowbot\nCrawl-delay: 10\n\nUser-agent: *\nDisallow: /private\n"
    val rules = Robots.effectiveRules(Robots.parseRobots("d.com", txt), "slowbot")
    assert(rules == Seq(("d.com", "/private", false)))
    // while the DELAY selection sees the specific group used alone
    assert(Robots.effectiveDelays(Robots.parseCrawlDelays("d.com", txt), "slowbot")
      == Seq(("d.com", 10000L)))
  }

  test("effectiveDelays + effectiveDelayFrame: group selection, max collapse, parity") {
    val parsed =
      Robots.parseCrawlDelays("a.com",
        "User-agent: graftbot\nCrawl-delay: 2\nUser-agent: *\nCrawl-delay: 10\n") ++
      Robots.parseCrawlDelays("b.com", "User-agent: *\nCrawl-delay: 1.5\n") ++
      Robots.parseCrawlDelays("c.com",
        "User-agent: *\nCrawl-delay: 3\n\nUser-agent: *\nCrawl-delay: 0.5\n") ++
      Robots.parseCrawlDelays("d.com", "User-agent: *\nDisallow: /x\n")
    val eff = Robots.effectiveDelays(parsed, "GraftBot")
    // specific agent's groups used ALONE (2000, not max(2000, 10000));
    // star fallback; max collapse across star groups; d.com absent
    assert(eff == Seq(("a.com", 2000L), ("b.com", 1500L), ("c.com", 3000L)))
    // the distributed twin computes the identical table
    val frame = Robots.effectiveDelayFrame(
      parsed.toDF("domain", "agent", "delay_ms"), "graftbot")
      .collect().map(r => (r.getAs[String]("domain"), r.getAs[Long]("delay_ms")))
      .toSeq.sortBy(_._1)
    assert(frame == eff)
  }

  test("parseSitemapLocs: loc extraction, entity decode, trim, lenient endings") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>http://a.com/x</loc><lastmod>2025-01-01</lastmod></url>
        |<url><loc> http://a.com/q?a=1&amp;b=2 </loc></url>
        |<url><loc>http://a.com/esc&amp;lt;tag</loc></url>
        |</urlset>""".stripMargin
    assert(Robots.parseSitemapLocs(xml) == Seq(
      "http://a.com/x",
      "http://a.com/q?a=1&b=2",
      // a double-escaped &amp;lt; is a literal "&lt;", never "<"
      "http://a.com/esc&lt;tag"))
    // sitemap INDEX files use <sitemap><loc> — same extraction
    assert(Robots.parseSitemapLocs(
      "<sitemapindex><sitemap><loc>http://a.com/s1.xml</loc></sitemap></sitemapindex>")
      == Seq("http://a.com/s1.xml"))
    // unterminated loc ends the walk with the intact prefix; null is empty
    assert(Robots.parseSitemapLocs(
      "<url><loc>http://a.com/1</loc><url><loc>http://a.com/trunc")
      == Seq("http://a.com/1"))
    assert(Robots.parseSitemapLocs(null).isEmpty)
    assert(Robots.parseSitemapLocs("no locs at all").isEmpty)
    // distributed explode is map-only
    val df = Robots.sitemapUrls(
      Seq((1L, xml)).toDF("media_id", "xml"), "media_id", "xml")
    graft.queries.Q.requireNoShuffle(df)
    assert(df.count() == 3L)
  }

  test("politenessScreen: groups by idCol — map-typed passthrough survives, duplicate ids collapse") {
    // the rating must collapse the rule-join fan-out by the unique id
    // ALONE: grouping by every column broke on non-orderable types
    // (here a map column) and silently merged fully-duplicate rows
    val rules = Robots.rules(
      Seq(("d.com", "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"))
        .toDF("domain", "robots_txt"), "domain", "robots_txt")
    val urls = Seq(
      (0L, "d.com", "/private/ok/x"), // BOTH rules match: 2-row fan-out
      (1L, "d.com", "/private/no"),
      (2L, "d.com", "/public"))
      .toDF("doc_id", "domain", "path")
      .withColumn("props", map(lit("k"), col("doc_id"))) // non-orderable
    val out = Robots.politenessScreen(urls, rules, "anybot").collect()
    assert(out.length == 3, out.mkString(";"))
    val got = out.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Boolean]("allowed"), r.getAs[Map[String, Long]]("props")("k")))).toMap
    assert(got == Map(0L -> ((true, 0L)), 1L -> ((false, 1L)), 2L -> ((true, 2L))),
      got.toString)
    // rows SHARING an id (outside the unique-id contract) collapse to one
    val dup = Seq((7L, "d.com", "/public"), (7L, "d.com", "/public"))
      .toDF("doc_id", "domain", "path")
    assert(Robots.politenessScreen(dup, rules, "anybot").count() == 1L)
  }

  test("parseSitemapDirectives: location-independent, any case, comments strip, URL colon safe") {
    val txt =
      """# header comment
        |Sitemap: http://a.com/sm1.xml
        |User-agent: *
        |Disallow: /x
        |SITEMAP: http://a.com/sm2.xml # mirror
        |sitemap:http://a.com/sm3.xml
        |Sitemap:
        |NotSitemap: http://a.com/no.xml
        |""".stripMargin
    // the URL's own colon must not confuse the directive split, empty
    // values drop, and a directive INSIDE a group block still parses
    // (location-independent per sitemaps.org)
    assert(Robots.parseSitemapDirectives(txt) == Seq(
      "http://a.com/sm1.xml", "http://a.com/sm2.xml", "http://a.com/sm3.xml"))
    assert(Robots.parseSitemapDirectives(null).isEmpty)
    // and the GROUP walk still ignores sitemap lines without breaking
    // the group (the directive is not a rule)
    val rules = Robots.parseRobots("a.com", txt)
    assert(rules == Seq(Robots.RobotsRule("a.com", "*", "disallow", "/x")))
    // batch pointer extraction is map-only
    val df = Robots.sitemapPointers(
      Seq(("a.com", txt)).toDF("domain", "robots_txt"), "domain", "robots_txt")
    graft.queries.Q.requireNoShuffle(df)
    assert(df.count() == 3L)
  }

  test("politenessScreen: past the rules guard the rating degrades to a shuffle join — no plan literals") {
    // a web-scale robots table (1e5 domains here; 1e7-1e8 in the wild)
    // must never collect to the driver or enter the plan text — the
    // same count-guard discipline as Frontier.scheduleJoined
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val rules = spark.range(0, 100000).select(
        concat(lit("d"), col("id"), lit(".com")).as("domain"),
        lit("*").as("agent"), lit("disallow").as("rule"),
        lit("/private").as("path"))
      val urls = spark.range(0, 1000).select(
        col("id").as("doc_id"),
        concat(lit("d"), col("id") % 500, lit(".com")).as("domain"),
        when(col("id") % 2 === 0, lit("/private/x"))
          .otherwise(lit("/public/x")).as("path"))
      val out = Robots.politenessScreen(urls, rules, "anybot",
        maxBroadcastRules = 1000L)
      // shuffle join on the domain + the rating groupBy — and the rule
      // table never appears in the plan text
      graft.queries.Q.requireMaxShuffles(out, 3)
      assert(graft.queries.Q.planNodes(out).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]))
      assert(!out.queryExecution.executedPlan.toString.contains("d77777.com"))
      val got = out.collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Boolean]("allowed")).toMap
      assert(got.size == 1000)
      assert((0L until 1000L).forall(i => got(i) == (i % 2 != 0)), "closed-form drift")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("rulesWithAvailability: RFC 9309 fetch-status semantics per bucket") {
    val fetches = Seq(
      ("ok.com", 200, "User-agent: *\nDisallow: /p\n"),
      ("gone.com", 404, null: String),          // unavailable: unrestricted
      ("moved.com", 301, null: String),         // terminal 3xx: unavailable
      ("down.com", 503, null: String),          // unreachable: total disallow
      ("torn.com", -1, null: String))           // torn fetch: total disallow
      .toDF("domain", "status", "txt")
    val rules = Robots.rulesWithAvailability(fetches, "domain", "status", "txt")
      .collect().map(r => (r.getAs[String]("domain"), r.getAs[String]("rule"),
        r.getAs[String]("path"))).toSet
    assert(rules == Set(
      ("ok.com", "disallow", "/p"),
      ("down.com", "disallow", "/"),
      ("torn.com", "disallow", "/")), rules.toString)
    // rated end to end: the synthetic disallow-"/" blocks EVERY path
    val urls = Seq(
      (0L, "ok.com", "/p/x"), (1L, "ok.com", "/q"),
      (2L, "gone.com", "/anything"), (3L, "moved.com", "/x"),
      (4L, "down.com", "/x"), (5L, "torn.com", "/")).toDF("doc_id", "domain", "path")
    val got = Robots.politenessScreen(urls,
      Robots.rulesWithAvailability(fetches, "domain", "status", "txt"), "anybot")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("allowed")).toMap
    assert(got == Map(0L -> false, 1L -> true, 2L -> true, 3L -> true,
      4L -> false, 5L -> false), got.toString)
  }

  test("allowedColumn: the map-side decision equals the distributed screen on every case") {
    val texts = Map(
      "d.com" ->
        """User-agent: *
          |Disallow: /private
          |Allow: /private/ok
          |Disallow: /cgi*bin
          |Allow: /wild*card
          |Disallow: /wild
          |Disallow:
          |""".stripMargin,
      "e.com" ->
        "User-agent: *\nDisallow: /\nUser-agent: me\nDisallow: /private\nAllow: /private/ok\n")
    val paths = Seq("/private/x", "/private/ok/y", "/public", "/cgi-bin/q",
      "/wild-card", "/", "/index")
    val urls = (for {
      (d, di) <- Seq("d.com", "e.com", "f.org").zipWithIndex
      (p, pi) <- paths.zipWithIndex
    } yield ((di * 100 + pi).toLong, d, p))
    val parsed = texts.toSeq.flatMap { case (d, t) => Robots.parseRobots(d, t) }
    for (agent <- Seq("me", "otherbot")) {
      val viaScreen = screen(texts, agent, urls)
      val rules = Robots.effectiveRules(parsed, agent)
      val viaColumn = urls.toDF("doc_id", "domain", "path")
        .withColumn("allowed",
          Robots.allowedColumn(rules, col("domain"), col("path")))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("allowed")).toMap
      assert(viaColumn == viaScreen, s"agent=$agent drifted between paths")
      // the column is a pure projection — shuffle-free, streaming-safe
      val plan = urls.toDF("doc_id", "domain", "path")
        .select(Robots.allowedColumn(rules, col("domain"), col("path")))
      graft.queries.Q.requireNoShuffle(plan)
    }
    // empty rule set: everything allowed
    assert(Robots.effectiveRules(Nil, "x").isEmpty)
    val allTrue = urls.toDF("doc_id", "domain", "path")
      .withColumn("a", Robots.allowedColumn(Nil, col("domain"), col("path")))
      .collect().forall(_.getAs[Boolean]("a"))
    assert(allTrue)
  }

  test("resolveRedirects: chains, loops, dangling targets, the hop budget") {
    import spark.implicits._
    val led = Seq(
      ("u0", 301, "u1"), ("u1", 302, "u2"), ("u2", 200, null),
      ("v0", 301, "v1"), ("v1", 301, "v0"),          // a 2-cycle
      ("w0", 307, "w9"),                             // dangling target
      ("x0", 303, null),                             // 3xx without Location
      ("y0", 301, "y1"), ("y1", 301, "y2"), ("y2", 301, "y3"),
      ("y3", 301, "y4"), ("y4", 301, "y5"), ("y5", 200, null))
      .toDF("url", "status", "location")
    val out = Robots.resolveRedirects(led, "url", "status", "location")
      .collect().map(r => r.getAs[String]("start_url") ->
        ((r.getAs[String]("final_url"), r.getAs[Int]("final_status"),
          r.getAs[Int]("hops"), r.getAs[Boolean]("exhausted")))).toMap
    assert(out("u0") == (("u2", 200, 2, false)))
    assert(out("u1") == (("u2", 200, 1, false)))
    assert(out("v0") == (("v1", 301, 5, true)))  // loop exhausts the budget
    assert(out("w0") == (("w9", -1, 1, false)))  // unfetched target: torn
    assert(out("x0") == (("x0", 303, 0, false))) // malformed: terminal as-is
    assert(out("y0") == (("y5", 200, 5, false))) // exactly the RFC's 5 hops
    // a tighter budget exhausts the same chain
    val tight = Robots.resolveRedirects(led, "url", "status", "location", maxHops = 3)
      .collect().map(r => r.getAs[String]("start_url") ->
        r.getAs[Boolean]("exhausted")).toMap
    assert(tight("y0") && !tight("u0"))
    // a URL fetched TWICE (a stale 503 retry + a later 200) collapses
    // to its most-successful row BEFORE the walk — one output row per
    // distinct url, chains resolve through the success, and the stale
    // failure cannot fan chains out through the hop joins
    val dup = Seq(
      ("a0", 301, "r.txt"),
      ("r.txt", 503, null), ("r.txt", 200, null), ("r.txt", 503, null))
      .toDF("url", "status", "location")
    val viaDup = Robots.resolveRedirects(dup, "url", "status", "location")
      .collect().map(r => r.getAs[String]("start_url") ->
        ((r.getAs[String]("final_url"), r.getAs[Int]("final_status")))).toMap
    assert(viaDup.size == 2) // one row per DISTINCT url
    assert(viaDup("a0") == (("r.txt", 200)))
    // ...and rulesViaRedirects takes the SUCCESSFUL fetch's rules, not
    // a union of the stale failure's disallow-all with them
    val dupRules = Robots.rulesViaRedirects(
      Seq(("d.example", "http://d.example/robots.txt")).toDF("domain", "url"),
      Seq(
        ("http://d.example/robots.txt", 301, "http://cdn.example/r", null),
        ("http://cdn.example/r", 503, null, null),
        ("http://cdn.example/r", 200, null, "User-agent: *\nDisallow: /a1\n"))
        .toDF("url", "status", "location", "text"))
      .collect().map(r => (r.getAs[String]("rule"), r.getAs[String]("path"))).toSet
    assert(dupRules == Set(("disallow", "/a1")))
  }

  test("parse limit: rules past the RFC 9309 §2.5 500 KiB cap are ignored, boundary clean") {
    // a directive fully BEFORE the cap applies; one fully PAST it is
    // ignored; the line STRADDLING the cap still parses whole (the cut
    // lands on the next line boundary — no half-parsed rule)
    val pad = "# filler comment line\n" * (Robots.ParseLimitBytes / 22 + 1)
    assert(pad.length > Robots.ParseLimitBytes)
    val before = "User-agent: *\nDisallow: /early\n"
    val txt = before + pad + "Disallow: /late\n"
    val rules = Robots.parseRobots("d.com", txt)
    assert(rules.map(_.path).contains("/early"))
    assert(!rules.map(_.path).contains("/late"))
    // straddling: place the cap INSIDE a rule line — it must parse whole
    val head = before + ("#x\n" * ((Robots.ParseLimitBytes - before.length - 10) / 3))
    val straddle = head + "Disallow: /straddling-rule-path\n"
    assert(head.length < Robots.ParseLimitBytes &&
      head.length + 20 > Robots.ParseLimitBytes)
    assert(Robots.parseRobots("d.com", straddle)
      .map(_.path).contains("/straddling-rule-path"))
    // under the cap: untouched
    assert(Robots.parseRobots("d.com", before).map(_.path) == Seq("/early"))
  }

  test("parse limit counts UTF-8 octets, not UTF-16 chars") {
    // 'é' is 1 char but 2 UTF-8 bytes: a comment pad whose CHAR length
    // stays well under the cap while its BYTE length crosses it must
    // still truncate at the byte horizon (r15 advice — the wire
    // document and the RFC's "500 kibibytes" both speak in octets)
    val line = "# " + ("é" * 20) + "\n" // 23 chars, 43 UTF-8 bytes
    val pad = line * (Robots.ParseLimitBytes / 43 + 2)
    assert(pad.length < Robots.ParseLimitBytes) // chars under the cap...
    assert(pad.getBytes("UTF-8").length > Robots.ParseLimitBytes) // ...bytes over
    val txt = "User-agent: *\nDisallow: /early\n" + pad + "Disallow: /late\n"
    val rules = Robots.parseRobots("d.com", txt)
    assert(rules.map(_.path).contains("/early"))
    assert(!rules.map(_.path).contains("/late"))
  }

  test("exact wildcard matching: map-side == distributed, regex corners") {
    import spark.implicits._
    // regex derivation: escapes, mid-pattern $ literal, ** collapse,
    // trailing anchor
    assert(Robots.robotsPatternRegex("/a*b$") == "^/a.*b$")
    assert(Robots.robotsPatternRegex("/p?x=(1)") == "^/p\\?x=\\(1\\)")
    assert(Robots.robotsPatternRegex("/a$b") == "^/a\\$b")
    assert(Robots.robotsPatternRegex("/**z") == "^/.*.*z")
    val txt = "User-agent: *\nDisallow: /\nAllow: /pub*\n" +
      "Disallow: /*.pdf$\nDisallow: /a/*/secret\nAllow: /a/open$\n"
    val parsed = Seq("d.com", "e.com").flatMap(d => Robots.parseRobots(d, txt))
    val exact = Robots.effectiveRulesExact(parsed, "bot")
    val paths = Seq("/pub/x", "/other", "/pub/doc.pdf", "/a/b/secret",
      "/a/open", "/a/openx", "/pub/sub/file.pdf", "/", "/a$b")
    val urls = (for ((d, di) <- Seq("d.com", "e.com").zipWithIndex;
      (p, pi) <- paths.zipWithIndex) yield ((di * 100 + pi).toLong, d, p))
      .toDF("doc_id", "domain", "path")
    val viaColumn = urls
      .withColumn("allowed",
        Robots.allowedColumnExact(exact, col("domain"), col("path")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("allowed")).toMap
    val viaScreen = Robots.politenessScreenExact(urls, parsed.toDF(), "bot")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("allowed")).toMap
    assert(viaColumn == viaScreen, "map-side and distributed exact screens drifted")
    // the carve-out the conservative screen cannot express: /pub*
    // admits /pub/x over Disallow: /; the anchored allow admits
    // /a/open and NOT /a/openx; /*.pdf$ (7 octets) outranks /pub* (5)
    for (base <- Seq(0L, 100L)) {
      assert(viaColumn(base + 0) && !viaColumn(base + 1))
      assert(!viaColumn(base + 2) && !viaColumn(base + 3))
      assert(viaColumn(base + 4) && !viaColumn(base + 5))
      assert(!viaColumn(base + 6) && !viaColumn(base + 7))
    }
    // map-side exactness is shuffle-free (streaming-safe)
    graft.queries.Q.requireNoShuffle(urls.select(
      Robots.allowedColumnExact(exact, col("domain"), col("path"))))
    // empty rules: everything allowed
    assert(Robots.effectiveRulesExact(Nil, "x").isEmpty)
  }

  test("politenessScreenAudit: both verdicts equal their solo screens, per row") {
    import spark.implicits._
    // wildcard-rich rules where the two semantics genuinely diverge
    val txt = "User-agent: *\nDisallow: /\nAllow: /pub*\n" +
      "Disallow: /*.pdf$\nDisallow: /a/*/secret\nAllow: /a/open$\n"
    val parsed = Seq("d.com", "e.com").flatMap(d => Robots.parseRobots(d, txt))
    val paths = Seq("/pub/x", "/other", "/pub/doc.pdf", "/a/b/secret",
      "/a/open", "/a/openx", "/pub/sub/file.pdf", "/", "/a$b")
    val urls = (for ((d, di) <- Seq("d.com", "e.com").zipWithIndex;
      (p, pi) <- paths.zipWithIndex) yield ((di * 100 + pi).toLong, d, p))
      .toDF("doc_id", "domain", "path")
    def byId(df: org.apache.spark.sql.DataFrame, c: String) =
      df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean](c)).toMap
    val audit = Robots.politenessScreenAudit(urls, parsed.toDF(), "bot")
    assert(audit.columns.toSeq ==
      urls.columns.toSeq ++ Seq("allowed", "allowed_conservative"))
    // the exact verdict IS politenessScreenExact's, row for row
    assert(byId(audit, "allowed") ==
      byId(Robots.politenessScreenExact(urls, parsed.toDF(), "bot"), "allowed"))
    // the conservative verdict IS politenessScreen's, row for row
    assert(byId(audit, "allowed_conservative") ==
      byId(Robots.politenessScreen(urls, parsed.toDF(), "bot"), "allowed"))
    // and the fixture really exercises the over-block: /pub/x is
    // exact-allowed (Allow: /pub*) but conservative-denied (the
    // wildcard allow drops, Disallow: / widens to everything)
    val over = audit.filter(col("allowed") && !col("allowed_conservative"))
      .select("path").as[String].collect().toSet
    assert(over == Set("/pub/x", "/a/open"))
    // one join + one groupBy: the audit costs what either screen costs
    graft.queries.Q.requireMaxShuffles(audit, 2)
  }

  test("sitemapLocsVia: index hop, gzip decode, torn/unfetched/nested degrades") {
    import spark.implicits._
    import graft.operators.CompressedMeta.gzipMember
    def urlset(locs: String*): String =
      s"<urlset>${locs.map(l => s"<url><loc>$l</loc></url>").mkString}</urlset>"
    def index(locs: String*): String =
      s"<sitemapindex>${locs.map(l => s"<sitemap><loc>$l</loc></sitemap>").mkString}</sitemapindex>"
    // decodeSitemapPayload: plain, gzipped, torn gzip, junk utf-8
    assert(Robots.decodeSitemapPayload(urlset("u").getBytes("UTF-8")) == urlset("u"))
    assert(Robots.decodeSitemapPayload(
      gzipMember(urlset("u").getBytes("UTF-8"))) == urlset("u"))
    assert(Robots.decodeSitemapPayload(
      java.util.Arrays.copyOf(gzipMember(urlset("u").getBytes("UTF-8")), 14)) == null)
    assert(Robots.decodeSitemapPayload(null) == null)
    val pointers = Seq(
      ("a.com", "http://a.com/idx.gz"),   // index → two children (one gz, one plain)
      ("b.com", "http://b.com/flat.xml"), // plain urlset
      ("c.com", "http://c.com/never"),    // never fetched
      ("e.com", "http://e.com/nest.xml")) // index → index (out of protocol)
      .toDF("domain", "sitemap_url")
    val fetches = Seq(
      ("http://a.com/idx.gz",
        gzipMember(index("http://a.com/s1.gz", "http://a.com/s2.xml").getBytes("UTF-8"))),
      ("http://a.com/s1.gz", gzipMember(urlset("http://a.com/p1").getBytes("UTF-8"))),
      ("http://a.com/s2.xml", urlset("http://a.com/p2", "http://a.com/p3").getBytes("UTF-8")),
      ("http://b.com/flat.xml", urlset("http://b.com/q1").getBytes("UTF-8")),
      ("http://e.com/nest.xml", index("http://e.com/inner.xml").getBytes("UTF-8")),
      ("http://e.com/inner.xml", index("http://e.com/deeper.xml").getBytes("UTF-8")))
      .toDF("url", "payload")
    val got = Robots.sitemapLocsVia(pointers, fetches)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("a.com", "http://a.com/p1"), ("a.com", "http://a.com/p2"),
      ("a.com", "http://a.com/p3"), ("b.com", "http://b.com/q1")))
  }

  test("rulesViaRedirects: terminal body binds to the ORIGINAL authority") {
    import spark.implicits._
    val txt = "User-agent: *\nDisallow: /a1\n"
    val starts = Seq(("orig.example", "http://orig.example/robots.txt"))
      .toDF("domain", "url")
    val fetches = Seq(
      ("http://orig.example/robots.txt", 301, "http://cdn.example/r.txt", null),
      ("http://cdn.example/r.txt", 200, null, txt))
      .toDF("url", "status", "location", "text")
    val rows = Robots.rulesViaRedirects(starts, fetches)
      .collect().map(r => (r.getAs[String]("domain"), r.getAs[String]("rule"),
        r.getAs[String]("path"))).toSet
    // the rule row carries the ORIGINAL domain, not the CDN host
    assert(rows == Set(("orig.example", "disallow", "/a1")))
    // a start absent from the ledger is unreachable → disallow all
    val missing = Robots.rulesViaRedirects(
      Seq(("gone.example", "http://gone.example/robots.txt")).toDF("domain", "url"),
      fetches)
      .collect().map(r => (r.getAs[String]("domain"), r.getAs[String]("rule"),
        r.getAs[String]("path"))).toSet
    assert(missing == Set(("gone.example", "disallow", "/")))
  }
}
