package graft

import graft.operators.Feeds

/** RSS 2.0 and Atom item extraction: link resolution (element text vs
  * href attribute with rel screening), entity decode, torn/link-less
  * drops, budgets, and adversarial no-throw.
  */
class FeedsSpec extends SparkSpec {

  private val rss =
    """<?xml version="1.0"?><rss version="2.0"><channel>
      |<title>Site</title><link>http://d.example/</link>
      |<item><title>A &amp; B</title><link>http://d.example/p/1?x=1&amp;y=2</link>
      |  <pubDate>Mon, 05 Jan 2026</pubDate></item>
      |<item><title>No link</title><pubDate>x</pubDate></item>
      |<item><title>C</title><link> http://d.example/p/2 </link></item>
      |<item><title>torn""".stripMargin

  private val atom =
    """<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">
      |<title>Site</title><link rel="self" href="http://d.example/feed"/>
      |<entry><title>E1</title>
      |  <link rel="self" href="http://d.example/e/1/meta"/>
      |  <link href="http://d.example/e/1?a=1&amp;b=2"/>
      |  <updated>2026-01-05</updated></entry>
      |<entry><title>E2</title><link rel="alternate" href="http://d.example/e/2"/></entry>
      |<entry><title>enclosure only</title><link rel="enclosure" href="http://d.example/x.mp3"/></entry>
      |</feed>""".stripMargin

  test("RSS: element-text links, entity decode, link-less and torn items drop") {
    val items = Feeds.parseFeed(rss)
    assert(items == Seq(
      Feeds.FeedItem("http://d.example/p/1?x=1&y=2", "A & B", "Mon, 05 Jan 2026"),
      Feeds.FeedItem("http://d.example/p/2", "C", null)))
  }

  test("Atom: href attribute wins; rel=self/enclosure screened; alternate accepted") {
    val items = Feeds.parseFeed(atom)
    assert(items == Seq(
      Feeds.FeedItem("http://d.example/e/1?a=1&b=2", "E1", "2026-01-05"),
      Feeds.FeedItem("http://d.example/e/2", "E2", null)))
    // the channel-level <link rel=self> outside entries never leaks in
    assert(!items.exists(_.url.endsWith("/feed")))
  }

  test("CDATA: wrapped titles and links unwrap LITERALLY (no entity decode inside)") {
    val cd = "<item><title><![CDATA[A & B <raw>]]></title>" +
      "<link><![CDATA[http://d.example/p?a=1&b=2]]></link></item>"
    val items = Feeds.parseFeed(cd)
    assert(items == Seq(Feeds.FeedItem("http://d.example/p?a=1&b=2", "A & B <raw>", null)))
    // entity text OUTSIDE CDATA still decodes
    assert(Feeds.parseFeed("<item><link>http://d.example/?x=1&amp;y=2</link></item>")
      .head.url == "http://d.example/?x=1&y=2")
  }

  test("atomHref: <linkurl …> extension elements are not <link>; name-bounded attrs") {
    val tricky = "<entry><title>T</title>" +
      "<linkurl href=\"http://d.example/WRONG\"/>" +
      "<link data-href=\"http://d.example/ALSO-WRONG\" href=\"http://d.example/right\"/>" +
      "</entry>"
    assert(Feeds.parseFeed(tricky) == Seq(Feeds.FeedItem("http://d.example/right", "T", null)))
    // an entry with ONLY fakes yields no link → item drops
    assert(Feeds.parseFeed("<entry><linkurl href=\"http://x/\"/></entry>").isEmpty)
  }

  test("budgets and degrades: maxItems caps; junk and null never throw") {
    val many = (0 until 20).map(i =>
      s"<item><link>http://d.example/$i</link></item>").mkString
    assert(Feeds.parseFeed(many, maxItems = 7).length == 7)
    // the budget is GLOBAL across both dialect passes — a hybrid
    // document cannot emit 2× maxItems
    val hybrid = (0 until 5).map(i => s"<item><link>http://d.example/r$i</link></item>").mkString +
      (0 until 5).map(i => s"<entry><link href=\"http://d.example/a$i\"/></entry>").mkString
    assert(Feeds.parseFeed(hybrid, maxItems = 7).length == 7)
    assert(Feeds.parseFeed(null).isEmpty)
    assert(Feeds.parseFeed("not a feed at all").isEmpty)
    assert(Feeds.parseFeed("<itemize>not an item</itemize>").isEmpty)
    for (cut <- 0 to rss.length by 11) Feeds.parseFeed(rss.take(cut))
    for (cut <- 0 to atom.length by 11) Feeds.parseFeed(atom.take(cut))
  }

  test("itemRows: distributed walk is map-only") {
    import spark.implicits._
    val df = Seq(("d1.example", rss), ("d2.example", atom)).toDF("domain", "xml")
    val rows = Feeds.itemRows(df, "domain", "xml")
    graft.queries.Q.requireNoShuffle(rows)
    assert(rows.count() == 4)
    val got = rows.collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got.contains(("d2.example", 1, "http://d.example/e/2")))
  }
}
