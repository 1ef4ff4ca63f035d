package graft.operators

import org.apache.spark.sql.DataFrame

/** RSS/Atom feed-item extraction — the SECOND frontier-discovery
  * channel next to sitemaps ([[Robots.parseSitemapLocs]]): sites that
  * publish continuously announce new URLs in their feeds long before
  * any sitemap regenerates, so a freshness-driven crawl reads both.
  * Same lenient hand-rolled scanning as the rest of the XML family
  * ([[XmlDump]]'s element walk): no DTD, entity decode only, torn
  * final items dropped, item budget bounds a hostile feed.
  *
  * Both dialects under one extractor:
  *   - RSS 2.0: `<item>` blocks, `<link>` element TEXT, `<pubDate>`;
  *   - Atom: `<entry>` blocks, `<link href="…">` ATTRIBUTE (the
  *     `rel="alternate"`/unmarked link wins over self/edit/enclosure
  *     rels), `<updated>`.
  *
  * Map-only over (domain, xml) rows; the output shape feeds the same
  * canonicalize → dedup → politeness chain sitemap discovery uses.
  * Reference scope: north-star crawl surface (the reference ingests
  * line JSON only — `App.java:136-162`).
  */
object Feeds {

  /** One feed item. `updated` is the raw date string (`pubDate` /
    * `updated`) or null — parsing timestamps is the caller's policy.
    */
  final case class FeedItem(url: String, title: String, updated: String)

  /** Atom link resolution inside [from, until): the first
    * `<link … href>` whose `rel` is absent or `alternate`
    * ([[XmlDump.attrValue]] — the shared lenient attribute parse).
    */
  private def atomHref(s: String, from: Int, until: Int): String = {
    var p = from
    while (p < until) {
      val open = s.indexOf("<link", p)
      if (open < 0 || open >= until) return null
      // name boundary: "<linkurl …>" (an extension element) is NOT a
      // <link> — the char after must end the name, same screen the
      // item/entry walk applies
      val after = open + 5
      if (after >= s.length ||
        (s.charAt(after) != '>' && s.charAt(after) != ' ' && s.charAt(after) != '/' &&
          s.charAt(after) != '\t' && s.charAt(after) != '\r' && s.charAt(after) != '\n')) {
        p = after
      } else {
        val gt = s.indexOf('>', open)
        if (gt < 0 || gt >= until) return null
        val tag = s.substring(open, gt)
        val rel = XmlDump.attrValue(tag, "rel")
        val href = XmlDump.attrValue(tag, "href")
        if (href != null && (rel == null || rel == "alternate")) return href
        p = gt + 1
      }
    }
    null
  }

  /** Extract every complete item/entry in document order. Items
    * without a resolvable link are dropped (nothing to crawl).
    */
  def parseFeed(xml: String, maxItems: Int = 10000): Seq[FeedItem] = {
    if (xml == null) return Seq.empty
    val out = Vector.newBuilder[FeedItem]
    // one pass per dialect: a document is one or the other, and a
    // malformed hybrid simply contributes whichever blocks complete —
    // under ONE item budget across both passes (per-pass counters
    // would let a hybrid emit 2× maxItems)
    var n = 0
    for ((openTag, closeTag, atom) <- Seq(("<item", "</item>", false), ("<entry", "</entry>", true))) {
      var p = 0
      var done = false
      while (!done && n < maxItems) {
        val open = xml.indexOf(openTag, p)
        if (open < 0) done = true
        else {
          val after = open + openTag.length
          if (after >= xml.length || (xml.charAt(after) != '>' && xml.charAt(after) != ' ')) p = after
          else {
            val close = xml.indexOf(closeTag, open)
            if (close < 0) done = true // torn final item
            else {
              val link =
                if (atom) atomHref(xml, open, close)
                else XmlDump.firstElem(xml, "link", open, close)
              val title = XmlDump.firstElem(xml, "title", open, close)
              val updated =
                if (atom) XmlDump.firstElem(xml, "updated", open, close)
                else XmlDump.firstElem(xml, "pubDate", open, close)
              if (link != null && link.trim.nonEmpty) {
                out += FeedItem(link.trim, title, updated)
                n += 1
              }
              p = close + closeTag.length
            }
          }
        }
      }
    }
    out.result()
  }

  /** Item rows per feed blob: (domain, item_idx, url, title, updated).
    * Map-only.
    */
  def itemRows(df: DataFrame, domainCol: String, xmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(domainCol), df(xmlCol))
      .as[(String, String)]
      .flatMap { case (d, xml) =>
        parseFeed(xml).zipWithIndex.map { case (it, i) => (d, i, it.url, it.title, it.updated) }
      }
      .toDF(domainCol, "item_idx", "url", "title", "updated")
  }
}
