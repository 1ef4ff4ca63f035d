package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** HTML outlink extraction — the link graph WITHOUT the WAT sidecar.
  * [[Warc.watLinks]] reads Common Crawl's pre-extracted metadata; a
  * SELF-crawled archive has only the raw HTML it fetched, so the graph
  * layer needs the extraction itself: scan each page's `href`/`src`
  * attributes, honor its `<base href>`, resolve every reference
  * against the page URL per RFC 3986 §5, and emit canonical absolute
  * targets ready for [[Graph]]'s domain collapse.
  *
  * Scale shape: map-only end to end — three native codegen
  * expressions (`graft_html_links`, `graft_html_base`,
  * `graft_url_resolve`) and one `explode`; no UDF, no shuffle, no
  * driver state. Per-page CPU is one full link scan plus the
  * `<base>` probe, which early-exits at the first base element (base
  * lives in head, so the probe is ~O(head), not a second full pass).
  * At 100 TB the extraction rides the same scan that read the
  * archive; the first exchange a link-graph consumer pays is its own
  * (the domain collapse), never this layer's.
  */
object Html {

  /** One row PER OUTLINK of each page: every column of `pages` except
    * `htmlCol`, plus `href` — the canonical absolute target. The
    * page's `<base href>` (itself possibly relative — resolved against
    * the page URL first, per WHATWG) rebases relative references;
    * references that resolve outside the http(s) contract
    * (javascript:, mailto:, data:, malformed) drop — the same visible
    * NULL-degrade the URL kernels share — and pages with no resolvable
    * links contribute nothing, like [[Warc.watLinks]]' links-less
    * envelopes. Fragment-only references never leave the page and are
    * dropped at extraction.
    */
  /** `<a href>` ANCHOR pairs of one document: (raw href, the anchor's
    * visible text — nested markup stripped, entities decoded,
    * whitespace collapsed, capped). Anchor text is the label the WEB
    * gives a page — the signal retrieval corpora and query-document
    * pairs are built from — and it lives between tags, which the
    * attribute-only scanner never captures, so this is its own lenient
    * pass: case-insensitive `<a`/`</a>`, href-less and fragment-only
    * anchors skipped, a torn anchor (no close) ends the walk, text
    * budget per anchor. Empty text (image links) survives as "" — the
    * href still carries graph signal.
    */
  def anchorPairs(html: String, maxAnchors: Int = 10000,
      maxTextLen: Int = 512): Seq[(String, String)] = {
    if (html == null) return Seq.empty
    val lower = html.toLowerCase(java.util.Locale.ROOT)
    val out = Vector.newBuilder[(String, String)]
    var i = 0
    var n = 0
    while (n < maxAnchors) {
      val open = lower.indexOf("<a", i)
      if (open < 0) return out.result()
      val after = open + 2
      if (after >= html.length ||
        (html.charAt(after) != ' ' && html.charAt(after) != '>' &&
          html.charAt(after) != '\t' && html.charAt(after) != '\n')) { i = after }
      else {
        val gt = html.indexOf('>', after)
        if (gt < 0) return out.result() // torn open tag
        // attr NAME matches case-free; the VALUE keeps its case (URLs)
        val href = {
          val at = lower.indexOf("href=\"", after)
          if (at < 0 || at >= gt) null
          else {
            val vs = at + 6
            val ve = html.indexOf('"', vs)
            if (ve < 0 || ve > gt) null else XmlDump.decodeEntities(html.substring(vs, ve))
          }
        }
        val close = lower.indexOf("</a", gt + 1)
        if (close < 0) return out.result() // torn anchor
        if (href != null && href.nonEmpty && href.charAt(0) != '#') {
          // visible text: nested tags dropped, entities decoded,
          // whitespace collapsed (display semantics), budget-capped
          val raw = html.substring(gt + 1, close)
          val sb = new java.lang.StringBuilder(math.min(raw.length, maxTextLen))
          var p = 0
          while (p < raw.length && sb.length < maxTextLen) {
            val c = raw.charAt(p)
            if (c == '<') {
              val e = raw.indexOf('>', p + 1)
              p = if (e < 0) raw.length else e + 1
            } else { sb.append(c); p += 1 }
          }
          val text = XmlDump.decodeEntities(sb.toString)
            .replaceAll("\\s+", " ").trim
          out += ((href, text))
          n += 1
        }
        i = close + 3
      }
    }
    out.result()
  }

  /** One row PER ANCHOR of each page: every column of `pages` except
    * `htmlCol`, plus the base-resolved canonical `href` and its
    * `anchor` text — [[outlinks]]' shape with the label attached.
    * Same NULL-drop contract for out-of-contract targets; map-only
    * (the pair extraction explodes, resolution is the codegen
    * expression).
    */
  def anchors(pages: DataFrame, urlCol: String, htmlCol: String): DataFrame = {
    val pass = pages.columns.filterNot(_ == htmlCol).map(col).toSeq
    val pageCanon = GraftFunctions.urlCanon(col(urlCol))
    val base = coalesce(
      GraftFunctions.urlResolve(pageCanon, GraftFunctions.htmlBase(col(htmlCol))),
      pageCanon)
    val pairs = udf((h: String) => anchorPairs(h))
    pages
      .select(pass ++ Seq(
        base.as("__base"),
        explode(pairs(col(htmlCol))).as("__p")): _*)
      .select(pass ++ Seq(
        GraftFunctions.urlResolve(col("__base"), col("__p._1")).as("href"),
        col("__p._2").as("anchor")): _*)
      .filter(col("href").isNotNull)
  }

  def outlinks(pages: DataFrame, urlCol: String, htmlCol: String): DataFrame = {
    val pass = pages.columns.filterNot(_ == htmlCol).map(col).toSeq
    val pageCanon = GraftFunctions.urlCanon(col(urlCol))
    // the effective base: <base href> resolved against the page URL
    // when present (absolute base -> itself; relative base -> merged),
    // the page URL otherwise
    val base = coalesce(
      GraftFunctions.urlResolve(pageCanon, GraftFunctions.htmlBase(col(htmlCol))),
      pageCanon)
    pages
      .select(pass ++ Seq(
        base.as("__base"),
        explode(GraftFunctions.htmlLinks(col(htmlCol))).as("__ref")): _*)
      .select(pass :+
        GraftFunctions.urlResolve(col("__base"), col("__ref")).as("href"): _*)
      .filter(col("href").isNotNull)
  }
}
