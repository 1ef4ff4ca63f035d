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

  /** `<a href>` ANCHOR pairs of one document: (raw href, the anchor's
    * visible text — nested markup stripped, entities decoded,
    * whitespace collapsed, capped). Anchor text is the label the WEB
    * gives a page — the signal retrieval corpora and query-document
    * pairs are built from — and it lives BETWEEN tags, so this rides
    * [[GraftMath.scanHtmlFull]]'s event view of the SAME hardened
    * scanner the link and meta extractors use (comments and
    * script/style bodies can't fake an anchor, quoted `>` can't end a
    * tag early, single-quoted/unquoted hrefs parse, `</abbr>` is not
    * `</a>`). Href-less and fragment-only anchors skipped; a new `<a>`
    * implicitly closes the previous (the browser rule — anchors never
    * nest); a torn anchor at end of input is discarded (completed-
    * prefix); empty text (image links) survives as "" — the href still
    * carries graph signal.
    */
  def anchorPairs(html: String, maxAnchors: Int = 10000,
      maxTextLen: Int = 512): Seq[(String, String)] =
    graft.functions.GraftMath.htmlAnchorPairs(html, maxAnchors, maxTextLen)

  /** One row PER ANCHOR of each page: every column of `pages` except
    * `htmlCol`, plus the base-resolved canonical `href` and its
    * `anchor` text — [[outlinks]]' shape with the label attached.
    * Same NULL-drop contract for out-of-contract targets; map-only
    * AND fully codegen (`graft_html_anchors` + `graft_url_resolve` —
    * no ScalaUDF, no Row serialization, same as the sibling link
    * extractor).
    */
  def anchors(pages: DataFrame, urlCol: String, htmlCol: String): DataFrame = {
    val pass = pages.columns.filterNot(_ == htmlCol).map(col).toSeq
    val pageCanon = GraftFunctions.urlCanon(col(urlCol))
    val base = coalesce(
      GraftFunctions.urlResolve(pageCanon, GraftFunctions.htmlBase(col(htmlCol))),
      pageCanon)
    pages
      .select(pass ++ Seq(
        base.as("__base"),
        explode(GraftFunctions.htmlAnchors(col(htmlCol))).as("__p")): _*)
      .select(pass ++ Seq(
        GraftFunctions.urlResolve(col("__base"), col("__p.href")).as("href"),
        col("__p.anchor").as("anchor")): _*)
      .filter(col("href").isNotNull)
  }

  /** Tags that TERMINATE a text block (block-level structure per the
    * HTML living standard's flow-content split); inline markup (a, b,
    * span, em, …) flows through a block. `br`/`hr` are separators.
    */
  private val BlockTags: Set[String] = Set(
    "p", "div", "section", "article", "main", "header", "footer", "nav",
    "aside", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li", "dl",
    "dt", "dd", "table", "thead", "tbody", "tfoot", "tr", "td", "th",
    "blockquote", "pre", "form", "fieldset", "figure", "figcaption",
    "address", "br", "hr", "body", "html", "head", "title")

  /** One segmented text block: collapsed visible text, its word and
    * char counts, the chars that came from ANCHOR text, and the
    * content/chrome verdict.
    */
  final case class Block(idx: Int, text: String, n_words: Int, n_chars: Int,
      n_link_chars: Int, is_content: Boolean)

  /** MAIN-CONTENT segmentation — the Boilerpipe-class block model, with
    * deterministic INTEGER thresholds so a DuckDB oracle re-derives
    * every verdict: the page splits into text blocks at block-level tag
    * boundaries (on the same hardened scanner as link/anchor/meta
    * extraction, so comments and script/style bodies can't fake prose),
    * each block collapses its whitespace and counts words, chars, and
    * anchor-text chars. A block is CONTENT iff
    *
    *   `n_words >= minWords  &&  3 * n_link_chars <= n_chars`
    *
    * — the word floor drops navigation/footer/title chrome (short runs),
    * the link-density cap (≤ 1/3, computed integer-exact) drops link
    * farms however long. No sequence smoothing: the thresholds are the
    * published text-density/link-density core, kept closed-form.
    * Empty/whitespace-only blocks never emit.
    */
  def blocks(html: String, minWords: Int = 8, maxBlocks: Int = 10000): Seq[Block] = {
    if (html == null) return Seq.empty
    val out = Vector.newBuilder[Block]
    var n = 0
    var inAnchor = false
    val sb = new java.lang.StringBuilder
    val link = new java.lang.StringBuilder
    def flush(): Boolean = {
      val text = graft.operators.XmlDump.decodeEntities(sb.toString)
        .replaceAll("\\s+", " ").trim
      val linkText = graft.operators.XmlDump.decodeEntities(link.toString)
        .replaceAll("\\s+", " ").trim
      sb.setLength(0); link.setLength(0)
      // a block boundary implicitly closes an open anchor (HTML5 closes
      // <a> at block elements; unclosed/self-closed anchors otherwise
      // poison every later block's link density)
      inAnchor = false
      if (text.nonEmpty) {
        val words = text.split(" ").length
        out += Block(n, text, words, text.length, linkText.length,
          words >= minWords && 3 * linkText.length <= text.length)
        n += 1
      }
      n < maxBlocks
    }
    graft.functions.GraftMath.scanHtmlFull(html)(new graft.functions.GraftMath.HtmlSink {
      override def open(idx: Int, tag: String, selfClose: Boolean): Boolean = {
        if (tag == "a" && !selfClose) inAnchor = true
        if (BlockTags(tag)) flush() else true
      }
      override def close(tag: String): Boolean = {
        if (tag == "a") inAnchor = false
        if (BlockTags(tag)) flush() else true
      }
      override def text(t: String): Boolean = {
        sb.append(t)
        if (inAnchor) link.append(t)
        true
      }
    })
    flush() // the trailing run (torn page keeps its completed text)
    out.result()
  }

  /** The page's main content: its content blocks' text joined with
    * newlines — what the quality screens and tokenizers should see,
    * chrome cut. Null in, null out; a page with no content blocks
    * yields "" (countable, distinct from a decode NULL).
    */
  def mainContent(html: String, minWords: Int = 8): String = {
    if (html == null) return null
    blocks(html, minWords).filter(_.is_content).map(_.text).mkString("\n")
  }

  /** One row PER BLOCK of each page: (passthrough cols…, block_idx,
    * n_words, n_chars, n_link_chars, is_content, text). Map-only.
    */
  def blockRows(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(htmlCol))
      .as[(Long, String)]
      .flatMap { case (id, h) =>
        blocks(h).map(b => (id, b.idx, b.n_words, b.n_chars, b.n_link_chars,
          b.is_content, b.text))
      }
      .toDF(idCol, "block_idx", "n_words", "n_chars", "n_link_chars",
        "is_content", "text")
  }

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
