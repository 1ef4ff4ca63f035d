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
