package graft

import graft.operators.Cdx

/** CDXJ index: SURT canonicalization, line parse with countable
  * missing fields, junk-line drops, and range-merge planning.
  */
class CdxSpec extends SparkSpec {

  test("surt: label reversal, www/default-port drops, non-default port kept") {
    assert(Cdx.surt("http://www.example.com/a/b?q=1") == "com,example)/a/b?q=1")
    assert(Cdx.surt("https://news.bbc.co.uk") == "uk,co,bbc,news)/")
    assert(Cdx.surt("http://example.com:80/x") == "com,example)/x")
    assert(Cdx.surt("https://example.com:443/x") == "com,example)/x")
    assert(Cdx.surt("http://example.com:8080/x") == "com,example:8080)/x")
    assert(Cdx.surt("ftp://example.com/") == null)
    assert(Cdx.surt("not a url") == null)
    assert(Cdx.surt(null) == null)
  }

  test("advice finding: surt matches the public CDX canonicalization") {
    // the WHOLE key lowercases — path case differences don't split captures
    assert(Cdx.surt("http://Example.com/Path/File.HTML") == "com,example)/path/file.html")
    // query parameters sort byte-wise
    assert(Cdx.surt("http://x.com/p?b=2&a=1") == "com,x)/p?a=1&b=2")
    assert(Cdx.surt("http://x.com/p?a=1&b=2") == "com,x)/p?a=1&b=2")
    // session-token parameters strip; an all-session query drops the '?'
    assert(Cdx.surt("http://x.com/p?a=1&jsessionid=ABC") == "com,x)/p?a=1")
    assert(Cdx.surt("http://x.com/p?PHPSESSID=deadbeef") == "com,x)/p")
    assert(Cdx.surt("http://x.com/p?aspsessionidqqrstt=xyz&z=9") == "com,x)/p?z=9")
    // the servlet path-parameter form strips too
    assert(Cdx.surt("http://x.com/page;jsessionid=ABC123?a=1") == "com,x)/page?a=1")
    assert(Cdx.surt("http://x.com/page;jsessionid=ABC123") == "com,x)/page")
    // a query can follow the host directly — it must not leak into the
    // host labels
    assert(Cdx.surt("http://x.com?a=1") == "com,x)/?a=1")
    assert(Cdx.surt("http://x.com:8080?a=1") == "com,x:8080)/?a=1")
  }

  test("parseLine: CDXJ string-numerics, missing fields -1, junk null") {
    val l = """com,site)/p 20260101000000 {"url": "http://site.com/p", """ +
      """"filename": "c.warc.gz", "offset": "345", "length": "800", """ +
      """"status": "200", "mime": "text/html"}"""
    assert(Cdx.parseLine(l) ==
      (("com,site)/p", "20260101000000", "http://site.com/p", "c.warc.gz", 345L, 800L, 200, "text/html")))
    val noOff = """com,x)/ 2026 {"url": "http://x.com/", "filename": "c.warc.gz"}"""
    val p = Cdx.parseLine(noOff)
    assert(p._5 == -1L && p._6 == -1L && p._7 == -1)
    assert(Cdx.parseLine("garbage with no json") == null)
    assert(Cdx.parseLine("key ts {broken json") == null)
    assert(Cdx.parseLine(null) == null)
  }

  test("fetchPlan: gap-bounded merge per file; overlaps and containment fold") {
    import spark.implicits._
    val caps = Seq(
      ("a.warc.gz", 0L, 800L), ("a.warc.gz", 1000L, 800L), // gap 200: merge
      ("a.warc.gz", 100000L, 800L), // far: new range
      ("a.warc.gz", 100100L, 100L), // CONTAINED in the previous record
      ("b.warc.gz", 0L, 500L),
      ("a.warc.gz", -1L, 800L) // unplannable: excluded
    ).toDF("filename", "offset", "length")
    val plan = Cdx.fetchPlan(caps, mergeGap = 300L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(plan == Set(
      ("a.warc.gz", 0L, 1800L, 2L),
      ("a.warc.gz", 100000L, 800L, 2L),
      ("b.warc.gz", 0L, 500L, 1L)))
    graft.queries.Q.requireMaxShuffles(Cdx.fetchPlan(caps), 1)
  }

  test("indexRows: distributed parse map-only; junk lines drop countably") {
    import spark.implicits._
    val text =
      """com,a)/ 2026 {"url": "http://a.com/", "filename": "f", "offset": "0", "length": "10", "status": "200", "mime": "text/html"}
        |this line is junk
        |com,b)/ 2026 {"url": "http://b.com/", "filename": "f"}""".stripMargin
    val out = Cdx.indexRows(Seq((1L, text)).toDF("media_id", "text"), "media_id", "text")
    graft.queries.Q.requireNoShuffle(out)
    val rows = out.collect()
    assert(rows.length == 2) // the junk line dropped
    assert(rows.map(_.getString(1)).toSet == Set("com,a)/", "com,b)/"))
  }
}
