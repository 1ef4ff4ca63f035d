package graft

import graft.operators.XmlDump

/** Dump page extraction (ids/ns/redirect/last-revision text, entity
  * decode, torn-page and budget degrades) and the wikitext strip pass
  * order, arm by arm.
  */
class XmlDumpSpec extends SparkSpec {

  test("entities: the five predefined, numeric dec/hex, single-pass, unknown verbatim") {
    assert(XmlDump.decodeEntities("a&lt;b&gt;c&amp;d&quot;e&apos;f") == "a<b>c&d\"e'f")
    assert(XmlDump.decodeEntities("&#65;&#x42;&#x1F600;") == "AB😀")
    // single pass: a double-encoded entity decodes ONE layer
    assert(XmlDump.decodeEntities("&amp;lt;") == "&lt;")
    assert(XmlDump.decodeEntities("&nbsp;&bogus;&#xZZ;&#;") == "&nbsp;&bogus;&#xZZ;&#;")
    assert(XmlDump.decodeEntities("no entities") == "no entities")
    assert(XmlDump.decodeEntities(null) == null)
  }

  test("pages: title/ns/id/redirect/text extract; page id is the PRE-revision id") {
    val xml = "<mediawiki>\n" +
      XmlDump.pageXml(7, 0, "Alpha & Co", None, "Body of [[Alpha]]") +
      XmlDump.pageXml(8, 0, "Beta", Some("Alpha & Co"), "#REDIRECT [[Alpha & Co]]") +
      XmlDump.pageXml(9, 14, "Category:Things", None, "cat page") +
      "</mediawiki>"
    val ps = XmlDump.pages(xml)
    assert(ps.length == 3)
    assert(ps(0) == XmlDump.WikiPage(7, 0, "Alpha & Co", null, "Body of [[Alpha]]", 7001L))
    assert(ps(1).redirect == "Alpha & Co" && ps(1).page_id == 8)
    assert(ps(2).ns == 14)
    // revision <id> (7001) must NOT win over the page <id> (7)
    assert(ps(0).page_id == 7)
  }

  test("pages: last revision's text wins; self-closed text is empty; missing degrades") {
    val multi =
      """<page><title>T</title><ns>0</ns><id>3</id>
        |<revision><id>1</id><text>old body</text></revision>
        |<revision><id>2</id><text>new body</text></revision>
        |</page>""".stripMargin
    assert(XmlDump.pages(multi).head.text == "new body")
    val selfClosed = "<page><title>E</title><ns>0</ns><id>4</id><revision><text bytes=\"0\" /></revision></page>"
    assert(XmlDump.pages(selfClosed).head.text == "")
    val noText = "<page><title>N</title><ns>0</ns><id>5</id></page>"
    val p = XmlDump.pages(noText).head
    assert(p.text == null && p.title == "N")
    val noId = "<page><title>X</title><ns>0</ns></page>"
    assert(XmlDump.pages(noId).head.page_id == -1L)
  }

  test("pages: torn final page drops; maxTextLen refuses all-or-NULL; maxPages caps") {
    val xml = XmlDump.pageXml(1, 0, "Whole", None, "kept") +
      "<page><title>Torn</title><ns>0</ns><id>2</id><revision><text>no close"
    val ps = XmlDump.pages(xml)
    assert(ps.length == 1 && ps.head.title == "Whole")
    val big = XmlDump.pageXml(1, 0, "Big", None, "x" * 100)
    assert(XmlDump.pages(big, maxTextLen = 50).head.text == null)
    assert(XmlDump.pages(big, maxTextLen = 100).head.text == "x" * 100)
    val many = (1 to 5).map(i => XmlDump.pageXml(i.toLong, 0, s"P$i", None, "t")).mkString
    assert(XmlDump.pages(many, maxPages = 3).length == 3)
    assert(XmlDump.pages(null).isEmpty)
  }

  test("strip: each pass, arm by arm") {
    def w(s: String) = XmlDump.stripWikitext(s)
    assert(w("a<!-- hidden -->b") == "ab")
    assert(w("a<!-- torn") == "a")
    assert(w("a<ref name=x>cite</ref>b<ref group=\"n\"/>c") == "abc")
    assert(w("a<ref>torn") == "a")
    assert(w("a{{tmpl|p={{inner}}x}}b") == "ab")
    assert(w("a{{torn b") == "a")
    assert(w("a{| class=x\n|cell\n|}b") == "ab")
    assert(w("x[[File:pic.jpg|thumb|a [[link]] caption]]y") == "xy")
    assert(w("x[[Category:Science]]y") == "xy")
    assert(w("see [[Target]] and [[Target|label]] and [[a|[[b]]]]") ==
      "see Target and label and b")
    assert(w("go [https://ex.com/p here] or [https://bare.com] end") ==
      "go here or  end")
    assert(w("'''''both''''' '''bold''' ''it''") == "both bold it")
    assert(w("== Head ==\nbody\n=== Sub ===") == "Head\nbody\nSub")
    assert(w("a<br/>b<div class=x>c</div>d") == "abcd")
    assert(w("2 &lt; 3 &amp; 4 &gt; 1") == "2 < 3 & 4 > 1")
    assert(w(null) == null)
    // pass order: a template invisible inside a removed comment stays gone
    assert(w("a<!--{{t}}-->b") == "ab")
    // a lone '<' is prose, not a torn tag
    assert(w("2 < 3 stays") == "2 < 3 stays")
  }

  test("strip: composed article reduces to closed-form prose") {
    val src = "== Heading 5 ==\n'''Bold''' text {{tmpl|x=5}}with [[Link 5|label 5]] " +
      "and [[Plain5]], see <ref name=a>junk</ref>[https://e.com/5 ext 5] rest " +
      "{| tbl |} &amp; <b>tail</b>5"
    assert(XmlDump.stripWikitext(src) ==
      "Heading 5\nBold text with label 5 and Plain5, see ext 5 rest  & tail5")
  }

  test("wikiLinks: targets canonicalize; media links drop; captions count") {
    val links = XmlDump.wikiLinks(
      "a [[Alpha]] b [[Beta|label]] c [[Gamma#Sec]] d [[delta_one]] " +
        "[[File:x.jpg|thumb|a [[Caption Link]] cap]] [[Category:Z]] " +
        "[[#selfsec]] [[  ]] [[torn")
    assert(links == Seq("Alpha", "Beta", "Gamma", "Delta one", "Caption Link"))
    // fragment-only and empty targets drop; the torn open yields nothing
    assert(XmlDump.wikiLinks("[[a\nb]]") == Seq.empty) // newline target = not a link
    assert(XmlDump.wikiLinks(null) == Seq.empty)
    assert(XmlDump.wikiLinks("[[x]]" * 50, maxLinks = 10).length == 10)
    // space runs collapse and underscores normalize like titles do
    assert(XmlDump.wikiLinks("[[a__b   c]]") == Seq("A b c"))
  }

  test("review findings: comment links, bare <text/>, heading tails, torn externals, surrogates") {
    // a commented-out link is never rendered, so it is not an edge
    assert(XmlDump.wikiLinks("a [[Real]] <!-- [[Old Target]] gone --> b") == Seq("Real"))
    // bare self-closed <text/> is the documented "" — not null
    val bare = "<page><title>E</title><ns>0</ns><id>4</id><revision><text/></revision></page>"
    assert(XmlDump.pages(bare).head.text == "")
    // heading lines with trailing whitespace still strip their markers
    assert(XmlDump.stripWikitext("== History == \nbody") == "History\nbody")
    assert(XmlDump.stripWikitext("== H ==\t") == "H")
    // a torn external link keeps its '[' (prose may follow)
    assert(XmlDump.stripWikitext("see [https://e.org details") == "see [https://e.org details")
    // surrogate character references are invalid XML: pass through verbatim
    assert(XmlDump.decodeEntities("&#xD800;x&#55296;") == "&#xD800;x&#55296;")
    // the linear link resolver: nested, torn, stray, and pipe semantics
    assert(XmlDump.stripWikitext("[[a|[[b]] c]] d") == "b c d")
    assert(XmlDump.stripWikitext("x [[torn y") == "x torn y")
    assert(XmlDump.stripWikitext("plain ]] stays [[L]]") == "plain ]] stays L")
  }

  test("pageRows: distributed walk is map-only; torn member keeps whole pages") {
    import spark.implicits._
    val xml1 = XmlDump.pageXml(10, 0, "A", None, "ta") + XmlDump.pageXml(11, 1, "B", None, "tb")
    val xml2 = XmlDump.pageXml(20, 0, "C", Some("A"), "#REDIRECT [[A]]") +
      "<page><title>torn"
    val df = Seq((1L, xml1), (2L, xml2)).toDF("media_id", "xml")
    val rows = XmlDump.pageRows(df, "media_id", "xml")
    graft.queries.Q.requireNoShuffle(rows)
    val got = rows.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
      r.getInt(4), r.getString(5), r.getString(6))).toSet
    assert(got == Set((1L, 0, 10L, 10001L, 0, "A", null), (1L, 1, 11L, 11001L, 1, "B", null),
      (2L, 0, 20L, 20001L, 0, "C", "A")))
  }

  test("rev_id: the LAST revision's id; missing revision degrades to -1") {
    val multi =
      """<page><title>T</title><ns>0</ns><id>3</id>
        |<revision><id>31</id><text>old</text></revision>
        |<revision><id>32</id><text>new</text></revision>
        |</page>""".stripMargin
    val p = XmlDump.pages(multi).head
    assert(p.rev_id == 32L && p.text == "new")
    assert(XmlDump.pages("<page><title>N</title><id>5</id></page>").head.rev_id == -1L)
    assert(XmlDump.pages(XmlDump.pageXml(7, 0, "X", None, "t", revId = 42L)).head.rev_id == 42L)
  }

  test("mergeDumps: verdicts; the winning GENERATION's row survives whole") {
    import spark.implicits._
    val g0 = Seq((1L, 100L, "t1 old", "R"), (2L, 200L, "t2", null), (3L, 300L, "t3", null),
      (5L, 500L, "t5 good", null))
      .toDF("page_id", "rev_id", "text", "redirect")
    val g1 = Seq((1L, 107L, "t1 new", null), (2L, 200L, "t2", null), (4L, 400L, "t4", null),
      (5L, 490L, "t5 REGRESSED", null))
      .toDF("page_id", "rev_id", "text", "redirect")
    val m = XmlDump.mergeDumps(g0, g1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getString(4))).toSet
    assert(m == Set(
      // updated: gen1's row INCLUDING its null redirect (gen0's 'R' must
      // not resurrect into a mixed-generation row)
      (1L, 107L, "t1 new", null, "updated"),
      (2L, 200L, "t2", null, "unchanged"),
      (3L, 300L, "t3", null, "carried"),
      (4L, 400L, "t4", null, "added"),
      // stale: the out-of-order delta loses WHOLE-ROW — no regression
      (5L, 500L, "t5 good", null, "stale")))
  }

  test("mergeDumps: id-less pages (page_id = -1) pass through 'unkeyed', never fan out") {
    import spark.implicits._
    val g0 = Seq((1L, 100L, "t1", null: String), (-1L, 5L, "anon old", null: String),
      (-1L, 6L, "anon old 2", null: String))
      .toDF("page_id", "rev_id", "text", "redirect")
    val g1 = Seq((1L, 107L, "t1 new", null: String), (-1L, 7L, "anon new", null: String))
      .toDF("page_id", "rev_id", "text", "redirect")
    val m = XmlDump.mergeDumps(g0, g1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(4)))
    // 2 + 1 id-less rows each carried verbatim — NOT 2×1 join fan-out
    assert(m.count(_._1 == -1L) == 3)
    assert(m.filter(_._1 == -1L).map(_._4).toSet == Set("unkeyed"))
    assert(m.toSet.contains((1L, 107L, "t1 new", "updated")))
  }

  test("wikiLinks/media drop: prefix match survives non-length-preserving lowercase (U+0130)") {
    // 'İ' (U+0130) toLowerCase is TWO chars — a pre-lowered copy would
    // misalign every offset after it and misclassify these links
    val t = "İstanbul [[File:x.jpg|c]] ve [[Ankara]] sonu"
    assert(XmlDump.wikiLinks(t) == Seq("Ankara"))
    assert(!XmlDump.stripWikitext(t).contains("x.jpg"))
    // case-insensitivity itself still holds
    assert(XmlDump.wikiLinks("[[FILE:a.png]] [[Image:b]] [[CATEGORY:c]] [[Real]]") == Seq("Real"))
  }

  test("attrValue: anchored at a name boundary — data-title never satisfies title") {
    def page(redirectTag: String) =
      s"<page><title>T</title><ns>0</ns><id>1</id>$redirectTag" +
        "<revision><id>2</id><text>x</text></revision></page>"
    assert(XmlDump.pages(page("<redirect data-title=\"wrong\" title=\"right\" />"))
      .head.redirect == "right")
    assert(XmlDump.pages(page("<redirect data-title=\"wrong\" />")).head.redirect == null)
    assert(XmlDump.pages(page("<redirect\ttitle=\"tabbed\" />")).head.redirect == "tabbed")
  }

  test("adversarial: truncations and hostile blobs never throw") {
    val xml = XmlDump.pageXml(1, 0, "T&x<y", Some("R\"q"), "a[[b|c]]{{d}}<ref>e") +
      XmlDump.pageXml(2, 3, "U", None, "plain")
    for (cut <- 0 to xml.length by 17) {
      XmlDump.pages(xml.take(cut)).foreach(p => XmlDump.stripWikitext(p.text))
    }
    XmlDump.pages("<page></page>")
    XmlDump.pages("<page><id>99999999999999999999</id></page>") // overflow id → -1
    assert(XmlDump.pages("<page><id>99999999999999999999</id></page>").head.page_id == -1L)
    XmlDump.stripWikitext("[[" * 2000) // the innermost-loop guard holds
    XmlDump.stripWikitext("[" + "https://x " * 3)
    XmlDump.stripWikitext("{|" * 500 + "|}" * 200)
  }
}
