package graft

import graft.operators.Html

/** HTML → Markdown structure-preserving conversion: headings, lists,
  * fences, quotes, tables, links, emphasis; the content-mode screen.
  */
class MarkdownSpec extends SparkSpec {

  test("headings, paragraphs, emphasis, links, images, hr") {
    val md = Html.markdown(
      "<html><head><title>chrome</title></head><body>" +
        "<h1>Title</h1><h2>Sub</h2>" +
        "<p>plain <b>bold</b> and <em>it</em> text</p>" +
        "<p>see <a href=\"http://x.example/p\">the page</a> here</p>" +
        "<p><img src=\"i.png\" alt=\"pic\"></p>" +
        "<hr>" +
        "<p>A &amp; B</p></body></html>")
    assert(md ==
      "# Title\n## Sub\n" +
        "plain **bold** and *it* text\n" +
        "see [the page](http://x.example/p) here\n" +
        "![pic](i.png)\n" +
        "---\n" +
        "A & B")
    // head content (title) never surfaces
    assert(!md.contains("chrome"))
  }

  test("lists: nesting, ordered counters, markers only on first line") {
    val md = Html.markdown(
      "<ul><li>one</li><li>two<ul><li>inner</li></ul></li></ul>" +
        "<ol><li>first</li><li>second</li></ol>")
    assert(md ==
      "- one\n- two\n  - inner\n" +
        "1. first\n2. second")
  }

  test("code: inline backticks, pre fences verbatim, markers suppressed inside") {
    assert(Html.markdown("<p>use <code>f(x)</code> here</p>") == "use `f(x)` here")
    val md = Html.markdown("<pre><code>line one\n  indented &lt;tag&gt;\n</code></pre>")
    assert(md == "```\nline one\n  indented <tag>\n```")
  }

  test("blockquotes: depth prefixes, structures inside keep the prefix") {
    val md = Html.markdown(
      "<blockquote><p>quoted prose</p>" +
        "<blockquote><p>deeper</p></blockquote></blockquote>")
    assert(md == "> quoted prose\n> > deeper")
    assert(Html.markdown("<blockquote><pre>x</pre></blockquote>") ==
      "> ```\n> x\n> ```")
  }

  test("tables: pipe rows, separator after header row, pipe escaping") {
    val md = Html.markdown(
      "<table><tr><th>Name</th><th>N</th></tr>" +
        "<tr><td>alpha</td><td>1</td></tr>" +
        "<tr><td>a|b</td><td>2</td></tr></table>")
    assert(md ==
      "| Name | N |\n| --- | --- |\n| alpha | 1 |\n| a\\|b | 2 |")
  }

  test("hardening rides the shared scanner; torn markup keeps the prefix") {
    // comments and script bodies can't fake structure
    assert(Html.markdown("<p>a</p><!-- <h1>no</h1> --><script>var h='<h1>no</h1>'</script>") == "a")
    // fragment-only and href-less anchors stay plain text
    assert(Html.markdown("<p><a href=\"#top\">up</a> <a>bare</a></p>") == "up bare")
    // torn page keeps completed lines plus the trailing run
    assert(Html.markdown("<h1>done</h1><p>trailing tex") == "# done\ntrailing tex")
    assert(Html.markdown(null) == null)
    assert(Html.markdown("") == "")
  }

  test("content mode composes the mainContent thresholds with structure") {
    val html = "<body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" + // link-dense: drops
      "<h1>Real Title</h1>" + // short but not linky: keeps (structural)
      "<p>one two three four five six seven eight nine</p>" + // keeps
      "<p>short</p>" + // word floor: drops
      "<ul><li>point one made here</li><li><a href=\"/x\">menu link</a></li></ul>" +
      "<pre>code()</pre>" + // fences always keep
      "</body>"
    val md = Html.markdown(html, minWords = 8)
    assert(md ==
      "# Real Title\n" +
        "one two three four five six seven eight nine\n" +
        "- point one made here\n" +
        "```\ncode()\n```")
    // a link-farm table row drops; a data row keeps
    val t = Html.markdown(
      "<table><tr><td>plain data value</td></tr>" +
        "<tr><td><a href=\"/1\">x1</a><a href=\"/2\">x2</a></td></tr></table>",
      minWords = 8)
    assert(t == "| plain data value |")
  }

  test("review finding: a new anchor implicitly closes an open one (browser rule)") {
    // without the implicit close, the first '[' would dangle unclosed
    assert(Html.markdown("<p><a href=\"/1\">one <a href=\"/2\">two</a></p>") ==
      "[one ](/1)[two](/2)")
    // torn anchor at end of input keeps the visible prefix
    assert(Html.markdown("<p><a href=\"/x\">torn") == "[torn")
  }

  test("markdownSections: heading-path breadcrumbs, level pops, preamble, empties") {
    val md = "intro line\n" +
      "# A\nbody a1\nbody a2\n" +
      "## A1\nnested\n" +
      "### A1x\ndeep\n" +
      "## A2\nback up\n" +
      "# B\n" + // no body of its own: extends the next section's path
      "## B1\nfinal"
    assert(Html.markdownSections(md) == Seq(
      (0, "", "intro line"),
      (1, "A", "body a1\nbody a2"),
      (2, "A > A1", "nested"),
      (3, "A > A1 > A1x", "deep"),
      (4, "A > A2", "back up"),
      (5, "B > B1", "final")))
    // a same-level heading REPLACES, a shallower one pops deeper levels
    assert(Html.markdownSections("# X\n## Y\ntext\n# Z\nmore").map(_._2) ==
      Seq("X > Y", "Z"))
    // not headings: fences and a bare '#'
    assert(Html.markdownSections("#nospace\nbody").head._2 == "")
    assert(Html.markdownSections(null) == null)
    assert(Html.markdownSections("") == Seq.empty)
  }

  test("review finding: fenced '# comment' lines are code, never headings") {
    val md = "# A\nbody\n```\n# not a heading\ncode line\n```\nafter"
    assert(Html.markdownSections(md) == Seq(
      (0, "A", "body\n```\n# not a heading\ncode line\n```\nafter")))
    // a quoted fence (the converter emits '> ```') toggles too
    assert(Html.markdownSections("# B\n> ```\n> # still code\n> ```\ntail") ==
      Seq((0, "B", "> ```\n> # still code\n> ```\ntail")))
    // torn fence: interior to EOF stays body (completed-prefix rule)
    assert(Html.markdownSections("# C\n```\n# x") == Seq((0, "C", "```\n# x")))
    // blank lines KEEP inside a fence (code structure), drop outside
    assert(Html.markdownSections("# D\n```\na\n\nb\n```\n\nplain") ==
      Seq((0, "D", "```\na\n\nb\n```\nplain")))
  }

  test("markdownSections: token budget packs units; tables and fences never split") {
    val md = "# A\none two three\nfour five\n| a | b |\n| 1 | 2 |\nsix seven"
    // budget 5: lines 1+2 fill it; the 10-token table is an atomic
    // oversize unit → its own section; the tail starts fresh
    assert(Html.markdownSections(md, maxTokens = 5) == Seq(
      (0, "A", "one two three\nfour five"),
      (1, "A", "| a | b |\n| 1 | 2 |"),
      (2, "A", "six seven")))
    // a fence is one unit: 8 tokens against a 4-token budget → its own
    // section; continuation sections keep the same breadcrumb path
    assert(Html.markdownSections("# B\nalpha\n```\nx y z\np q r\n```\nbeta",
      maxTokens = 4) == Seq(
      (0, "B", "alpha"),
      (1, "B", "```\nx y z\np q r\n```"),
      (2, "B", "beta")))
    // maxTokens = 0 (default): pure heading split, no packing
    assert(Html.markdownSections("# C\na\nb\nc").map(_._3) == Seq("a\nb\nc"))
  }

  test("review finding: <a href>/<img src> inside <head> never leak into the body") {
    val html = "<html><head><a href=\"/poison\">x</a><img src=\"/p.png\"></head>" +
      "<body><p><a>bare</a> and <img alt=\"i\"></p></body></html>"
    assert(Html.markdown(html) == "bare and")
  }

  test("markdownSectionRows composes with the converter end to end") {
    import spark.implicits._
    val html = "<h1>Guide</h1><p>welcome text</p><h2>Setup</h2><p>step one</p>"
    val pages = Seq((1L, html)).toDF("media_id", "html")
    val out = Html.markdownSectionRows(
      Html.markdownRows(pages, "media_id", "html"), "media_id", "markdown")
    graft.queries.Q.requireNoShuffle(out)
    assert(out.collect().map(r => (r.getInt(1), r.getString(2), r.getString(3))).toSeq ==
      Seq((0, "Guide", "welcome text"), (1, "Guide > Setup", "step one")))
  }

  test("markdownRows: distributed walk map-only") {
    import spark.implicits._
    val df = Seq((1L, "<h1>T</h1><p>body text</p>"), (2L, null: String))
      .toDF("media_id", "html")
    val out = Html.markdownRows(df, "media_id", "html")
    graft.queries.Q.requireNoShuffle(out)
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "# T\nbody text"), (2L, null)))
  }
}
