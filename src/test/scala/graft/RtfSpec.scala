package graft

import graft.operators.Rtf

/** RTF control-word strip: groups, destinations, escapes, unicode
  * fallback runs, windows-1252 hex bytes, degrades.
  */
class RtfSpec extends SparkSpec {

  private def rtf(body: String): Array[Byte] =
    s"{\\rtf1\\ansi\\deff0$body}".getBytes("ISO-8859-1")

  test("plain text, par/line/tab, formatting words vanish") {
    val d = Rtf.strip(rtf("{\\b bold} and plain\\par second\\line third\\tab t"))
    assert(d.stage == "ok")
    assert(d.paragraphs == Seq("bold and plain", "second", "third\tt"))
  }

  test("destinations skip whole: fonttbl/colortbl/info/pict and {\\*\\...}") {
    val d = Rtf.strip(rtf(
      "{\\fonttbl{\\f0 Times New Roman;}}" +
        "{\\colortbl;\\red0\\green0\\blue0;}" +
        "{\\info{\\title SECRET TITLE}}" +
        "{\\*\\generator Writer 7.0;}" +
        "visible text\\par" +
        "{\\pict 89504e47}after"))
    assert(d.paragraphs == Seq("visible text", "after"))
    assert(!d.paragraphs.mkString.contains("SECRET"))
    assert(!d.paragraphs.mkString.contains("Times"))
  }

  test("escapes: braces, backslash, nbsp, typographic words, hex cp1252") {
    // the single space after \rquote is the control word's DELIMITER
    // and is consumed (the published tokenization)
    val d = Rtf.strip(rtf("a\\{b\\}c\\\\d\\~e \\lquote q\\rquote \\emdash\\'80\\'e9"))
    assert(d.paragraphs == Seq("a{b}c\\d e ‘q’—€é"))
    // unmapped 1252 slots surface as U+FFFD, never a guess
    assert(Rtf.strip(rtf("x\\'81y")).paragraphs == Seq("x�y"))
  }

  test("\\uN with \\uc fallback runs; negative code points wrap") {
    // default uc=1: the '?' fallback after \u is consumed
    assert(Rtf.strip(rtf("\\u26085 ?\\u26412 ?!")).paragraphs == Seq("日本!"))
    // uc0: nothing consumed
    assert(Rtf.strip(rtf("\\uc0\\u960 x")).paragraphs == Seq("πx"))
    // uc2 consumes two fallback chars, incl. a \'xx escape
    assert(Rtf.strip(rtf("\\uc2\\u960 \\'3f?done")).paragraphs == Seq("πdone"))
    // negative = signed 16-bit wrap
    assert(Rtf.strip(rtf("\\uc0\\u-224 z")).paragraphs.head.head == 0xFF20.toChar)
  }

  test("\\binN raw payloads skip blind — embedded braces never desync the walk") {
    // the 5 raw bytes after \bin5 contain braces and a backslash; a
    // text-mode scan would close the objdata group early and leak
    val b = "{\\rtf1 pre{\\*\\objdata\\bin5 }}\\{x} post}".getBytes("ISO-8859-1")
    val d = graft.operators.Rtf.strip(b)
    assert(d.stage == "ok" && d.paragraphs == Seq("pre post"))
    // \bin running past EOF: the completed prefix keeps, never throws
    val torn = "{\\rtf1 keep{\\*\\objdata\\bin99 xx".getBytes("ISO-8859-1")
    assert(graft.operators.Rtf.strip(torn).paragraphs == Seq("keep"))
  }

  test("degrades and torn input") {
    assert(Rtf.strip("not rtf at all".getBytes("UTF-8")).stage == "parse")
    assert(Rtf.strip(null).stage == "parse")
    val whole = rtf("first\\par second half")
    val torn = Rtf.strip(java.util.Arrays.copyOfRange(whole, 0, whole.length - 8))
    assert(torn.stage == "ok" && torn.paragraphs.head == "first")
    (0 until whole.length by 5).foreach(cut =>
      Rtf.strip(java.util.Arrays.copyOfRange(whole, 0, cut)))
  }

  test("textRows: distributed walk map-only; mixed outcomes coexist") {
    import spark.implicits._
    val df = Seq(
      (1L, rtf("alpha\\par beta")),
      (2L, "junk".getBytes("UTF-8"))).toDF("media_id", "payload")
    val t = Rtf.textRows(df, "media_id", "payload")
    graft.queries.Q.requireNoShuffle(t)
    assert(t.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3))).toSet ==
      Set((1L, "ok", 2, "alpha\nbeta"), (2L, "parse", 0, null)))
  }
}
