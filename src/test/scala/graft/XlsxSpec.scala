package graft

import graft.operators.Xlsx

/** XLSX shared-strings extraction on the shared OOXML walk. */
class XlsxSpec extends SparkSpec {

  test("shared strings round-trip; rich runs concatenate; si boundary-checked") {
    val d = Xlsx.read(Xlsx.xlsx(Seq("Name", "Quarterly report", "A & B")))
    assert(d.stage == "ok")
    // item 1 was written as two rich runs: concatenation must restore it
    assert(d.strings == Seq("Name", "Quarterly report", "A & B"))
    // a numbers-only workbook (no sharedStrings part) is ok with zero strings
    val numbers = Xlsx.read(Xlsx.xlsx(Seq("x"), withSharedStrings = false))
    assert(numbers.stage == "ok" && numbers.strings.isEmpty)
  }

  test("review finding: phonetic rPh runs never surface in the prose") {
    // furigana annotations carry <t> text that is NOT the cell's prose
    val sst = "<sst><si><r><t>東京</t></r>" +
      "<rPh sb=\"0\" eb=\"2\"><t>トウキョウ</t></rPh>" +
      "<phoneticPr fontId=\"1\"/></si>" +
      "<si><t>plain</t></si></sst>"
    val none = 0.toChar.toString
    val cleaned = Xlsx.stripSubtrees(sst, "rPh")
    assert(graft.operators.Docx.paragraphsTags(cleaned, "si", "t", none, none, none) ==
      Seq("東京", "plain"))
    // boundary: rPh must not eat a hypothetical rPhX tag
    assert(Xlsx.stripSubtrees("<rPhX><t>keep</t></rPhX>", "rPh") ==
      "<rPhX><t>keep</t></rPhX>")
    // self-closed and torn forms degrade cleanly
    assert(Xlsx.stripSubtrees("a<rPh/>b", "rPh") == "ab")
    assert(Xlsx.stripSubtrees("a<rPh sb=\"0\">torn", "rPh") == "a")
  }

  test("degrades: junk -> zip, CFB -> encrypted, no workbook -> part") {
    assert(Xlsx.read("junk".getBytes("UTF-8")).stage == "zip")
    assert(Xlsx.read(null).stage == "zip")
    assert(Xlsx.read(graft.operators.Docx.encryptedFixture(4L)).stage == "encrypted")
    val noWb = graft.operators.ZipShard.zip(
      Seq(("xl/styles.xml", "<x/>".getBytes("UTF-8"))), deflate = false)
    assert(Xlsx.read(noWb).stage == "part")
  }

  test("office triage routes xlsx; textRows map-only") {
    import spark.implicits._
    assert(graft.operators.Office.detect(Xlsx.xlsx(Seq("x"))) == "xlsx")
    val df = Seq(
      (1L, Xlsx.xlsx(Seq("alpha", "beta"))),
      (2L, "junk".getBytes("UTF-8"))).toDF("media_id", "payload")
    val t = Xlsx.textRows(df, "media_id", "payload")
    graft.queries.Q.requireNoShuffle(t)
    assert(t.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3))).toSet ==
      Set((1L, "ok", 2, "alpha\nbeta"), (2L, "zip", 0, null)))
    val routed = graft.operators.Office.routedText(df, "media_id", "payload")
    assert(routed.collect().map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet ==
      Set((1L, "xlsx", "alpha\nbeta"), (2L, "unknown", null)))
  }

  test("adversarial: truncation and bit flips never throw") {
    val b = Xlsx.xlsx(Seq("spreadsheet text here"))
    (0 until b.length by 7).foreach(cut =>
      Xlsx.read(java.util.Arrays.copyOfRange(b, 0, cut)))
    (0 until b.length by 11).foreach { i =>
      val m = b.clone(); m(i) = (m(i) ^ 0x66).toByte
      Xlsx.read(m)
    }
  }
}
