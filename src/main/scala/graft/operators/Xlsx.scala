package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame

/** XLSX (ECMA-376 SpreadsheetML) shared-strings extraction — the text
  * a spreadsheet actually carries lives centralized in
  * `xl/sharedStrings.xml` as `<si>` items of `<t>` runs (plain or
  * rich `<r><t>…</t></r>` — runs concatenate, same grammar as the
  * other OOXML bodies, so the SHARED walk runs it with `si`/`t`
  * spellings). Cell grids reference these by index; for a text corpus
  * the string table IS the prose surface.
  *
  * Degrades per the office-family contract: junk → `zip`; CFB →
  * `encrypted`; a zip without `xl/workbook.xml` → `part`. A workbook
  * WITHOUT a sharedStrings part is valid (numbers-only) and is `ok`
  * with zero strings. Map-only. Reference scope: the reference
  * ingests line JSON only (`App.java:136-162`).
  */
object Xlsx {

  final case class XlsxDoc(stage: String, strings: Seq[String])

  def read(bytes: Array[Byte]): XlsxDoc = {
    if (bytes == null) return XlsxDoc("zip", Seq.empty)
    if (Docx.isCfb(bytes)) return XlsxDoc("encrypted", Seq.empty)
    val es = ZipShard.entries(bytes)
    if (es.isEmpty) return XlsxDoc("zip", Seq.empty)
    readEntries(es)
  }

  /** The walk over an already-opened archive (the one-walk triage
    * path — see [[Docx.readEntries]]).
    */
  private[operators] def readEntries(es: Seq[ZipShard.ZipEntry]): XlsxDoc = {
    val byName = es.map(e => e.name -> e.data).toMap
    if (!byName.contains("xl/workbook.xml")) return XlsxDoc("part", Seq.empty)
    byName.get("xl/sharedStrings.xml") match {
      case None => XlsxDoc("ok", Seq.empty) // numbers-only workbook
      case Some(d) =>
        // si/t ride the shared walk; SpreadsheetML strings carry no
        // tab/br elements, so those slots get a sentinel no real tag
        // name can start with. PHONETIC runs (<rPh>, the furigana
        // Japanese workbooks attach) hold <t> text that is NOT the
        // cell's prose — their subtrees strip before the walk.
        val none = 0.toChar.toString
        XlsxDoc("ok", Docx.paragraphsTags(stripSubtrees(new String(d, UTF_8), "rPh"),
          "si", "t", none, none, none))
    }
  }

  /** Remove every `<tag …>…</tag>` subtree (boundary-checked name;
    * self-closed forms drop too). Phonetic-run exclusion — rPh does
    * not nest in published files; a torn subtree drops to end (the
    * completed-prefix discipline).
    */
  private[graft] def stripSubtrees(xml: String, tag: String): String = {
    val open = "<" + tag
    val close = "</" + tag + ">"
    if (!xml.contains(open)) return xml
    val sb = new java.lang.StringBuilder(xml.length)
    var i = 0
    while (i < xml.length) {
      val at = xml.indexOf(open, i)
      if (at < 0) { sb.append(xml, i, xml.length); i = xml.length }
      else {
        val after = at + open.length
        val bounded = after < xml.length && (xml.charAt(after) == '>' ||
          xml.charAt(after) == '/' || Character.isWhitespace(xml.charAt(after)))
        if (!bounded) { sb.append(xml, i, after); i = after }
        else {
          sb.append(xml, i, at): Unit
          val gt = xml.indexOf('>', at)
          if (gt < 0) i = xml.length // torn tag: subtree drops to end
          else if (xml.charAt(gt - 1) == '/') i = gt + 1 // self-closed
          else {
            val end = xml.indexOf(close, gt)
            i = if (end < 0) xml.length else end + close.length
          }
        }
      }
    }
    sb.toString
  }

  /** One row per document: (media_id, stage, n_strings, text) — the
    * office-family shape (`text` = strings joined by NEWLINE).
    * Map-only.
    */
  def textRows(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, b) =>
        val d = read(b)
        (id, d.stage, d.strings.length,
          if (d.stage == "ok") d.strings.mkString("\n") else null)
      }
      .toDF(idCol, "stage", "n_strings", "text")
  }

  // ---- fixture writer (tests + gates only) ----

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /** Minimal valid xlsx: content types, workbook, and a sharedStrings
    * part over `strings` — every SECOND item written in the rich-run
    * form (split at midpoint) to prove run concatenation.
    */
  def xlsx(strings: Seq[String], withSharedStrings: Boolean = true): Array[Byte] = {
    val contentTypes =
      """<?xml version="1.0"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |  <Default Extension="xml" ContentType="application/xml"/>
        |</Types>""".stripMargin
    val workbook =
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheets><sheet name="Sheet1" sheetId="1"/></sheets>
        |</workbook>""".stripMargin
    val sis = strings.zipWithIndex.map { case (s, i) =>
      if (i % 2 == 1 && s.length >= 2) {
        val mid = s.length / 2
        s"<si><r><rPr/><t xml:space=\"preserve\">${xmlEscape(s.substring(0, mid))}</t></r>" +
          s"<r><t xml:space=\"preserve\">${xmlEscape(s.substring(mid))}</t></r></si>"
      } else s"<si><t xml:space=\"preserve\">${xmlEscape(s)}</t></si>"
    }.mkString
    val shared =
      s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.length}">$sis</sst>"""
    ZipShard.zip(Seq(
      ("[Content_Types].xml", contentTypes.getBytes(UTF_8)),
      ("xl/workbook.xml", workbook.getBytes(UTF_8))) ++
      (if (withSharedStrings) Seq(("xl/sharedStrings.xml", shared.getBytes(UTF_8)))
      else Seq.empty), deflate = false)
  }
}
