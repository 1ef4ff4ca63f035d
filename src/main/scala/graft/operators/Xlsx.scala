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
    if (Docx.isCfb(bytes)) return XlsxDoc(Docx.cfbStage(bytes), Seq.empty)
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

  /** One grid cell: sheet part number, 1-based row and column, and the
    * cell's TEXT value (shared-string resolved, inline-string
    * concatenated, or the raw `<v>` lexical form for number/bool/
    * error/formula cells — the deterministic closed form; display
    * formatting is a renderer concern).
    */
  final case class Cell(sheet: Int, row: Int, col: Int, value: String)

  final case class XlsxGrid(stage: String, cells: Seq[Cell])

  private val SheetName = "^xl/worksheets/sheet([0-9]+)\\.xml$".r

  /** Column letters of an A1 reference → 1-based column index
    * (`A`→1, `Z`→26, `AA`→27). Zero when the reference has no letters.
    */
  private[graft] def colOf(ref: String): Int = {
    var c = 0
    var i = 0
    while (i < ref.length && ref.charAt(i) >= 'A' && ref.charAt(i) <= 'Z') {
      c = c * 26 + (ref.charAt(i) - 'A' + 1)
      i += 1
    }
    c
  }

  /** SHEET-GRID walk — the text a worksheet's cell grid actually
    * carries, which [[read]]'s string-table view misses whole for
    * inline-string cells (streaming writers), number/formula values,
    * and row order: walk `xl/worksheets/sheetN.xml` parts in part
    * order, resolve each `<c>`:
    *
    *   - `t="s"` → sharedStrings\[v\] (the central table, rich runs
    *     already concatenated);
    *   - `t="inlineStr"` → the `<is>` subtree's `<t>` runs,
    *     concatenated (same grammar as an `<si>` item);
    *   - everything else (number, `t="str"` formula result, `t="b"`,
    *     `t="e"`) → the raw `<v>` lexical form;
    *
    * in ROW order: `r` attributes are authoritative where present
    * (files legally store rows/cells out of order), and an attribute-
    * less row/cell continues after its predecessor (the streaming-
    * writer shorthand, ECMA-376 §18.3.1.73). Cells with no value
    * never emit. A shared-string index past the table degrades the
    * DOCUMENT (`strings` — an inconsistent package, never a guess).
    */
  private[operators] def gridEntries(es: Seq[ZipShard.ZipEntry],
      maxCells: Int = 1 << 20): XlsxGrid = {
    val byName = es.map(e => e.name -> e.data).toMap
    if (!byName.contains("xl/workbook.xml")) return XlsxGrid("part", Seq.empty)
    val shared: IndexedSeq[String] = byName.get("xl/sharedStrings.xml") match {
      case None => IndexedSeq.empty
      case Some(d) =>
        val none = 0.toChar.toString
        Docx.paragraphsTags(stripSubtrees(new String(d, UTF_8), "rPh"),
          "si", "t", none, none, none).toIndexedSeq
    }
    val sheets = es.flatMap(e => e.name match {
      case SheetName(n) => Some((n.toInt, e.data))
      case _ => None
    }).sortBy(_._1)
    val out = Vector.newBuilder[Cell]
    var n = 0
    sheets.foreach { case (sheetNo, data) =>
      val xml = new String(data, UTF_8)
      var rowNo = 0
      var colNo = 0
      var i = 0
      var going = true
      // collected cells of the CURRENT sheet, sorted at the end: the r
      // attributes are authoritative, and files legally store rows out
      // of order — the emit order is always (row, col)
      val cells = scala.collection.mutable.ArrayBuffer[Cell]()
      while (going && i < xml.length && n < maxCells) {
        val lt = xml.indexOf('<', i)
        if (lt < 0) going = false
        else {
          val gt = xml.indexOf('>', lt)
          if (gt < 0) going = false // torn tag: completed cells keep
          else {
            val tag = xml.substring(lt + 1, gt)
            i = gt + 1
            if (tag.startsWith("row") && (tag.length == 3 ||
              tag.charAt(3) == ' ' || tag.charAt(3) == '/')) {
              rowNo = Option(XmlDump.attrValue(tag, "r")).flatMap(_.toIntOption)
                .getOrElse(rowNo + 1)
              colNo = 0
            } else if (tag.startsWith("c") && (tag.length == 1 ||
              tag.charAt(1) == ' ' || tag.charAt(1) == '/')) {
              val selfClose = tag.endsWith("/")
              colNo = Option(XmlDump.attrValue(tag, "r")).map(colOf)
                .filter(_ > 0).getOrElse(colNo + 1)
              val t = Option(XmlDump.attrValue(tag, "t")).getOrElse("n")
              if (!selfClose) {
                // the cell's subtree runs to </c>; read <v> or <is>
                val close = xml.indexOf("</c>", i)
                val sub = if (close < 0) "" else xml.substring(i, close)
                if (close >= 0) i = close + 4
                else going = false // torn cell drops, prior cells keep
                val value: String =
                  if (t == "inlineStr") {
                    val none = 0.toChar.toString
                    Docx.paragraphsTags("<si>" + sub + "</si>",
                      "si", "t", none, none, none).headOption.orNull
                  } else {
                    val vo = sub.indexOf("<v>")
                    val vc = sub.indexOf("</v>")
                    if (vo < 0 || vc < vo) null
                    else {
                      val raw = XmlDump.decodeEntities(sub.substring(vo + 3, vc))
                      if (t == "s") {
                        val idx = raw.trim.toIntOption.getOrElse(-1)
                        if (idx < 0 || idx >= shared.length)
                          return XlsxGrid("strings", Seq.empty)
                        shared(idx)
                      } else raw
                    }
                  }
                if (value != null && going) {
                  cells += Cell(sheetNo, if (rowNo == 0) 1 else rowNo, colNo, value)
                  n += 1
                }
              }
            }
          }
        }
      }
      out ++= cells.sortBy(c => (c.row, c.col))
    }
    XlsxGrid("ok", out.result())
  }

  def readGrid(bytes: Array[Byte]): XlsxGrid = {
    if (bytes == null) return XlsxGrid("zip", Seq.empty)
    if (Docx.isCfb(bytes)) return XlsxGrid(Docx.cfbStage(bytes), Seq.empty)
    val es = ZipShard.entries(bytes)
    if (es.isEmpty) return XlsxGrid("zip", Seq.empty)
    gridEntries(es)
  }

  /** One row per grid CELL: (media_id, sheet_no, row_no, col_no,
    * value), row-major per sheet. Degraded documents emit nothing here
    * ([[textRows]]/[[gridTextRows]] carry the countable stage).
    * Map-only.
    */
  def cellRows(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        readGrid(b).cells.map(c => (id, c.sheet, c.row, c.col, c.value))
      }
      .toDF(idCol, "sheet_no", "row_no", "col_no", "value")
  }

  /** The grid flattened to PROSE — what the curation pipeline feeds
    * on: per row, cells joined by TAB; rows by NEWLINE; sheets
    * concatenated in part order. A workbook with worksheet parts but
    * no textual cells yields "" (countable, distinct from a decode
    * NULL). Falls back to the shared-strings view when no worksheet
    * part exists (a strings-only package — the pre-grid surface).
    */
  private[graft] def gridText(es: Seq[ZipShard.ZipEntry]): (String, Int, String) = {
    if (!es.exists(e => SheetName.findFirstIn(e.name).isDefined)) {
      val d = readEntries(es)
      return (d.stage, d.strings.length,
        if (d.stage == "ok") d.strings.mkString("\n") else null)
    }
    val g = gridEntries(es)
    if (g.stage != "ok") return (g.stage, 0, null)
    val sb = new java.lang.StringBuilder
    var lastKey = (-1, -1)
    g.cells.foreach { c =>
      if (lastKey._1 >= 0)
        sb.append(if ((c.sheet, c.row) == lastKey) '\t' else '\n'): Unit
      sb.append(c.value): Unit
      lastKey = (c.sheet, c.row)
    }
    ("ok", g.cells.length, sb.toString)
  }

  /** One row per document: (media_id, stage, n_cells, text) over the
    * GRID view — [[gridText]]'s shape contract. Map-only.
    */
  def gridTextRows(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, b) =>
        if (b == null) (id, "zip", 0, null)
        else if (Docx.isCfb(b)) (id, Docx.cfbStage(b), 0, null)
        else {
          val es = ZipShard.entries(b)
          if (es.isEmpty) (id, "zip", 0, null)
          else {
            val (stage, nc, text) = gridText(es)
            (id, stage, nc, text)
          }
        }
      }
      .toDF(idCol, "stage", "n_cells", "text")
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

  /** 1-based column index → A1 letters (`1`→A, `27`→AA). */
  private def colRef(c: Int): String = {
    var n = c
    val sb = new java.lang.StringBuilder
    while (n > 0) {
      sb.insert(0, ('A' + (n - 1) % 26).toChar): Unit
      n = (n - 1) / 26
    }
    sb.toString
  }

  /** Minimal GRID xlsx: workbook, a sharedStrings table over the `s`
    * cells, and one worksheet whose rows are STORED in reverse order
    * with explicit `r` references — proving the reader emits by
    * reference, not storage order. Each row is (rowNo, cells), each
    * cell (kind, text) with kind `s` (shared-string ref), `is`
    * (inline string) or `n` (raw number value).
    */
  def xlsxGrid(rows: Seq[(Int, Seq[(String, String)])]): Array[Byte] = {
    val contentTypes =
      """<?xml version="1.0"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |  <Default Extension="xml" ContentType="application/xml"/>
        |</Types>""".stripMargin
    val workbook =
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheets><sheet name="Sheet1" sheetId="1"/></sheets>
        |</workbook>""".stripMargin
    val sharedList = rows.flatMap(_._2).collect { case ("s", v) => v }.distinct
    val sharedIdx = sharedList.zipWithIndex.toMap
    val rowsXml = rows.reverse.map { case (rn, cells) =>
      val cx = cells.zipWithIndex.map { case ((kind, v), ci) =>
        val ref = colRef(ci + 1) + rn
        kind match {
          case "s" => s"""<c r="$ref" t="s"><v>${sharedIdx(v)}</v></c>"""
          case "is" =>
            s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(v)}</t></is></c>"""
          case _ => s"""<c r="$ref"><v>${xmlEscape(v)}</v></c>"""
        }
      }.mkString
      s"""<row r="$rn" spans="1:${cells.length}">$cx</row>"""
    }.mkString
    val sheet =
      s"""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>$rowsXml</sheetData></worksheet>""".stripMargin
    val sis = sharedList.map(s =>
      s"""<si><t xml:space="preserve">${xmlEscape(s)}</t></si>""").mkString
    val shared =
      s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sharedList.length}">$sis</sst>"""
    ZipShard.zip(Seq(
      ("[Content_Types].xml", contentTypes.getBytes(UTF_8)),
      ("xl/workbook.xml", workbook.getBytes(UTF_8))) ++
      (if (sharedList.nonEmpty)
        Seq(("xl/sharedStrings.xml", shared.getBytes(UTF_8))) else Seq.empty) ++
      Seq(("xl/worksheets/sheet1.xml", sheet.getBytes(UTF_8))), deflate = false)
  }
}
