package graft.operators

import org.apache.spark.sql.DataFrame

/** OFFICE TRIAGE — the media-triage pattern applied to documents: a
  * real document dump is a MIXED bag of .docx/.pptx/.odt/legacy
  * binaries, and extensions lie, so routing happens on CONTENT. A CFB
  * signature opens the OLE walk ([[Cfb]]): a `WordDocument` stream is
  * a legacy Word binary (extracted via [[Doc]] — its own FIB flags
  * decide true encryption), `EncryptionInfo`+`EncryptedPackage` is an
  * encrypted OOXML package, anything else (xls/ppt/unparseable) is the
  * countable `cfb` bin. A zip routes by its distinguishing member
  * (`word/document.xml` → docx, `ppt/slides/slideN.xml` → pptx,
  * `xl/workbook.xml` → xlsx) — except ODF, which routes by the
  * MANDATORY `mimetype` member (odt/ods/odp — `content.xml` presence
  * alone would mislabel spreadsheets and decks as text documents).
  * Everything else quarantines. Each routed document then flows
  * through ITS OWN shipped reader ([[Docx]]/[[Pptx]]/[[Xlsx]]/[[Odt]]/
  * [[Doc]]) into one unified (kind, n_units, text) frame — one scan,
  * one map-only stage, no decode resources spent before the route
  * decides.
  */
object Office {

  private val SlidePattern = "^ppt/slides/slide[0-9]+\\.xml$".r

  /** Is this payload an RTF stream (`{\rtf` magic)? */
  private def isRtf(b: Array[Byte]): Boolean =
    b.length >= 5 && b(0) == '{' && b(1) == '\\' &&
      b(2) == 'r' && b(3) == 't' && b(4) == 'f'

  /** Route an already-opened zip archive by its distinguishing member
    * — the ONE rule set [[detect]] and [[routedText]] both consult.
    * ODF subtypes discriminate on the mandatory `mimetype` member
    * ([[Odt.subtype]]); a mimetype-less `content.xml` zip stays `odt`
    * (the lenient legacy route).
    */
  private def detectEntries(es: Seq[ZipShard.ZipEntry]): String = {
    val names = es.map(_.name)
    if (names.contains("word/document.xml")) "docx"
    else if (names.exists(n => SlidePattern.findFirstIn(n).isDefined)) "pptx"
    else if (names.contains("xl/workbook.xml")) "xlsx"
    else if (names.contains("content.xml")) Odt.subtype(es)
    else "zip"
  }

  /** Route a CFB container by its distinguishing stream: `doc`
    * (legacy Word binary) | `xls` (legacy Excel workbook) | `ppt`
    * (legacy PowerPoint) | `msg` (Outlook message) | `encrypted`
    * (fEncrypted .doc, or an encrypted OOXML shell) | `cfb`
    * (another/unparseable OLE).
    */
  private def detectCfb(doc: Cfb.CfbDoc): String =
    if (Cfb.isEncryptedOoxml(doc)) "encrypted"
    else doc.streams.get("WordDocument") match {
      case Some(wd) => if (Doc.fibEncrypted(wd)) "encrypted" else "doc"
      case None =>
        if (doc.streams.contains("Workbook") || doc.streams.contains("Book")) "xls"
        else if (doc.streams.contains("PowerPoint Document")) "ppt"
        else if (Msg.isMsg(doc)) "msg"
        else "cfb"
    }

  /** Content-based kind: `docx` | `pptx` | `xlsx` | `odt` | `ods` |
    * `odp` | `rtf` | `doc` | `xls` | `ppt` | `msg` | `encrypted` |
    * `cfb` | `zip` (a zip that is none of the routed families) |
    * `unknown`.
    */
  def detect(bytes: Array[Byte]): String = {
    if (bytes == null) return "unknown"
    if (Cfb.isCfb(bytes))
      return Cfb.parse(bytes).map(detectCfb).getOrElse("cfb")
    if (isRtf(bytes)) return "rtf"
    val es = ZipShard.entries(bytes)
    if (es.isEmpty) return "unknown"
    detectEntries(es)
  }

  /** One row per document: (media_id, kind, n_units, text) — the
    * routed extraction. `n_units` is the kind's own unit (paragraphs
    * for docx/odt/ods/odp/rtf/doc, slides for pptx, grid cells for
    * xlsx); quarantined kinds keep NULL text with 0 units, countable
    * per kind. The route and the extraction share ONE container walk
    * (zip entry list or CFB parse) — at 100 TB that scan is the
    * dominant per-document cost and is never paid twice. A legacy
    * `doc` whose FIB turns out encrypted/malformed AFTER the route
    * re-labels to its degrade stage, still countable. Map-only.
    */
  def routedText(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, b) =>
        if (b == null) (id, "unknown", 0, null)
        else if (Cfb.isCfb(b)) Cfb.parse(b) match {
          case None => (id, "cfb", 0, null)
          case Some(c) => detectCfb(c) match {
            case "doc" =>
              val d = Doc.readCfb(c)
              if (d.stage == "ok")
                (id, "doc", d.paragraphs.length, d.paragraphs.mkString("\n"))
              else (id, d.stage, 0, null) // encrypted/fib/clx, countable
            case "xls" =>
              val d = Xls.readCfb(c)
              if (d.stage == "ok")
                (id, "xls", d.cells.length, Xls.gridText(d.cells))
              else (id, d.stage, 0, null) // encrypted/biff/strings, countable
            case "ppt" =>
              val d = Ppt.readCfb(c)
              if (d.stage == "ok")
                (id, "ppt", d.paragraphs.length, d.paragraphs.mkString("\n"))
              else (id, d.stage, 0, null)
            case "msg" =>
              val d = Msg.readCfb(c)
              if (d.stage == "ok")
                (id, "msg", d.n_recipients, Msg.flatText(d))
              else (id, d.stage, 0, null)
            case kind => (id, kind, 0, null)
          }
        }
        else if (isRtf(b)) {
          val d = Rtf.strip(b)
          (id, "rtf", d.paragraphs.length,
            if (d.stage == "ok") d.paragraphs.mkString("\n") else null)
        } else {
          val es = ZipShard.entries(b)
          if (es.isEmpty) (id, "unknown", 0, null)
          else detectEntries(es) match {
            case "docx" =>
              val d = Docx.readEntries(es)
              (id, "docx", d.paragraphs.length,
                if (d.stage == "ok") d.paragraphs.mkString("\n") else null)
            case "pptx" =>
              val d = Pptx.readEntries(es)
              (id, "pptx", d.slides.length,
                if (d.stage == "ok") d.slides.flatMap(_._3).mkString("\n") else null)
            case "xlsx" =>
              // grid view (inline strings, numbers, row order); falls
              // back to the string table for worksheet-less packages
              val (stage, nCells, text) = Xlsx.gridText(es)
              (id, "xlsx", nCells, if (stage == "ok") text else null)
            case kind @ ("odt" | "ods" | "odp") =>
              val d = Odt.readEntries(es)
              (id, kind, d.paragraphs.length,
                if (d.stage == "ok") d.paragraphs.mkString("\n") else null)
            case kind => (id, kind, 0, null)
          }
        }
      }
      .toDF(idCol, "kind", "n_units", "text")
  }
}
