package graft.operators

import org.apache.spark.sql.DataFrame

/** OFFICE TRIAGE — the media-triage pattern applied to documents: a
  * real document dump is a MIXED bag of .docx/.pptx/.odt/legacy
  * binaries, and extensions lie, so routing happens on CONTENT: the
  * CFB signature marks an encrypted (or legacy binary) OLE container;
  * a zip routes by its distinguishing member (`word/document.xml` →
  * docx, `ppt/slides/slideN.xml` → pptx, ODF `content.xml` → odt);
  * everything else quarantines. Each routed document then flows
  * through ITS OWN shipped reader ([[Docx]]/[[Pptx]]/[[Odt]]) into
  * one unified (kind, n_units, text) frame — one scan, one map-only
  * stage, no decode resources spent before the route decides.
  */
object Office {

  private val SlidePattern = "^ppt/slides/slide[0-9]+\\.xml$".r

  /** Is this payload an RTF stream (`{\rtf` magic)? */
  private def isRtf(b: Array[Byte]): Boolean =
    b.length >= 5 && b(0) == '{' && b(1) == '\\' &&
      b(2) == 'r' && b(3) == 't' && b(4) == 'f'

  /** Route an already-opened archive by its distinguishing member —
    * the ONE rule set [[detect]] and [[routedText]] both consult.
    */
  private def detectEntries(names: Seq[String]): String =
    if (names.contains("word/document.xml")) "docx"
    else if (names.exists(n => SlidePattern.findFirstIn(n).isDefined)) "pptx"
    else if (names.contains("xl/workbook.xml")) "xlsx"
    else if (names.contains("content.xml")) "odt"
    else "zip"

  /** Content-based kind: `docx` | `pptx` | `xlsx` | `odt` | `rtf` |
    * `encrypted` | `zip` (a zip that is none of the four) |
    * `unknown`.
    */
  def detect(bytes: Array[Byte]): String = {
    if (bytes == null) return "unknown"
    if (Docx.isCfb(bytes)) return "encrypted"
    if (isRtf(bytes)) return "rtf"
    val es = ZipShard.entries(bytes)
    if (es.isEmpty) return "unknown"
    detectEntries(es.map(_.name))
  }

  /** One row per document: (media_id, kind, n_units, text) — the
    * routed extraction. `n_units` is the kind's own unit (paragraphs
    * for docx/odt/rtf, slides for pptx, strings for xlsx);
    * quarantined kinds keep NULL text with 0 units, countable per
    * kind. The route and the extraction share ONE archive walk — at
    * 100 TB the zip scan is the dominant per-document cost and is
    * never paid twice. Map-only.
    */
  def routedText(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, b) =>
        if (b == null) (id, "unknown", 0, null)
        else if (Docx.isCfb(b)) (id, "encrypted", 0, null)
        else if (isRtf(b)) {
          val d = Rtf.strip(b)
          (id, "rtf", d.paragraphs.length,
            if (d.stage == "ok") d.paragraphs.mkString("\n") else null)
        } else {
          val es = ZipShard.entries(b)
          if (es.isEmpty) (id, "unknown", 0, null)
          else detectEntries(es.map(_.name)) match {
            case "docx" =>
              val d = Docx.readEntries(es)
              (id, "docx", d.paragraphs.length,
                if (d.stage == "ok") d.paragraphs.mkString("\n") else null)
            case "pptx" =>
              val d = Pptx.readEntries(es)
              (id, "pptx", d.slides.length,
                if (d.stage == "ok") d.slides.flatMap(_._3).mkString("\n") else null)
            case "xlsx" =>
              val d = Xlsx.readEntries(es)
              (id, "xlsx", d.strings.length,
                if (d.stage == "ok") d.strings.mkString("\n") else null)
            case "odt" =>
              val d = Odt.readEntries(es)
              (id, "odt", d.paragraphs.length,
                if (d.stage == "ok") d.paragraphs.mkString("\n") else null)
            case kind => (id, kind, 0, null)
          }
        }
      }
      .toDF(idCol, "kind", "n_units", "text")
  }
}
