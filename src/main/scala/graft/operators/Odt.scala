package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame

/** ODT (OpenDocument Text, the OASIS/LibreOffice format) text
  * extraction — the other office prose container next to [[Docx]]: a
  * zip whose `content.xml` carries the body as `<text:p>` paragraphs
  * and `<text:h>` headings. Unlike OOXML (text inside `<w:t>` runs),
  * ODF puts text in the element CONTENT itself, so this walk collects
  * between-tag text nodes while inside a paragraph.
  *
  * Deterministic rules: `<text:tab/>` → TAB, `<text:line-break/>` →
  * NEWLINE, `<text:s text:c="n"/>` → n spaces (1 when unstated);
  * footnote/endnote bodies (`<text:note>`) and reviewer comments
  * (`<office:annotation>`) are EXCLUDED whole — their nested
  * paragraphs never surface (the header-part exclusion, in-line form);
  * headings count as paragraphs (they are the prose's lines); a torn
  * part keeps completed paragraphs. Degrades per the family contract:
  * junk → `zip`; password-protected ODF encrypts MEMBER-wise and
  * declares it in the manifest (`manifest:encryption-data`), so a
  * declaring archive → `encrypted`, never a garbage decode; a zip
  * without `content.xml` → `part`. Map-only.
  * Reference scope: the reference ingests line JSON only
  * (`App.java:136-162`).
  */
object Odt {

  final case class OdtDoc(stage: String, paragraphs: Seq[String])

  /** Element names whose whole subtree is chrome, not prose.
    * `presentation:notes` is the ODP speaker-notes body — the same
    * exclusion PPTX applies by part family, in-line here because ODF
    * keeps notes inside the page element.
    */
  private val ExcludeTags = Set("text:note", "office:annotation",
    "presentation:notes")

  /** ODF SUBTYPE from the mandatory `mimetype` member (first entry,
    * stored, per OASIS §3.3) — the spec-blessed discriminator: ODS
    * spreadsheets and ODP presentations carry `content.xml` too, so
    * routing on that member's PRESENCE alone would extract them
    * mislabeled (and per-kind admission accounting would lump them).
    * A missing/unknown mimetype with a `content.xml` stays `odt` (the
    * lenient legacy route, countable as such).
    */
  private[operators] def subtype(es: Seq[ZipShard.ZipEntry]): String =
    es.find(_.name == "mimetype")
      .map(e => new String(e.data, UTF_8).trim) match {
      case Some("application/vnd.oasis.opendocument.spreadsheet") => "ods"
      case Some("application/vnd.oasis.opendocument.presentation") => "odp"
      case _ => "odt"
    }

  private def named(tag: String, name: String): Boolean =
    tag.startsWith(name) && (tag.length == name.length || {
      val c = tag.charAt(name.length)
      c == '/' || Character.isWhitespace(c)
    })

  private[graft] def paragraphs(xml: String, maxParagraphs: Int = 100000,
      maxChars: Int = 16 << 20): Seq[String] = {
    val out = Vector.newBuilder[String]
    var n = 0
    var total = 0
    var inP = false
    var excludeDepth = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    var going = true
    while (going && i < xml.length && n < maxParagraphs && total < maxChars) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) going = false
      else {
        // text node between tags
        if (lt > i && inP && excludeDepth == 0)
          sb.append(xml, i, lt): Unit
        val gt = xml.indexOf('>', lt)
        if (gt < 0) going = false // torn tag: incomplete paragraph drops
        else {
          val tag = xml.substring(lt + 1, gt)
          val selfClose = tag.endsWith("/")
          i = gt + 1
          val isClose = tag.startsWith("/")
          val body = if (isClose) tag.substring(1) else tag
          if (ExcludeTags.exists(named(body, _))) {
            if (!selfClose) {
              if (isClose) { if (excludeDepth > 0) excludeDepth -= 1 }
              else excludeDepth += 1
            }
          } else if (excludeDepth > 0) {
            () // chrome subtree: everything inside is invisible
          } else if (named(body, "text:p") || named(body, "text:h")) {
            if (isClose) {
              if (inP) {
                out += XmlDump.decodeEntities(sb.toString)
                n += 1; total += sb.length; inP = false
              }
            } else if (selfClose) { out += ""; n += 1 } // empty paragraph
            else { inP = true; sb.setLength(0) }
          } else if (inP && named(body, "text:tab") && !isClose) sb.append('\t')
          else if (inP && named(body, "text:line-break") && !isClose) sb.append('\n')
          else if (inP && named(body, "text:s") && !isClose) {
            val c = Option(XmlDump.attrValue(tag, "text:c"))
              .flatMap(_.toIntOption).getOrElse(1)
            sb.append(" " * math.min(math.max(c, 0), 4096)): Unit
          }
          // every other element (spans, styles, frames) is structure:
          // its text nodes flow, its markers drop
        }
      }
    }
    out.result()
  }

  def read(bytes: Array[Byte]): OdtDoc = {
    if (bytes == null) return OdtDoc("zip", Seq.empty)
    val es = ZipShard.entries(bytes)
    if (es.isEmpty) return OdtDoc("zip", Seq.empty)
    readEntries(es)
  }

  /** The walk over an already-opened archive (the one-walk triage
    * path — see [[Docx.readEntries]]).
    */
  private[operators] def readEntries(es: Seq[ZipShard.ZipEntry]): OdtDoc = {
    val byName = es.map(e => e.name -> e.data).toMap
    // member-wise ODF encryption is declared in the manifest
    val manifest = byName.get("META-INF/manifest.xml")
      .map(d => new String(d, UTF_8))
    if (manifest.exists(_.contains("manifest:encryption-data")))
      return OdtDoc("encrypted", Seq.empty)
    byName.get("content.xml") match {
      case None => OdtDoc("part", Seq.empty)
      case Some(d) => OdtDoc("ok", paragraphs(new String(d, UTF_8)))
    }
  }

  /** One row per document: (media_id, stage, n_paragraphs, text) —
    * the [[Docx.textRows]] shape, one contract across the office
    * family. Map-only.
    */
  def textRows(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, b) =>
        val d = read(b)
        (id, d.stage, d.paragraphs.length,
          if (d.stage == "ok") d.paragraphs.mkString("\n") else null)
      }
      .toDF(idCol, "stage", "n_paragraphs", "text")
  }

  // ---- fixture writer (tests + gates only) ----

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /** Minimal valid ODT: mimetype first (stored, per spec), a manifest
    * (optionally declaring encryption), and content.xml over `paras`
    * — embedded TAB/NEWLINE become the explicit elements; a footnote
    * with poison text rides along to prove exclusion.
    */
  def odt(paras: Seq[String], encrypted: Boolean = false): Array[Byte] = {
    val manifest =
      s"""<?xml version="1.0"?>
         |<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">
         |  <manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"${
        if (encrypted) "><manifest:encryption-data/></manifest:file-entry" else "/"}>
         |</manifest:manifest>""".stripMargin
    val body = paras.map { p =>
      val inner = p.flatMap {
        case '\t' => "<text:tab/>"
        case '\n' => "<text:line-break/>"
        case c => xmlEscape(c.toString)
      }
      s"""<text:p text:style-name="P1">$inner</text:p>"""
    }.mkString
    val content =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<office:document-content
         |    xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
         |    xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
         |  <office:body><office:text>
         |    $body
         |    <text:p>tail<text:note text:note-class="footnote"><text:note-body>
         |      <text:p>FOOTNOTE MUST NOT SURFACE</text:p>
         |    </text:note-body></text:note> end</text:p>
         |  </office:text></office:body>
         |</office:document-content>""".stripMargin
    ZipShard.zip(Seq(
      ("mimetype", "application/vnd.oasis.opendocument.text".getBytes(UTF_8)),
      ("META-INF/manifest.xml", manifest.getBytes(UTF_8)),
      ("content.xml", content.getBytes(UTF_8))), deflate = false)
  }

  private val OdfManifest =
    """<?xml version="1.0"?>
      |<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">
      |  <manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>
      |</manifest:manifest>""".stripMargin

  /** Minimal valid ODP: the presentation mimetype (FIRST member,
    * stored), one draw:page per entry of `slides` (each a list of
    * paragraph texts inside a frame's text box), and a
    * `presentation:notes` body with poison text riding each page —
    * its exclusion is the speaker-notes proof.
    */
  def odp(slides: Seq[Seq[String]]): Array[Byte] = {
    val pages = slides.zipWithIndex.map { case (paras, i) =>
      val body = paras.map(p =>
        s"""<text:p>${xmlEscape(p)}</text:p>""").mkString
      s"""<draw:page draw:name="page${i + 1}">
         |  <draw:frame><draw:text-box>$body</draw:text-box></draw:frame>
         |  <presentation:notes><draw:frame><draw:text-box>
         |    <text:p>SPEAKER NOTES MUST NOT SURFACE</text:p>
         |  </draw:text-box></draw:frame></presentation:notes>
         |</draw:page>""".stripMargin
    }.mkString
    val content =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<office:document-content
         |    xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
         |    xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"
         |    xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"
         |    xmlns:presentation="urn:oasis:names:tc:opendocument:xmlns:presentation:1.0">
         |  <office:body><office:presentation>
         |    $pages
         |  </office:presentation></office:body>
         |</office:document-content>""".stripMargin
    ZipShard.zip(Seq(
      ("mimetype", "application/vnd.oasis.opendocument.presentation".getBytes(UTF_8)),
      ("META-INF/manifest.xml", OdfManifest.getBytes(UTF_8)),
      ("content.xml", content.getBytes(UTF_8))), deflate = false)
  }

  /** Minimal valid ODS: the spreadsheet mimetype and one table whose
    * rows carry string and number cells — ODF puts the DISPLAY text of
    * every cell in a `text:p`, so the shared walk reads the grid in
    * row-major document order.
    */
  def ods(rows: Seq[Seq[String]]): Array[Byte] = {
    val rowsXml = rows.map { cells =>
      val cx = cells.map(c =>
        s"""<table:table-cell office:value-type="string"><text:p>${xmlEscape(c)}</text:p></table:table-cell>""").mkString
      s"<table:table-row>$cx</table:table-row>"
    }.mkString
    val content =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<office:document-content
         |    xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
         |    xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"
         |    xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0">
         |  <office:body><office:spreadsheet>
         |    <table:table table:name="Sheet1">$rowsXml</table:table>
         |  </office:spreadsheet></office:body>
         |</office:document-content>""".stripMargin
    ZipShard.zip(Seq(
      ("mimetype", "application/vnd.oasis.opendocument.spreadsheet".getBytes(UTF_8)),
      ("META-INF/manifest.xml", OdfManifest.getBytes(UTF_8)),
      ("content.xml", content.getBytes(UTF_8))), deflate = false)
  }
}
