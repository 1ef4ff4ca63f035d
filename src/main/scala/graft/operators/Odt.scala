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

  /** Element names whose whole subtree is chrome, not prose. */
  private val ExcludeTags = Set("text:note", "office:annotation")

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
}
