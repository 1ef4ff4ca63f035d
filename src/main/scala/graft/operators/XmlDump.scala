package graft.operators

import org.apache.spark.sql.DataFrame

/** XML-dump page extraction + wikitext plain-texting — the published-
  * encyclopedia dump as a documents source: a MediaWiki-style
  * `pages-articles` export is ONE huge XML document of `<page>`
  * elements (title / ns / id / optional `<redirect>` / revision
  * `<text>`), shipped inside the multistream bzip2 layout
  * ([[DumpDecode]]), and its article bodies are WIKITEXT that must be
  * stripped to plain prose before any tokenizer or dedup sees them.
  *
  * The page scanner is hand-rolled and LENIENT (the family's
  * untrusted-input contract, like [[Html]]'s tag walk): no DTD, no
  * namespace machinery, no entity expansion beyond the XML five +
  * numeric — a dump is machine-written, so structural surprises are
  * CORRUPTION to degrade on, not grammar to support. A torn final
  * `<page>` (the normal case when a blob is cut mid-batch) drops that
  * page and ends the walk; a page missing its id/title keeps the row
  * with null/-1 so the degrade is countable. Per-page text budgets
  * bound a hostile blob.
  *
  * The wikitext strip is a fixed, documented pass order (comments →
  * refs → nested templates → nested tables → File/Image/Category links
  * → wiki links → external links → bold/italic quotes → heading lines
  * → residual tags → entities) chosen so each pass cannot re-expose
  * syntax a later pass already handled; it deliberately does NOT
  * collapse whitespace — layout normalization is a separate concern
  * with its own operator. Everything is map-only over
  * (media_id, xml) rows. Reference scope: the reference engine parses
  * line JSON only (`App.java:136-162`); dump ingest is north-star
  * surface for the corpus path.
  */
object XmlDump {

  /** One extracted page. `page_id` is -1 when the id element is
    * missing/junk; `redirect` is the target title or null; `text` is
    * the LAST revision's raw wikitext ("" for a self-closed `<text/>`,
    * null when absent or over budget); `rev_id` is that same LAST
    * revision's `<id>` (-1 when absent) — the monotone version an
    * incremental dump merge keys on.
    */
  final case class WikiPage(page_id: Long, ns: Int, title: String, redirect: String,
      text: String, rev_id: Long = -1L)

  /** XML entity decode: the five predefined + numeric (dec/hex), one
    * left-to-right pass so `&amp;lt;` correctly yields the four
    * characters `&lt;`. Unknown entities pass through verbatim.
    */
  def decodeEntities(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 12) { out.append(c); i += 1 }
        else {
          val name = s.substring(i + 1, semi)
          val rep: String = name match {
            case "lt" => "<"
            case "gt" => ">"
            case "amp" => "&"
            case "quot" => "\""
            case "apos" => "'"
            case _ if name.startsWith("#x") || name.startsWith("#X") =>
              numericEntity(name.substring(2), 16)
            case _ if name.startsWith("#") =>
              numericEntity(name.substring(1), 10)
            case _ => null
          }
          if (rep == null) { out.append(c); i += 1 }
          else { out.append(rep); i = semi + 1 }
        }
      }
    }
    out.toString
  }

  /** Numeric character reference → string, or null on junk. Surrogate
    * code points are REJECTED (XML forbids them as character
    * references; emitting a lone surrogate would build malformed
    * UTF-16 that downstream UTF-8 encoding silently mangles to U+FFFD
    * — worse than passing the reference through verbatim).
    */
  private def numericEntity(digits: String, radix: Int): String =
    try {
      val cp = Integer.parseInt(digits, radix)
      if (Character.isValidCodePoint(cp) && (cp < 0xD800 || cp > 0xDFFF))
        new String(Character.toChars(cp))
      else null
    } catch { case _: Exception => null }

  /** First `<tag>content</tag>` inside [from, until): decoded content,
    * or null when absent/torn. Attribute-bearing opens match too.
    */
  private[operators] def firstElem(s: String, tag: String, from: Int, until: Int): String = {
    var p = from
    while (p < until) {
      val open = s.indexOf("<" + tag, p)
      if (open < 0 || open >= until) return null
      val after = open + 1 + tag.length
      if (after < until &&
        (s.charAt(after) == '>' || s.charAt(after) == ' ' || s.charAt(after) == '/')) {
        val gt = s.indexOf('>', after)
        if (gt < 0 || gt >= until) return null
        if (s.charAt(gt - 1) == '/') return "" // self-closed
        val close = s.indexOf("</" + tag + ">", gt + 1)
        if (close < 0 || close >= until) return null
        val raw = s.substring(gt + 1, close)
        // CDATA content is LITERAL — no entity decode (real feeds wrap
        // titles/links this way constantly; dumps never do, harmlessly)
        val t = raw.trim
        if (t.startsWith("<![CDATA[") && t.endsWith("]]>"))
          return t.substring(9, t.length - 3)
        return decodeEntities(raw)
      }
      p = after // e.g. "<textarea" while looking for "<text"
    }
    null
  }

  /** Lenient `name="value"` attribute extraction from raw tag text
    * (entity-decoded), shared by the redirect parser and the feed
    * reader. The match is anchored at an attribute-NAME boundary (the
    * char before must be whitespace), so `data-href="…"` never
    * satisfies `href`. Null when absent/torn.
    */
  private[operators] def attrValue(tag: String, name: String): String = {
    val needle = name + "=\""
    var at = tag.indexOf(needle)
    while (at >= 0) {
      if (at > 0 && Character.isWhitespace(tag.charAt(at - 1))) {
        val vs = at + needle.length
        val ve = tag.indexOf('"', vs)
        return if (ve < 0) null else decodeEntities(tag.substring(vs, ve))
      }
      at = tag.indexOf(needle, at + 1)
    }
    null
  }

  /** Extract every complete `<page>` in document order (torn final
    * page dropped; the walk is the multistream member's natural
    * boundary). `maxTextLen` refuses a single page body over budget
    * (text → null, page kept) — all-or-NULL, never truncated text.
    */
  def pages(xml: String, maxPages: Int = 100000, maxTextLen: Int = 4 << 20): Seq[WikiPage] = {
    if (xml == null) return Seq.empty
    val out = Vector.newBuilder[WikiPage]
    var p = 0
    var n = 0
    while (n < maxPages) {
      val open = xml.indexOf("<page>", p)
      if (open < 0) return out.result()
      val close = xml.indexOf("</page>", open)
      if (close < 0) return out.result() // torn final page
      val end = close

      val title = firstElem(xml, "title", open, end)
      val ns = Option(firstElem(xml, "ns", open, end)).flatMap(_.trim.toIntOption).getOrElse(0)
      // the page id is the first <id> BEFORE the revision block (the
      // revision carries its own <id>)
      val revAt = {
        val r = xml.indexOf("<revision>", open)
        if (r < 0 || r > end) end else r
      }
      val pageId = Option(firstElem(xml, "id", open, revAt))
        .flatMap(_.trim.toLongOption).getOrElse(-1L)

      val redirect = {
        val r = xml.indexOf("<redirect", open)
        if (r < 0 || r >= end) null
        else {
          val gt = xml.indexOf('>', r)
          if (gt < 0 || gt >= end) null
          else attrValue(xml.substring(r, gt), "title")
        }
      }

      // LAST <text …> in the page: pages-articles carries one revision,
      // but a multi-revision export means the newest body
      val text = {
        var last = -1
        var q = open
        var done = false
        while (!done) {
          val t = xml.indexOf("<text", q)
          if (t < 0 || t >= end) done = true
          else {
            val after = t + 5
            if (after < end && (xml.charAt(after) == '>' || xml.charAt(after) == ' ' ||
              xml.charAt(after) == '/')) last = t
            q = after
          }
        }
        if (last < 0) null
        else {
          val gt = xml.indexOf('>', last)
          if (gt < 0 || gt >= end) null
          else if (xml.charAt(gt - 1) == '/') ""
          else {
            val tc = xml.indexOf("</text>", gt + 1)
            if (tc < 0 || tc > end) null
            else if (tc - gt - 1 > maxTextLen) null // over budget: refuse, visibly
            else decodeEntities(xml.substring(gt + 1, tc))
          }
        }
      }

      // the LAST revision's own <id> — the version the text came from
      val revId = {
        var lastRev = -1
        var q = revAt
        while (q < end) {
          val r = xml.indexOf("<revision>", q)
          if (r < 0 || r >= end) q = end else { lastRev = r; q = r + 10 }
        }
        if (lastRev < 0) -1L
        else Option(firstElem(xml, "id", lastRev, end))
          .flatMap(_.trim.toLongOption).getOrElse(-1L)
      }

      out += WikiPage(pageId, ns, title, redirect, text, revId)
      n += 1
      p = close + 7
    }
    out.result()
  }

  /** Internal-link TARGETS of a wikitext body — the dump's edge list,
    * extracted BEFORE [[stripWikitext]] erases the brackets. Every
    * `[[…]]` open is scanned (so a link inside a media caption counts,
    * as MediaWiki renders it); the target is the body up to the first
    * `|`, normalized the way page titles collapse: `#fragment`
    * stripped (a section link targets its page), underscores are
    * spaces, space runs collapse, first letter upper-cases
    * (MediaWiki's case-insensitive initial). Media/category links,
    * fragment-only self links, empty and newline-bearing targets are
    * dropped.
    */
  def wikiLinks(text0: String, maxLinks: Int = 10000): Seq[String] = {
    if (text0 == null) return Seq.empty
    // comments first: a commented-out [[link]] is never rendered, so it
    // must not become a graph edge
    val text = removeComments(text0)
    val out = Vector.newBuilder[String]
    var i = 0
    var n = 0
    while (n < maxLinks) {
      val open = text.indexOf("[[", i)
      if (open < 0) return out.result()
      i = open + 2
      if (!hasDropPrefix(text, open + 2)) {
        val close = text.indexOf("]]", open + 2)
        if (close >= 0) {
          var body = text.substring(open + 2, close)
          val pipe = body.indexOf('|')
          if (pipe >= 0) body = body.substring(0, pipe)
          val hash = body.indexOf('#')
          if (hash >= 0) body = body.substring(0, hash)
          body = body.replace('_', ' ').trim.replaceAll(" +", " ")
          if (body.nonEmpty && body.indexOf('\n') < 0) {
            val canon =
              if (Character.isLowerCase(body.charAt(0)))
                body.substring(0, 1).toUpperCase(java.util.Locale.ROOT) + body.substring(1)
              else body
            out += canon
            n += 1
          }
        }
      }
    }
    out.result()
  }

  // ---- wikitext → plain text ----

  /** Remove nested `open…close` regions (innermost-aware stack scan).
    * An unbalanced opener removes through the end — wikitext after a
    * torn template is template ARGUMENTS, not prose.
    */
  private def removeNested(s: String, open: String, close: String): String = {
    if (s.indexOf(open) < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    var depth = 0
    while (i < s.length) {
      if (s.startsWith(open, i)) { depth += 1; i += open.length }
      else if (depth > 0 && s.startsWith(close, i)) { depth -= 1; i += close.length }
      else {
        if (depth == 0) out.append(s.charAt(i))
        i += 1
      }
    }
    out.toString
  }

  /** Remove `<ref …>…</ref>` and self-closed `<ref …/>` (the citation
    * bodies that would otherwise leak into prose). Lower-case tags —
    * dumps are machine-written. Unclosed ref removes to end.
    */
  private def removeRefs(s: String): String = {
    if (s.indexOf("<ref") < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.startsWith("<ref", i) &&
        (i + 4 >= s.length || s.charAt(i + 4) == '>' || s.charAt(i + 4) == ' ' || s.charAt(i + 4) == '/')) {
        val gt = s.indexOf('>', i)
        if (gt < 0) i = s.length // torn open tag: drop the tail
        else if (s.charAt(gt - 1) == '/') i = gt + 1
        else {
          val close = s.indexOf("</ref>", gt + 1)
          i = if (close < 0) s.length else close + 6
        }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  private def removeComments(s: String): String = {
    if (s.indexOf("<!--") < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.startsWith("<!--", i)) {
        val close = s.indexOf("-->", i + 4)
        i = if (close < 0) s.length else close + 3
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** Media/category link prefixes whose whole `[[…]]` (nesting-aware —
    * captions embed links) is non-prose.
    */
  private val DropLinkPrefixes = Seq("file:", "image:", "category:")

  /** Case-insensitive prefix test AT the original string's offsets —
    * never against a `toLowerCase` copy, which is not length-preserving
    * (U+0130 'İ' lowers to two chars) and would misalign every check
    * after such a char in e.g. Turkish wikitext.
    */
  private def hasDropPrefix(s: String, at: Int): Boolean =
    DropLinkPrefixes.exists(p => s.regionMatches(true, at, p, 0, p.length))

  private def removeMediaLinks(s: String): String = {
    if (s.indexOf("[[") < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.startsWith("[[", i) && hasDropPrefix(s, i + 2)) {
        var depth = 1
        var j = i + 2
        while (j < s.length && depth > 0) {
          if (s.startsWith("[[", j)) { depth += 1; j += 2 }
          else if (s.startsWith("]]", j)) { depth -= 1; j += 2 }
          else j += 1
        }
        i = j // torn media link: drop the tail (caption syntax, not prose)
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** `[[target|label]]` → label, `[[target]]` → target — resolved
    * inside-out in ONE left-to-right pass (a bracket stack, the
    * [[removeMediaLinks]] shape): labels containing links merge before
    * their enclosing link resolves, and the pass is linear in the page
    * size where a rebuild-per-link loop was quadratic (a hostile
    * list-article with thousands of links must not pin an executor
    * core). A `[[` with no close contributes its content without the
    * brackets (visible degrade); a stray `]]` at depth 0 is prose.
    */
  private def resolveWikiLinks(s: String): String = {
    if (s.indexOf("[[") < 0) return s
    var frames = List(new java.lang.StringBuilder(s.length))
    var i = 0
    while (i < s.length) {
      if (s.startsWith("[[", i)) { frames = new java.lang.StringBuilder() :: frames; i += 2 }
      else if (frames.lengthCompare(1) > 0 && s.startsWith("]]", i)) {
        val body = frames.head.toString
        frames = frames.tail
        // label = everything after the FIRST pipe (MediaWiki renders
        // extra pipes literally inside the label)
        val pipe = body.indexOf('|')
        frames.head.append(if (pipe >= 0) body.substring(pipe + 1) else body)
        i += 2
      } else { frames.head.append(s.charAt(i)); i += 1 }
    }
    // torn opens: fold content outward, brackets dropped
    while (frames.lengthCompare(1) > 0) {
      val inner = frames.head.toString
      frames = frames.tail
      frames.head.append(inner)
    }
    frames.head.toString
  }

  /** `[scheme://url label]` → label, `[scheme://url]` → "". */
  private def resolveExternalLinks(s: String): String = {
    if (s.indexOf('[') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '[' &&
        (s.startsWith("http://", i + 1) || s.startsWith("https://", i + 1) ||
          s.startsWith("ftp://", i + 1) || s.startsWith("//", i + 1))) {
        val close = s.indexOf(']', i + 1)
        if (close < 0) { out.append(s.charAt(i)); i += 1 } // torn: keep the char
        else {
          val body = s.substring(i + 1, close)
          val sp = body.indexOf(' ')
          if (sp >= 0) out.append(body.substring(sp + 1))
          i = close + 1
        }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** `== Heading ==` lines → their inner text (trailing whitespace
    * after the closing run is legal — MediaWiki still renders the
    * heading).
    */
  private def stripHeadings(s: String): String =
    s.split("\n", -1).map { line =>
      var end = line.length
      while (end > 0 && (line.charAt(end - 1) == ' ' || line.charAt(end - 1) == '\t')) end -= 1
      var a = 0
      while (a < end && line.charAt(a) == '=') a += 1
      var b = end
      while (b > a && line.charAt(b - 1) == '=') b -= 1
      if (a >= 1 && b < end && b > a) line.substring(a, b).trim
      else line
    }.mkString("\n")

  private def stripTags(s: String): String = {
    if (s.indexOf('<') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '<') {
        val gt = s.indexOf('>', i + 1)
        if (gt < 0) { out.append(s.charAt(i)); i += 1 } // lone '<' is prose
        else i = gt + 1
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** Wikitext → plain prose, in the documented pass order. Whitespace
    * is preserved as the removals leave it (no collapsing here).
    */
  def stripWikitext(src: String): String = {
    if (src == null) return null
    var s = removeComments(src)
    s = removeRefs(s)
    s = removeNested(s, "{{", "}}")
    s = removeNested(s, "{|", "|}")
    s = removeMediaLinks(s)
    s = resolveWikiLinks(s)
    s = resolveExternalLinks(s)
    s = s.replace("'''''", "").replace("'''", "").replace("''", "")
    s = stripHeadings(s)
    s = stripTags(s)
    decodeEntities(s)
  }

  /** Page rows per dump blob: (media_id, page_idx, page_id, rev_id,
    * ns, title, redirect, text). Map-only.
    */
  def pageRows(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(xmlCol))
      .as[(Long, String)]
      .flatMap { case (id, xml) =>
        pages(xml).zipWithIndex.map { case (pg, i) =>
          (id, i, pg.page_id, pg.rev_id, pg.ns, pg.title, pg.redirect, pg.text)
        }
      }
      .toDF(idCol, "page_idx", "page_id", "rev_id", "ns", "title", "redirect", "text")
  }

  /** Incremental dump MERGE — how a corpus tracks a published dump
    * between full exports: the add/changes generation wins per page
    * ONLY when its revision id is NEWER; pages absent from the new
    * generation carry forward; a delta row whose revision is OLDER
    * than the snapshot's is `stale` and loses WHOLE-ROW (replaying an
    * out-of-order delta must never regress a page). Every page gets a
    * verdict the refresh audit counts (`added` / `updated` /
    * `unchanged` / `stale` / `carried`), and the winning GENERATION's
    * row survives intact — never a per-column mix, which would stamp
    * an old body with a new revision id (or resurrect a dropped
    * redirect) and defeat the all-or-NULL visibility the text budget
    * exists for. Both inputs are [[pageRows]]-shaped (need `page_id` +
    * `rev_id`). One full-outer join on the page key — the
    * dump-flavored sibling of the CDC apply; at 100 TB the snapshot
    * side arrives hash-partitioned by page_id from the previous merge,
    * so only the (much smaller) delta side reshuffles.
    */
  def mergeDumps(oldPages: DataFrame, newPages: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    // ID-LESS pages (the page_id = -1 parse degrade) never enter the
    // join: an equality key shared by every degrade row would fan out
    // M×N and make the verdict accounting meaningless. They pass
    // through from BOTH generations with verdict `unkeyed` — still
    // countable, never merged.
    val o = oldPages.filter(col("page_id") =!= -1L).alias("o")
    val n = newPages.filter(col("page_id") =!= -1L).alias("n")
    val cols = newPages.columns.filter(_ != "page_id").toSeq
    val newWins = col("o.page_id").isNull ||
      (col("n.page_id").isNotNull && col("n.rev_id") > col("o.rev_id"))
    val verdict = when(col("o.page_id").isNull, "added")
      .when(col("n.page_id").isNull, "carried")
      .when(col("n.rev_id") > col("o.rev_id"), "updated")
      .when(col("n.rev_id") < col("o.rev_id"), "stale")
      .otherwise("unchanged")
    val merged = n.join(o, col("n.page_id") === col("o.page_id"), "full_outer")
      .select((coalesce(col("n.page_id"), col("o.page_id")).as("page_id") +:
        cols.map(c => when(newWins, col(s"n.$c")).otherwise(col(s"o.$c")).as(c)) :+
        verdict.as("verdict")): _*)
    val unkeyed = oldPages.unionByName(newPages)
      .filter(col("page_id") === -1L)
      .select((col("page_id") +: cols.map(col) :+ lit("unkeyed").as("verdict")): _*)
    merged.unionByName(unkeyed)
  }

  // ---- fixture builder (tests + gates only) ----

  /** One `<page>` element with XML-encoded content. `revId` defaults
    * to the id-derived fixture convention.
    */
  def pageXml(id: Long, ns: Int, title: String, redirect: Option[String], text: String,
      revId: Long = -1L): String = {
    def enc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")
    val red = redirect.map(r => s"""    <redirect title="${enc(r)}" />\n""").getOrElse("")
    val rid = if (revId >= 0) revId else id * 1000 + 1
    s"""  <page>
       |    <title>${enc(title)}</title>
       |    <ns>$ns</ns>
       |    <id>$id</id>
       |$red    <revision>
       |      <id>$rid</id>
       |      <text bytes="${text.length}">${enc(text)}</text>
       |    </revision>
       |  </page>
       |""".stripMargin
  }
}
