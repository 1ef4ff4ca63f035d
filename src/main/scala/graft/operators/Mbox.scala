package graft.operators

import java.nio.charset.StandardCharsets.{ISO_8859_1, US_ASCII}

import org.apache.spark.sql.DataFrame

/** Mbox/email ingest — mailing-list archives (the classic public
  * corpora: kernel lists, Apache lists, Usenet mirrors) ship as mbox:
  * messages concatenated behind `From ` separator lines, each an
  * RFC 5322 message whose body may be quoted-printable or base64
  * encoded (RFC 2045) and declared in any charset — which is exactly
  * the strict 21-charset layer the WARC path already owns
  * ([[Warc.decodeCharset]]), reused verbatim so mail and web text can
  * never disagree about what a charset means.
  *
  * In contract:
  *   - the mboxrd convention: body lines matching `>+From ` lose one
  *     `>` (the writer added it so bodies can't forge separators);
  *   - folded headers unfold (continuation lines join with one space);
  *   - RFC 2047 encoded-words in headers (`=?cs?B|Q?…?=`) decode —
  *     B (base64) and Q (quoted-printable with `_` = space) — through
  *     the same strict charset layer, invalid tokens kept verbatim
  *     (visible, never a guess);
  *   - Content-Transfer-Encoding 7bit/8bit/binary (identity),
  *     quoted-printable (soft breaks, `=XX`), base64 (MIME decoder,
  *     all-or-NULL on junk);
  *   - multipart bodies: the FIRST `text/plain` part wins (the
  *     convention mail corpora extract), nested multipart to depth 2;
  *     a message with no text/plain keeps NULL text — countable, like
  *     a media fetch in the crawl ledger.
  *
  * Torn final messages keep the completed prefix; budgets bound
  * hostile messages. Map-only over (media_id, mbox) rows. Reference
  * scope: north-star corpus surface (the reference ingests line JSON
  * only — `App.java:136-162`).
  */
object Mbox {

  /** One parsed message: headers of record plus the decoded body
    * (null when the wire layers refuse or no text/plain part exists).
    */
  final case class Msg(from: String, subject: String, date: String,
      messageId: String, text: String)

  /** Split an mbox into raw messages (separator lines excluded,
    * mboxrd `>From ` unquoting applied).
    */
  def messages(mbox: String, maxMessages: Int = 100000): Seq[String] = {
    if (mbox == null) return Seq.empty
    val lines = mbox.split("\n", -1)
    val out = Vector.newBuilder[String]
    var cur: java.lang.StringBuilder = null
    var n = 0
    def flush(): Unit = {
      if (cur != null && n < maxMessages) { out += cur.toString; n += 1 }
      cur = null
    }
    lines.foreach { line0 =>
      val line = if (line0.endsWith("\r")) line0.substring(0, line0.length - 1) else line0
      if (line.startsWith("From ")) { flush(); cur = new java.lang.StringBuilder() }
      else if (cur != null) {
        // mboxrd: ">From ", ">>From ", … lose exactly one '>'
        val unquoted = {
          var i = 0
          while (i < line.length && line.charAt(i) == '>') i += 1
          if (i > 0 && line.startsWith("From ", i)) line.substring(1) else line
        }
        if (cur.length() > 0) cur.append('\n'): Unit
        cur.append(unquoted): Unit
      }
    }
    flush()
    out.result()
  }

  /** Unfold headers: (lower-name → value) of the FIRST occurrence,
    * continuation lines joined with one space.
    */
  private[operators] def headers(head: String): Map[String, String] = {
    val m = scala.collection.mutable.LinkedHashMap[String, String]()
    var name: String = null
    var value: java.lang.StringBuilder = null
    def flush(): Unit = {
      if (name != null && !m.contains(name)) m(name) = value.toString.trim
      name = null; value = null
    }
    head.split("\n", -1).foreach { line =>
      if (line.nonEmpty && (line.charAt(0) == ' ' || line.charAt(0) == '\t')) {
        if (value != null) value.append(' ').append(line.trim): Unit
      } else {
        flush()
        val c = line.indexOf(':')
        if (c > 0) {
          name = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          value = new java.lang.StringBuilder(line.substring(c + 1).trim)
        }
      }
    }
    flush()
    m.toMap
  }

  /** Quoted-printable decode (RFC 2045 §6.7): `=XX` bytes, `=`-EOL
    * soft breaks; a junk escape passes through verbatim (lenient —
    * real mail is full of them).
    */
  private[operators] def decodeQp(s: String, underscoreIsSpace: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 2 < s.length &&
        Character.digit(s.charAt(i + 1), 16) >= 0 && Character.digit(s.charAt(i + 2), 16) >= 0) {
        out.write(Character.digit(s.charAt(i + 1), 16) * 16 + Character.digit(s.charAt(i + 2), 16))
        i += 3
      } else if (c == '=' && i + 1 < s.length && s.charAt(i + 1) == '\n') {
        i += 2 // soft break
      } else if (c == '=' && i + 2 < s.length && s.charAt(i + 1) == '\r' && s.charAt(i + 2) == '\n') {
        i += 3 // soft break, CRLF
      } else if (c == '_' && underscoreIsSpace) {
        out.write(' '); i += 1
      } else if (c == '=' && i + 1 >= s.length) {
        i += 1 // trailing soft break at end of input
      } else {
        out.write(c & 0xFF); i += 1 // bodies ride as latin-1-lossless chars
      }
    }
    out.toByteArray
  }

  /** RFC 2047 encoded-words in a header value: `=?cs?B|Q?data?=`
    * decodes through the strict charset layer; an invalid token stays
    * VERBATIM (visible), and adjacent encoded words merge without the
    * separating whitespace (the RFC rule real subjects rely on).
    */
  private[operators] def decodeHeader(v: String): String = {
    if (v == null || !v.contains("=?")) return v
    val out = new java.lang.StringBuilder()
    var i = 0
    var lastWasWord = false
    while (i < v.length) {
      val at = v.indexOf("=?", i)
      if (at < 0) { out.append(v.substring(i)); i = v.length }
      else {
        val between = v.substring(i, at)
        val q2 = v.indexOf('?', at + 2)
        val q3 = if (q2 < 0) -1 else v.indexOf('?', q2 + 1)
        val end = if (q3 < 0) -1 else v.indexOf("?=", q3 + 1)
        val decoded: String =
          if (q2 < 0 || q3 < 0 || end < 0) null
          else {
            val cs = v.substring(at + 2, q2)
            val enc = v.substring(q2 + 1, q3).toLowerCase(java.util.Locale.ROOT)
            val data = v.substring(q3 + 1, end)
            val bytes: Array[Byte] = enc match {
              case "b" =>
                try java.util.Base64.getMimeDecoder.decode(data)
                catch { case _: IllegalArgumentException => null }
              case "q" => decodeQp(data, underscoreIsSpace = true)
              case _ => null
            }
            if (bytes == null) null else Warc.decodeCharset(bytes, cs)
          }
        if (decoded == null) { // invalid token: verbatim, visible
          out.append(between).append("=?"): Unit
          lastWasWord = false
          i = at + 2
        } else {
          // whitespace BETWEEN adjacent encoded words vanishes (RFC 2047 §6.2)
          if (!(lastWasWord && between.trim.isEmpty)) out.append(between): Unit
          out.append(decoded): Unit
          lastWasWord = true
          i = end + 2
        }
      }
    }
    out.toString
  }

  /** Content-Type parameter extraction (lenient, quoted or bare).
    * Case-insensitive match AT the original string's offsets
    * (regionMatches — a toLowerCase copy is not length-preserving and
    * would misalign the value capture after e.g. U+0130).
    */
  private def param(ct: String, name: String): String = {
    if (ct == null) return null
    val needle = name + "="
    var at = -1
    var i = 0
    val max = ct.length - needle.length
    while (at < 0 && i <= max) {
      // name boundary: `charset=` must not match inside `x-charset=`
      // (same bug class as the XmlDump.attrValue / Feeds fixes)
      val bounded = i == 0 || {
        val c = ct.charAt(i - 1)
        c == ';' || Character.isWhitespace(c)
      }
      if (bounded && ct.regionMatches(true, i, needle, 0, needle.length)) at = i
      else i += 1
    }
    if (at < 0) return null
    val s = at + needle.length
    if (s < ct.length && ct.charAt(s) == '"') {
      val e = ct.indexOf('"', s + 1)
      if (e < 0) null else ct.substring(s + 1, e)
    } else {
      var e = s
      while (e < ct.length && ct.charAt(e) != ';' && !Character.isWhitespace(ct.charAt(e))) e += 1
      ct.substring(s, e)
    }
  }

  /** Decode ONE entity's body text: transfer decode (identity / QP /
    * base64) then the strict charset layer. Null on refusal.
    */
  private def decodeBody(body: String, cte: String, charset: String): String = {
    val bytes: Array[Byte] = Option(cte).map(_.trim.toLowerCase(java.util.Locale.ROOT)) match {
      case None | Some("7bit") | Some("8bit") | Some("binary") | Some("") =>
        body.getBytes(ISO_8859_1) // chars arrived latin-1-lossless from the split
      case Some("quoted-printable") => decodeQp(body)
      case Some("base64") =>
        try java.util.Base64.getMimeDecoder.decode(body.getBytes(US_ASCII))
        catch { case _: IllegalArgumentException => null }
      case Some(_) => null // out-of-contract coding: visible NULL
    }
    if (bytes == null) null else Warc.decodeCharset(bytes, charset)
  }

  /** One message: headers of record (RFC 2047 decoded) + the decoded
    * text body, multipart resolved to the first text/plain part.
    */
  def parseMessage(raw: String, depth: Int = 0): Msg = {
    if (raw == null) return Msg(null, null, null, null, null)
    val sep = raw.indexOf("\n\n")
    val (head, body) =
      if (sep < 0) (raw, "") else (raw.substring(0, sep), raw.substring(sep + 2))
    val h = headers(head)
    val ct = h.getOrElse("content-type", null)
    val media = if (ct == null) "text/plain" else {
      val semi = ct.indexOf(';')
      (if (semi < 0) ct else ct.substring(0, semi)).trim.toLowerCase(java.util.Locale.ROOT)
    }
    val text: String =
      if (media.startsWith("multipart/")) {
        if (depth >= 2) null // nesting bomb: visible NULL
        else {
          val boundary = param(ct, "boundary")
          if (boundary == null) null
          else {
            val parts = body.split(
              java.util.regex.Pattern.quote("--" + boundary), -1)
              .drop(1) // preamble
              .takeWhile(p => !p.startsWith("--")) // the closing delimiter
              .map(_.stripPrefix("\r\n").stripPrefix("\n"))
            parts.iterator
              .map(p => parseMessage(p, depth + 1))
              .collectFirst { case m if m.text != null => m.text }
              .orNull
          }
        }
      } else if (media == "text/plain") {
        decodeBody(body, h.getOrElse("content-transfer-encoding", null), param(ct, "charset"))
      } else null // html-only or media: countable NULL at this layer
    Msg(
      decodeHeader(h.getOrElse("from", null)),
      decodeHeader(h.getOrElse("subject", null)),
      h.getOrElse("date", null),
      h.getOrElse("message-id", null),
      text)
  }

  /** Messages per archive row: (media_id, msg_idx, from, subject,
    * date, message_id, text). Map-only.
    */
  def messageRows(df: DataFrame, idCol: String, mboxCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(mboxCol))
      .as[(Long, String)]
      .flatMap { case (id, mb) =>
        messages(mb).zipWithIndex.map { case (raw, i) =>
          val m = parseMessage(raw)
          (id, i, m.from, m.subject, m.date, m.messageId, m.text)
        }
      }
      .toDF(idCol, "msg_idx", "from", "subject", "date", "message_id", "text")
  }
}
