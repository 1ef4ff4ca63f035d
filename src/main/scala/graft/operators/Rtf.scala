package graft.operators

import org.apache.spark.sql.DataFrame

/** RTF text extraction — the legacy document format two decades of
  * .doc-adjacent tooling exported: a `{\rtf1 …}` group tree of
  * control words and plain text. Like the LaTeX strip, a BOUNDED
  * deterministic scan, never a layout engine:
  *
  *   - groups nest with `{`/`}`; DESTINATION groups that carry
  *     non-prose (font/color/stylesheet tables, document info,
  *     embedded pictures, headers/footers/footnotes) skip WHOLE, as
  *     does every `{\*\…}` optional destination (the spec's rule:
  *     readers that don't know a starred destination must ignore it);
  *   - `\par` and `\line` break lines (paragraph boundaries), `\tab`
  *     is a TAB, `\~` a space, `\emdash`/`\endash`/`\lquote`/
  *     `\rquote`/`\ldblquote`/`\rdblquote`/`\bullet` their
  *     characters, `\{` `\}` `\\` the literals;
  *   - `\'xx` hex escapes decode as windows-1252 (the overwhelming
  *     default; other `\ansicpg` pages are out of the honest subset
  *     and their bytes degrade to U+FFFD, visible, never guessed);
  *   - `\uN` emits code point N (RTF writes it as a SIGNED 16-bit
  *     value: negatives wrap by +65536), then skips the `\ucN`
  *     fallback run (default 1) — including a following `\'xx`;
  *   - every other control word is formatting and vanishes, its
  *     single delimiting space consumed (the published tokenization);
  *   - output normalizes like the office family: lines trimmed,
  *     whitespace collapsed, empties dropped, joined by NEWLINE.
  *
  * Degrades: bytes that don't open with `{\rtf` → `parse` (countable);
  * a torn file keeps the completed prefix. Map-only. Reference scope:
  * the reference ingests line JSON only (`App.java:136-162`).
  */
object Rtf {

  /** Destination control words whose whole group is chrome. */
  private val SkipDests = Set("fonttbl", "colortbl", "stylesheet", "info",
    "pict", "header", "footer", "footnote", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf")

  final case class RtfText(stage: String, paragraphs: Seq[String])

  def strip(bytes: Array[Byte], maxChars: Int = 16 << 20): RtfText = {
    if (bytes == null) return RtfText("parse", Seq.empty)
    // RTF is 7-bit with \'xx escapes: latin-1 is the lossless carrier
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("{\\rtf")) return RtfText("parse", Seq.empty)
    val out = Vector.newBuilder[String]
    val sb = new java.lang.StringBuilder
    var total = 0
    def flush(): Unit = {
      // collapse SPACE runs only — explicit \tab characters are content
      val t = sb.toString.replaceAll(" +", " ").trim
      sb.setLength(0)
      if (t.nonEmpty) { out += t; total += t.length }
    }
    var i = 0
    val n = s.length
    var depth = 0
    var skipUntilDepth = -1 // inside a skipped destination when >= 0
    var uc = 1 // \ucN fallback length (simplification: global, not per-group)
    var pendingFallback = 0
    var groupJustOpened = false
    while (i < n && total < maxChars) {
      val c = s.charAt(i)
      val skipping = skipUntilDepth >= 0
      c match {
        case '{' =>
          depth += 1; groupJustOpened = true; i += 1
        case '}' =>
          depth = math.max(0, depth - 1)
          // the skipped destination ends when its own group closes
          if (skipUntilDepth >= 0 && depth < skipUntilDepth) skipUntilDepth = -1
          groupJustOpened = false
          i += 1
        case '\\' =>
          val opened = groupJustOpened
          groupJustOpened = false
          if (i + 1 >= n) i = n
          else s.charAt(i + 1) match {
            case '*' =>
              // {\*\dest …}: an optional destination — skip the group
              if (!skipping && opened) skipUntilDepth = depth
              i += 2
            case '\'' =>
              // exactly two hex digits; anything else is NOT an escape
              // (consuming it blind would desync the brace walk)
              val d1 = if (i + 2 < n) Character.digit(s.charAt(i + 2), 16) else -1
              val d2 = if (i + 3 < n) Character.digit(s.charAt(i + 3), 16) else -1
              if (d1 >= 0 && d2 >= 0) {
                if (!skipping) {
                  if (pendingFallback > 0) pendingFallback -= 1
                  else sb.append(win1252(d1 * 16 + d2)): Unit
                }
                i += 4
              } else i += 2 // malformed escape: drop the \' pair only
            case '{' | '}' | '\\' =>
              if (!skipping && pendingFallback == 0) sb.append(s.charAt(i + 1)): Unit
              if (pendingFallback > 0) pendingFallback -= 1
              i += 2
            case '~' =>
              if (!skipping) sb.append(' '): Unit
              i += 2
            case ch if ch.isLetter =>
              var j = i + 1
              while (j < n && s.charAt(j).isLetter) j += 1
              val word = s.substring(i + 1, j)
              var neg = false
              var num = -1
              if (j < n && (s.charAt(j) == '-' || s.charAt(j).isDigit)) {
                if (s.charAt(j) == '-') { neg = true; j += 1 }
                val ds = j
                while (j < n && s.charAt(j).isDigit) j += 1
                num = try s.substring(ds, j).toInt catch { case _: Exception => 0 }
                if (neg) num = -num
              }
              if (j < n && s.charAt(j) == ' ') j += 1 // the delimiter space
              if (word == "bin" && num > 0) {
                // \binN: N raw BYTES follow (picture/object payloads).
                // They are not RTF text and legally contain braces —
                // consume them blind (even inside a skipped
                // destination) or the brace walk desyncs and binary
                // leaks into prose. Latin-1 carrier: 1 byte = 1 char.
                i = math.min(n.toLong, j.toLong + num).toInt
              } else {
              if (!skipping) {
                word match {
                  case "par" | "line" => flush()
                  case "tab" => sb.append('\t'): Unit
                  case "emdash" => sb.append('—'): Unit
                  case "endash" => sb.append('–'): Unit
                  case "lquote" => sb.append('‘'): Unit
                  case "rquote" => sb.append('’'): Unit
                  case "ldblquote" => sb.append('“'): Unit
                  case "rdblquote" => sb.append('”'): Unit
                  case "bullet" => sb.append('•'): Unit
                  case "uc" => if (num >= 0) uc = num
                  case "u" =>
                    val cp = if (num < 0) num + 65536 else num
                    // any BMP scalar value; surrogate halves and the
                    // controls are the visible U+FFFD
                    if ((cp >= 0x20 && cp < 0xD800) || (cp >= 0xE000 && cp <= 0xFFFD))
                      sb.append(cp.toChar): Unit
                    else sb.append('�'): Unit
                    pendingFallback = uc
                  case w if opened && SkipDests(w) => skipUntilDepth = depth
                  case _ => () // formatting word: vanishes
                }
              }
              i = j
              }
            case _ => i += 2 // \<symbol> outside the table: both drop
          }
        case '\r' | '\n' =>
          groupJustOpened = false
          i += 1 // raw newlines are not text in RTF
        case _ =>
          groupJustOpened = false
          if (!skipping) {
            if (pendingFallback > 0) pendingFallback -= 1
            else sb.append(c): Unit
          }
          i += 1
      }
    }
    flush()
    RtfText("ok", out.result())
  }

  /** windows-1252 byte → char: latin-1 except the 0x80–0x9F window
    * (the same table the WARC charset layer certifies); unmapped
    * slots are the visible U+FFFD.
    */
  private def win1252(b: Int): Char = {
    if (b < 0x80 || b > 0x9F) return b.toChar
    val w = "€�‚ƒ„…†‡ˆ‰Š‹Œ�Ž��‘’“”•–—˜™š›œ�žŸ"
    w.charAt(b - 0x80)
  }

  /** One row per document: (media_id, stage, n_paragraphs, text) —
    * the office-family shape. Map-only.
    */
  def textRows(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, b) =>
        val d = strip(b)
        (id, d.stage, d.paragraphs.length,
          if (d.stage == "ok") d.paragraphs.mkString("\n") else null)
      }
      .toDF(idCol, "stage", "n_paragraphs", "text")
  }
}
