package graft.operators

import java.nio.charset.StandardCharsets.UTF_16LE

import org.apache.spark.sql.DataFrame

/** Outlook `.msg` ([MS-OXMSG]) extraction — the mail-dump format next
  * to [[Mbox]]: a CFB container whose properties live in
  * `__substg1.0_TTTTYYYY` streams (TTTT the property tag, YYYY the
  * type — 001F UTF-16LE, 001E 8-bit), with recipients and attachments
  * as `__recip_version1.0_#N` / `__attach_version1.0_#N`
  * SUB-STORAGES. The reader consumes the PATH-QUALIFIED container
  * walk ([[Cfb.parse]]'s directory tree): only ROOT-level property
  * streams are the message's own — a recipient storage carries its
  * own property streams (display name, even body-tagged ones) that
  * must never shadow the message body, which is exactly what the
  * tree namespace guarantees.
  *
  * Extracted: subject (tag 0037), body (tag 1000), sender name
  * (0C1A), and the recipient/attachment counts (sub-storage census —
  * the inventory-not-decode discipline for the binary attachment
  * payloads). Degrades, countable: not a parseable CFB → `cfb`; a
  * CFB with no message property streams → `part`; an encrypted OOXML
  * shell → `encrypted`. Map-only. Reference scope: the reference
  * ingests line JSON only (`App.java:136-162`).
  */
object Msg {

  final case class MsgDoc(stage: String, subject: String, sender: String,
      body: String, n_recipients: Int, n_attachments: Int)

  private def decode1252(b: Array[Byte]): String =
    new String(b, java.nio.charset.Charset.forName("windows-1252"))

  /** A root-level string property by tag: the UTF-16 form wins, the
    * 8-bit form is the fallback spelling.
    */
  private def prop(doc: Cfb.CfbDoc, tag: String): String =
    doc.streams.get(s"__substg1.0_${tag}001F").map(b => new String(b, UTF_16LE))
      .orElse(doc.streams.get(s"__substg1.0_${tag}001E").map(decode1252))
      .orNull

  /** The [MS-OXRTFCP] LZFu init dictionary — the published 207-byte
    * prelude every compressed-RTF body's references may reach into.
    */
  private val LzfuPrelude: Array[Byte] =
    ("{\\rtf1\\ansi\\mac\\deff0\\deftab720{\\fonttbl;}" +
      "{\\f0\\fnil \\froman \\fswiss \\fmodern \\fscript \\fdecor " +
      "MS Sans SerifSymbolArialTimes New RomanCourier" +
      "{\\colortbl\\red0\\green0\\blue0\r\n" +
      "\\par \\pard\\plain\\f0\\fs20\\b\\i\\u\\tab\\tx")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  /** [MS-OXRTFCP] LZFu decompression — the compressed-RTF body most
    * real .msg files carry (PR_RTF_COMPRESSED, tag 1009): a 4096-byte
    * circular dictionary seeded with the published prelude; control
    * bytes flag literals vs 12-bit-offset / 4-bit-length references; a
    * reference whose offset equals the current write position is the
    * END token. `MELA`-tagged payloads are stored uncompressed. None
    * on malformed input (countable — the body stays absent, never
    * garbage). The CRC is not validated (lenient read).
    */
  private[graft] def lzfuDecompress(data: Array[Byte],
      maxOut: Int = 16 << 20): Option[Array[Byte]] = {
    if (data == null || data.length < 16) return None
    def u32(off: Int): Long =
      (data(off) & 0xFFL) | ((data(off + 1) & 0xFFL) << 8) |
        ((data(off + 2) & 0xFFL) << 16) | ((data(off + 3) & 0xFFL) << 24)
    val rawSize = u32(4)
    if (rawSize > maxOut) return None
    u32(8) match {
      case 0x414C454DL => // 'MELA': stored uncompressed
        val n = math.min(rawSize, (data.length - 16).toLong).toInt
        Some(java.util.Arrays.copyOfRange(data, 16, 16 + n))
      case 0x75465A4CL => // 'LZFu'
        val dict = new Array[Byte](4096)
        System.arraycopy(LzfuPrelude, 0, dict, 0, LzfuPrelude.length)
        var wpos = LzfuPrelude.length
        val out = new java.io.ByteArrayOutputStream()
        var i = 16
        while (i < data.length && out.size <= maxOut) {
          val control = data(i) & 0xFF
          i += 1
          var bit = 0
          while (bit < 8) {
            if ((control & (1 << bit)) == 0) {
              if (i >= data.length) return None // torn literal run
              dict(wpos) = data(i)
              wpos = (wpos + 1) % 4096
              out.write(data(i))
              i += 1
            } else {
              if (i + 2 > data.length) return None
              val v = ((data(i) & 0xFF) << 8) | (data(i + 1) & 0xFF)
              i += 2
              val off = v >>> 4
              if (off == wpos) return Some(out.toByteArray) // END token
              var j = 0
              var rp = off
              val len = (v & 0xF) + 2
              while (j < len) {
                val b = dict(rp)
                rp = (rp + 1) % 4096
                dict(wpos) = b
                wpos = (wpos + 1) % 4096
                out.write(b)
                j += 1
              }
            }
            bit += 1
          }
        }
        None // ran out without an END token: malformed
      case _ => None
    }
  }

  private[operators] def isMsg(doc: Cfb.CfbDoc): Boolean =
    doc.streams.contains("__properties_version1.0") ||
      doc.streams.keysIterator.exists(k =>
        !k.contains("/") && k.startsWith("__substg1.0_"))

  private[operators] def readCfb(doc: Cfb.CfbDoc): MsgDoc = {
    if (!isMsg(doc)) return MsgDoc("part", null, null, null, 0, 0)
    // body resolution order: the plain-text property (1000), else the
    // COMPRESSED-RTF property (1009) decompressed and fed through the
    // shipped RTF stripper — the form most real messages store
    val body = Option(prop(doc, "1000")).orElse {
      doc.streams.get("__substg1.0_10090102")
        .flatMap(lzfuDecompress(_))
        .flatMap { rtf =>
          val d = Rtf.strip(rtf)
          if (d.stage == "ok") Some(d.paragraphs.mkString("\n")) else None
        }
    }.orNull
    MsgDoc("ok",
      prop(doc, "0037"), prop(doc, "0C1A"), body,
      doc.entries.count(e => e.typ == 1 && e.name.startsWith("__recip_version1.0_")),
      doc.entries.count(e => e.typ == 1 && e.name.startsWith("__attach_version1.0_")))
  }

  def read(bytes: Array[Byte]): MsgDoc =
    Cfb.parse(bytes) match {
      case None => MsgDoc("cfb", null, null, null, 0, 0)
      case Some(doc) =>
        if (Cfb.isEncryptedOoxml(doc)) MsgDoc("encrypted", null, null, null, 0, 0)
        else readCfb(doc)
    }

  /** Subject + body joined by NEWLINE — the prose surface the
    * curation pipeline feeds on (either part may be absent).
    */
  private[graft] def flatText(d: MsgDoc): String =
    Seq(Option(d.subject), Option(d.body)).flatten.mkString("\n")

  /** One row per message: (media_id, stage, subject, sender,
    * n_recipients, n_attachments, text). Map-only.
    */
  def textRows(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, b) =>
        val d = if (b == null || !Cfb.isCfb(b))
          MsgDoc("cfb", null, null, null, 0, 0)
        else read(b)
        (id, d.stage, d.subject, d.sender, d.n_recipients, d.n_attachments,
          if (d.stage == "ok") flatText(d) else null)
      }
      .toDF(idCol, "stage", "subject", "sender", "n_recipients",
        "n_attachments", "text")
  }

  // ---- fixture writer (tests + gates only) ----

  /** Minimal valid .msg: the property marker stream, root subject/
    * sender/body (UTF-16 spelling), one recipient sub-storage per
    * entry of `recipients` — each carrying its display name AND a
    * POISON body-tagged stream that must never shadow the message
    * body (the tree-namespace proof) — plus `attachments` attachment
    * sub-storages with opaque payload streams.
    */
  /** LZFu compression (fixture side): one crafted reference into the
    * init dictionary when the body opens with the prelude's `rtf1`
    * header (proving reference decode against the published dict),
    * literals for the rest, the END token last. CRC written 0 (the
    * reader is lenient by contract).
    */
  private[graft] def lzfuCompress(rtf: Array[Byte]): Array[Byte] = {
    val head = "{\\rtf1\\ansi".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val opensWithDict = rtf.length >= head.length &&
      head.indices.forall(i => rtf(i) == head(i))
    var wpos = LzfuPrelude.length
    var pos = 0
    val toks = scala.collection.mutable.ArrayBuffer[Either[Byte, Int]]()
    if (opensWithDict) {
      toks += Right((0 << 4) | (head.length - 2)) // dict offset 0, len 11
      pos = head.length
      wpos += head.length
    }
    while (pos < rtf.length) {
      toks += Left(rtf(pos))
      pos += 1
      wpos += 1
    }
    toks += Right(((wpos % 4096) << 4)) // END: offset = write position
    val body = new java.io.ByteArrayOutputStream()
    toks.grouped(8).foreach { group =>
      var control = 0
      group.zipWithIndex.foreach { case (t, i) => if (t.isRight) control |= 1 << i }
      body.write(control)
      group.foreach {
        case Left(b) => body.write(b)
        case Right(v) => body.write((v >> 8) & 0xFF); body.write(v & 0xFF)
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))
    w32(body.size.toLong + 12) // compSize: bytes after this field
    w32(rtf.length.toLong)
    w32(0x75465A4CL) // 'LZFu'
    w32(0L) // crc: not validated by the lenient reader
    body.writeTo(out)
    out.toByteArray
  }

  def msg(subject: String, sender: String, body: String,
      recipients: Seq[String], attachments: Int = 0,
      rtfBody: String = null): Array[Byte] = {
    // null subject/sender/body omit the property stream (all three are
    // optional in real messages — absence is not a degrade);
    // `rtfBody` ships as the COMPRESSED-RTF property instead
    val base = Seq(("__properties_version1.0", new Array[Byte](32))) ++
      Option(subject).map(s => ("__substg1.0_0037001F", s.getBytes(UTF_16LE))) ++
      Option(sender).map(s => ("__substg1.0_0C1A001F", s.getBytes(UTF_16LE))) ++
      Option(body).map(s => ("__substg1.0_1000001F", s.getBytes(UTF_16LE))) ++
      Option(rtfBody).map(s => ("__substg1.0_10090102",
        lzfuCompress(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))))
    val recips = recipients.zipWithIndex.flatMap { case (r, i) =>
      val st = f"__recip_version1.0_#$i%08X"
      Seq(
        (s"$st/__substg1.0_3001001F", r.getBytes(UTF_16LE)),
        (s"$st/__substg1.0_1000001F",
          "RECIPIENT BODY MUST NOT SURFACE".getBytes(UTF_16LE)))
    }
    val attach = (0 until attachments).map { i =>
      val st = f"__attach_version1.0_#$i%08X"
      (s"$st/__substg1.0_37010102", Array.tabulate[Byte](24)(j => (i + j).toByte))
    }
    Cfb.cfb(base ++ recips ++ attach)
  }
}
