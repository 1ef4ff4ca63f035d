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

  private[operators] def isMsg(doc: Cfb.CfbDoc): Boolean =
    doc.streams.contains("__properties_version1.0") ||
      doc.streams.keysIterator.exists(k =>
        !k.contains("/") && k.startsWith("__substg1.0_"))

  private[operators] def readCfb(doc: Cfb.CfbDoc): MsgDoc = {
    if (!isMsg(doc)) return MsgDoc("part", null, null, null, 0, 0)
    MsgDoc("ok",
      prop(doc, "0037"), prop(doc, "0C1A"), prop(doc, "1000"),
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
  def msg(subject: String, sender: String, body: String,
      recipients: Seq[String], attachments: Int = 0): Array[Byte] = {
    // null subject/sender/body omit the property stream (all three are
    // optional in real messages — absence is not a degrade)
    val base = Seq(("__properties_version1.0", new Array[Byte](32))) ++
      Option(subject).map(s => ("__substg1.0_0037001F", s.getBytes(UTF_16LE))) ++
      Option(sender).map(s => ("__substg1.0_0C1A001F", s.getBytes(UTF_16LE))) ++
      Option(body).map(s => ("__substg1.0_1000001F", s.getBytes(UTF_16LE)))
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
