package graft

import graft.operators.Pdf

/** PDF text extraction: object grammar, classic xref + /Prev chains,
  * FlateDecode, the text-operator machine, Annex D encodings
  * (certified against the JDK's charsets where they exist), the
  * degrade stages, and adversarial no-throw.
  */
class PdfSpec extends SparkSpec {

  private def doc(lines: Seq[String], encoding: String = "WinAnsiEncoding",
      flate: Boolean = true): Array[Byte] =
    Pdf.pdf(Seq(Pdf.Page(Pdf.contentOps(lines, encoding), encoding)), flate = flate)

  test("one page round-trips: flate and raw, lines joined by Td moves") {
    for (flate <- Seq(true, false)) {
      val d = Pdf.extractText(doc(Seq("Hello world", "second line"), flate = flate))
      assert(d.stage == "ok" && d.n_pages == 1)
      assert(d.text == "Hello world\nsecond line")
    }
  }

  test("pages are line-separated; page order follows /Kids order") {
    val b = Pdf.pdf(Seq(
      Pdf.Page(Pdf.contentOps(Seq("page one"))),
      Pdf.Page(Pdf.contentOps(Seq("page two", "more"))),
      Pdf.Page(Pdf.contentOps(Seq("page three")))))
    val d = Pdf.extractText(b)
    assert(d.n_pages == 3 && d.stage == "ok")
    assert(d.text == "page one\npage two\nmore\npage three")
  }

  test("literal strings: escapes, octal, nested parens, continuations, EOL normalization") {
    def viaContent(raw: String): String = {
      val ops = s"BT /F1 12 Tf 72 720 Td ($raw) Tj ET"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      Pdf.extractText(Pdf.pdf(Seq(Pdf.Page(ops)), flate = false)).text
    }
    assert(viaContent("""a\(b\)c\\d""") == "a(b)c\\d")
    assert(viaContent("""oct \101\102 \61""") == "oct AB 1")
    assert(viaContent("nested (parens) fine") == "nested (parens) fine")
    assert(viaContent("broken\\\nline") == "brokenline") // continuation
    assert(viaContent("hard\nline") == "hard�line") // raw EOL → LF byte, undefined in WinAnsi text
  }

  test("hex strings decode with odd-digit padding and embedded whitespace") {
    val ops = "BT /F1 12 Tf 72 720 Td <48 65 6C6C 6F> Tj <4> Tj ET"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val d = Pdf.extractText(Pdf.pdf(Seq(Pdf.Page(ops)), flate = false))
    assert(d.text == "Hello@") // <4> pads to 0x40
  }

  test("TJ arrays: word-gap threshold inserts a space, kerning vanishes") {
    val ops = "BT /F1 12 Tf 72 720 Td [(A) -250 (B) -50 (C) 120 (D)] TJ ET"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val d = Pdf.extractText(Pdf.pdf(Seq(Pdf.Page(ops)), flate = false))
    assert(d.text == "A BCD")
  }

  test("quote operators and T* start new lines; Td with ty=0 does not") {
    val ops = ("BT /F1 12 Tf 14 TL 72 720 Td (first) Tj (second) ' " +
      "10 0 Td (same) Tj T* (third) Tj ET")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val d = Pdf.extractText(Pdf.pdf(Seq(Pdf.Page(ops)), flate = false))
    assert(d.text == "first\nsecondsame\nthird")
  }

  test("WinAnsi high bytes: euro, em-dash, accents round-trip through octal escapes") {
    val s = "café — €99 “quoted”"
    val d = Pdf.extractText(doc(Seq(s)))
    assert(d.text == s)
  }

  test("MacRoman page decodes its own table; Standard maps typographic quotes") {
    val mac = "π ≈ ∞ • Áé"
    assert(Pdf.extractText(doc(Seq(mac), encoding = "MacRomanEncoding")).text == mac)
    // Standard: 0x27 shows as U+2019 (the writer encodes U+2019 → 0x27)
    val std = "it’s ‘fine’"
    assert(Pdf.extractText(doc(Seq(std), encoding = "StandardEncoding")).text == std)
  }

  test("encoding tables certify against the JDK charsets where defined") {
    // WinAnsi == windows-1252 on every code the table defines
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    for (b <- 32 until 256 if Pdf.WinAnsi(b) != 0.toChar) {
      val jdk = new String(Array(b.toByte), cp1252)
      assert(jdk.length == 1 && jdk.charAt(0) == Pdf.WinAnsi(b),
        f"WinAnsi 0x$b%02X: table ${Pdf.WinAnsi(b).toInt}%04X vs JDK ${jdk.charAt(0).toInt}%04X")
    }
    // MacRoman vs x-MacRoman, skipping the two slots where the JDK
    // tracks post-1998 Mac OS (0xDB € vs the spec's currency) — the
    // PDF table is normative here
    if (java.nio.charset.Charset.isSupported("x-MacRoman")) {
      val macJdk = java.nio.charset.Charset.forName("x-MacRoman")
      for (b <- 32 until 256 if b != 0xDB && Pdf.MacRoman(b) != 0.toChar) {
        val jdk = new String(Array(b.toByte), macJdk)
        assert(jdk.length == 1 && jdk.charAt(0) == Pdf.MacRoman(b),
          f"MacRoman 0x$b%02X: table ${Pdf.MacRoman(b).toInt}%04X vs JDK ${jdk.charAt(0).toInt}%04X")
      }
    }
    // Standard spot checks from the published table
    assert(Pdf.Standard(0x27) == '’' && Pdf.Standard(0x60) == '‘')
    assert(Pdf.Standard(0xAE) == 'ﬁ' && Pdf.Standard(0xD0) == '—')
    assert(Pdf.Standard(0xE0) == 0.toChar) // undefined slot stays undefined
  }

  test("/Differences re-encoding: AGL names, uniXXXX, letters, digits; unknown degrades") {
    val diff = Seq((200, "Euro"), (201, "lslash"), (202, "uni0142"),
      (203, "quotedblleft"), (204, "Q"), (205, "seven"))
    val ops = "BT /F1 12 Tf 72 720 Td (x\\310\\311\\312\\313\\314\\315y) Tj ET"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val d = Pdf.extractText(Pdf.pdf(Seq(Pdf.Page(ops, differences = diff))))
    assert(d.stage == "ok")
    assert(d.text == "x€łł“Q7y")
    // codes OUTSIDE the differences still read the base (WinAnsi 'x','y')
    // — asserted by the x/y above. An unknown glyph degrades the font
    // whole: substituting a guess would silently rewrite text
    val bad = Pdf.pdf(Seq(Pdf.Page(ops, differences = Seq((200, "notarealglyph")))))
    val db = Pdf.extractText(bad)
    assert(db.stage == "encoding" && db.text == null && db.n_pages == 1)
  }

  test("CID/Type0 via ToUnicode: bfchar, bfrange forms, mixed pages, degrades hold") {
    // bfchar: explicit pairs, incl. a multi-char ligature expansion
    val cm1 = Pdf.toUnicodeCMap(Seq(3 -> "H", 4 -> "i", 5 -> " ", 6 -> "日", 7 -> "ﬁ"))
    val p1 = Pdf.pdf(Seq(Pdf.Page(
      Pdf.cidContentOps(Seq(Seq(3, 4, 5, 6), Seq(7, 4))),
      cid = true, toUnicode = Some(cm1))))
    val d1 = Pdf.extractText(p1)
    assert(d1.stage == "ok" && d1.text == "Hi 日\nﬁi")

    // bfrange: contiguous block — the LAST code unit increments
    val cm2 = Pdf.toUnicodeCMap(Nil, Seq((0x0010, 0x0019, "a")))
    val p2 = Pdf.pdf(Seq(Pdf.Page(
      Pdf.cidContentOps(Seq(Seq(0x10, 0x12, 0x19))),
      cid = true, toUnicode = Some(cm2))))
    assert(Pdf.extractText(p2).text == "acj")

    // unmapped code and a torn odd byte are U+FFFD, not a degrade
    val p3 = Pdf.pdf(Seq(Pdf.Page(
      Pdf.cidContentOps(Seq(Seq(3, 0x99))),
      cid = true, toUnicode = Some(Pdf.toUnicodeCMap(Seq(3 -> "x"))))))
    assert(Pdf.extractText(p3).text == "x�")

    // a CMap'd page and a simple-encoding page coexist in one doc
    val mixed = Pdf.pdf(Seq(
      Pdf.Page(Pdf.cidContentOps(Seq(Seq(3))), cid = true,
        toUnicode = Some(Pdf.toUnicodeCMap(Seq(3 -> "cid page")))),
      Pdf.Page(Pdf.contentOps(Seq("plain page")))))
    val dm = Pdf.extractText(mixed)
    assert(dm.stage == "ok" && dm.text == "cid page\nplain page" && dm.n_pages == 2)

    // no ToUnicode at all: still the counted degrade
    assert(Pdf.extractText(Pdf.pdf(Seq(Pdf.Page(
      Pdf.cidContentOps(Seq(Seq(3))), cid = true)))).stage == "cid_font")
  }

  test("parseToUnicode: published subset edges; out-of-subset returns None") {
    assert(Pdf.parseToUnicode("no sections at all") == Some(Map.empty))
    // array-form bfrange
    val arr = "2 beginbfrange\n<0001> <0002> [<0041> <0042>]\nendbfrange"
    assert(Pdf.parseToUnicode(arr) == Some(Map(1 -> "A", 2 -> "B")))
    // 1-byte codes are in-subset
    assert(Pdf.parseToUnicode("1 beginbfchar\n<41> <0058>\nendbfchar") == Some(Map(0x41 -> "X")))
    // out of subset: 3-byte src, odd-BYTE dst (5 hex digits pad to 3
    // bytes — not UTF-16), inverted range, torn section
    assert(Pdf.parseToUnicode("1 beginbfchar\n<000041> <0041>\nendbfchar").isEmpty)
    assert(Pdf.parseToUnicode("1 beginbfchar\n<0041> <00410>\nendbfchar").isEmpty)
    assert(Pdf.parseToUnicode("1 beginbfrange\n<0002> <0001> <0041>\nendbfrange").isEmpty)
    assert(Pdf.parseToUnicode("1 beginbfchar\n<0041> <0041>").isEmpty) // no end marker
  }

  test("review finding: bfrange increments overflowing UTF-16 degrade, never wrap") {
    // dst last unit + span past 0xFFFF would wrap silently
    assert(Pdf.parseToUnicode(
      "1 beginbfrange\n<0001> <0004> <FFFE>\nendbfrange").isEmpty)
    // walking from below into the surrogate block emits lone surrogates
    assert(Pdf.parseToUnicode(
      "1 beginbfrange\n<0001> <0004> <D7FE>\nendbfrange").isEmpty)
    // a low-surrogate end may increment only within the low block...
    assert(Pdf.parseToUnicode(
      "1 beginbfrange\n<0001> <0002> <D800DFFF>\nendbfrange").isEmpty)
    // ...and only behind a high surrogate
    assert(Pdf.parseToUnicode(
      "1 beginbfrange\n<0001> <0002> <D800DC00>\nendbfrange") ==
      Some(Map(1 -> "𐀀", 2 -> "𐀁")))
    // a lone HIGH surrogate end never increments
    assert(Pdf.parseToUnicode(
      "1 beginbfrange\n<0001> <0002> <D800>\nendbfrange").isEmpty)
    // the in-range spans still work (regression guard)
    assert(Pdf.parseToUnicode(
      "1 beginbfrange\n<0001> <0003> <0041>\nendbfrange") ==
      Some(Map(1 -> "A", 2 -> "B", 3 -> "C")))
  }

  test("encrypted, EMPTY user password: RC4-40/128 and AES-128 open; wrong subset holds") {
    Seq("rc40", "rc4128", "aes128", "aes256").foreach { mode =>
      val d = Pdf.extractText(Pdf.encryptedPdf(
        Seq(Seq("secret line one", "and two"), Seq("page two")), mode))
      assert(d.stage == "ok", s"mode=$mode stage=${d.stage}")
      assert(d.n_pages == 2, mode)
      assert(d.text.contains("secret line one") && d.text.contains("page two"), mode)
    }
    // a NON-empty user password must keep the honest degrade — the
    // verifier (Algorithm 6 against /U; 2.B for V5) decides before
    // any decrypt
    Seq("rc4128", "aes256").foreach { mode =>
      val locked = Pdf.extractText(
        Pdf.encryptedPdf(Seq(Seq("x")), mode, userPwd = "hunter2"))
      assert(locked.stage == "encrypted" && locked.text == null, mode)
    }
    // a tampered /U (corrupt auth data) also keeps degrading
    val b = Pdf.encryptedPdf(Seq(Seq("y")), "rc40")
    val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    val at = s.indexOf("/U <") + 4
    val tampered = (s.substring(0, at) +
      (if (s.charAt(at) == '0') '1' else '0') + s.substring(at + 1))
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Pdf.extractText(tampered).stage == "encrypted")
  }

  test("encrypted adversarial: truncation and bit flips never throw") {
    val whole = Pdf.encryptedPdf(Seq(Seq("alpha beta")), "aes128")
    (1 until whole.length by 211).foreach { n =>
      Pdf.extractText(whole.take(n)): Unit
    }
    (0 until whole.length by 127).foreach { i =>
      val flip = whole.clone
      flip(i) = (flip(i) ^ 0x2A).toByte
      Pdf.extractText(flip): Unit
    }
  }

  test("degrades: encrypted, CID font, unknown filter, predictor, xref stream, junk") {
    val enc = Pdf.pdf(Seq(Pdf.Page(Pdf.contentOps(Seq("secret")))), encrypted = true)
    val de = Pdf.extractText(enc)
    assert(de.stage == "encrypted" && de.text == null && de.n_pages == 1)

    val cid = Pdf.pdf(Seq(Pdf.Page(Pdf.contentOps(Seq("cid text")), cid = true)))
    val dc = Pdf.extractText(cid)
    assert(dc.stage == "cid_font" && dc.text == null && dc.n_pages == 1)

    // unknown filter: patch the content object's /Filter name
    val lzw = new String(Pdf.pdf(Seq(Pdf.Page(Pdf.contentOps(Seq("x")), "WinAnsiEncoding")), flate = false),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // raw content has no /Filter — force one in
    val patched = lzw.replace("<< /Length", "<< /Filter /LZWDecode /Length")
    val df = Pdf.extractText(patched.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    // offsets shifted by the insert, so either filter or parse/xref is
    // acceptable — but never text
    assert(df.text == null)

    assert(Pdf.extractText("%PDF-1.4 not really a pdf at all".getBytes("UTF-8")).stage == "parse")
    assert(Pdf.extractText("garbage".getBytes("UTF-8")).stage == "parse")
    assert(Pdf.extractText(null).stage == "parse")
    assert(Pdf.extractText(Array.emptyByteArray).stage == "parse")
  }

  test("unknown filter degrades as 'filter' with offsets intact") {
    // swap the filter NAME in place (same length) so offsets stay valid
    val base = Pdf.pdf(Seq(Pdf.Page(Pdf.contentOps(Seq("body")), "WinAnsiEncoding")), flate = true)
    val s = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
    val swapped = s.replace("/Filter /FlateDecode", "/Filter /LZWDecodeXX")
    assert(swapped.length == s.length && swapped != s)
    val d = Pdf.extractText(swapped.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(d.stage == "filter" && d.text == null && d.n_pages == 1)
  }

  test("incremental update: the /Prev chain resolves newest-first") {
    val base = Pdf.pdf(Seq(Pdf.Page(Pdf.contentOps(Seq("version one")))))
    assert(Pdf.extractText(base).text == "version one")
    // object 4 is page 1's content stream in the writer's layout
    val updated = Pdf.pdfUpdate(base, 4,
      Pdf.streamBody(Pdf.contentOps(Seq("version two")), flate = true))
    val d = Pdf.extractText(updated)
    assert(d.stage == "ok" && d.text == "version two")
    // a second update chains again
    val v3 = Pdf.pdfUpdate(updated, 4,
      Pdf.streamBody(Pdf.contentOps(Seq("version three")), flate = false))
    assert(Pdf.extractText(v3).text == "version three")
  }

  test("indirect /Length resolves through the xref; rescue scan covers a wrong one") {
    // hand-build a tiny PDF with an indirect Length
    val content = "BT /F1 12 Tf 72 720 Td (ind) Tj ET"
    val sb = new java.lang.StringBuilder()
    val offs = scala.collection.mutable.ArrayBuffer[Int]()
    def obj(body: String): Unit = {
      offs += sb.length()
      sb.append(s"${offs.length} 0 obj\n$body\nendobj\n"): Unit
    }
    sb.append("%PDF-1.4\n")
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 6 0 R >> >> /Contents 4 0 R >>")
    obj(s"<< /Length 5 0 R >>\nstream\n$content\nendstream")
    obj(s"${content.length}")
    obj("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val xref = sb.length()
    sb.append(s"xref\n0 ${offs.length + 1}\n0000000000 65535 f \n")
    offs.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offs.length + 1} /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    val d = Pdf.extractText(sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(d.stage == "ok" && d.text == "ind")
    // wrong Length (same WIDTH, so offsets stay true): rescue lands it
    assert(content.length == 34)
    val wrong = sb.toString.replace(s"5 0 obj\n${content.length}", s"5 0 obj\n77")
    val dw = Pdf.extractText(wrong.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(dw.stage == "ok" && dw.text == "ind")
  }

  test("xref streams: /W rows, predictors, object streams — all four layouts extract") {
    val pages = Seq(
      Pdf.Page(Pdf.contentOps(Seq("modern xref", "second line"))),
      Pdf.Page(Pdf.contentOps(Seq("it’s page two"), "StandardEncoding"), "StandardEncoding"))
    val classic = Pdf.extractText(Pdf.pdf(pages))
    assert(classic.stage == "ok")
    for (pred <- Seq(false, true); ostm <- Seq(false, true)) {
      val b = Pdf.pdfXrefStream(pages, predictor = pred, objStm = ostm)
      val d = Pdf.extractText(b)
      assert(d.stage == "ok", s"pred=$pred ostm=$ostm")
      assert(d.n_pages == 2)
      // the classic and stream writers extract IDENTICALLY
      assert(d.text == classic.text, s"pred=$pred ostm=$ostm")
    }
    assert(classic.text == "modern xref\nsecond line\nit’s page two")
  }

  test("xref streams: degrades stay visible — bad predictor shape, torn stream") {
    val b = Pdf.pdfXrefStream(Seq(Pdf.Page(Pdf.contentOps(Seq("x")))), predictor = true)
    // corrupt the deflated xref rows: the chain is unreadable → 'xref'
    // (">>\nstream\n" — a bare "stream\n" search would land inside the
    // trailing "endstream")
    val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    val at = s.lastIndexOf(">>\nstream\n") + 10
    val torn = b.clone()
    torn(at + 2) = (torn(at + 2) ^ 0x7F).toByte
    val d = Pdf.extractText(torn)
    assert(d.text == null && (d.stage == "parse" || d.stage == "xref"))
    // truncation fuzz on all stream layouts never throws
    for (ostm <- Seq(false, true)) {
      val blob = Pdf.pdfXrefStream(Seq(Pdf.Page(Pdf.contentOps(Seq("fuzz", "two")))),
        predictor = true, objStm = ostm)
      for (cut <- 0 to blob.length by 11)
        Pdf.extractText(java.util.Arrays.copyOfRange(blob, 0, cut))
      val rnd = new scala.util.Random(11)
      for (_ <- 0 until 150) {
        val c = blob.clone()
        val i = rnd.nextInt(c.length)
        c(i) = (c(i) ^ (1 << rnd.nextInt(8))).toByte
        Pdf.extractText(c)
      }
    }
  }

  test("review finding: 'encrypted' verdict survives a ciphertext object stream") {
    // in a real encrypted PDF the ObjStm payload is ciphertext, so the
    // page tree is unreadable — the stage must still read 'encrypted'
    // (count best-effort 0), never degrade to 'parse'
    val b = Pdf.pdfXrefStream(Seq(Pdf.Page(Pdf.contentOps(Seq("secret")))), objStm = true)
    val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    // splice /Encrypt into the xref stream's dict (the last object —
    // no offset after it shifts)
    val withEnc = s.replace("/Root 1 0 R /Filter", "/Encrypt 99 0 R /Root 1 0 R /Filter")
    assert(withEnc != s)
    val plain = Pdf.extractText(withEnc.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(plain.stage == "encrypted" && plain.n_pages == 1 && plain.text == null)
    // now the ObjStm payload is garbage (what real ciphertext looks
    // like to a non-decrypting reader): count degrades, stage holds
    val enc = withEnc.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val objStmData = withEnc.indexOf(">>\nstream\n") + 10
    enc(objStmData + 1) = (enc(objStmData + 1) ^ 0x7F).toByte
    val d = Pdf.extractText(enc)
    assert(d.stage == "encrypted" && d.n_pages == 0 && d.text == null)
  }

  test("incremental update over an xref-stream base: the hybrid /Prev chain walks") {
    val base = Pdf.pdfXrefStream(Seq(Pdf.Page(Pdf.contentOps(Seq("stream v1")))), objStm = true)
    assert(Pdf.extractText(base).text == "stream v1")
    // the classic-section update points /Prev at the xref STREAM:
    // hop 1 classic, hop 2 stream — both forms in one chain
    val updated = Pdf.pdfUpdate(base, 4,
      Pdf.streamBody(Pdf.contentOps(Seq("stream v2")), flate = true))
    val d = Pdf.extractText(updated)
    assert(d.stage == "ok" && d.text == "stream v2")
  }

  test("inline images skip to EI; graphics operators don't disturb text") {
    val ops = ("BT /F1 12 Tf 72 720 Td (before) Tj ET " +
      "q 1 0 0 1 10 10 cm BI /W 2 /H 2 /BPC 8 /CS /G ID )( EI Q " +
      "BT /F1 12 Tf 72 700 Td (after) Tj ET")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val d = Pdf.extractText(Pdf.pdf(Seq(Pdf.Page(ops)), flate = false))
    assert(d.stage == "ok" && d.text == "before\nafter")
  }

  test("contents array concatenates parts; text state persists across them") {
    val part1 = "BT /F1 12 Tf 72 720 Td (part one ) Tj"
    val part2 = "(and two) Tj ET" // Tf carries over from part 1
    val sb = new java.lang.StringBuilder()
    val offs = scala.collection.mutable.ArrayBuffer[Int]()
    def obj(body: String): Unit = {
      offs += sb.length()
      sb.append(s"${offs.length} 0 obj\n$body\nendobj\n"): Unit
    }
    sb.append("%PDF-1.4\n")
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 6 0 R >> >> " +
      "/Contents [4 0 R 5 0 R] >>")
    obj(s"<< /Length ${part1.length} >>\nstream\n$part1\nendstream")
    obj(s"<< /Length ${part2.length} >>\nstream\n$part2\nendstream")
    obj("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val xref = sb.length()
    sb.append(s"xref\n0 ${offs.length + 1}\n0000000000 65535 f \n")
    offs.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offs.length + 1} /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    val d = Pdf.extractText(sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(d.stage == "ok" && d.text == "part one and two")
  }

  test("/Info metadata: UTF-16BE and PDFDocEncoding text strings; absent stays null") {
    val both = Pdf.pdf(Seq(Pdf.Page(Pdf.contentOps(Seq("x")))),
      info = Some(("Tít — “q”", "A € B")), infoUtf16 = false)
    assert(Pdf.extractInfo(both) == (("Tít — “q”", "A € B")))
    val wide = Pdf.pdf(Seq(Pdf.Page(Pdf.contentOps(Seq("x")))),
      info = Some(("π ≤ Ω", "日本")), infoUtf16 = true)
    assert(Pdf.extractInfo(wide) == (("π ≤ Ω", "日本")))
    assert(Pdf.extractInfo(Pdf.pdf(Seq(Pdf.Page(Pdf.contentOps(Seq("x")))))) == ((null, null)))
    assert(Pdf.extractInfo("junk".getBytes("UTF-8")) == ((null, null)))
    assert(Pdf.extractInfo(null) == ((null, null)))
    // the raw decoder's corners: BOM-less bytes are PDFDoc, 0xA0 is €
    assert(Pdf.decodeTextString(Array(0x8D.toByte, 0x41, 0x8E.toByte, 0xA0.toByte)) == "“A”€")
    // advice finding: Table D.2's 0x18–0x1F accent slots decode, and the
    // undefined 0x7F / 0xAD slots emit U+FFFD, not raw passthrough
    assert(Pdf.decodeTextString((0x18 to 0x1F).map(_.toByte).toArray) == "˘ˇˆ˙˝˛˚˜")
    assert(Pdf.decodeTextString(Array(0x41, 0x7F.toByte, 0xAD.toByte, 0x42)) == "A��B")
    // the fixture writer round-trips the accent block
    assert(Pdf.decodeTextString(pdfDocBytes(Pdf.textStringLit("a˘b˜c", utf16 = false))) == "a˘b˜c")
  }

  /** Unescape one fixture `(…)` literal back to its raw bytes. */
  private def pdfDocBytes(lit: String): Array[Byte] = {
    val body = lit.substring(1, lit.length - 1)
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < body.length) {
      if (body.charAt(i) == '\\') {
        if (i + 3 < body.length && body.charAt(i + 1).isDigit) {
          out.write(Integer.parseInt(body.substring(i + 1, i + 4), 8)); i += 4
        } else { out.write(body.charAt(i + 1).toInt); i += 2 }
      } else { out.write(body.charAt(i).toInt); i += 1 }
    }
    out.toByteArray
  }

  test("textRows: distributed walk is map-only; mixed outcomes coexist") {
    import spark.implicits._
    val rows = Seq(
      (1L, doc(Seq("alpha"))),
      (2L, Pdf.pdf(Seq(Pdf.Page(Pdf.contentOps(Seq("x")), cid = true)))),
      (3L, "junk".getBytes("UTF-8"))).toDF("media_id", "payload")
    val out = Pdf.textRows(rows, "media_id", "payload")
    graft.queries.Q.requireNoShuffle(out)
    val got = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3))).toSet
    assert(got == Set(
      (1L, 1, "ok", "alpha"),
      (2L, 1, "cid_font", null),
      (3L, 0, "parse", null)))
  }

  test("adversarial: truncation and bit flips never throw") {
    val base = Pdf.pdf(Seq(
      Pdf.Page(Pdf.contentOps(Seq("fuzz target", "line two"))),
      Pdf.Page(Pdf.contentOps(Seq("π page"), "MacRomanEncoding"), "MacRomanEncoding")))
    for (cut <- 0 to base.length by 13) {
      val d = Pdf.extractText(java.util.Arrays.copyOfRange(base, 0, cut))
      assert(d.stage == "ok" || d.text == null) // degraded docs never carry text
    }
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val c = base.clone()
      val i = rnd.nextInt(c.length)
      c(i) = (c(i) ^ (1 << rnd.nextInt(8))).toByte
      Pdf.extractText(c) // must not throw
    }
    // nesting bombs
    Pdf.extractText(("%PDF-1.4\n" + "[" * 10000 + "\nstartxref\n9\n%%EOF").getBytes("UTF-8"))
    Pdf.extractText(("%PDF-1.4\nxref\n0 99999999\ntrailer\nstartxref\n9\n%%EOF").getBytes("UTF-8"))
  }
}
