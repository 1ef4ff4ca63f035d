package graft

import graft.operators.Warc

/** WARC container walk: byte-exact framing, intact-prefix degrade,
  * binary-body text contract, and adversarial-input no-throw.
  */
class WarcSpec extends SparkSpec {

  import spark.implicits._

  test("parseWarc: full fixture round-trips every closed-form field") {
    val recs = Warc.parseWarc(4L, Warc.syntheticWarc(4L, 3))
    assert(recs.length == 3)
    recs.zipWithIndex.foreach { case (r, i) =>
      assert(r.rec_idx == i)
      assert(r.warc_type == (if (i % 2 == 0) "response" else "request"))
      assert(r.target_uri == s"http://site${(4 + i) % 5}.example/p$i")
      assert(r.body == s"payload ${4 * 7 + i} content words")
      assert(r.content_length == r.body.getBytes("UTF-8").length.toLong)
    }
  }

  test("X-Robots-Tag: one header per directive COMBINES (servers emit repeats)") {
    import spark.implicits._
    val body = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "X-Robots-Tag: noindex\r\nX-Robots-Tag: NOFOLLOW\r\n\r\n<html>x</html>"
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://a/1\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n").getBytes("UTF-8")
    val ind = Warc.httpIndexability(Warc.recordsBinary(
      Seq((1L, rec)).toDF("media_id", "payload"), "media_id", "payload")).collect()
    assert(ind.length == 1 && ind(0).getAs[Int]("x_mask") == 3)
    assert(ind(0).getAs[String]("text") == "<html>x</html>")
  }

  test("revisit resolution: digest joins to the FIRST capture; unresolvable keeps NULLs") {
    import spark.implicits._
    def rec(wType: String, uri: String, digest: String, body: String) = {
      val d = if (digest == null) "" else s"WARC-Payload-Digest: $digest\r\n"
      s"WARC/1.0\r\nWARC-Type: $wType\r\nWARC-Target-URI: $uri\r\n$d" +
        s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n"
    }
    // the SAME digest captured twice (media 1 then media 2): first wins
    val blob1 = (rec("response", "http://a/1", "sha1:X", "first capture") +
      rec("revisit", "http://a/1?v2", "sha1:X", "")).getBytes("UTF-8")
    val blob2 = (rec("response", "http://b/1", "sha1:X", "second capture") +
      rec("revisit", "http://b/gone", "sha1:NOPE", "") +
      rec("revisit", "http://b/nodigest", null, "")).getBytes("UTF-8")
    val recs = Warc.records(Seq((1L, blob1), (2L, blob2)).toDF("media_id", "payload"),
      "media_id", "payload")
    // parse carries the new headers
    val parsed = Warc.parseWarc(1L, blob1)
    assert(parsed(0).payload_digest == "sha1:X" && parsed(0).refers_to_uri == null)
    val got = Warc.resolveRevisits(recs).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(5), r.getString(6))).toSet
    assert(got == Set(
      (1L, "http://a/1?v2", "http://a/1", "first capture"), // NOT "second capture"
      (2L, "http://b/gone", null, null), // unknown digest keeps NULLs
      (2L, "http://b/nodigest", null, null))) // digest-less keeps NULLs too
  }

  test("parseWarc: truncation yields the intact prefix; framing is Content-Length-exact") {
    // torn mid-record-2: exactly record 0 survives
    val torn = Warc.syntheticWarc(7L, 3, keepRecords = 1)
    val recs = Warc.parseWarc(7L, torn)
    assert(recs.map(_.rec_idx) == Seq(0))
    // a body CONTAINING header-like text must not desync the walk
    // (framing comes from Content-Length, not delimiter scanning)
    val tricky = "inner\r\n\r\nWARC/1.0\r\nfake: x\r\n\r\nstill body"
    val blob =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n" +
        s"Content-Length: ${tricky.getBytes("UTF-8").length}\r\n\r\n$tricky\r\n\r\n" +
        s"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: v\r\n" +
        "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes("UTF-8")
    val two = Warc.parseWarc(1L, blob)
    assert(two.length == 2)
    assert(two(0).body == tricky && two(1).body == "ok")
    // non-UTF-8 body: framing fields survive, body is NULL
    val binBody = Array[Byte](0xC3.toByte, 0x28, 0x00)
    val binBlob = ("WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: w\r\n" +
      "Content-Length: 3\r\n\r\n").getBytes("UTF-8") ++ binBody ++
      "\r\n\r\n".getBytes("UTF-8")
    val bin = Warc.parseWarc(2L, binBlob)
    assert(bin.length == 1 && bin(0).content_length == 3L && bin(0).body == null)
  }

  test("parseWarc: adversarial bytes never throw; records() is map-only over a frame") {
    var s = 0x2545F4914F6CDD1DL
    def arr(n: Int): Array[Byte] = Array.fill(n) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17; (s & 0xFF).toByte
    }
    for (n <- Seq(0, 3, 64, 777); pre <- Seq("", "WARC/1.0\r\n", "WARC/1.0\r\nContent-Length: 999999\r\n\r\n"))
      Warc.parseWarc(1L, pre.getBytes("US-ASCII") ++ arr(n)): Unit
    val df = Seq((1L, Warc.syntheticWarc(1L, 2)), (2L, Warc.syntheticWarc(2L, 0)))
      .toDF("media_id", "payload")
    val out = Warc.records(df, "media_id", "payload")
    graft.queries.Q.requireNoShuffle(out)
    assert(out.count() == 2L) // empty container contributes zero rows
  }

  test("parseHttp: status line, Content-Type/charset, payload; degrade on non-HTTP") {
    val msg = "HTTP/1.1 301 Moved Permanently\r\nLocation: /x\r\n" +
      "Content-Type: Text/HTML; charset=\"UTF-8\"; boundary=x\r\n\r\nbody text"
    assert(Warc.parseHttp(msg) == Some((301, "text/html", "utf-8", "body text")))
    // charset-less and parameter-less types; empty payload; only the
    // FIRST Content-Type counts
    assert(Warc.parseHttp("HTTP/1.0 200 OK\r\nContent-Type: image/png\r\n\r\n")
      == Some((200, "image/png", null, "")))
    assert(Warc.parseHttp(
      "HTTP/1.1 200 OK\r\nContent-Type: a/b\r\nContent-Type: c/d\r\n\r\nx")
      == Some((200, "a/b", null, "x")))
    // degrade: null body, non-HTTP body, missing header terminator,
    // junk status
    assert(Warc.parseHttp(null).isEmpty)
    assert(Warc.parseHttp("request 42").isEmpty)
    assert(Warc.parseHttp("HTTP/1.1 200 OK\r\nNo: end").isEmpty)
    assert(Warc.parseHttp("HTTP/1.1 xx OK\r\n\r\np").isEmpty)
    // the distributed layer: responses parse, requests drop, torn
    // bodies stay visible as status -1 rows
    val torn = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: t\r\n" +
      "Content-Length: 9\r\n\r\nnot http!\r\n\r\n").getBytes("UTF-8")
    val frame = Seq(
      (1L, Warc.syntheticWarcHttp(1L, 4)),
      (2L, Warc.syntheticWarcHttp(2L, 4)),
      (3L, torn)).toDF("media_id", "payload")
    val http = Warc.httpResponses(Warc.records(frame, "media_id", "payload"))
    graft.queries.Q.requireNoShuffle(http)
    val rows = http.collect().map(r =>
      (r.getAs[Long]("media_id"), r.getAs[Int]("rec_idx")) ->
        (r.getAs[Int]("status"), r.getAs[String]("content_type"),
          r.getAs[String]("payload"))).toMap
    // requests dropped, responses keyed by (seed, i)
    assert(rows.keySet == Set((1L, 0), (1L, 2), (2L, 0), (2L, 2), (3L, 0)))
    assert(rows((1L, 0)) == (200, "text/html", "page 7 body"))
    assert(rows((1L, 2)) == (200, "image/png", "page 9 body")) // (1+2)%5 == 3
    assert(rows((2L, 0)) == (404, "text/html", "page 14 body")) // (2+0)%7 == 2
    assert(rows((2L, 2)) == (200, "text/html", "page 16 body"))
    assert(rows((3L, 0)) == (-1, null, null)) // torn fetch stays visible
  }

  test("charset-aware text layer: each page decodes under its OWN declared charset, strictly") {
    // the decode matrix: utf-8 / latin-1 / cp1252 / default / a lying
    // server / an out-of-contract charset — strict everywhere, so a
    // wrong declaration is a visible NULL, never mojibake
    val frame = Seq((3L, Warc.syntheticWarcCharsets(3L))).toDF("media_id", "payload")
    val out = Warc.httpTexts(Warc.recordsBinary(frame, "media_id", "payload"))
    graft.queries.Q.requireNoShuffle(out)
    val rows = out.collect().map(r => r.getAs[Int]("rec_idx") ->
      ((r.getAs[String]("charset"), r.getAs[String]("text")))).toMap
    assert(rows(0) == (("utf-8", "café page 3")))
    assert(rows(1) == (("iso-8859-1", "café résumé 3")))
    assert(rows(2) == (("windows-1252", "price €3")))
    assert(rows(3) == ((null, "plain page 3"))) // no declaration: utf-8 default
    assert(rows(4) == (("utf-8", null)))        // lying server: strict fail
    assert(rows(5) == (("shift_jis", "nihongo 3"))) // ASCII under Shift_JIS decodes
    // the meta prescan fallback: header silent, <meta charset> decodes
    assert(rows(6)._1 == "iso-8859-1" && rows(6)._2.contains("café meta 3"))
    // the transport declaration WINS over a lying meta
    assert(rows(7)._1 == "utf-8" && rows(7)._2.contains("café hdr 3"))
    // the global-crawl families: every multibyte payload decodes to
    // exactly the text the fixture encoded (byte-verified roundtrip)
    assert(rows(8) == (("shift_jis", "日本語ページ 3")))
    assert(rows(9)._1 == "euc-jp" && rows(9)._2.endsWith("言語テスト 3"))
    assert(rows(10) == (("euc-kr", "한국어 페이지 3")))
    assert(rows(11) == (("gb2312", "中文网页 3"))) // the WHATWG gb2312->GBK mapping
    assert(rows(12) == (("gb18030", "中文ༀ页 3"))) // 4-byte gb18030 sequence
    assert(rows(13) == (("big5", "繁體中文 3")))
    assert(rows(14) == (("koi8-r", "русский текст 3")))
    assert(rows(15) == (("windows-1251", "кириллица 3")))
    assert(rows(16) == (("iso-8859-7", "ελληνικά 3")))
    assert(rows(17) == (("iso-8859-2", "čeština stránka 3")))
    // a corrupt/lying CJK body still NULLs — strict in the new families
    assert(rows(18) == (("shift_jis", null)))
    // UNDECLARED content: strict utf-8 first, then the WHATWG
    // windows-1252 fallback — a declaration-less latin-1 page ADMITS
    assert(rows(19) == ((null, "legacy café 3")))
    // but the fallback is STRICT too: 0x90 is unmapped in cp1252
    assert(rows(20) == ((null, null)))
    assert(Warc.decodeCharset("mixé".getBytes("ISO-8859-1"), null) == "mixé")
    assert(Warc.decodeCharset("utf ok é".getBytes("UTF-8"), null) == "utf ok é")
    // alias labels map to the same decoders
    assert(Warc.decodeCharset("日本".getBytes("Shift_JIS"), "SJIS") == "日本")
    assert(Warc.decodeCharset("あ".getBytes("windows-31j"), "cp932") == "あ")
    assert(Warc.decodeCharset("한".getBytes("EUC-KR"), "ks_c_5601-1987") == "한")
    assert(Warc.decodeCharset("р".getBytes("KOI8-R"), "koi8") == "р")
    assert(Warc.decodeCharset("ł".getBytes("windows-1250"), "cp1250") == "ł")
    assert(Warc.decodeCharset("ğ".getBytes("ISO-8859-9"), "latin5") == "ğ")
    assert(Warc.decodeCharset("€".getBytes("ISO-8859-15"), "latin9") == "€")
    val srcs = out.collect().map(r => r.getAs[Int]("rec_idx") ->
      r.getAs[String]("charset_source")).toMap
    assert(srcs(3) == "default" && srcs(6) == "meta" && srcs(7) == "header")
    assert(srcs(9) == "meta" && srcs(8) == "header")
    // metaCharset corners: both meta forms, quote styles, the 1 KiB
    // prescan window, and absence
    assert(Warc.metaCharset("<META CHARSET='WINDOWS-1252'>x".getBytes("US-ASCII"))
      == "windows-1252")
    assert(Warc.metaCharset(
      ("x" * 1024 + "<meta charset=utf-8>").getBytes("US-ASCII")) == null)
    assert(Warc.metaCharset("<metadata charset=no><p>".getBytes("US-ASCII")) == null ||
      // "<metadata" contains "<meta" — the lenient scan MAY read it;
      // pin the actual behavior: the prefix matches, charset= found
      Warc.metaCharset("<metadata charset=no><p>".getBytes("US-ASCII")) == "no")
    assert(Warc.metaCharset("<p>no declaration</p>".getBytes("US-ASCII")) == null)
    assert(Warc.metaCharset(null) == null)
    // the utf-8-only layer NULLs the latin-1 page the charset-aware
    // one decodes — the gap this layer closes
    val utf8Only = Warc.httpResponses(Warc.records(frame, "media_id", "payload"))
      .collect().map(r => r.getAs[Int]("rec_idx") -> r.getAs[String]("payload")).toMap
    assert(utf8Only(1) == null && utf8Only(0) != null)
    // decodeCharset contract corners
    assert(Warc.decodeCharset("aéb".getBytes("ISO-8859-1"), "LATIN1") == "aéb")
    // bad utf-8 + NO declaration: the cp1252 fallback admits it
    assert(Warc.decodeCharset(Array[Byte](0x41, 0xE9.toByte), null) == "Aé")
    // bad utf-8 + a utf-8 DECLARATION: still NULL (only undeclared falls back)
    assert(Warc.decodeCharset(Array[Byte](0x41, 0xE9.toByte), "utf-8") == null)
    assert(Warc.decodeCharset(Array.empty[Byte], "utf-8") == "")
    assert(Warc.decodeCharset(null, "utf-8") == null)
    // binary-safe framing survives the bytes walk: a payload full of
    // CRLFCRLF and fake version lines must not desync record extents
    val evil = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: t\r\n" +
      // the 26-byte body IS "\r\n\r\nWARC/1.0\r\nfake: header" — a
      // delimiter-scanning parser would desync on it; Content-Length
      // framing must not
      "Content-Length: 26\r\n\r\n" + "\r\n\r\nWARC/1.0\r\nfake: header" + "\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: u\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes("US-ASCII")
    val recs = Warc.parseWarcBytes(9L, evil)
    assert(recs.length == 2 && recs(1).warc_type == "request",
      recs.map(r => (r.warc_type, r.content_length)).toString)
  }

  test("syntheticWarcCrawl withNonResponses: interleaved records parse; response bytes identical; httpLedger classifies") {
    val plain = Warc.parseWarc(3L, Warc.syntheticWarcCrawl(3L, 6))
    val mixed = Warc.parseWarc(3L, Warc.syntheticWarcCrawl(3L, 6, withNonResponses = true))
    // response records are byte-field-identical either way — only the
    // positions shift (revisit after i%3==1, request after i%3==2)
    assert(plain.length == 6)
    assert(mixed.count(_.warc_type == "response") == 6)
    assert(mixed.count(_.warc_type == "revisit") == 2)  // i = 1, 4
    assert(mixed.count(_.warc_type == "request") == 2)  // i = 2, 5
    assert(mixed.filter(_.warc_type == "response").map(r =>
      (r.target_uri, r.body)) == plain.map(r => (r.target_uri, r.body)))
    // a revisit record shares its response's target URI
    val rev = mixed.filter(_.warc_type == "revisit").head
    assert(rev.target_uri == plain(1).target_uri)
    // httpLedger: every record classified — responses parsed, torn
    // responses status -1, non-responses status 0 with NULL fields
    val torn = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: t\r\n" +
      "Content-Length: 9\r\n\r\nnot http!\r\n\r\n").getBytes("UTF-8")
    val frame = Seq(
      (1L, Warc.syntheticWarcCrawl(1L, 3, withNonResponses = true)),
      (2L, torn)).toDF("media_id", "payload")
    val led = Warc.httpLedger(Warc.records(frame, "media_id", "payload"))
    graft.queries.Q.requireNoShuffle(led)
    val rows = led.collect().map(r => (r.getAs[Long]("media_id"),
      r.getAs[Int]("rec_idx")) ->
      ((r.getAs[String]("warc_type"), r.getAs[Int]("status"),
        r.getAs[String]("content_type")))).toMap
    assert(rows.size == 6) // 3 responses + revisit(i=1) + request(i=2) + torn
    assert(rows((1L, 0))._1 == "response" && rows((1L, 0))._2 == 200)
    assert(rows((1L, 2)) == (("revisit", 0, null)))
    assert(rows((1L, 4)) == (("request", 0, null)))
    assert(rows((2L, 0)) == (("response", -1, null))) // torn stays visible
    // and the i=2 response ((1+2)%5==3) keeps its png classification
    assert(rows((1L, 3)) == (("response", 200, "image/png")))
  }

  test("dechunk: RFC 9112 framing corners — extensions, trailers, torn, junk") {
    def b(s: String) = s.getBytes("US-ASCII")
    // encoder round-trip including the chunk extension + trailer field
    val data = "hello chunked world".getBytes("UTF-8")
    assert(Warc.dechunk(Warc.chunkBody(data)).sameElements(data))
    // empty body: just the last chunk + terminal CRLF
    assert(Warc.dechunk(Warc.chunkBody(Array.emptyByteArray))
      .sameElements(Array.emptyByteArray))
    // uppercase hex sizes and no trailer
    assert(new String(Warc.dechunk(b("A\r\n0123456789\r\n0\r\n\r\n")), "US-ASCII")
      == "0123456789")
    // torn mid-chunk, torn mid-size-line, junk size → all NULL
    assert(Warc.dechunk(Warc.chunkBody(data, tornAt = 4)) == null)
    assert(Warc.dechunk(b("A\r\n0123")) == null)
    assert(Warc.dechunk(b("zz\r\nxx\r\n0\r\n\r\n")) == null)
    // missing chunk-data CRLF, bytes past the terminal CRLF → NULL
    assert(Warc.dechunk(b("3\r\nabcX\r\n0\r\n\r\n")) == null)
    assert(Warc.dechunk(b("3\r\nabc\r\n0\r\n\r\njunk")) == null)
    // bomb cap: declared size past maxOut refuses
    assert(Warc.dechunk(b("FFFFFFFF\r\n"), maxOut = 1024) == null)
    assert(Warc.dechunk(null) == null)
    // strict RFC 9112 chunk-size grammar (1*HEXDIG): a sign or padding
    // that Long.parseLong would tolerate is out of grammar → NULL
    assert(Warc.dechunk(b("+3\r\nabc\r\n0\r\n\r\n")) == null)
    assert(Warc.dechunk(b(" 3 \r\nabc\r\n0\r\n\r\n")) == null)
    assert(Warc.dechunk(b("0x3\r\nabc\r\n0\r\n\r\n")) == null)
    // strict zlib: round-trip, truncation, trailing junk, raw deflate
    val z = Warc.zlibDeflate(data)
    assert(Warc.inflateZlib(z).sameElements(data))
    assert(Warc.inflateZlib(java.util.Arrays.copyOf(z, z.length - 3)) == null)
    assert(Warc.inflateZlib(z ++ b("x")) == null)
    assert(Warc.inflateZlib(b("not zlib at all")) == null)
    assert(Warc.inflateZlib(null) == null)
    // decodeHttpBody layer order: TE first, CE second; contract edges
    val gz = graft.operators.CompressedMeta.gzipMember(data)
    assert(Warc.decodeHttpBody(Warc.chunkBody(gz), "chunked", "gzip")
      .sameElements(data))
    assert(Warc.decodeHttpBody(data, null, "identity").sameElements(data))
    assert(Warc.decodeHttpBody(data, "gzip", null) == null) // TE gzip: out of contract
    assert(Warc.decodeHttpBody(data, null, "br") == null)
    assert(Warc.decodeHttpBody(data, null, "gzip, identity") == null) // compound
    // strict whole-payload gunzip: trailing junk refuses, members concat
    assert(graft.operators.CompressedMeta.gunzipAll(gz ++ b("x")) == null)
    assert(new String(graft.operators.CompressedMeta.gunzipAll(
      graft.operators.CompressedMeta.gzipMember(b("ab")) ++
        graft.operators.CompressedMeta.gzipMember(b("cd"))), "US-ASCII") == "abcd")
  }

  test("httpTexts decodes on-the-wire bodies: chunked, gzip, deflate, layered, torn") {
    val frame = Seq((5L, Warc.syntheticWarcEncodings(5L)))
      .toDF("media_id", "payload")
    val out = Warc.httpTexts(Warc.recordsBinary(frame, "media_id", "payload"))
    graft.queries.Q.requireNoShuffle(out)
    val rows = out.collect().map(r => r.getAs[Int]("rec_idx") ->
      ((r.getAs[String]("transfer_encoding"), r.getAs[String]("content_encoding"),
        r.getAs[String]("text")))).toMap
    assert(rows(0) == ((null, null, "café page 5")))
    assert(rows(1) == (("chunked", null, "chunked café 5")))
    assert(rows(2) == ((null, "gzip", "gz café résumé 5")))
    assert(rows(3) == ((null, "deflate", "price €5")))
    assert(rows(4) == (("chunked", "gzip", "both café 5")))
    // degrades: torn chunk / out-of-contract coding / corrupt gzip all
    // NULL the text while the framing fields stay visible
    assert(rows(5) == (("chunked", null, null)))
    assert(rows(6) == ((null, "br", null)))
    assert(rows(7) == ((null, "gzip", null)))
    // Content-Encoding: zstd — a real compressed-block frame inflates
    assert(rows(8) == ((null, "zstd", "zs5 zs5 zs5 zs5 end")))
  }

  test("httpLedgerBytes: full-stream audit rows; response rows equal httpTexts") {
    val frame = Seq(
      (1L, Warc.syntheticWarcCrawl(1L, 8, withNonResponses = true,
        withEncodings = true, badEncodingEvery = 3)),
      (2L, Warc.syntheticWarcEncodings(2L)))
      .toDF("media_id", "payload")
    val recs = Warc.recordsBinary(frame, "media_id", "payload")
    val led = Warc.httpLedgerBytes(recs)
    graft.queries.Q.requireNoShuffle(led)
    // the two byte-path readers can never drift: the ledger's response
    // rows equal httpTexts row for row on the shared columns
    def key(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("rec_idx")) ->
        ((r.getAs[Int]("status"), r.getAs[String]("content_type"),
          r.getAs[String]("transfer_encoding"), r.getAs[String]("content_encoding"),
          r.getAs[String]("text")))).toMap
    val viaLedger = key(led.filter(org.apache.spark.sql.functions.col("warc_type") === "response")
      .select("media_id", "rec_idx", "status", "content_type",
        "transfer_encoding", "content_encoding", "text"))
    val viaTexts = key(Warc.httpTexts(recs)
      .select("media_id", "rec_idx", "status", "content_type",
        "transfer_encoding", "content_encoding", "text"))
    assert(viaLedger == viaTexts)
    // non-responses carry status 0; the br records are 200/text-html
    // with NULL text — the 'encoding' classification's raw material,
    // DISTINCT from torn (-1)
    val all = led.collect()
    assert(all.exists(r => r.getAs[String]("warc_type") == "revisit" &&
      r.getAs[Int]("status") == 0))
    assert(all.exists(r => r.getAs[String]("warc_type") == "response" &&
      r.getAs[Int]("status") == 200 &&
      r.getAs[String]("content_encoding") == "br" &&
      r.getAs[String]("text") == null))
    // body_decoded splits NULL text by CAUSE: the wire layer lost the
    // br body (false), while the utf-7 records' bytes arrived fine and
    // the CHARSET layer refused (true) — the ledger's two remediation
    // buckets must never conflate
    assert(all.exists(r => r.getAs[String]("content_encoding") == "br" &&
      !r.getAs[Boolean]("body_decoded")))
    assert(all.exists(r => r.getAs[Int]("status") == 200 &&
      r.getAs[String]("text") == null &&
      r.getAs[String]("content_encoding") == null &&
      r.getAs[Boolean]("body_decoded")))
  }

  test("httpValidators: case-preserved tags, absent validators, torn messages") {
    val blob = Warc.syntheticWarcRefresh(2L, 6)
    // append a torn response (no CRLFCRLF) under its own URI
    val torn = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://t.example/x\r\nContent-Length: 9\r\n\r\n" +
      "HTTP/1.1 " + "\r\n\r\n").getBytes("UTF-8")
    val frame = Seq((2L, blob ++ torn)).toDF("media_id", "payload")
    val rows = Warc.httpValidators(Warc.recordsBinary(frame, "media_id", "payload"))
    graft.queries.Q.requireNoShuffle(rows)
    val got = rows.collect().map(r => r.getAs[Int]("rec_idx") ->
      ((r.getAs[Int]("status"), r.getAs[String]("etag"),
        r.getAs[String]("last_modified")))).toMap
    // round 1, page 0: both validators, ETag case/quoting preserved
    assert(got(0) == ((200, "W/\"v1-2-0\"", "Mon, 00 Jan 2026")))
    assert(got(1) == ((200, null, null)))           // page 1: none
    assert(got(3) == ((200, "W/\"v1-2-3\"", null))) // page 3: tag only
    assert(got(7) == ((304, null, null)))           // round 2: 304, no validators
    assert(got(12) == ((-1, null, null)))           // torn: visible, not guessed
  }

  test("encoding layer never throws: truncations, bit flips, random bytes") {
    // the on-the-wire decode chain is the newest untrusted-input
    // surface — drive it with every prefix of the encoding fixture,
    // deterministic byte flips, and arbitrary garbage; parse failures
    // must surface as NULL rows, never as a task-killing throw
    val full = Warc.syntheticWarcEncodings(3L)
    for (cut <- 0 until full.length by 13) {
      val torn = java.util.Arrays.copyOf(full, cut)
      Warc.httpTexts(Warc.recordsBinary(
        Seq((1L, torn)).toDF("media_id", "payload"),
        "media_id", "payload")).collect()
    }
    for (i <- full.indices by 29) {
      val bad = full.clone; bad(i) = (bad(i) ^ 0x41).toByte
      Warc.httpTexts(Warc.recordsBinary(
        Seq((1L, bad)).toDF("media_id", "payload"),
        "media_id", "payload")).collect()
    }
    // pure-garbage and pathological primitives
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 50) {
      val junk = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      assert(Warc.dechunk(junk) == null || Warc.dechunk(junk) != null) // no throw
      Warc.inflateZlib(junk)
      Warc.decodeHttpBody(junk, "chunked", "gzip")
      Warc.decodeHttpBody(junk, null, "zstd")
      Warc.parseHttpBytesFull(junk)
    }
    // a valid message whose DECLARED lengths lie (Content-Length vs
    // actual chunk frame) stays a visible NULL
    val lying = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "FF\r\nshort").getBytes("US-ASCII")
    assert(Warc.decodeHttpBody(
      Warc.parseHttpBytesFull(lying).get._2, "chunked", null) == null)
  }

  test("crawl chain is encoding-invariant: wire codings decode to identical output") {
    // the SAME logical archive, once with plain bodies and once as a
    // server would transfer them (chunked / gzipped) — the byte-level
    // ingest must produce row-identical decoded text
    def chain(withEnc: Boolean) = {
      val frame = Seq(
        (1L, Warc.syntheticWarcCrawl(1L, 8, withNonResponses = true,
          withEncodings = withEnc)),
        (2L, Warc.syntheticWarcCrawl(2L, 8, withNonResponses = true,
          withEncodings = withEnc))).toDF("media_id", "payload")
      Warc.httpTexts(Warc.recordsBinary(frame, "media_id", "payload"))
        .select("media_id", "rec_idx", "target_uri", "status",
          "content_type", "charset", "text")
        .collect().map(_.toSeq).toSet
    }
    val plain = chain(false)
    val encoded = chain(true)
    assert(plain == encoded)
    assert(plain.nonEmpty)
  }
}
