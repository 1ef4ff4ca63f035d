package graft

import graft.operators.DumpDecode

/** bzip2/xz member walk vs REAL-CLI golden bytes: multistream splits,
  * all-or-NULL whole-payload decode, completed-prefix degrades, bomb
  * caps, and adversarial no-throw. Goldens were produced by the real
  * `bzip2` (-1/-9) and `xz` (-0/-6) CLIs over closed-form plaintexts.
  */
class DumpDecodeSpec extends SparkSpec {

  private def b64(s: String): Array[Byte] = java.util.Base64.getDecoder.decode(s)

  private val plain1: Array[Byte] = ("Hello dump world! " * 7 + "tail-1").getBytes("US-ASCII")
  private val plain2: Array[Byte] = Array.tabulate(500)(i => (((i * 7) % 26) + 97).toByte)
  private val plain3: Array[Byte] = Array.emptyByteArray

  // (name, compressed, plain)
  private def goldenBz2: Seq[(String, Array[Byte], Array[Byte])] = Seq(
    ("bz2 -9 text", b64("QlpoOTFBWSZTWfvmED0AAA8dgGACIAAAQCYm1oAgAFChppgAK/1SgyME9SKMEZPDFbWo30cHpfOzRU+IJJJL7IPxdyRThQkPvmED0A=="), plain1),
    ("bz2 -9 cycle", b64("QlpoOTFBWSZTWfDJZnQAAAmBgD////AgAHBQAABkyApVQA0AMJp9owxoyJnRpR+o1o5k6UYE60dqO9HijyT1R5o90fKPtGNGRM6NKP1GtH8XckU4UJDwyWZ0"), plain2),
    ("bz2 -9 empty", b64("QlpoORdyRThQkAAAAAA="), plain3),
    ("bz2 -1 text", b64("QlpoMTFBWSZTWfvmED0AAA8dgGACIAAAQCYm1oAgAFChppgAK/1SgyME9SKMEZPDFbWo30cHpfOzRU+IJJJL7IPxdyRThQkPvmED0A=="), plain1),
    ("bz2 -1 empty", b64("QlpoMRdyRThQkAAAAAA="), plain3)
  )

  private def goldenXz: Seq[(String, Array[Byte], Array[Byte])] = Seq(
    ("xz -6 text", b64("/Td6WFoAAATm1rRGBMAnhAEhARYAAAAAAAAAADBdI5jgAIMAH10AJBlJmG8QFQjOzt4EVjoSWzq62iXu6igTtJLmOCa8AAAAZq5LWgIdLGQAAUOEAQAAACjdQ7axxGf7AgAAAAAEWVo="), plain1),
    ("xz -6 cycle", b64("/Td6WFoAAATm1rRGBMAq9AMhARYAAAAAAAAAAHDPFnngAfMAIl0AMJoKRLFLF6eOAafYFOaFtnobEOhh9qCJa+HvsJ/Hw0gAAAAAAHuqXmC5IkE3AAFG9AMAAADfZFW1scRn+wIAAAAABFla"), plain2),
    ("xz -6 empty", b64("/Td6WFoAAATm1rRGAAAAABzfRCEftvN9AQAAAAAEWVo="), plain3),
    ("xz -0 text", b64("/Td6WFoAAATm1rRGA8AohAEhAQwAAAAAmiYdYeAAgwAgXQAkGUmG59Xlm2eqDuMhnO1GHVtukjT/2lJd/KWqaEtAAABmrktaAh0sZAABQIQBAAAAhq/XMLHEZ/sCAAAAAARZWg=="), plain1)
  )

  test("golden: real-bzip2 and real-xz output decodes byte-exactly") {
    for ((name, comp, plain) <- goldenBz2) {
      val ms = DumpDecode.bz2Members(comp)
      assert(ms.length == 1 && java.util.Arrays.equals(ms.head, plain), name)
      assert(java.util.Arrays.equals(DumpDecode.bunzipAll(comp), plain), name)
    }
    for ((name, comp, plain) <- goldenXz) {
      val ms = DumpDecode.xzMembers(comp)
      assert(ms.length == 1 && java.util.Arrays.equals(ms.head, plain), name)
      assert(java.util.Arrays.equals(DumpDecode.unxzAll(comp), plain), name)
    }
  }

  test("multistream: concatenated streams split into members at exact byte boundaries") {
    val bz = goldenBz2(0)._2 ++ goldenBz2(1)._2 ++ goldenBz2(2)._2
    val ms = DumpDecode.bz2Members(bz)
    assert(ms.length == 3)
    assert(java.util.Arrays.equals(ms(0), plain1))
    assert(java.util.Arrays.equals(ms(1), plain2))
    assert(ms(2).isEmpty)
    // bunzipAll concatenates (the empty member contributes nothing)
    assert(java.util.Arrays.equals(DumpDecode.bunzipAll(bz), plain1 ++ plain2))

    val xz = goldenXz(0)._2 ++ goldenXz(1)._2
    val xs = DumpDecode.xzMembers(xz)
    assert(xs.length == 2)
    assert(java.util.Arrays.equals(xs(0), plain1))
    assert(java.util.Arrays.equals(xs(1), plain2))
    assert(java.util.Arrays.equals(DumpDecode.unxzAll(xz), plain1 ++ plain2))
  }

  test("completed-prefix: a torn second stream keeps the first member only") {
    val whole = goldenBz2(1)._2
    for (cut <- Seq(4, whole.length / 2, whole.length - 1)) {
      val bz = goldenBz2(0)._2 ++ whole.take(cut)
      val ms = DumpDecode.bz2Members(bz)
      assert(ms.length == 1 && java.util.Arrays.equals(ms.head, plain1), s"cut=$cut")
      assert(DumpDecode.bunzipAll(bz) == null, s"cut=$cut") // not consumed exactly
    }
    val xwhole = goldenXz(1)._2
    for (cut <- Seq(6, xwhole.length / 2, xwhole.length - 1)) {
      val xz = goldenXz(0)._2 ++ xwhole.take(cut)
      val xs = DumpDecode.xzMembers(xz)
      assert(xs.length == 1 && java.util.Arrays.equals(xs.head, plain1), s"cut=$cut")
      assert(DumpDecode.unxzAll(xz) == null, s"cut=$cut")
    }
  }

  test("all-or-NULL: trailing junk, junk prefix, and mid-stream corruption refuse") {
    val junk = Array.tabulate(16)(i => (i * 37 + 5).toByte)
    assert(DumpDecode.bunzipAll(goldenBz2(0)._2 ++ junk) == null)
    assert(DumpDecode.unxzAll(goldenXz(0)._2 ++ junk) == null)
    assert(DumpDecode.bunzipAll(junk) == null)
    assert(DumpDecode.unxzAll(junk) == null)
    assert(DumpDecode.bunzipAll(null) == null)
    assert(DumpDecode.unxzAll(null) == null)
    // flip a byte in the middle of the compressed body: CRC refuses
    val bz = goldenBz2(1)._2.clone(); bz(bz.length / 2) = (bz(bz.length / 2) ^ 0x5A).toByte
    assert(DumpDecode.bunzipAll(bz) == null)
    val xz = goldenXz(1)._2.clone(); xz(xz.length / 2) = (xz(xz.length / 2) ^ 0x5A).toByte
    assert(DumpDecode.unxzAll(xz) == null)
  }

  test("bomb caps: an over-budget member refuses and keeps the completed prefix") {
    val big = DumpDecode.bz2Member(Array.fill(100000)('a'.toByte))
    val ms = DumpDecode.bz2Members(goldenBz2(0)._2 ++ big, maxOutPerMember = 1024)
    assert(ms.length == 1 && java.util.Arrays.equals(ms.head, plain1))
    assert(DumpDecode.bz2Members(big, maxOutPerMember = 1024).isEmpty)
    // aggregate budget: second member tips the total
    val two = DumpDecode.bz2Member(plain2) ++ DumpDecode.bz2Member(plain2)
    assert(DumpDecode.bz2Members(two, maxOutTotal = 600).length == 1)
    val xbig = DumpDecode.xzMember(Array.fill(100000)('a'.toByte))
    assert(DumpDecode.xzMembers(xbig, maxOutPerMember = 1024).isEmpty)
    assert(DumpDecode.bunzipAll(big, maxOutPerMember = 1024) == null)
    assert(DumpDecode.unxzAll(xbig, maxOutPerMember = 1024) == null)
  }

  test("fixture encoders round-trip and interleave across formats") {
    for (n <- Seq(0, 1, 63, 64, 65, 5000)) {
      val data = Array.tabulate(n)(i => ((i * 131 + 7) & 0xFF).toByte)
      assert(java.util.Arrays.equals(DumpDecode.bunzipAll(DumpDecode.bz2Member(data)), data), s"bz2 n=$n")
      assert(java.util.Arrays.equals(DumpDecode.unxzAll(DumpDecode.xzMember(data)), data), s"xz n=$n")
    }
    // a bz2 stream is junk to the xz walk and vice versa (magic gate)
    assert(DumpDecode.xzMembers(DumpDecode.bz2Member(plain1)).isEmpty)
    assert(DumpDecode.bz2Members(DumpDecode.xzMember(plain1)).isEmpty)
  }

  test("bz2MemberAt + parseMultistreamIndex: random access decodes ONLY the target stream") {
    val m0 = DumpDecode.bz2Member("header".getBytes("US-ASCII"))
    val m1 = DumpDecode.bz2Member(plain1)
    val m2 = DumpDecode.bz2Member(plain2)
    // corrupt the middle member: offsets around it must still resolve
    val bad = m1.clone(); bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x3C).toByte
    val blob = m0 ++ bad ++ m2
    assert(new String(DumpDecode.bz2MemberAt(blob, 0), "US-ASCII") == "header")
    assert(java.util.Arrays.equals(DumpDecode.bz2MemberAt(blob, (m0.length + bad.length).toLong), plain2))
    assert(DumpDecode.bz2MemberAt(blob, m0.length.toLong) == null) // the corrupt one, visibly
    assert(DumpDecode.bz2MemberAt(blob, 3L) == null) // junk offset: no header there
    assert(DumpDecode.bz2MemberAt(blob, -1L) == null)
    assert(DumpDecode.bz2MemberAt(blob, blob.length.toLong) == null)
    assert(DumpDecode.bz2MemberAt(null, 0L) == null)
    assert(DumpDecode.bz2MemberAt(DumpDecode.bz2Member(Array.fill(100000)('a'.toByte)), 0L,
      maxOut = 1024) == null) // bomb cap

    val idx = DumpDecode.parseMultistreamIndex(
      "0:10:Alpha\n612:11:Title: with colons\njunk line\n612:-:bad id\n:5:empty off\n612:12:")
    assert(idx == Seq((0L, 10L, "Alpha"), (612L, 11L, "Title: with colons")))
    // CRLF index files: titles must not keep a trailing '\r'
    assert(DumpDecode.parseMultistreamIndex("0:10:Alpha\r\n612:11:Beta\r\n") ==
      Seq((0L, 10L, "Alpha"), (612L, 11L, "Beta")))
    assert(DumpDecode.parseMultistreamIndex(null).isEmpty)
    assert(DumpDecode.parseMultistreamIndex("").isEmpty)
  }

  test("decompressAuto: magic sniff dispatches all four formats; plain passes through") {
    import graft.operators.{CompressedMeta, ZstdDecode}
    val data = Array.tabulate(300)(i => ((i * 11 + 3) & 0xFF).toByte)
    assert(java.util.Arrays.equals(DumpDecode.decompressAuto(CompressedMeta.gzipMember(data)), data))
    assert(java.util.Arrays.equals(DumpDecode.decompressAuto(ZstdDecode.zstdFrameRaw(data, checksum = true)), data))
    assert(java.util.Arrays.equals(DumpDecode.decompressAuto(DumpDecode.bz2Member(data)), data))
    assert(java.util.Arrays.equals(DumpDecode.decompressAuto(DumpDecode.xzMember(data)), data))
    // no known magic → UNCHANGED (plain tar's signature lives at byte 257)
    assert(DumpDecode.decompressAuto(data) eq data)
    assert(DumpDecode.decompressAuto(null) == null)
    assert(DumpDecode.decompressAuto(Array[Byte](1)).length == 1)
    // corrupt compressed payload → null, never silently-partial bytes
    val gz = CompressedMeta.gzipMember(data); gz(gz.length - 2) = (gz(gz.length - 2) ^ 1).toByte
    assert(DumpDecode.decompressAuto(gz) == null)
  }

  test("adversarial: every truncation and every-16th bit-flip of goldens never throws") {
    val payloads = Seq(goldenBz2(1)._2, goldenXz(1)._2,
      goldenBz2(0)._2 ++ goldenBz2(1)._2, goldenXz(0)._2 ++ goldenXz(1)._2)
    for (p <- payloads) {
      for (cut <- 0 to p.length) {
        DumpDecode.bz2Members(p.take(cut)); DumpDecode.xzMembers(p.take(cut))
        DumpDecode.bunzipAll(p.take(cut)); DumpDecode.unxzAll(p.take(cut))
      }
      for (i <- p.indices by 16) {
        val q = p.clone(); q(i) = (q(i) ^ 0xFF).toByte
        DumpDecode.bz2Members(q); DumpDecode.xzMembers(q)
        DumpDecode.bunzipAll(q); DumpDecode.unxzAll(q)
      }
    }
  }
}
