package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry => JZipEntry, ZipInputStream, ZipOutputStream}

import graft.operators.{TarShard, ZipShard}

/** Stream-order zip walk vs the JDK reference implementation (both
  * directions — the JDK writer emits the data-descriptor layout, so
  * that corner is certified on real bytes), stored/deflate arms, CRC
  * refusal, torn-prefix degrades, bomb caps, sample grouping parity
  * with tar, and adversarial no-throw.
  */
class ZipShardSpec extends SparkSpec {

  private def jdkZip(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    for ((name, data) <- members) {
      val e = new JZipEntry(name)
      e.setTime(0L)
      z.putNextEntry(e)
      z.write(data)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private val sampleMembers: Seq[(String, Array[Byte])] = Seq(
    ("000001.jpg", Array.tabulate(700)(i => (i * 3).toByte)),
    ("000001.txt", "a red bicycle".getBytes("UTF-8")),
    ("000002.jpg", Array.tabulate(33)(i => (i * 5 + 1).toByte)),
    ("000002.txt", "two ducks".getBytes("UTF-8")))

  test("golden: JDK ZipOutputStream bytes (descriptor layout) walk entry-exactly") {
    val es = ZipShard.entries(jdkZip(sampleMembers))
    assert(es.length == 4)
    for (((name, data), e) <- sampleMembers.zip(es)) {
      assert(e.name == name && e.method == 8 && e.usize == data.length.toLong)
      assert(java.util.Arrays.equals(e.data, data), name)
    }
  }

  test("our writer is REAL zip: the JDK reader round-trips every layout") {
    for ((deflate, descriptor) <- Seq((true, false), (true, true), (false, false))) {
      val blob = ZipShard.zip(sampleMembers, deflate = deflate, descriptor = descriptor)
      val in = new ZipInputStream(new ByteArrayInputStream(blob))
      for ((name, data) <- sampleMembers) {
        val e = in.getNextEntry
        assert(e.getName == name, s"d=$deflate desc=$descriptor")
        assert(java.util.Arrays.equals(in.readAllBytes(), data))
      }
      assert(in.getNextEntry == null)
      // and our own walk agrees
      val es = ZipShard.entries(blob)
      assert(es.map(_.name) == sampleMembers.map(_._1))
      assert(es.forall(e => java.util.Arrays.equals(
        e.data, sampleMembers.find(_._1 == e.name).get._2)))
    }
  }

  test("zip64: the 0x0001 extra field and 8-byte descriptors walk; JDK reader agrees") {
    for ((deflate, descriptor) <- Seq((true, false), (true, true), (false, false))) {
      val blob = ZipShard.zip(sampleMembers, deflate = deflate, descriptor = descriptor,
        zip64 = true)
      // our stream-order walk resolves the saturated 4-byte fields
      // through the extended-information field
      val es = ZipShard.entries(blob)
      assert(es.map(_.name) == sampleMembers.map(_._1), s"d=$deflate desc=$descriptor")
      for (((name, data), e) <- sampleMembers.zip(es)) {
        assert(e.usize == data.length.toLong, name)
        assert(java.util.Arrays.equals(e.data, data), name)
      }
      // JDK certification for the non-descriptor layouts. The
      // descriptor one is excluded on purpose: APPNOTE 4.3.9.2 widths
      // the descriptor by the entry's declared zip64-ness (what this
      // walk and the zip CLI do), while ZipInputStream.readEnd guesses
      // from the ACTUAL inflated size — a long-standing JDK quirk that
      // misreads spec-conformant 8-byte descriptors on small members.
      if (!descriptor) {
        val in = new ZipInputStream(new ByteArrayInputStream(blob))
        for ((name, data) <- sampleMembers) {
          val e = in.getNextEntry
          assert(e.getName == name, s"JDK d=$deflate desc=$descriptor")
          assert(java.util.Arrays.equals(in.readAllBytes(), data))
        }
      }
    }
    // a saturated size with NO zip64 extra field is a torn header, not
    // a guess: the walk stops with the completed prefix
    val blob = ZipShard.zip(sampleMembers, deflate = false, zip64 = true)
    // find the first local header's extra field and blank its id
    val extraAt = 30 + "000001.jpg".getBytes("UTF-8").length
    val broken = blob.clone()
    broken(extraAt) = 0x7F
    assert(ZipShard.entries(broken).isEmpty)
    // an absurd 2^63 zip64 size is a bomb claim, refused
    val bomb = blob.clone()
    bomb(extraAt + 4 + 7) = 0x80.toByte // usize high byte → negative
    assert(ZipShard.entries(bomb).isEmpty)
  }

  test("stored+descriptor is unknowable in stream order: the walk stops visibly") {
    // splice bit 3 into a STORED entry's flags: boundary now unknowable
    val blob = ZipShard.zip(sampleMembers.take(1), deflate = false)
    val bad = blob.clone(); bad(6) = 0x08
    assert(ZipShard.entries(bad).isEmpty)
    // an unsupported method (bzip2 = 12) stops with the prefix kept
    val two = ZipShard.zip(sampleMembers.take(2), deflate = true)
    // second local header: find it by signature scan from byte 4
    var second = 4
    while (!(two(second) == 0x50 && two(second + 1) == 0x4b &&
      two(second + 2) == 3 && two(second + 3) == 4)) second += 1
    val meth = two.clone(); meth(second + 8) = 12
    assert(ZipShard.entries(meth).length == 1)
  }

  test("CRC refusal and torn payloads keep the completed prefix") {
    val blob = ZipShard.zip(sampleMembers, deflate = true)
    // corrupt one body byte of the SECOND entry: first survives, rest stop
    var second = 4
    while (!(blob(second) == 0x50 && blob(second + 1) == 0x4b &&
      blob(second + 2) == 3 && blob(second + 3) == 4)) second += 1
    val bad = blob.clone()
    bad(second + 30 + "000001.txt".length + 2) = (bad(second + 30 + "000001.txt".length + 2) ^ 0x55).toByte
    val es = ZipShard.entries(bad)
    assert(es.length == 1 && es.head.name == "000001.jpg")
    for (cut <- Seq(10, 200, blob.length / 2)) {
      val got = ZipShard.entries(blob.take(cut))
      assert(got.forall(e => e.data.length.toLong == e.usize), s"cut=$cut")
      assert(got.length < 4, s"cut=$cut")
    }
  }

  test("bomb caps bound the inflate; budgets keep the prefix") {
    val big = ZipShard.zip(Seq(("a.bin", Array.fill(200000)('a'.toByte))))
    assert(ZipShard.entries(big, maxOutPerEntry = 1024).isEmpty)
    val mixed = ZipShard.zip(sampleMembers)
    assert(ZipShard.entries(mixed, maxOutTotal = 714L).length == 2) // 700+13, third tips
    assert(ZipShard.entries(mixed, maxEntries = 3).length == 3)
  }

  test("samples: zip and tar shards of the same files group identically") {
    val tarSamples = TarShard.samples(TarShard.entries(
      TarShard.tar(sampleMembers.map { case (n, d) => (n, "0", d) })))
    val zipSamples = ZipShard.samples(ZipShard.entries(ZipShard.zip(sampleMembers)))
    assert(zipSamples.map(_.key) == tarSamples.map(_.key))
    assert(zipSamples.map(_.parts.map(_._1)) == tarSamples.map(_.parts.map(_._1)))
    // directories break runs like tar's type-5 members
    val withDir = ZipShard.entries(ZipShard.zip(Seq(
      ("b.txt", "1".getBytes), ("d/", Array.emptyByteArray), ("b.json", "2".getBytes))
      .map { case (n, d) => (n, d) }))
    assert(ZipShard.samples(withDir).map(_.key) == Seq("b", "b"))
  }

  test("review finding: the sig-less data-descriptor layout parses (spec allows it)") {
    // mainstream writers emit PK\x07\x08 before the descriptor, but the
    // signature is OPTIONAL — strip it and the walk must still resolve
    // the boundary (the csize-vs-bytes-consumed cross-check, which also
    // disambiguates an entry whose real CRC happens to equal the sig)
    val members = sampleMembers.take(2)
    val blob = ZipShard.zip(members, deflate = true, descriptor = true)
    var p = 30 + members.head._1.length
    while (!(blob(p) == 0x50 && blob(p + 1) == 0x4b && blob(p + 2) == 7 && blob(p + 3) == 8)) p += 1
    val noSig = blob.take(p) ++ blob.drop(p + 4) // first entry's descriptor loses its sig
    val es = ZipShard.entries(noSig)
    assert(es.length == 2)
    assert(java.util.Arrays.equals(es(0).data, members(0)._2))
    assert(java.util.Arrays.equals(es(1).data, members(1)._2))
  }

  test("adversarial: truncations, bit flips, and junk never throw") {
    val blobs = Seq(jdkZip(sampleMembers), ZipShard.zip(sampleMembers, descriptor = true))
    for (blob <- blobs) {
      for (cut <- 0 to blob.length by 13) ZipShard.entries(blob.take(cut))
      for (i <- blob.indices by 31) {
        val q = blob.clone(); q(i) = (q(i) ^ 0xFF).toByte
        ZipShard.entries(q)
      }
    }
    ZipShard.entries(null)
    ZipShard.entries(Array.tabulate(100)(i => (i * 7).toByte))
  }
}
