package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}

import graft.operators.TarShard

/** Hand-rolled ustar walk vs the Apache commons-compress reference
  * implementation (both directions), WebDataset sample grouping,
  * long-name/PAX arms, checksum refusal, torn-prefix degrades, bomb
  * caps, and adversarial no-throw.
  */
class TarShardSpec extends SparkSpec {

  private def refTar(members: Seq[(String, Array[Byte])],
      longFileMode: Int = TarArchiveOutputStream.LONGFILE_GNU): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val t = new TarArchiveOutputStream(bos)
    t.setLongFileMode(longFileMode)
    t.setAddPaxHeadersForNonAsciiNames(true)
    for ((name, data) <- members) {
      val e = new TarArchiveEntry(name)
      e.setSize(data.length.toLong)
      t.putArchiveEntry(e)
      t.write(data)
      t.closeArchiveEntry()
    }
    t.close()
    bos.toByteArray
  }

  private val sampleMembers: Seq[(String, Array[Byte])] = Seq(
    ("000001.jpg", Array.tabulate(700)(i => (i * 3).toByte)),
    ("000001.txt", "a red bicycle".getBytes("UTF-8")),
    ("000001.seg.json", """{"boxes":[1,2]}""".getBytes("UTF-8")),
    ("000002.jpg", Array.tabulate(33)(i => (i * 5 + 1).toByte)),
    ("000002.txt", "two ducks".getBytes("UTF-8"))
  )

  test("golden: commons-compress output parses entry-exactly (plain names)") {
    val es = TarShard.entries(refTar(sampleMembers))
    assert(es.length == 5)
    for (((name, data), e) <- sampleMembers.zip(es)) {
      assert(e.name == name && e.typeflag == "0" && e.size == data.length.toLong)
      assert(java.util.Arrays.equals(e.data, data), name)
    }
  }

  test("golden: GNU long names and PAX long names both resolve") {
    val long = "deep/nested/shard/with/a/very/long/path/segment/" + ("x" * 80) + "/000009.txt"
    assert(long.length > 100)
    val gnu = TarShard.entries(refTar(Seq((long, "payload".getBytes("UTF-8")))))
    assert(gnu.length == 1 && gnu.head.name == long &&
      new String(gnu.head.data, "UTF-8") == "payload")
    val pax = TarShard.entries(refTar(Seq((long, "payload".getBytes("UTF-8"))),
      TarArchiveOutputStream.LONGFILE_POSIX))
    assert(pax.length == 1 && pax.head.name == long &&
      new String(pax.head.data, "UTF-8") == "payload")
  }

  test("our writer is REAL tar: commons-compress round-trips it, long names included") {
    val long = "shards/train/" + ("y" * 95) + "/000042.cls"
    val blob = TarShard.tar(Seq(
      ("dir/", "5", Array.emptyByteArray),
      ("dir/000001.txt", "0", "hello".getBytes("UTF-8")),
      (long, "0", Array[Byte](9, 8, 7))))
    val in = new TarArchiveInputStream(new ByteArrayInputStream(blob))
    val e1 = in.getNextEntry; assert(e1.getName == "dir/" && e1.isDirectory)
    val e2 = in.getNextEntry
    assert(e2.getName == "dir/000001.txt" && new String(in.readAllBytes(), "UTF-8") == "hello")
    val e3 = in.getNextEntry
    assert(e3.getName == long && java.util.Arrays.equals(in.readAllBytes(), Array[Byte](9, 8, 7)))
    assert(in.getNextEntry == null)
    // and our own walk agrees with itself
    val es = TarShard.entries(blob)
    assert(es.map(_.name) == Seq("dir/", "dir/000001.txt", long))
    assert(es.map(_.typeflag) == Seq("5", "0", "0"))
  }

  test("samples: consecutive stems group; dirs and dot-less files break runs") {
    val es = TarShard.entries(refTar(sampleMembers))
    val ss = TarShard.samples(es)
    assert(ss.map(_.key) == Seq("000001", "000002"))
    assert(ss(0).parts.map(_._1) == Seq("jpg", "txt", "seg.json"))
    assert(ss(1).parts.map(_._1) == Seq("jpg", "txt"))
    assert(new String(ss(0).parts(1)._2, "UTF-8") == "a red bicycle")
    // a repeated stem AFTER a break is a NEW sample (consecutive-run law)
    val withBreak = TarShard.entries(TarShard.tar(Seq(
      ("a.txt", "0", "1".getBytes), ("NOEXT", "0", "x".getBytes),
      ("a.json", "0", "2".getBytes))))
    assert(TarShard.samples(withBreak).map(_.key) == Seq("a", "a"))
    // directory members break runs the same way and never join samples
    val withDir = TarShard.entries(TarShard.tar(Seq(
      ("b.txt", "0", "1".getBytes), ("d/", "5", Array.emptyByteArray),
      ("b.json", "0", "2".getBytes))))
    assert(TarShard.samples(withDir).map(_.key) == Seq("b", "b"))
    // stems carry their directory: same basename under two dirs ≠ one sample
    val twoDirs = TarShard.entries(TarShard.tar(Seq(
      ("d1/c.txt", "0", "1".getBytes), ("d2/c.txt", "0", "2".getBytes))))
    assert(TarShard.samples(twoDirs).map(_.key) == Seq("d1/c", "d2/c"))
  }

  test("checksum refusal and torn data keep the completed prefix") {
    val blob = refTar(sampleMembers)
    // corrupt the SECOND header's checksum field: first entry survives
    val secondHeader = 512 + 1024 // header + 700-byte data padded to 1024
    val bad = blob.clone()
    bad(secondHeader + 148) = '9'
    assert(TarShard.entries(bad).length == 1)
    // truncate mid-data: entries whose data completed survive
    for (cut <- Seq(512 + 100, secondHeader + 512 + 3, blob.length - 1030)) {
      val es = TarShard.entries(blob.take(cut))
      assert(es.length < 5 && es.forall(e => e.data.length.toLong == e.size), s"cut=$cut")
    }
    // the full blob minus end blocks still yields all five
    assert(TarShard.entries(blob.dropRight(1024)).length == 5)
  }

  test("bomb caps: entry count and aggregate byte budgets bound the walk") {
    val blob = refTar(sampleMembers)
    assert(TarShard.entries(blob, maxEntries = 2).length == 2)
    // 700 + 13 + 15 bytes in: a 730 budget admits three entries, not four
    assert(TarShard.entries(blob, maxOutTotal = 730L).length == 3)
    // a hostile header declaring a huge size stops cleanly (data past end)
    val hostile = TarShard.tar(Seq(("h.bin", "0", Array[Byte](1)))).clone()
    System.arraycopy("77777777777".getBytes("US-ASCII"), 0, hostile, 124, 11)
    // fix the checksum so ONLY the size lies
    val sum = (0 until 512).map(i => if (i >= 148 && i < 156) 0x20 else hostile(i) & 0xFF).sum
    System.arraycopy(f"${sum}%06o".getBytes("US-ASCII"), 0, hostile, 148, 6)
    assert(TarShard.entries(hostile).isEmpty)
  }

  test("entryRows/sampleRows: distributed walk is map-only and exact") {
    import spark.implicits._
    val df = Seq((1L, refTar(sampleMembers)), (2L, TarShard.tar(Seq(
      ("z.txt", "0", "zz".getBytes("UTF-8"))))))
      .toDF("media_id", "payload")
    val er = TarShard.entryRows(df, "media_id", "payload")
    graft.queries.Q.requireNoShuffle(er)
    assert(er.count() == 6)
    val sr = TarShard.sampleRows(df, "media_id", "payload").collect()
    assert(sr.length == 6)
    val keys = sr.map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3))).toSeq
    assert(keys.contains((1L, 0, "000001", "seg.json")))
    assert(keys.contains((2L, 0, "z", "txt")))
  }

  test("adversarial: every-512-stride truncation and junk never throw") {
    val blob = refTar(sampleMembers)
    for (cut <- 0 to blob.length by 512) TarShard.entries(blob.take(cut))
    for (cut <- Seq(1, 7, 100, 511, 513)) TarShard.entries(blob.take(cut))
    TarShard.entries(Array.tabulate(2048)(i => (i * 37).toByte))
    TarShard.entries(null)
    TarShard.entries(Array.emptyByteArray)
    // PAX record walk on hostile 'x' payloads
    val paxJunk = TarShard.tar(Seq(("p", "x", "999 path=/x\n".getBytes("UTF-8")),
      ("q.txt", "0", "1".getBytes)))
    TarShard.entries(paxJunk)
  }
}
