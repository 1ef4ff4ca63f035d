package graft

import org.apache.spark.sql.functions._

import graft.operators.ContainerMeta

/** MP4 box walk (sizes, largesize, v0/v1 mvhd, track handlers, torn
  * boxes) and Ogg page walk (lacing, granules, id headers, torn
  * pages).
  */
class ContainerMetaSpec extends SparkSpec {
  import spark.implicits._

  test("mp4Inventory: the three fixture arms produce the closed-form rows") {
    val r0 = ContainerMeta.mp4Inventory(0, ContainerMeta.syntheticMp4(0))
    assert(r0 == ContainerMeta.Mp4Inventory(0, "isom", 1000, 90000, 90000,
      2, true, true, 640, 360))
    val r1 = ContainerMeta.mp4Inventory(1, ContainerMeta.syntheticMp4(1))
    assert(r1 == ContainerMeta.Mp4Inventory(1, "mp42", 600, 1234567891L,
      1234567891L * 1000L / 600L, 1, false, true, 0, 0))
    val r2 = ContainerMeta.mp4Inventory(2, ContainerMeta.syntheticMp4(2))
    assert(r2 == ContainerMeta.Mp4Inventory(2, null, 0, 0, 0, 0, false, false, 0, 0))
  }

  test("mp4Inventory: largesize boxes, torn boxes, and run-to-end sizes") {
    val base = ContainerMeta.syntheticMp4(0)
    // wrap the ftyp body in a largesize (size=1 + 64-bit) box: the
    // walk must still find the brand
    val ftypBody = java.util.Arrays.copyOfRange(base, 8, 24)
    val big = new java.io.ByteArrayOutputStream()
    big.write(Array[Byte](0, 0, 0, 1), 0, 4)
    big.write("ftyp".getBytes, 0, 4)
    val lsz = 16L + ftypBody.length
    for (k <- 7 to 0 by -1) big.write(((lsz >> (8 * k)) & 0xFF).toInt)
    big.write(ftypBody, 0, ftypBody.length)
    val rest = java.util.Arrays.copyOfRange(base, 24, base.length)
    // splice: payload must still LEAD with an ftyp at offset 4..8 for
    // the contract sniff — largesize ftyp has its type at 4..8 too
    val spliced = big.toByteArray ++ rest
    val got = ContainerMeta.mp4Inventory(9, spliced)
    assert(got.brand == "isom" && got.n_tracks == 2, got.toString)
    // a box whose size overruns the payload stops the walk with the
    // prefix intact: chop mid-moov — brand survives, tracks degrade
    val torn = ContainerMeta.mp4Inventory(9,
      java.util.Arrays.copyOfRange(base, 0, base.length - 20))
    assert(torn.brand == "isom")
    assert(torn.n_tracks < 2)
    // a download cut EXACTLY at a box boundary leaving a bare zero-body
    // tkhd header must keep the parsed prefix, not throw it away
    val bare = base ++ Array[Byte](0, 0, 0, 8) ++ "tkhd".getBytes("ISO-8859-1")
    val kept = ContainerMeta.mp4Inventory(9, bare)
    assert(kept.brand == "isom" && kept.n_tracks == 2, kept.toString)
  }

  test("oggInventory: the three fixture arms produce the closed-form rows") {
    val r0 = ContainerMeta.oggInventory(0, ContainerMeta.syntheticOgg(0))
    assert(r0 == ContainerMeta.OggInventory(0, "opus", 2, 48000, 2, 48000,
      (48000L - 312L) * 1000L / 48000L))
    val r1 = ContainerMeta.oggInventory(1, ContainerMeta.syntheticOgg(1))
    assert(r1 == ContainerMeta.OggInventory(1, "vorbis", 2, 44100, 2, 22051,
      22051L * 1000L / 44100L))
    val r2 = ContainerMeta.oggInventory(2, ContainerMeta.syntheticOgg(2))
    assert(r2 == ContainerMeta.OggInventory(2, "unknown", 0, 0, 0, 0, 0))
  }

  test("oggInventory: multi-segment lacing, -1 granules, torn pages") {
    // a 300-byte packet laces as 255 + 45: the walk must span it
    val head = ContainerMeta.syntheticOgg(0)
    val r = ContainerMeta.oggInventory(0, head)
    assert(r.n_pages == 2)
    // granule -1 (no packet ends on page) must not move the max
    val minus1 = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(head, 0, head.length)
      // hand-build a page with granule -1
      out.write("OggS".getBytes, 0, 4); out.write(0); out.write(0)
      for (_ <- 0 until 8) out.write(0xFF)
      for (_ <- 0 until 12) out.write(0)
      out.write(1); out.write(3); out.write(Array[Byte](1, 2, 3), 0, 3)
      out.toByteArray
    }
    val rm = ContainerMeta.oggInventory(0, minus1)
    assert(rm.n_pages == 3 && rm.granule == 48000L)
    // torn page (declared payload overruns): prefix stays visible
    val torn = ContainerMeta.oggInventory(0,
      java.util.Arrays.copyOfRange(head, 0, head.length - 10))
    assert(torn.n_pages == 1 && torn.codec == "opus")
  }

  test("distributed inventories are map-only") {
    val df = (0L until 9L).map(k =>
      (k, ContainerMeta.syntheticMp4(k), ContainerMeta.syntheticOgg(k)))
      .toDF("media_id", "mp4", "ogg")
    val m = ContainerMeta.mp4Inventories(df, "media_id", "mp4")
    val o = ContainerMeta.oggInventories(df, "media_id", "ogg")
    graft.queries.Q.requireNoShuffle(m)
    graft.queries.Q.requireNoShuffle(o)
    assert(m.filter(col("has_video")).count() == 3L)
    assert(o.filter(col("codec") === "vorbis").count() == 3L)
  }

  test("mkvInventory: the four fixture arms produce the closed-form rows") {
    val r0 = ContainerMeta.mkvInventory(0, ContainerMeta.syntheticMkv(0))
    assert(r0 == ContainerMeta.MkvInventory(0, "webm", 1000000L, 90000L,
      2, true, true, 1280, 720, "V_VP9", "A_OPUS", 2, 48000), r0.toString)
    val r1 = ContainerMeta.mkvInventory(5, ContainerMeta.syntheticMkv(5))
    assert(r1 == ContainerMeta.MkvInventory(5, "matroska", 2000000L,
      60010L, 1, false, true, 0, 0, null, "A_VORBIS", 2, 44100), r1.toString)
    // the torn arm: doc type, scale and duration survive; tracks don't
    val r2 = ContainerMeta.mkvInventory(6, ContainerMeta.syntheticMkv(6))
    assert(r2 == ContainerMeta.MkvInventory(6, "webm", 1000000L, 90006L,
      0, false, false, 0, 0, null, null, 0, 0), r2.toString)
    val r3 = ContainerMeta.mkvInventory(3, ContainerMeta.syntheticMkv(3))
    assert(r3 == ContainerMeta.MkvInventory(3, null, 0L, 0L,
      0, false, false, 0, 0, null, null, 0, 0), r3.toString)
  }

  test("mkvInventory: vint forms, unknown sizes, torn files, adversarial bytes") {
    // the webm arm's Segment is the 1-byte unknown-size form (0xFF);
    // every other size is a 1- or 2-byte vint and ids span 1-4 bytes —
    // the arm-0 closed-form row above already pins all of them. Here:
    // truncation at EVERY prefix length must degrade, never throw, and
    // whatever parses must be a prefix of the full inventory.
    val full = ContainerMeta.syntheticMkv(4) // webm arm, seed 4
    val want = ContainerMeta.mkvInventory(4, full)
    for (cut <- 0 to full.length) {
      val got = ContainerMeta.mkvInventory(4,
        java.util.Arrays.copyOfRange(full, 0, cut))
      assert(got.n_tracks <= want.n_tracks, s"cut=$cut")
      if (got.doc_type != null) assert(got.doc_type == "webm", s"cut=$cut")
    }
    // and with the tail replaced by garbage instead of cut
    for (cut <- Seq(5, 12, 20, 30, full.length - 5)) {
      val garbled = full.clone()
      for (i <- cut until full.length) garbled(i) = ((i * 37) & 0xFF).toByte
      ContainerMeta.mkvInventory(4, garbled) // must not throw
    }
    // an EBML-led payload whose header lacks a DocType but carries a
    // parseable Segment/Info must degrade timescale AND dur_ms
    // together — never an inconsistent (timescale=0, dur_ms>0) row
    val noDocType = {
      val f = ContainerMeta.syntheticMkv(4)
      // arm 0 layout: [EBML hdr: id4 + size1 + [DocType el]] — blank the
      // DocType element id (0x42 0x82 at offset 5) into an unknown id
      val g = f.clone(); g(5) = 0x41.toByte
      ContainerMeta.mkvInventory(4, g)
    }
    assert(noDocType.doc_type == null)
    assert(noDocType.timescale == 0L && noDocType.dur_ms == 0L, noDocType.toString)
    // adversarial random bytes never throw (xorshift-deterministic)
    var s = 0x9E3779B97F4A7C15L
    for (trial <- 0 until 50) {
      val n = (trial * 7) % 200
      val junk = new Array[Byte](n)
      for (i <- 0 until n) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        junk(i) = (s & 0xFF).toByte
      }
      ContainerMeta.mkvInventory(trial.toLong, junk) // must not throw
      // and the same bytes behind a valid EBML magic: walk, degrade
      ContainerMeta.mkvInventory(trial.toLong,
        Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte) ++ junk)
    }
    // distributed walk is map-only
    val df = (0L until 8L).map(k => (k, ContainerMeta.syntheticMkv(k)))
      .toDF("media_id", "mkv")
    val inv = ContainerMeta.mkvInventories(df, "media_id", "mkv")
    graft.queries.Q.requireNoShuffle(inv)
    assert(inv.filter(col("doc_type") === "webm").count() == 4L) // arms 0 and 2
    assert(inv.filter(col("has_video")).count() == 2L)
  }
}
