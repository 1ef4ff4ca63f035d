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
}
