package graft

import org.apache.spark.sql.functions._

import graft.operators.CompressedMeta

/** Gzip member header/trailer walk and zstd frame walk: closed-form
  * arms, conformance of the gzip fixture against the JDK inflater,
  * torn-payload degrades, and adversarial no-throw.
  */
class CompressedMetaSpec extends SparkSpec {
  import spark.implicits._

  test("gzipInventory: the four fixture arms produce the closed-form rows") {
    val r0 = CompressedMeta.gzipInventory(4, CompressedMeta.syntheticGzip(4))
    assert(r0 == CompressedMeta.GzipInventory(4, true, 8, 1700000004L, 3,
      "f4.txt", 17, 24L), r0.toString)
    val r1 = CompressedMeta.gzipInventory(5, CompressedMeta.syntheticGzip(5))
    assert(r1 == CompressedMeta.GzipInventory(5, true, 8, 0L, 3, null, 18, 45L),
      r1.toString)
    // torn mid-FNAME: fixed header fields survive, name/trailer degrade
    val r2 = CompressedMeta.gzipInventory(6, CompressedMeta.syntheticGzip(6))
    assert(r2 == CompressedMeta.GzipInventory(6, true, 8, 1700000006L, 3,
      null, 0, 0L), r2.toString)
    val r3 = CompressedMeta.gzipInventory(3, CompressedMeta.syntheticGzip(3))
    assert(r3 == CompressedMeta.GzipInventory(3, false, 0, 0L, 0, null, 0, 0L))
  }

  test("gzip fixture is REAL gzip: the JDK inflater round-trips it and agrees with ISIZE") {
    // the walk must be measuring genuine members, not a lookalike the
    // fixture and parser agree on by construction
    for (seed <- Seq(0L, 4L, 8L)) { // FNAME arms
      val bytes = CompressedMeta.syntheticGzip(seed)
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val text = new String(in.readAllBytes(), "US-ASCII")
      val inv = CompressedMeta.gzipInventory(seed, bytes)
      assert(text.length.toLong == inv.isize, s"seed=$seed")
      assert(text == (0 until text.length).map(k => ('a' + (seed + k) % 26).toChar).mkString)
    }
    // FEXTRA/FHCRC arm inflates too (GZIPInputStream verifies HCRC is
    // skippable-compatible only when absent — our arm writes a dummy
    // HCRC, so inflate via raw Inflater from the walked header length)
    val b1 = CompressedMeta.syntheticGzip(1)
    val inv1 = CompressedMeta.gzipInventory(1, b1)
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(b1, inv1.header_len, b1.length - inv1.header_len - 8)
    val buf = new Array[Byte](256)
    val n = inf.inflate(buf)
    inf.end()
    assert(n.toLong == inv1.isize)
  }

  test("zstdInventory: the four fixture arms produce the closed-form rows") {
    val r0 = CompressedMeta.zstdInventory(4, CompressedMeta.syntheticZstd(4))
    assert(r0 == CompressedMeta.ZstdInventory(4, 1, 0, 1, 104L, 104L, 0L, true),
      r0.toString)
    val r1 = CompressedMeta.zstdInventory(5, CompressedMeta.syntheticZstd(5))
    assert(r1 == CompressedMeta.ZstdInventory(5, 2, 1, 2, 1050L, 2048L, 7L, false),
      r1.toString)
    // torn mid-block: the completed-frame contract yields nothing
    val r2 = CompressedMeta.zstdInventory(6, CompressedMeta.syntheticZstd(6))
    assert(r2 == CompressedMeta.ZstdInventory(6, 0, 0, 0, 0L, 0L, 0L, false))
    val r3 = CompressedMeta.zstdInventory(3, CompressedMeta.syntheticZstd(3))
    assert(r3 == CompressedMeta.ZstdInventory(3, 0, 0, 0, 0L, 0L, 0L, false))
  }

  test("walks never throw: every prefix length, garbled tails, random bytes") {
    for (seed <- Seq(0L, 1L, 5L)) {
      val gz = CompressedMeta.syntheticGzip(seed)
      val zs = CompressedMeta.syntheticZstd(seed)
      for (cut <- 0 to gz.length)
        CompressedMeta.gzipInventory(seed, java.util.Arrays.copyOfRange(gz, 0, cut))
      for (cut <- 0 to zs.length) {
        val inv = CompressedMeta.zstdInventory(seed,
          java.util.Arrays.copyOfRange(zs, 0, cut))
        val full = CompressedMeta.zstdInventory(seed, zs)
        assert(inv.n_frames <= full.n_frames && inv.n_blocks <= full.n_blocks,
          s"seed=$seed cut=$cut")
      }
    }
    var s = 0x9E3779B97F4A7C15L
    for (trial <- 0 until 50) {
      val n = (trial * 11) % 160
      val junk = new Array[Byte](n)
      for (i <- 0 until n) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        junk(i) = (s & 0xFF).toByte
      }
      CompressedMeta.gzipInventory(trial.toLong, junk)
      CompressedMeta.zstdInventory(trial.toLong, junk)
      // and behind valid magics: walk, degrade, no throw
      CompressedMeta.gzipInventory(trial.toLong,
        Array(0x1F.toByte, 0x8B.toByte) ++ junk)
      CompressedMeta.zstdInventory(trial.toLong,
        Array(0x28, 0xB5, 0x2F, 0xFD).map(_.toByte) ++ junk)
    }
    assert(CompressedMeta.gzipInventory(0, null).is_gzip == false)
    assert(CompressedMeta.zstdInventory(0, null).n_frames == 0L)
  }

  test("gunzipMembers: per-member splitting, CRC/ISIZE verification, corrupt-member prefix, bomb cap") {
    val parts = Seq("alpha", "beta bytes", "").map(_.getBytes("US-ASCII"))
    val cat = parts.map(CompressedMeta.gzipMember).reduce(_ ++ _)
    // a whole-file gunzip would flatten these; the member walk keeps
    // the boundaries — byte-exact round trip including the EMPTY member
    val got = CompressedMeta.gunzipMembers(cat)
    assert(got.map(new String(_, "US-ASCII")) == Seq("alpha", "beta bytes", ""))
    // a corrupt THIRD member (flipped CRC byte) drops it and the rest,
    // keeping the verified prefix
    val third = CompressedMeta.gzipMember("gamma".getBytes("US-ASCII"))
    third(third.length - 6) = (third(third.length - 6) ^ 0x5A).toByte
    val withBad = CompressedMeta.gzipMember("a".getBytes) ++
      CompressedMeta.gzipMember("b".getBytes) ++ third ++
      CompressedMeta.gzipMember("never".getBytes)
    assert(CompressedMeta.gunzipMembers(withBad)
      .map(new String(_, "US-ASCII")) == Seq("a", "b"))
    // truncated mid-deflate: verified prefix only
    val torn = cat.dropRight(parts(2).length + 30)
    assert(CompressedMeta.gunzipMembers(torn).length <= 2)
    // the bomb cap: a member expanding past the cap stops the walk
    val big = CompressedMeta.gzipMember(new Array[Byte](1 << 16)) // 64 KiB of zeros
    assert(CompressedMeta.gunzipMembers(big, maxOutPerMember = 1 << 10).isEmpty)
    assert(CompressedMeta.gunzipMembers(big).length == 1)
    assert(CompressedMeta.gunzipMembers(null).isEmpty)
    // the AGGREGATE bomb cap: every member individually under the
    // per-member cap, but their cumulative output crosses the total
    // budget — the walk keeps the members completed BEFORE the budget
    // and stops (a concatenation of small maximal members must not
    // accumulate unbounded output in one task)
    val many = Array.fill(8)(CompressedMeta.gzipMember(new Array[Byte](1 << 12)))
      .reduce(_ ++ _) // 8 × 4 KiB members = 32 KiB total
    assert(CompressedMeta.gunzipMembers(many).length == 8)
    assert(CompressedMeta.gunzipMembers(many,
      maxOutPerMember = 1 << 16, maxOutTotal = (3 << 12) + 100).length == 3)
    // the .warc.gz path: per-record members parse to the SAME rows as
    // the uncompressed container, rec_idx re-indexed across members
    val plain = graft.operators.Warc.records(
      Seq((1L, graft.operators.Warc.syntheticWarcHttp(1L, 6)))
        .toDF("media_id", "payload"), "media_id", "payload")
    val gz = graft.operators.Warc.recordsGz(
      Seq((1L, graft.operators.Warc.syntheticWarcGz(1L, 6)))
        .toDF("media_id", "payload"), "media_id", "payload")
    graft.queries.Q.requireNoShuffle(gz)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Int]("rec_idx"), r.getAs[String]("warc_type"),
        r.getAs[String]("target_uri"), r.getAs[String]("body"))).toSet
    assert(rows(gz) == rows(plain))
  }

  test("distributed inventories are map-only") {
    val df = (0L until 8L).map(k =>
      (k, CompressedMeta.syntheticGzip(k), CompressedMeta.syntheticZstd(k)))
      .toDF("media_id", "gz", "zs")
    val g = CompressedMeta.gzipInventories(df, "media_id", "gz")
    val z = CompressedMeta.zstdInventories(df, "media_id", "zs")
    graft.queries.Q.requireNoShuffle(g)
    graft.queries.Q.requireNoShuffle(z)
    assert(g.filter(col("is_gzip")).count() == 6L)
    assert(z.filter(col("has_checksum")).count() == 2L) // arms 0, 4
  }
}
