package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Container METADATA extraction for the other two dominant media
  * container families — MP4/ISO-BMFF (the web's video container) and
  * Ogg (Vorbis/Opus audio) — completing the inventory layer
  * [[AudioMeta]] opened for MPEG audio: duration, track structure,
  * codec identity and dimensions from pure header arithmetic, no
  * codec work, ~tens of bytes read per box/page regardless of payload
  * size. The inventory decides what to decode; the decodable formats
  * (JPEG/PNG/GIF/BMP/TIFF frames, WAV/FLAC/ADPCM/G.711 audio,
  * MJPEG/Y4M video) have their own full decoders.
  *
  * Untrusted-input contract throughout: malformed sizes stop the walk
  * with the intact prefix visible (torn downloads stay measurable),
  * unknown boxes/codecs skip — never a throw mid-partition.
  *
  * Scale shape: map-only over (media_id, payload) rows — the
  * [[Multimodal.decodeAudio]] plan.
  */
object ContainerMeta {

  /** One MP4 blob's inventory: major brand from `ftyp`, movie
    * timescale/duration from `mvhd` (both version 0 and 1 layouts),
    * track count and handler kinds from `trak`/`hdlr`, presentation
    * dimensions from the video track's `tkhd` (16.16 fixed point,
    * integer part). `brand` null when the payload is not ISO-BMFF.
    */
  final case class Mp4Inventory(
      media_id: Long,
      brand: String,
      timescale: Long,
      duration: Long,
      dur_ms: Long,
      n_tracks: Int,
      has_video: Boolean,
      has_audio: Boolean,
      width: Int,
      height: Int)

  private def be32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) << 24 | (b(o + 1) & 0xFFL) << 16 |
      (b(o + 2) & 0xFFL) << 8 | (b(o + 3) & 0xFFL)
  private def be64(b: Array[Byte], o: Int): Long =
    be32(b, o) << 32 | be32(b, o + 4)

  /** ISO-BMFF containers whose children are themselves boxes — the
    * walk recurses into exactly these; everything else is a leaf.
    */
  private val Mp4Containers =
    Set("moov", "trak", "mdia", "minf", "stbl", "edts", "udta")

  /** Inventory one MP4 payload. The box walk: 4-byte big-endian size +
    * 4-char type; size 1 → 64-bit largesize follows; size 0 → box runs
    * to end of enclosure; any size overrunning the enclosure stops
    * that level's walk (torn downloads keep the parsed prefix).
    */
  def mp4Inventory(id: Long, bytes: Array[Byte]): Mp4Inventory = try {
    var brand: String = null
    var timescale = 0L; var duration = 0L
    var nTracks = 0; var hasV = false; var hasA = false
    var w = 0; var h = 0
    var trakW = 0; var trakH = 0
    def walk(start: Long, end: Long): Unit = {
      var i = start
      while (i + 8 <= end) {
        val sz32 = be32(bytes, i.toInt)
        val typ = new String(bytes, i.toInt + 4, 4,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        var body = i + 8
        val boxEnd =
          if (sz32 == 1L && i + 16 <= end) { body = i + 16; i + be64(bytes, i.toInt + 8) }
          else if (sz32 == 0L) end
          else i + sz32
        if (boxEnd < body || boxEnd > end) return // malformed: stop this level
        typ match {
          case "ftyp" if boxEnd - body >= 4 =>
            brand = new String(bytes, body.toInt, 4,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          case "mvhd" if boxEnd - body >= 4 =>
            val v = bytes(body.toInt) & 0xFF
            if (v == 1 && boxEnd - body >= 28) {
              timescale = be32(bytes, body.toInt + 20)
              duration = be64(bytes, body.toInt + 24)
            } else if (v == 0 && boxEnd - body >= 20) {
              timescale = be32(bytes, body.toInt + 12)
              duration = be32(bytes, body.toInt + 16)
            }
          case "trak" =>
            nTracks += 1; trakW = 0; trakH = 0
            walk(body, boxEnd)
          case "tkhd" if boxEnd - body >= 1 =>
            val v = bytes(body.toInt) & 0xFF
            // width/height are the LAST 8 bytes of the box (16.16)
            if (boxEnd - body >= (if (v == 1) 92 else 80)) {
              trakW = (be32(bytes, boxEnd.toInt - 8) >> 16).toInt
              trakH = (be32(bytes, boxEnd.toInt - 4) >> 16).toInt
            }
          case "hdlr" if boxEnd - body >= 12 =>
            val kind = new String(bytes, body.toInt + 8, 4,
              java.nio.charset.StandardCharsets.ISO_8859_1)
            if (kind == "vide") { hasV = true; w = trakW; h = trakH }
            if (kind == "soun") hasA = true
          case t if Mp4Containers.contains(t) =>
            walk(body, boxEnd)
          case _ => ()
        }
        i = boxEnd
      }
    }
    // only an ftyp-led payload is in contract (streaming-brand files
    // without a leading ftyp are out); everything else degrades
    if (bytes.length >= 8 &&
        new String(bytes, 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1) == "ftyp")
      walk(0L, bytes.length.toLong)
    val durMs = if (timescale > 0) duration * 1000L / timescale else 0L
    Mp4Inventory(id, brand, timescale, duration, durMs, nTracks, hasV, hasA, w, h)
  } catch {
    case _: Exception =>
      Mp4Inventory(id, null, 0L, 0L, 0L, 0, false, false, 0, 0)
  }

  /** One Ogg blob's inventory: codec identity from the first page's
    * identification header (Vorbis or Opus), sample counts from the
    * LAST parsed page's granule position (Vorbis granules tick at the
    * stream rate; Opus granules always tick at 48 kHz and pre-skip
    * samples subtract). `n_pages` counts parsed pages, so torn
    * downloads surface as short walks with a shorter duration.
    */
  final case class OggInventory(
      media_id: Long,
      codec: String, // "vorbis" | "opus" | "unknown"
      n_channels: Int,
      sample_rate: Int,
      n_pages: Long,
      granule: Long,
      dur_ms: Long)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | (b(o + 1) & 0xFF) << 8
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | (b(o + 1) & 0xFFL) << 8 |
      (b(o + 2) & 0xFFL) << 16 | (b(o + 3) & 0xFFL) << 24
  private def le64(b: Array[Byte], o: Int): Long =
    le32(b, o) | le32(b, o + 4) << 32

  /** Inventory one Ogg payload: page walk (magic, version 0, lacing
    * table → payload size), id-header sniff on the first page.
    */
  def oggInventory(id: Long, bytes: Array[Byte]): OggInventory = try {
    var codec = "unknown"
    var channels = 0; var rate = 0; var preskip = 0
    var pages = 0L; var granule = 0L
    var i = 0
    var done = false
    while (!done && i + 27 <= bytes.length) {
      if (bytes(i) != 'O' || bytes(i + 1) != 'g' || bytes(i + 2) != 'g' ||
          bytes(i + 3) != 'S' || bytes(i + 4) != 0) done = true
      else {
        val g = le64(bytes, i + 6)
        val nsegs = bytes(i + 26) & 0xFF
        if (i + 27 + nsegs > bytes.length) done = true
        else {
          var payload = 0
          var s = 0
          while (s < nsegs) { payload += bytes(i + 27 + s) & 0xFF; s += 1 }
          val bodyOff = i + 27 + nsegs
          if (bodyOff + payload > bytes.length) done = true
          else {
            if (pages == 0L && payload >= 8) {
              if (bytes(bodyOff) == 'O' && bytes(bodyOff + 1) == 'p' &&
                  bytes(bodyOff + 2) == 'u' && bytes(bodyOff + 3) == 's' &&
                  bytes(bodyOff + 4) == 'H' && payload >= 19) {
                codec = "opus"
                channels = bytes(bodyOff + 9) & 0xFF
                preskip = le16(bytes, bodyOff + 10)
                rate = 48000 // opus granules always tick at 48 kHz
              } else if (bytes(bodyOff) == 1 && bytes(bodyOff + 1) == 'v' &&
                  bytes(bodyOff + 2) == 'o' && bytes(bodyOff + 3) == 'r' &&
                  bytes(bodyOff + 4) == 'b' && payload >= 30) {
                codec = "vorbis"
                channels = bytes(bodyOff + 11) & 0xFF
                rate = le32(bytes, bodyOff + 12).toInt
              }
            }
            // granule -1 marks a no-packet-ends-here page: keep the max
            if (g >= 0 && g > granule) granule = g
            pages += 1
            i = bodyOff + payload
          }
        }
      }
    }
    val samples = math.max(0L, granule - preskip)
    val durMs = if (rate > 0) samples * 1000L / rate else 0L
    OggInventory(id, codec, channels, rate, pages, granule, durMs)
  } catch {
    case _: Exception => OggInventory(id, "unknown", 0, 0, 0L, 0L, 0L)
  }

  /** Batch walks: map-only, shuffle-free — the decodeAudio plan. */
  def mp4Inventories(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(payloadCol).as("payload"))
      .as[Multimodal.MediaBlob]
      .mapPartitions(_.map(b => mp4Inventory(b.media_id, b.payload)))
      .toDF()
  }

  def oggInventories(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(payloadCol).as("payload"))
      .as[Multimodal.MediaBlob]
      .mapPartitions(_.map(b => oggInventory(b.media_id, b.payload)))
      .toDF()
  }

  // --- synthetic fixtures --------------------------------------------------

  private def box(typ: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val sz = body.length + 8
    out.write((sz >> 24) & 0xFF); out.write((sz >> 16) & 0xFF)
    out.write((sz >> 8) & 0xFF); out.write(sz & 0xFF)
    out.write(typ.getBytes("ISO-8859-1"), 0, 4)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  private def beBytes32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def beBytes64(v: Long): Array[Byte] =
    beBytes32(v >> 32) ++ beBytes32(v & 0xFFFFFFFFL)

  private def mvhdBox(version: Int, timescale: Long, duration: Long): Array[Byte] = {
    val body =
      if (version == 1)
        Array[Byte](1, 0, 0, 0) ++ beBytes64(0) ++ beBytes64(0) ++
          beBytes32(timescale) ++ beBytes64(duration) ++ new Array[Byte](80)
      else
        Array[Byte](0, 0, 0, 0) ++ beBytes32(0) ++ beBytes32(0) ++
          beBytes32(timescale) ++ beBytes32(duration) ++ new Array[Byte](80)
    box("mvhd", body)
  }

  private def trakBox(kind: String, w: Int, h: Int): Array[Byte] = {
    val tkhdBody = Array[Byte](0, 0, 0, 0) ++ new Array[Byte](72) ++
      beBytes32(w.toLong << 16) ++ beBytes32(h.toLong << 16) // 80-byte v0 body
    val hdlrBody = new Array[Byte](8) ++ kind.getBytes("ISO-8859-1") ++
      new Array[Byte](12)
    box("trak", box("tkhd", tkhdBody) ++
      box("mdia", box("hdlr", hdlrBody)))
  }

  /** Three-arm MP4 fixture keyed on `seed % 3`:
    * 0 — isom brand, v0 mvhd (timescale 1000, duration 90000+seed),
    *     one video trak (640x360+seed) + one audio trak;
    * 1 — mp42 brand, v1 mvhd (64-bit duration; timescale 600),
    *     audio-only;
    * 2 — not BMFF at all.
    */
  def syntheticMp4(seed: Long): Array[Byte] = (seed % 3).toInt match {
    case 0 =>
      box("ftyp", "isom".getBytes ++ beBytes32(0) ++ "isomiso2".getBytes) ++
        box("moov", mvhdBox(0, 1000L, 90000L + seed) ++
          trakBox("vide", 640 + (seed % 5).toInt, 360) ++
          trakBox("soun", 0, 0))
    case 1 =>
      box("ftyp", "mp42".getBytes ++ beBytes32(1) ++ "mp42".getBytes) ++
        box("moov", mvhdBox(1, 600L, 1234567890L + seed) ++
          trakBox("soun", 0, 0))
    case _ =>
      (0 until 32).map(i => ((seed + i) & 0x7D).toByte).toArray
  }

  private def oggPage(granule: Long, seq: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("OggS".getBytes, 0, 4); out.write(0)
    out.write(if (seq == 0) 2 else 0) // BOS flag on the first page
    for (k <- 0 until 8) out.write(((granule >> (8 * k)) & 0xFF).toInt)
    for (k <- 0 until 4) out.write((0x42 >> (8 * k) & 0xFF)) // serial
    for (k <- 0 until 4) out.write(((seq >> (8 * k)) & 0xFF))
    for (_ <- 0 until 4) out.write(0) // CRC (not verified by the walk)
    // lacing: 255-byte segments + the final short one
    val full = payload.length / 255; val rest = payload.length % 255
    out.write(full + 1)
    for (_ <- 0 until full) out.write(255)
    out.write(rest)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** Three-arm Ogg fixture keyed on `seed % 3`:
    * 0 — Opus (stereo, pre-skip 312, granule 48000+seed at 48 kHz);
    * 1 — Vorbis (channels 1+seed%2, rate 44100, granule 22050+seed);
    * 2 — not Ogg.
    */
  def syntheticOgg(seed: Long): Array[Byte] = (seed % 3).toInt match {
    case 0 =>
      val head = "OpusHead".getBytes ++ Array[Byte](1, 2) ++
        Array[Byte]((312 & 0xFF).toByte, (312 >> 8).toByte) ++
        new Array[Byte](7)
      oggPage(0L, 0, head) ++
        oggPage(48000L + seed, 1, (0 until 40).map(i => ((seed + i) & 0x7D).toByte).toArray)
    case 1 =>
      val ch = (1 + seed % 2).toByte
      // 30-byte id header: type+\"vorbis\"+version+ch+rate+3 bitrates+
      // blocksizes+framing
      val head = Array[Byte](1) ++ "vorbis".getBytes ++
        beBytes32(0) ++ Array[Byte](ch) ++
        Array[Byte]((44100 & 0xFF).toByte, ((44100 >> 8) & 0xFF).toByte,
          ((44100 >> 16) & 0xFF).toByte, 0) ++ new Array[Byte](12) ++
        Array[Byte](0x58, 1)
      oggPage(0L, 0, head) ++
        oggPage(22050L + seed, 1, (0 until 40).map(i => ((seed + i) & 0x7D).toByte).toArray)
    case _ =>
      (0 until 32).map(i => ((seed + i) & 0x7D).toByte).toArray
  }
}
