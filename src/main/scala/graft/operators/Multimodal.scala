package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * IMAGE decode is REAL as of round 10: [[decodePpm]] (binary P6) and
  * [[decodeBmp]] (24-bit uncompressed BMP — bottom-up rows, B,G,R
  * order and 4-byte row padding normalized away) parse in pure JVM to
  * one common top-down RGB raster, from which [[imageStats]] derives
  * dimensions, per-channel integer moments and the dHash; the
  * header-sniffing fallback covers formats this environment ships no
  * codec for (JPEG/PNG would drop in at the same mapPartitions seam).
  * `decodeStub` remains only as the deterministic FAKE-feature
  * generator for the embedding-plumbing gates, clearly so named.
  *
  * Scale notes: payloads stay columnar until the mapPartitions boundary;
  * the decode stage is map-only (no shuffle); `targetPartitionBytes`
  * repartitioning keeps a 1000-executor cluster's tasks balanced when
  * blob sizes are skewed.
  */
object Multimodal {

  /** A decoded media record: fixed-shape features + metadata. */
  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      features: Array[Float]
  )

  final case class MediaBlob(media_id: Long, payload: Array[Byte])

  /** Deterministic fake "decode": header sniff + pseudo-dimensions +
    * a fixed-length feature vector from a rolling hash of the payload.
    * Replace with a real codec (JavaCV, TwelveMonkeys, …) in production.
    */
  def decodeStub(blob: MediaBlob): MediaFeatures = {
    val bytes = blob.payload
    val fmt =
      if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
      else "unknown"
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val dim = 8
    val feats = Array.tabulate(dim) { j =>
      // spread the hash into [0,1) floats, deterministic per payload
      (((h >>> (j * 7)) & 0xFFFF).toFloat) / 65536.0f
    }
    MediaFeatures(
      media_id = blob.media_id,
      n_bytes = bytes.length.toLong,
      format = fmt,
      width = 1 + (math.abs(h) % 1920).toInt,
      height = 1 + (math.abs(h >>> 11) % 1080).toInt,
      features = feats
    )
  }

  /** Batch decode over partitions — the Scala analog of a pandas-batched
    * UDF: one iterator pass per partition, constant memory, no
    * per-row setup cost (a real codec would be initialized once per
    * partition here).
    */
  def decodeAll(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition init of the (stub) codec would go here
      it.map(decodeStub)
    }
  }

  /** DataFrame-level entry: (idCol: long, payloadCol: binary) → features. */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import df.sparkSession.implicits._
    val typed = df
      .select(col(idCol).cast("long").as("media_id"), col(payloadCol).as("payload"))
      .as[MediaBlob]
    decodeAll(typed).toDF()
  }

  /** A REAL decoded image: dimensions, integer per-channel moments
    * (mean/variance derive as sum/n and ssq/n − mean²), and the 64-bit
    * dHash split into two 32-bit halves (`dhash_hi:dhash_lo`) so both
    * engines' signed-64 arithmetic stays overflow-free in the oracle.
    */
  final case class ImageStats(
      media_id: Long,
      format: String,
      width: Int,
      height: Int,
      n_pixels: Long,
      sum_r: Long, sum_g: Long, sum_b: Long,
      ssq_r: Long, ssq_g: Long, ssq_b: Long,
      dhash_lo: Long, dhash_hi: Long)

  /** Pure-JVM binary-PPM (P6) parser — a real pixel format decoded with
    * no codec dependency: header `P6 <w> <h> <maxval>` with PPM's
    * whitespace/`#`-comment rules, then a w·h·3 RGB raster (one byte
    * per sample; maxval ≤ 255). Returns None on anything malformed —
    * wrong magic, non-positive dims, wide maxval, short raster — so
    * corrupt payloads degrade to the sniffing fallback instead of
    * throwing mid-partition.
    */
  def decodePpm(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val b = bytes(i)
        if (b == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (b == ' ' || b == '\n' || b == '\r' || b == '\t') i += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = -1
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (bytes(i) - '0')
        i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    // header ends with exactly ONE whitespace byte before the raster
    i += 1
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    if (w.toLong * h * 3 > Int.MaxValue - i) return None
    if (i + w * h * 3 > bytes.length) return None
    Some((w, h, java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3)))
  }

  /** Decode a 24-bit uncompressed BMP (BITMAPINFOHEADER or larger,
    * biCompression = 0) to the same top-down RGB raster [[decodePpm]]
    * yields: rows are stored bottom-up (top-down when the height field
    * is negative) in B,G,R byte order with each row padded to 4 bytes —
    * all three quirks are normalized away here so every consumer
    * ([[imageStats]]' moments and dHash) is format-agnostic.
    */
  def decodeBmp(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    def le32(o: Int): Int =
      (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
        ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
    def le16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    val dataOff = le32(10)
    if (le32(14) < 40) return None // pre-BITMAPINFOHEADER variants
    val w = le32(18)
    val hRaw = le32(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0 || le16(28) != 24 || le32(30) != 0) return None
    if (w.toLong * h * 3 > Int.MaxValue) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (dataOff < 54 || stride.toLong * h + dataOff > bytes.length) return None
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val ro = dataOff + (if (topDown) y else h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val so = ro + x * 3
        val po = (y * w + x) * 3
        px(po) = bytes(so + 2)
        px(po + 1) = bytes(so + 1)
        px(po + 2) = bytes(so)
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** Try every real decoder in order; the format tag records which one
    * matched. */
  def decodeImageBytes(bytes: Array[Byte]): Option[(String, Int, Int, Array[Byte])] =
    decodePpm(bytes).map { case (w, h, px) => ("ppm", w, h, px) }
      .orElse(decodeBmp(bytes).map { case (w, h, px) => ("bmp", w, h, px) })

  /** Decode one payload to [[ImageStats]]: channel sums + sums of
    * squares and the difference hash (dHash: 9×8 nearest-neighbor
    * grayscale grid, bit j = gy·8+gx set when the right neighbor is
    * brighter). All-integer arithmetic — gray is (r+g+b) div 3,
    * sample coords are gx·w div 9 / gy·h div 8 — so the whole record
    * is oracle-checkable in SQL, for every format [[decodeImageBytes]]
    * handles. Undecodable payloads keep the header sniff and zeroed
    * stats (the labeled fallback replacing the retired decodeStub
    * claims for images).
    */
  def imageStats(id: Long, bytes: Array[Byte]): ImageStats =
    decodeImageBytes(bytes) match {
      case Some((fmt, w, h, px)) =>
        var sr = 0L; var sg = 0L; var sb = 0L
        var qr = 0L; var qg = 0L; var qb = 0L
        val n = w * h
        var m = 0
        while (m < n) {
          val r = px(3 * m) & 0xFF; val g = px(3 * m + 1) & 0xFF; val b = px(3 * m + 2) & 0xFF
          sr += r; sg += g; sb += b
          qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
          m += 1
        }
        def gray(x: Int, y: Int): Int = {
          val o = (y * w + x) * 3
          ((px(o) & 0xFF) + (px(o + 1) & 0xFF) + (px(o + 2) & 0xFF)) / 3
        }
        var lo = 0L; var hi = 0L
        var gy = 0
        while (gy < 8) {
          val sy = gy * h / 8
          var gx = 0
          while (gx < 8) {
            if (gray((gx + 1) * w / 9, sy) > gray(gx * w / 9, sy)) {
              val j = gy * 8 + gx
              if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
            }
            gx += 1
          }
          gy += 1
        }
        ImageStats(id, fmt, w, h, n.toLong, sr, sg, sb, qr, qg, qb, lo, hi)
      case None =>
        val fmt =
          if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
          else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
          else "unknown"
        ImageStats(id, fmt, 0, 0, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    }

  /** Batch image decode: (idCol: long, payloadCol: binary) →
    * [[ImageStats]] rows via one iterator pass per partition (same
    * map-only shape as [[decodeAll]] — a real codec for other formats
    * initializes once per partition here).
    */
  def decodeImages(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(payloadCol).as("payload"))
      .as[MediaBlob]
      .mapPartitions(_.map(b => imageStats(b.media_id, b.payload)))
      .toDF()
  }

  /** Deterministic PPM fixture encoder (test/gate side): pixel byte at
    * flat raster index m is (seed·31 + m) mod 256 — closed-form, so a
    * SQL oracle can re-derive every pixel the decoder must report.
    */
  def syntheticPpm(seed: Long, w: Int, h: Int): Array[Byte] = {
    require(seed >= 0 && w > 0 && h > 0, "syntheticPpm: non-negative seed, positive dims")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = Array.tabulate(w * h * 3)(m => ((seed * 31 + m) % 256).toByte)
    header ++ px
  }

  /** Closed-form 24-bit bottom-up BMP with the SAME logical pixel
    * formula as [[syntheticPpm]] (RGB sample m = (seed·31+m) mod 256 in
    * top-down order), so one oracle covers both decoders — the BMP
    * encoding buries the formula under bottom-up rows, B,G,R order and
    * row padding, exactly the quirks [[decodeBmp]] must normalize.
    */
  def syntheticBmp(seed: Long, w: Int, h: Int): Array[Byte] = {
    require(seed >= 0 && w > 0 && h > 0, "syntheticBmp: non-negative seed, positive dims")
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + stride * h)
    def p32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
      out(o + 2) = ((v >> 16) & 0xFF).toByte; out(o + 3) = ((v >>> 24) & 0xFF).toByte
    }
    def p16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    p32(2, out.length); p32(10, 54); p32(14, 40)
    p32(18, w); p32(22, h)
    p16(26, 1); p16(28, 24); p32(30, 0); p32(34, stride * h)
    var y = 0
    while (y < h) {
      val ro = 54 + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        out(ro + x * 3) = ((seed * 31 + p + 2) % 256).toByte
        out(ro + x * 3 + 1) = ((seed * 31 + p + 1) % 256).toByte
        out(ro + x * 3 + 2) = ((seed * 31 + p) % 256).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Frame sampling shape for video-like payloads: n evenly-strided
    * byte slices per payload (8-byte samples in the stub; a real decoder
    * slices at container frame offsets), one row per sampled frame —
    * the explode-side plumbing of a video pipeline. Pure binary
    * `substr`, no string round-trip.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, nFrames: Int): DataFrame = {
    val stride = greatest(floor(length(col(payloadCol)) / nFrames), lit(1)).cast("int")
    df.select(
      col(idCol).cast("long").as("media_id"),
      posexplode(
        transform(
          sequence(lit(0), lit(nFrames - 1)),
          i => col(payloadCol).substr(i * stride + lit(1), lit(8))
        )
      ).as(Seq("frame_no", "frame_sample"))
    )
  }

  /** Rebalance skewed blob sizes so each task sees ~targetBytes of
    * payload (pre-shuffle for the decode stage when inputs are skewed).
    *
    * The partition count comes from metadata, never a data scan: pass
    * `totalBytes` when the pipeline knows it (ingest accounting, a
    * manifest), else it falls back to Catalyst's plan-statistics size —
    * file-footer metadata for file-backed inputs. An earlier version
    * summed `length(payload)` with an extra job, which doubles the read
    * at 100 TB; an estimate is exactly as good here, because the target
    * is a task-sizing heuristic, not an exact quota.
    */
  def rebalanceBySize(
      df: DataFrame,
      payloadCol: String,
      targetBytes: Long,
      totalBytes: Option[Long] = None
  ): DataFrame = {
    val bytes = totalBytes.getOrElse(
      df.queryExecution.optimizedPlan.stats.sizeInBytes
        .min(BigInt(Long.MaxValue)).toLong)
    // Catalyst reports Long.MaxValue for unknown-stats plans (post-join,
    // non-file-backed); with a small targetBytes the quotient can exceed
    // Int range and `.toInt` would wrap to an arbitrary count. Unknown
    // stats carry no sizing signal at all, so keep the input partitioning;
    // otherwise clamp to a sane ceiling before narrowing.
    if (bytes == Long.MaxValue && totalBytes.isEmpty) df
    else {
      val parts = math.min(math.max(1L, bytes / targetBytes), MaxRebalanceParts.toLong).toInt
      df.repartition(parts)
    }
  }

  /** Ceiling for [[rebalanceBySize]]'s computed partition count — far above
    * any real cluster's useful task count, far below Int overflow.
    */
  val MaxRebalanceParts: Int = 1 << 20

  /** A REAL decoded audio clip: format/layout metadata plus per-channel
    * integer moments (mean/RMS derive as sum/n and ssq/n) and
    * zero-crossing counts — the standard cheap audio-quality screens
    * (silence ↔ near-zero ssq, clipping ↔ ssq near full-scale², noise
    * ↔ high crossing rate). Stats are laid out for the FIRST TWO
    * channels (c0/c1) so the record is fixed-shape; mono clips carry
    * zeros in the c1 lanes. All-integer arithmetic (16-bit samples sum
    * into longs) — oracle-checkable in SQL like [[ImageStats]].
    */
  final case class AudioStats(
      media_id: Long,
      format: String,
      n_channels: Int,
      sample_rate: Int,
      n_frames: Long,
      dur_ms: Long,
      sum_c0: Long, ssq_c0: Long, zc_c0: Long,
      sum_c1: Long, ssq_c1: Long, zc_c1: Long)

  /** Pure-JVM RIFF/WAVE PCM decoder — the audio analog of [[decodePpm]],
    * no codec dependency: `RIFF <size> WAVE`, then a chunk walk for
    * `fmt ` (must be audioFormat 1 = integer PCM; 16-bit signed or
    * 8-bit unsigned samples) and `data` (little-endian interleaved
    * frames). 8-bit samples normalize into the 16-bit signed space as
    * (b − 128)·256, so every consumer sees one sample domain. Trailing
    * partial frames and odd-size chunk padding are handled per the
    * RIFF spec; anything malformed — wrong magic, missing/short
    * chunks, non-PCM, unsupported depth, non-positive layout — returns
    * None so corrupt payloads degrade to the header sniff instead of
    * throwing mid-partition.
    */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    def le32(o: Int): Int =
      (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
        ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
    def le16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def tag(o: Int, s: String): Boolean =
      bytes(o) == s(0).toByte && bytes(o + 1) == s(1).toByte &&
        bytes(o + 2) == s(2).toByte && bytes(o + 3) == s(3).toByte
    if (bytes.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var channels = -1; var rate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    var i = 12
    while (i + 8 <= bytes.length && (dataOff < 0 || channels < 0)) {
      val sz = le32(i + 4)
      if (sz < 0 || i + 8 + sz.toLong > bytes.length) return None
      if (tag(i, "fmt ") && sz >= 16) {
        if (le16(i + 8) != 1) return None // integer PCM only
        channels = le16(i + 10); rate = le32(i + 12); bits = le16(i + 22)
      } else if (tag(i, "data")) { dataOff = i + 8; dataLen = sz }
      i += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || (bits != 16 && bits != 8) || dataOff < 0) return None
    val sampleBytes = bits / 8
    val frameBytes = channels * sampleBytes
    val frames = dataLen / frameBytes // drop a trailing partial frame
    val out = new Array[Short](frames * channels)
    var s = 0
    while (s < out.length) {
      val o = dataOff + s * sampleBytes
      out(s) =
        if (bits == 16) ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort
        else (((bytes(o) & 0xFF) - 128) * 256).toShort
      s += 1
    }
    Some((channels, rate, out))
  }

  /** Decode one payload to [[AudioStats]]: per-channel sample sums,
    * sums of squares and zero-crossing counts (a crossing at frame t>0
    * when sign(s[t-1]) ≠ sign(s[t]), negatives vs non-negatives) over
    * the first two channels; `dur_ms = frames·1000 div rate` (integer).
    * Undecodable payloads keep a header sniff (mp3/ogg/flac magics) and
    * zeroed stats — the same labeled-fallback contract as
    * [[imageStats]].
    */
  def audioStats(id: Long, bytes: Array[Byte]): AudioStats =
    decodeWav(bytes) match {
      case Some((ch, rate, pcm)) =>
        val frames = if (ch == 0) 0 else pcm.length / ch
        val sums = new Array[Long](2); val ssqs = new Array[Long](2)
        val zcs = new Array[Long](2)
        var c = 0
        while (c < math.min(ch, 2)) {
          var t = 0
          var prevNeg = false
          while (t < frames) {
            val v = pcm(t * ch + c).toLong
            sums(c) += v; ssqs(c) += v * v
            val neg = v < 0
            if (t > 0 && neg != prevNeg) zcs(c) += 1
            prevNeg = neg
            t += 1
          }
          c += 1
        }
        AudioStats(id, "wav", ch, rate, frames.toLong,
          frames.toLong * 1000L / rate,
          sums(0), ssqs(0), zcs(0), sums(1), ssqs(1), zcs(1))
      case None =>
        val fmt =
          if (bytes.length >= 3 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') "mp3"
          else if (bytes.length >= 4 && bytes(0) == 'O' && bytes(1) == 'g' && bytes(2) == 'g') "ogg"
          else if (bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a') "flac"
          else "unknown"
        AudioStats(id, fmt, 0, 0, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    }

  /** Batch audio decode: (idCol: long, payloadCol: binary) →
    * [[AudioStats]] rows, one iterator pass per partition — the same
    * map-only, shuffle-free shape as [[decodeImages]].
    */
  def decodeAudio(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(payloadCol).as("payload"))
      .as[MediaBlob]
      .mapPartitions(_.map(b => audioStats(b.media_id, b.payload)))
      .toDF()
  }

  /** Per-frame stats of a REAL decoded video: luma moments + chroma
    * sums for every frame — the per-frame signal a scene-cut /
    * black-frame / sampling stage consumes. One row per frame,
    * fixed-shape, all-integer.
    */
  final case class FrameStats(
      media_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      frame_no: Int,
      sum_y: Long, ssq_y: Long, sum_u: Long, sum_v: Long)

  /** Pure-JVM Y4M (YUV4MPEG2) decoder — a REAL video container with no
    * codec dependency (uncompressed planar YUV): ASCII stream header
    * `YUV4MPEG2 W<w> H<h> F<n>:<d> ... C<cs>`, then per frame a
    * `FRAME[ params]\n` marker followed by raw planes. C444 (three
    * w·h planes) and the C420 family (w·h luma + two w/2·h/2 chroma
    * planes, even dims required) are supported; anything malformed —
    * wrong magic, bad dims, unknown colorspace, short frame payload —
    * returns None, the same degrade-don't-throw contract as the other
    * decoders. Returns (w, h, fpsNum, fpsDen, colorspace, frames) with
    * each frame's planes concatenated Y then U then V.
    */
  def decodeY4m(bytes: Array[Byte]): Option[(Int, Int, Int, Int, String, Seq[Array[Byte]])] = {
    val magic = "YUV4MPEG2"
    if (bytes.length < magic.length ||
      !magic.zipWithIndex.forall { case (ch, j) => bytes(j) == ch.toByte }) return None
    var i = magic.length
    def readLine(): Option[String] = {
      val start = i
      while (i < bytes.length && bytes(i) != '\n') i += 1
      if (i >= bytes.length) None
      else {
        val s = new String(bytes, start, i - start, "US-ASCII")
        i += 1 // consume the newline
        Some(s)
      }
    }
    val header = readLine().getOrElse(return None)
    var w = -1; var h = -1; var fn = 25; var fd = 1; var cs = "420"
    header.trim.split(" ").filter(_.nonEmpty).foreach { tok =>
      tok.head match {
        case 'W' => w = tok.tail.toIntOption.getOrElse(-1)
        case 'H' => h = tok.tail.toIntOption.getOrElse(-1)
        case 'F' =>
          val parts = tok.tail.split(":")
          if (parts.length == 2) {
            fn = parts(0).toIntOption.getOrElse(25)
            fd = parts(1).toIntOption.getOrElse(1)
          }
        case 'C' => cs = tok.tail
        case _   => // interlacing / aspect / extensions: ignored
      }
    }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
    val frameLen =
      if (cs.startsWith("444")) 3L * w * h
      else if (cs.startsWith("420")) {
        if (w % 2 != 0 || h % 2 != 0) return None
        w.toLong * h + 2L * (w / 2) * (h / 2)
      } else return None
    if (frameLen > Int.MaxValue) return None
    val frames = Seq.newBuilder[Array[Byte]]
    while (i < bytes.length) {
      val line = readLine().getOrElse(return None)
      if (!line.startsWith("FRAME")) return None
      if (i + frameLen > bytes.length) return None
      frames += java.util.Arrays.copyOfRange(bytes, i, i + frameLen.toInt)
      i += frameLen.toInt
    }
    Some((w, h, fn, fd, cs, frames.result()))
  }

  /** Decode one payload to per-frame [[FrameStats]]: luma sum / sum of
    * squares and chroma sums per frame — all-integer, SQL-derivable.
    * Undecodable payloads yield NO rows (the explode-side analog of
    * the sniff fallback: a missing media_id in the output IS the
    * corrupt signal, joinable back against the input for the drop
    * ledger).
    */
  def videoFrameStats(id: Long, bytes: Array[Byte]): Seq[FrameStats] =
    decodeY4m(bytes) match {
      case None => Seq.empty
      case Some((w, h, _, _, cs, frames)) =>
        val ySize = w * h
        val cSize = if (cs.startsWith("444")) ySize else (w / 2) * (h / 2)
        frames.zipWithIndex.map { case (px, f) =>
          var sy = 0L; var qy = 0L; var su = 0L; var sv = 0L
          var m = 0
          while (m < ySize) {
            val v = px(m) & 0xFF
            sy += v; qy += v.toLong * v
            m += 1
          }
          m = 0
          while (m < cSize) {
            su += px(ySize + m) & 0xFF
            sv += px(ySize + cSize + m) & 0xFF
            m += 1
          }
          FrameStats(id, w, h, frames.length, f, sy, qy, su, sv)
        }
    }

  /** Batch video decode: (idCol: long, payloadCol: binary) → one
    * [[FrameStats]] row per decoded frame, one iterator pass per
    * partition (flatMap — corrupt payloads contribute zero rows).
    */
  def decodeVideos(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(payloadCol).as("payload"))
      .as[MediaBlob]
      .flatMap(b => videoFrameStats(b.media_id, b.payload))
      .toDF()
  }

  /** Deterministic Y4M fixture encoder (test/gate side): C444, plane
    * sample at (frame f, plane p, flat index m) carries
    * (seed·31 + f·97 + p·53 + m) mod 256 — closed form per sample, so
    * a SQL oracle re-derives every plane byte the decoder must
    * integrate.
    */
  def syntheticY4m(seed: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    require(seed >= 0 && w > 0 && h > 0 && frames > 0,
      "syntheticY4m: non-negative seed, positive layout")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream()
    out.write(header)
    val planeSize = w * h
    var f = 0
    while (f < frames) {
      out.write(marker)
      var p = 0
      while (p < 3) {
        var m = 0
        while (m < planeSize) {
          out.write(((seed * 31 + f * 97 + p * 53 + m) % 256).toInt)
          m += 1
        }
        p += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** Deterministic WAV fixture encoder (test/gate side): interleaved
    * sample index i (= frame·channels + channel) carries the 16-bit
    * value ((seed·31 + i)·97) mod 65536, interpreted signed (two's
    * complement) — closed form, so a SQL oracle re-derives every sample
    * the decoder must integrate. ·97 spreads consecutive indices across
    * the signed range so sign alternates and zero-crossing counting is
    * actually exercised.
    */
  def syntheticWav(seed: Long, channels: Int, sampleRate: Int, frames: Int): Array[Byte] = {
    require(seed >= 0 && channels > 0 && sampleRate > 0 && frames > 0,
      "syntheticWav: non-negative seed, positive layout")
    val dataLen = frames * channels * 2
    val out = new Array[Byte](44 + dataLen)
    def p32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
      out(o + 2) = ((v >> 16) & 0xFF).toByte; out(o + 3) = ((v >>> 24) & 0xFF).toByte
    }
    def p16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    def tag(o: Int, s: String): Unit = s.zipWithIndex.foreach { case (ch, j) => out(o + j) = ch.toByte }
    tag(0, "RIFF"); p32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, channels)
    p32(24, sampleRate); p32(28, sampleRate * channels * 2)
    p16(32, channels * 2); p16(34, 16)
    tag(36, "data"); p32(40, dataLen)
    var i = 0
    while (i < frames * channels) {
      p16(44 + i * 2, (((seed * 31 + i) * 97) % 65536).toInt)
      i += 1
    }
    out
  }
}
