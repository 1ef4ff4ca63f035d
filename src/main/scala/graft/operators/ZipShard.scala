package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.DataFrame

/** Zip-shard ingest — the OTHER container sharded datasets ship in
  * (Kaggle-style bundles, model checkpoints, scraped-site exports):
  * a STREAM-ORDER walk over local file headers, deliberately ignoring
  * the central directory, because a 100 TB reader sees each shard as
  * one sequential blob — seeking to the end first is the layout's
  * convenience, not the data path's. Same untrusted-input contract as
  * the rest of the family ([[TarShard]]/[[DumpDecode]]):
  *
  *   - methods 0 (stored) and 8 (deflate, raw), CRC32-VERIFIED either
  *     from the header or, for flag-bit-3 entries, from the trailing
  *     data descriptor (whose sizes are only knowable after the
  *     inflate — the streaming-zip corner tar never has);
  *   - a STORED entry with bit 3 set is undecodable in stream order
  *     (no length anywhere before the data) — the walk stops there,
  *     visibly, rather than guessing at boundaries;
  *   - torn/corrupt entries keep the completed prefix; per-entry and
  *     aggregate inflate budgets bound bombs (deflate amplifies
  *     ~1000:1); the walk ends CLEANLY at the central directory.
  *
  * Sample grouping reuses [[TarShard.samples]]' consecutive-stem law —
  * the container is invisible to the WebDataset layer. Map-only over
  * (media_id, payload) rows. Reference scope: the reference ingests
  * line JSON only (`App.java:136-162`); shard ingest is north-star
  * surface.
  */
object ZipShard {

  /** One zip member. Directories carry a trailing `/` name and empty
    * data (the zip convention).
    */
  final case class ZipEntry(name: String, method: Int, usize: Long, data: Array[Byte])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | (b(o + 1) & 0xFF) << 8
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | (b(o + 1) & 0xFFL) << 8 |
      (b(o + 2) & 0xFFL) << 16 | (b(o + 3) & 0xFFL) << 24

  private val LocalSig = 0x04034b50L
  private val CentralSig = 0x02014b50L
  private val EndSig = 0x06054b50L
  private val DescSig = 0x08074b50L

  /** Walk one shard's members in stream order (completed-prefix on
    * torn input; clean stop at the central directory).
    */
  def entries(bytes: Array[Byte],
      maxEntries: Int = 65536,
      maxOutPerEntry: Int = 64 << 20,
      maxOutTotal: Long = 256L << 20): Seq[ZipEntry] = {
    if (bytes == null) return Seq.empty
    val out = Vector.newBuilder[ZipEntry]
    var off = 0
    var n = 0
    var total = 0L
    var done = false
    while (!done && off + 4 <= bytes.length && n < maxEntries) {
      val sig = le32(bytes, off)
      if (sig == CentralSig || sig == EndSig) done = true // clean end of the local stream
      else if (sig != LocalSig || off + 30 > bytes.length) done = true // junk/torn header
      else {
        val flags = le16(bytes, off + 6)
        val method = le16(bytes, off + 8)
        val hasDesc = (flags & 0x08) != 0
        val crc = le32(bytes, off + 14)
        val csize = le32(bytes, off + 18)
        val usize = le32(bytes, off + 22)
        val nameLen = le16(bytes, off + 26)
        val extraLen = le16(bytes, off + 28)
        val dataAt = off + 30 + nameLen + extraLen
        if (dataAt > bytes.length) done = true // torn before data
        else {
          val name = new String(bytes, off + 30, nameLen, java.nio.charset.StandardCharsets.UTF_8)
          method match {
            case 0 if !hasDesc => // stored, sized up front
              if (csize != usize || dataAt + csize > bytes.length ||
                csize > maxOutPerEntry || total + csize > maxOutTotal) done = true
              else {
                val data = java.util.Arrays.copyOfRange(bytes, dataAt, dataAt + csize.toInt)
                val c = new CRC32(); c.update(data)
                if (c.getValue != crc) done = true // corrupt: stop, keep prefix
                else {
                  out += ZipEntry(name, 0, usize, data); total += csize; n += 1
                  off = dataAt + csize.toInt
                }
              }
            case 0 => done = true // stored + descriptor: boundary unknowable in stream order
            case 8 => // deflate (raw); descriptor entries learn sizes from the inflate
              val inf = new Inflater(true)
              inf.setInput(bytes, dataAt, bytes.length - dataAt)
              val bo = new ByteArrayOutputStream()
              val buf = new Array[Byte](64 << 10)
              var bad = false
              try {
                while (!inf.finished() && !bad) {
                  val m = inf.inflate(buf)
                  if (m > 0) {
                    if (bo.size.toLong + m > maxOutPerEntry || total + bo.size + m > maxOutTotal) bad = true
                    else bo.write(buf, 0, m)
                  } else if (!inf.finished()) bad = true // needsInput mid-stream = torn
                }
              } catch { case _: Exception => bad = true }
              val consumed = inf.getBytesRead
              inf.end()
              if (bad) done = true
              else {
                val data = bo.toByteArray
                val c = new CRC32(); c.update(data)
                var next = dataAt + consumed.toInt
                var expectCrc = crc
                var expectUsize = usize
                if (hasDesc) {
                  // descriptor: OPTIONAL PK\x07\x08 sig, crc32, csize,
                  // usize. The sig is ambiguous — an entry whose real
                  // CRC32 equals the sig value looks identical — so
                  // both layouts are validated against the one fact the
                  // inflate established (csize == bytes consumed) and
                  // the consistent one wins (sig-ful preferred: it is
                  // what every mainstream writer emits).
                  def descAt(p: Int): Boolean =
                    p + 12 <= bytes.length && le32(bytes, p + 4) == consumed
                  if (next + 4 <= bytes.length && le32(bytes, next) == DescSig &&
                    descAt(next + 4)) next += 4
                  if (!descAt(next)) done = true // neither layout consistent: torn
                  else {
                    expectCrc = le32(bytes, next)
                    expectUsize = le32(bytes, next + 8)
                    next += 12
                  }
                } else if (csize != consumed) done = true // header lied about the body
                if (!done) {
                  if (c.getValue != expectCrc || expectUsize != data.length.toLong) done = true
                  else {
                    out += ZipEntry(name, 8, data.length.toLong, data)
                    total += data.length; n += 1
                    off = next
                  }
                }
              }
            case _ => done = true // unsupported method: stop, keep prefix
          }
        }
      }
    }
    out.result()
  }

  /** The WebDataset view of a zip shard: [[TarShard.samples]]' law
    * over the stream-order members (directories break runs exactly
    * like tar's type-5 entries).
    */
  def samples(es: Seq[ZipEntry]): Seq[TarShard.TarSample] =
    TarShard.samples(es.map(e =>
      TarShard.TarEntry(e.name, if (e.name.endsWith("/")) "5" else "0", e.usize, e.data)))

  /** Member inventory per shard row: (media_id, entry_idx, name,
    * method, size). Map-only.
    */
  def entryRows(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        entries(p).zipWithIndex.map { case (e, i) => (id, i, e.name, e.method, e.usize) }
      }
      .toDF(idCol, "entry_idx", "name", "method", "size")
  }

  /** WebDataset sample parts per shard row — [[TarShard.sampleRows]]'
    * exact shape, so the container is provably invisible downstream.
    */
  def sampleRows(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        samples(entries(p)).zipWithIndex.flatMap { case (s, i) =>
          s.parts.map { case (ext, data) => (id, i, s.key, ext, data) }
        }
      }
      .toDF(idCol, "sample_idx", "sample_key", "ext", "data")
  }

  // ---- fixture writer (tests + gates only) ----

  /** Minimal zip writer: stored (`deflate = false`) or raw-deflate
    * members, optional data-descriptor layout, then a central
    * directory + end record so real readers accept the bytes.
    * Deterministic (zeroed times).
    */
  def zip(members: Seq[(String, Array[Byte])], deflate: Boolean = true,
      descriptor: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    val central = new ByteArrayOutputStream()
    def c16(v: Int): Unit = { central.write(v & 0xFF); central.write((v >> 8) & 0xFF) }
    def c32(v: Long): Unit = {
      central.write((v & 0xFF).toInt); central.write(((v >> 8) & 0xFF).toInt)
      central.write(((v >> 16) & 0xFF).toInt); central.write(((v >> 24) & 0xFF).toInt)
    }
    for ((name, data) <- members) {
      val hdrOff = out.size()
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val crc = { val c = new CRC32(); c.update(data); c.getValue }
      val method = if (deflate) 8 else 0
      val body: Array[Byte] =
        if (!deflate) data
        else {
          val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(data); d.finish()
          val bo = new ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
          d.end()
          bo.toByteArray
        }
      val flags = if (descriptor && deflate) 0x08 else 0
      w32(LocalSig); w16(20); w16(flags); w16(method); w16(0); w16(0)
      if (flags != 0) { w32(0); w32(0); w32(0) }
      else { w32(crc); w32(body.length.toLong); w32(data.length.toLong) }
      w16(nb.length); w16(0)
      out.write(nb, 0, nb.length)
      out.write(body, 0, body.length)
      if (flags != 0) { w32(DescSig); w32(crc); w32(body.length.toLong); w32(data.length.toLong) }
      // central directory copy
      c32(CentralSig); c16(20); c16(20); c16(flags); c16(method); c16(0); c16(0)
      c32(crc); c32(body.length.toLong); c32(data.length.toLong)
      c16(nb.length); c16(0); c16(0); c16(0); c16(0); c32(0); c32(hdrOff.toLong)
      central.write(nb, 0, nb.length)
    }
    val cdOff = out.size()
    val cd = central.toByteArray
    out.write(cd, 0, cd.length)
    w32(EndSig); w16(0); w16(0); w16(members.length); w16(members.length)
    w32(cd.length.toLong); w32(cdOff.toLong); w16(0)
    out.toByteArray
  }
}
