package graft

import graft.operators.Avro
import graft.operators.Avro._

/** Avro object-container walk: round-trips, both codecs, certification
  * against the Avro reference implementation in BOTH directions, the
  * schema-subset boundary, degrade stages, completed-block prefixes,
  * and adversarial no-throw.
  */
class AvroSpec extends SparkSpec {

  private val schema =
    """{"type":"record","name":"R","fields":[
      |{"name":"id","type":"long"},{"name":"name","type":"string"},
      |{"name":"ok","type":"boolean"},{"name":"tag","type":"bytes"}]}""".stripMargin

  private def recs(n: Int): Seq[Seq[AV]] =
    (0 until n).map(i => Seq(AVLong(i * 10L), AVStr(s"row $i"),
      AVBool(i % 2 == 0), AVBytes(Array((i + 1).toByte, 0x7F.toByte))))

  test("round-trip: null and deflate codecs, multi-block, canonical strings") {
    for (codec <- Seq("null", "deflate")) {
      val r = Avro.read(Avro.ocf(schema, recs(5), codec = codec, blockSize = 2))
      assert(r.stage == "ok", codec)
      assert(r.fields.map(_._1) == Seq("id", "name", "ok", "tag"))
      assert(r.records.length == 5)
      assert(r.records(3) == Seq("30", "row 3", "false", "047f"))
    }
  }

  test("certification: the Avro reference reader accepts our bytes") {
    import org.apache.avro.file.DataFileStream
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    for (codec <- Seq("null", "deflate")) {
      val in = new DataFileStream[GenericRecord](
        new java.io.ByteArrayInputStream(Avro.ocf(schema, recs(4), codec = codec)),
        new GenericDatumReader[GenericRecord]())
      val got = Iterator.continually(if (in.hasNext) in.next() else null)
        .takeWhile(_ != null).toSeq
      assert(got.length == 4, codec)
      assert(got(2).get("id") == 20L)
      assert(got(2).get("name").toString == "row 2")
      assert(got(2).get("ok") == true)
    }
  }

  test("certification: our walk reads Avro-reference-written bytes") {
    import org.apache.avro.Schema
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val sch = new Schema.Parser().parse(schema)
    for (deflate <- Seq(false, true)) {
      val bos = new java.io.ByteArrayOutputStream()
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
      if (deflate) w.setCodec(CodecFactory.deflateCodec(6))
      w.create(sch, bos)
      for (i <- 0 until 3) {
        val r = new GenericData.Record(sch)
        r.put("id", i * 7L)
        r.put("name", s"ref $i")
        r.put("ok", i != 1)
        r.put("tag", java.nio.ByteBuffer.wrap(Array(i.toByte)))
        w.append(r)
      }
      w.close()
      val got = Avro.read(bos.toByteArray)
      assert(got.stage == "ok", s"deflate=$deflate")
      assert(got.records.length == 3)
      assert(got.records(1) == Seq("7", "ref 1", "false", "01"))
    }
  }

  test("schema subset boundary: unions/arrays/nested degrade whole-document") {
    val union = """{"type":"record","name":"R","fields":[{"name":"u","type":["null","string"]}]}"""
    assert(Avro.read(Avro.ocf(union, Seq.empty)).stage == "schema")
    val arr = """{"type":"record","name":"R","fields":[{"name":"a","type":{"type":"array","items":"long"}}]}"""
    assert(Avro.read(Avro.ocf(arr, Seq.empty)).stage == "schema")
    val dup = """{"type":"record","name":"R","fields":[{"name":"x","type":"long"},{"name":"x","type":"int"}]}"""
    assert(Avro.read(Avro.ocf(dup, Seq.empty)).stage == "schema")
    val notRecord = """{"type":"string"}"""
    assert(Avro.read(Avro.ocf(notRecord, Seq.empty)).stage == "schema")
  }

  test("degrades: junk magic, unknown codec, corrupt sync keeps the block prefix") {
    assert(Avro.read("not avro at all".getBytes("UTF-8")).stage == "parse")
    assert(Avro.read(null).stage == "parse")
    assert(Avro.read(Avro.ocf(schema, recs(2), codec = "snappy")).stage == "codec")
    // flip a byte in the FINAL block's sync: that block drops, the
    // earlier blocks survive — all-or-nothing per block
    val blob = Avro.ocf(schema, recs(5), blockSize = 2) // blocks [2,2,1]
    val torn = blob.clone()
    torn(torn.length - 3) = (torn(torn.length - 3) ^ 0x55).toByte
    val r = Avro.read(torn)
    assert(r.stage == "ok" && r.records.length == 4)
    assert(r.records(3) == Seq("30", "row 3", "false", "047f"))
  }

  test("distributed views: recordRows field-exact, docRows stage-countable, map-only") {
    import spark.implicits._
    val df = Seq(
      (1L, Avro.ocf(schema, recs(2))),
      (2L, Avro.ocf(schema, recs(1), codec = "snappy")),
      (3L, "junk".getBytes("UTF-8"))).toDF("media_id", "payload")
    val rr = Avro.recordRows(df, "media_id", "payload")
    graft.queries.Q.requireNoShuffle(rr)
    assert(rr.count() == 8) // 2 records × 4 fields; degraded docs emit none
    val dr = Avro.docRows(df, "media_id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(dr == Set((1L, "ok", 2), (2L, "codec", 0), (3L, "parse", 0)))
  }

  test("adversarial: truncation and bit flips never throw; budgets bound bombs") {
    val blob = Avro.ocf(schema, recs(6), codec = "deflate", blockSize = 3)
    for (cut <- 0 to blob.length by 7) Avro.read(java.util.Arrays.copyOfRange(blob, 0, cut))
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val c = blob.clone()
      val i = rnd.nextInt(c.length)
      c(i) = (c(i) ^ (1 << rnd.nextInt(8))).toByte
      Avro.read(c)
    }
    // a hostile record-count claim is budget-bounded, not allocated
    assert(Avro.read(blob, maxRecords = 2).records.length <= 3)
  }
}
