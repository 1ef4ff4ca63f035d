package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: schema, determinism, format sniff, frame
  * sampling, and size-based rebalance. The decode itself is a documented
  * stub; these tests pin the Spark-side contract a real codec drops into.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private val jpegHeader = Array(0xFF, 0xD8, 0x01, 0x02).map(_.toByte)
  private val pngHeader = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt).map(_.toByte)

  test("extractFeatures: schema, format sniff, determinism") {
    val df = Seq(
      (1L, jpegHeader),
      (2L, pngHeader),
      (3L, Array[Byte](0, 1, 2))
    ).toDF("media_id", "payload")

    val out = Multimodal.extractFeatures(df, "media_id", "payload")
    assert(out.columns.toSeq ==
      Seq("media_id", "n_bytes", "format", "width", "height", "features"))

    val rows = out.collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(rows(1L).getAs[String]("format") == "jpeg")
    assert(rows(2L).getAs[String]("format") == "png")
    assert(rows(3L).getAs[String]("format") == "unknown")
    def feats(r: org.apache.spark.sql.Row): Seq[Float] =
      r.getAs[scala.collection.Seq[Float]]("features").toSeq
    assert(rows(1L).getAs[Long]("n_bytes") == 4L)
    assert(rows.values.forall(feats(_).length == 8))

    // deterministic: same payload → same features
    val again = Multimodal.extractFeatures(df, "media_id", "payload")
      .collect().map(r => r.getAs[Long]("media_id") -> feats(r)).toMap
    rows.foreach { case (id, r) => assert(feats(r) == again(id)) }
  }

  test("decode stub bounds: width/height positive and within range") {
    val f = Multimodal.decodeStub(Multimodal.MediaBlob(7L, pngHeader))
    assert(f.width >= 1 && f.width <= 1920)
    assert(f.height >= 1 && f.height <= 1080)
    assert(f.features.forall(v => v >= 0.0f && v < 1.0f))
  }

  test("sampleFrames emits n rows per payload with frame indices") {
    val df = Seq((1L, "somebinarypayloadbytesgohere".getBytes)).toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(df, "media_id", "payload", nFrames = 4).collect()
    assert(frames.length == 4)
    assert(frames.map(_.getAs[Int]("frame_no")).toSeq == Seq(0, 1, 2, 3))
  }

  test("rebalanceBySize targets ~targetBytes per partition from a known total") {
    val df = Seq.tabulate(64)(i => (i.toLong, Array.fill(1000)(i.toByte)))
      .toDF("media_id", "payload")
    val re = Multimodal.rebalanceBySize(df, "payload", targetBytes = 8000L,
      totalBytes = Some(64000L))
    assert(re.rdd.getNumPartitions == 8) // 64 KB / 8 KB
  }

  test("rebalanceBySize keeps input partitioning on unknown stats; clamps huge totals") {
    // Catalyst's unknown-stats sentinel (Long.MaxValue) carries no sizing
    // signal: the partitioning must pass through unchanged, not wrap
    // through .toInt into an arbitrary count
    val df = Seq.tabulate(8)(i => (i.toLong, s"payload$i")).toDF("media_id", "payload")
      .repartition(5)
    val joined = df.as("a").join(df.as("b"),
      col("a.media_id") === col("b.media_id") + 1000) // no-match join: stats unknown
    if (joined.queryExecution.optimizedPlan.stats.sizeInBytes == BigInt(Long.MaxValue)) {
      val re = Multimodal.rebalanceBySize(joined, "a.payload", targetBytes = 1L)
      assert(re.rdd.getNumPartitions == joined.rdd.getNumPartitions)
    }
    // explicit huge totals clamp to the ceiling instead of Int-wrapping
    val clamped = Multimodal.rebalanceBySize(df, "payload",
      targetBytes = 1L, totalBytes = Some(Long.MaxValue))
    assert(clamped.rdd.getNumPartitions == Multimodal.MaxRebalanceParts)
  }

  test("rebalanceBySize derives the count from plan stats without scanning") {
    // file-backed input: stats come from parquet footers, not a job
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val statsBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    val re = Multimodal.rebalanceBySize(docs, "text",
      targetBytes = (statsBytes / 4).toLong)
    assert(re.rdd.getNumPartitions == 4)
  }
}
