package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration shape,
  * output schema — is real and tested. The media decode itself is STUBBED
  * (this environment ships no image/audio codecs): `decodeStub` derives
  * deterministic fake features from the bytes. Swapping in a real codec
  * changes only the function body passed to `mapPartitions`, nothing in
  * the plan shape.
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
}
