package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Write side of the date-pruning story (SURVEY §2 S2): persist rows
  * into a Hive-style `dt=YYYYMMDD/` tree so that downstream readers get
  * Catalyst partition pruning (`PruneFileSourcePartitions`) instead of
  * the reference's hand-rolled directory filter — whole date directories
  * skipped at file-listing time, at any scale.
  *
  * Works for batch (`write`) and streaming (`writeStream`, exactly-once
  * per file with checkpointing).
  */
object PartitionedSink {

  /** Append `dt` (YYYYMMDD, from the event-time column) for partitioning. */
  def withDt(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("dt", date_format(col(tsCol), "yyyyMMdd"))

  /** Batch write, partitioned by event date. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    withDt(df, tsCol).write.partitionBy("dt").mode("append").parquet(path)

  /** Streaming writer, partitioned by event date; caller sets trigger
    * and starts it.
    */
  def streamDatePartitioned(
      df: DataFrame,
      tsCol: String,
      path: String,
      checkpoint: String
  ): DataStreamWriter[Row] =
    withDt(df, tsCol).writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("dt")

  /** Upsert one batch into a date-partitioned table: DYNAMIC partition
    * overwrite replaces only the `dt=` partitions present in the batch,
    * leaving every other date untouched. This is the materialized-view
    * maintenance primitive: corrected aggregates (e.g. sessions revised
    * by late data) replace their day's output in place, at the cost of
    * rewriting just that day — not the table.
    */
  def upsertBatchDatePartitioned(batch: DataFrame, tsCol: String, path: String): Unit =
    withDt(batch, tsCol).write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dt")
      .mode("overwrite")
      .parquet(path)

  /** Streaming upsert sink via foreachBatch: each micro-batch
    * overwrites only its own date partitions. Pair with Update output
    * mode (re-emitted corrections) or Complete mode per-day rollups;
    * exactly-once per partition comes from the overwrite being
    * idempotent for a replayed batch.
    */
  def streamUpsertDatePartitioned(
      df: DataFrame,
      tsCol: String,
      path: String,
      checkpoint: String
  ): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatchDatePartitioned(batch, tsCol, path)
      }
}
