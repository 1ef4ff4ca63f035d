package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming deduplication — the ingest-side twin of the batch dedup
  * operators: drop repeated records as they arrive, before they ever hit
  * storage. Both variants are pure DataFrame→DataFrame functions that
  * also work on batch inputs (unified API).
  *
  * State sizing at scale: `exact` keeps every key seen since the query
  * started (unbounded state — only for keyspaces known to be small);
  * `withinWatermark` bounds state by event time: a key's state is
  * dropped once the watermark passes it, so state ∝ (arrival rate ×
  * watermark delay), independent of stream lifetime — the only viable
  * shape for an unbounded 100 TB/day ingest.
  */
object StreamingDedup {

  /** Keep the first row per key; unbounded state. */
  def exact(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.dropDuplicates(keyCols)

  /** Keep the first row per key among rows whose event times fall
    * within the watermark delay of each other; state is evicted as the
    * watermark advances. `df` must already carry a watermark on its
    * event-time column when streaming.
    */
  def withinWatermark(df: DataFrame, keyCols: Seq[String]): DataFrame =
    if (df.isStreaming) df.dropDuplicatesWithinWatermark(keyCols)
    else df.dropDuplicates(keyCols)
}
