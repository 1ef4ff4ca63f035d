package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The count-guarded broadcast side shared by the frontier/robots
  * lookup joins (Profile.guardedSide's simple regime, factored so the
  * pattern exists ONCE): persist and count the bounded frame; at or
  * under `maxRows` collect it to a driver-local relation and BROADCAST
  * (the identical driver footprint a broadcast would pay anyway — and
  * the frame's derivation drops out of the consumer's plan); past the
  * guard unpersist and return the LAZY frame for a shuffle join (the
  * recompute of a bounded derivation is the leak-free price — Spark's
  * CacheManager holds caches until an explicit unpersist, and a
  * plan-lifetime persist from a lazy-returning operator would
  * accumulate with no owner to release it).
  *
  * Profile.guardedSide keeps its richer thunk/keepPersisted contract
  * for callers that materialize before returning; this is the
  * keepPersisted=false regime every lookup join needs.
  */
private[operators] object Guard {

  /** Past this many rows a lookup table stops riding a broadcast
    * (≈ tens of MB of driver memory at 2^20 rows) and the join
    * degrades to a shuffle.
    */
  val DefaultMaxBroadcastRows: Long = 1L << 20

  def broadcastOrLazy(small: DataFrame, maxRows: Long): DataFrame = {
    val persisted = small.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n =
      try persisted.count()
      catch { case t: Throwable => persisted.unpersist(); throw t }
    if (n <= maxRows) {
      val local = broadcast(small.sparkSession.createDataFrame(
        persisted.collectAsList(), small.schema))
      persisted.unpersist()
      local
    } else {
      persisted.unpersist()
      small
    }
  }
}
