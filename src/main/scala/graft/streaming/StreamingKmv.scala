package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV — the bottom-k theta sketch's continuous twin
  * ([[graft.operators.Sketch.kmvSketch]]): per-SHARD bottom-K register
  * state, so the state store holds at most `shards × K` longs no
  * matter how many keys stream past — the bounded-state discipline of
  * [[StreamingDedup]]/[[StreamingQuota]] applied to the sketch family.
  * Hash-sharding keeps ingest parallel; order statistics are
  * associative/commutative/idempotent, so the shard states collapse
  * ([[toSketch]]) to EXACTLY the batch build of the whole history —
  * bit-equal, duplicates across micro-batches absorbed, history never
  * rescanned.
  *
  * Same unified-API shape as the siblings: the batch branch of
  * [[shardRegisters]] computes the identical per-shard bottom-K with
  * plain aggregation, so stream == batch is spec-pinned.
  */
object StreamingKmv {

  import graft.operators.Sketch

  /** One shard's register set; `version` increments per state change
    * so an Update-mode sink's LATEST row per shard is the state.
    */
  final case class ShardRegs(shard: Int, version: Long, hvs: Seq[Long])

  /** Internal row shape of the sharded key stream (public — Spark's
    * codegen'd encoder projections cannot touch private classes).
    */
  final case class Keyed(shard: Int, hv: Long)

  /** Distinct bottom-K in unsigned order over a hash iterator — the
    * shard state transition. K is [[Sketch.KmvK]] (64), so the
    * TreeSet never exceeds K+1 entries.
    */
  private def bottomK(it: Iterator[Long]): Seq[Long] = {
    val set = scala.collection.mutable.TreeSet.empty[Long](
      Ordering.by((h: Long) => h ^ Long.MinValue))
    it.foreach { h =>
      set += h
      if (set.size > Sketch.KmvK) set -= set.last
    }
    set.toSeq
  }

  /** Per-shard register rows over `keyCol`. Batch: one aggregation
    * pass. Streaming: Update-mode `flatMapGroupsWithState` whose state
    * is the shard's current bottom-K; a batch that doesn't move the
    * registers emits nothing.
    */
  def shardRegisters(df: DataFrame, keyCol: String, shards: Int): Dataset[ShardRegs] = {
    require(shards > 0, "StreamingKmv.shardRegisters: positive shard count")
    implicit val kEnc = Encoders.product[Keyed]
    implicit val sEnc = Encoders.product[ShardRegs]
    implicit val iEnc = Encoders.scalaInt
    val hv = xxhash64(col(keyCol))
    val keyed = df
      .select(pmod(hv, lit(shards.toLong)).cast("int").as("shard"), hv.as("hv"))
      .as[Keyed]
    if (!df.isStreaming) {
      // dedup first (map-side partial aggregation) and pre-filter each
      // shard to its bottom-K with a window, so the final per-shard
      // group sees ≤ K rows — the raw key stream never funnels
      // undeduped into `shards` tasks
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard"))
        .orderBy(col("hv").bitwiseXOR(lit(Long.MinValue)).asc)
      keyed.toDF().distinct()
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= Sketch.KmvK)
        .drop("__rk")
        .as[Keyed]
        .groupByKey(_.shard).mapGroups { (s, it) =>
          ShardRegs(s, 0L, bottomK(it.map(_.hv)))
        }
    } else
      keyed.groupByKey(_.shard).flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (s: Int, it: Iterator[Keyed], state: GroupState[ShardRegs]) =>
          val prev = state.getOption
          val merged = bottomK(prev.iterator.flatMap(_.hvs.iterator) ++ it.map(_.hv))
          if (prev.exists(_.hvs == merged)) Iterator.empty
          else {
            val next = ShardRegs(s, prev.map(_.version + 1L).getOrElse(0L), merged)
            state.update(next)
            Iterator.single(next)
          }
      }
  }

  /** Collapse shard register rows — keeping each shard's LATEST
    * version (an Update-mode sink appends every emit) — to the
    * stream-wide K-register frame: bottom-K of the shard-state union,
    * bit-equal to `Sketch.kmvSketch` over the concatenated key
    * history. Frames here are ≤ shards×K rows.
    */
  def toSketch(regs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("version").desc)
    regs
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(explode(col("hvs")).as("hv"))
      .orderBy(col("hv").bitwiseXOR(lit(Long.MinValue)).asc)
      .limit(Sketch.KmvK)
  }
}
