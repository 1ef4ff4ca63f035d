package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming politeness scheduling — [[graft.operators.Frontier
  * .schedule]]'s continuous twin: as admitted URLs stream in, each
  * host's slot counter lives in ONE long of per-host state and every
  * arrival gets its fetch offset (slot × the host's crawl-delay) the
  * moment it lands — the politeness invariant (one request per delay
  * interval per host) enforced without re-ranking the frontier per
  * batch. The delay table rides the closure as literals — the
  * documented streaming-safe regime of the literal [[graft.operators
  * .Frontier.delayColumn]] form (the frame-joined form is the BATCH
  * web-scale path; a streaming lookup that big belongs in a
  * stream-static join upstream of this operator).
  *
  * Slot semantics: ARRIVAL order — a crawler schedules what it has.
  * Within a micro-batch a host's URLs order deterministically by
  * canon; across batches the counter continues from state, so
  * stream == batch holds exactly when per-host arrival respects canon
  * order (spec-pinned), and the politeness contract (distinct slots,
  * fetch_at = slot × delay) holds under ANY arrival order.
  */
object StreamingFrontier {

  /** Per-host state: the next politeness slot to hand out. */
  final case class HostState(nextSlot: Long)

  /** Keyed input row (public — encoder projections). */
  final case class UrlRow(canon: String, host: String, delay_ms: Long)

  /** Emitted plan row; `worker` attaches as a column downstream. */
  final case class SlotRow(canon: String, host: String, slot: Long, fetch_at_ms: Long)

  /** Politeness-slot assignment over (canon, host) rows. Batch:
    * delegates to the window operator (identical columns). Streaming:
    * Update-mode `flatMapGroupsWithState` whose state is the host's
    * slot counter.
    */
  def schedule(
      urls: DataFrame,
      delays: Seq[(String, Long)],
      defaultDelayMs: Long,
      workers: Int
  ): DataFrame = {
    require(workers > 0, "StreamingFrontier.schedule: positive worker count")
    require(defaultDelayMs >= 0, "StreamingFrontier.schedule: non-negative default delay")
    import graft.operators.Frontier
    if (!urls.isStreaming)
      Frontier.schedule(urls.select(col("canon"), col("host")),
        delays, defaultDelayMs, workers)
    else {
      implicit val uEnc = Encoders.product[UrlRow]
      implicit val sEnc = Encoders.product[SlotRow]
      implicit val hEnc = Encoders.product[HostState]
      implicit val kEnc = Encoders.STRING
      urls
        .select(col("canon").cast("string"), col("host").cast("string"),
          Frontier.delayColumn(delays, col("host"), defaultDelayMs).as("delay_ms"))
        .as[UrlRow]
        .groupByKey(_.host)
        .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
          (host: String, it: Iterator[UrlRow], state: GroupState[HostState]) =>
            var next = state.getOption.map(_.nextSlot).getOrElse(0L)
            val rows = it.toSeq.sortBy(_.canon).map { u =>
              val slot = next
              next += 1L
              SlotRow(u.canon, host, slot, slot * u.delay_ms)
            }
            state.update(HostState(next))
            rows.iterator
        }
        .toDF()
        .withColumn("worker", Frontier.workerOf(col("host"), workers))
    }
  }
}
