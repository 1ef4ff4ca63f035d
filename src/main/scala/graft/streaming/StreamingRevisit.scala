package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming REVISIT scheduling — the continuous twin of
  * [[graft.operators.Frontier.revisitSchedule]]: as fetch completions
  * stream in, track each URL's unchanged streak in per-URL state (two
  * longs — the bounded-state discipline of [[StreamingKmv]]/
  * [[StreamingDedup]]) and emit the adaptive next-fetch decision the
  * moment the fetch lands, instead of rescanning the whole fetch
  * history per crawl round. The policy is the batch operator's,
  * verbatim: interval = baseMs·2^streak capped at maxMs (shift clamped
  * BEFORE it can wrap), streak resets on a changed fetch; within a
  * micro-batch events sort by (ts, changed) so tied timestamps order
  * changed-LAST — the batch window's deterministic tie rule.
  *
  * Ordering contract: a URL's fetches arrive in fetch order ACROSS
  * micro-batches (each URL has one fetcher — the politeness invariant
  * — and a fetcher emits its own completions in order); within a batch
  * any order is fine. Stream == batch is spec-pinned on shared
  * fixtures, including the tie and cap arms.
  */
object StreamingRevisit {

  /** One fetch completion: the canonical URL, event-time millis, and
    * whether the payload differed from the previous fetch (e.g. a
    * [[graft.operators.Changelog.snapshotDiff]] verdict).
    */
  final case class FetchEvent(canon: String, fetch_ms: Long, changed: Boolean)

  /** Per-URL state: last fetch time + current unchanged streak. */
  final case class RevisitState(lastFetchMs: Long, streak: Long)

  /** The emitted decision row — [[graft.operators.Frontier
    * .revisitSchedule]]'s output shape.
    */
  final case class RevisitRow(
      canon: String,
      last_fetch_ms: Long,
      unchanged_streak: Long,
      interval_ms: Long,
      next_fetch_ms: Long)

  private def decide(canon: String, st: RevisitState,
      baseMs: Long, maxMs: Long): RevisitRow = {
    val maxShift = 62L - (63 - java.lang.Long.numberOfLeadingZeros(baseMs))
    val shift = math.min(st.streak, maxShift)
    val interval = math.min(maxMs, baseMs << shift.toInt)
    RevisitRow(canon, st.lastFetchMs, st.streak, interval, st.lastFetchMs + interval)
  }

  /** Fold one batch of a URL's events (sorted to the batch tie rule)
    * into the state: changed resets the streak, unchanged increments —
    * exactly the window's `rn − lastChangeRn` arithmetic, one event at
    * a time.
    */
  private def fold(st: Option[RevisitState], events: Seq[FetchEvent]): RevisitState =
    events.sortBy(e => (e.fetch_ms, e.changed)).foldLeft(
      st.getOrElse(RevisitState(Long.MinValue, 0L))) { (s, e) =>
      RevisitState(e.fetch_ms, if (e.changed) 0L else s.streak + 1L)
    }

  /** Per-URL revisit decisions over a fetch-event frame carrying
    * (canon, fetch_ms, changed). Batch: delegates to the window
    * operator. Streaming: Update-mode `flatMapGroupsWithState` whose
    * state is the two-long per-URL streak — each emit is the URL's
    * CURRENT decision, so an Update sink's latest row per canon IS the
    * schedule.
    */
  def schedule(df: DataFrame, baseMs: Long, maxMs: Long): DataFrame = {
    require(baseMs > 0, "StreamingRevisit.schedule: positive base interval")
    require(maxMs >= baseMs, "StreamingRevisit.schedule: maxMs >= baseMs")
    if (!df.isStreaming)
      graft.operators.Frontier.revisitSchedule(df, baseMs, maxMs)
    else {
      implicit val eEnc = Encoders.product[FetchEvent]
      implicit val rEnc = Encoders.product[RevisitRow]
      implicit val sEnc = Encoders.product[RevisitState]
      implicit val kEnc = Encoders.STRING
      df.select(col("canon").cast("string"), col("fetch_ms").cast("long"),
        col("changed").cast("boolean"))
        .as[FetchEvent]
        .groupByKey(_.canon)
        .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
          (canon: String, it: Iterator[FetchEvent], state: GroupState[RevisitState]) =>
            val next = fold(state.getOption, it.toSeq)
            state.update(next)
            Iterator.single(decide(canon, next, baseMs, maxMs))
        }
        .toDF()
    }
  }
}
