package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The custom-state escape hatch: the reference's session aggregation
  * re-implemented on `flatMapGroupsWithState` — for session semantics
  * the built-in `session_window` can't express (per-session caps,
  * session-local dedup, emit-on-update, …). For the plain gap-session
  * count, `graft.operators.Sessionize` (native, codegen'd, merging
  * session state inside the aggregation) is strictly preferable; the
  * spec pins this implementation against it.
  *
  * State per key: the open (not-yet-watermark-closed) sessions, each a
  * (start, lastEvent, denies) triple — constant-size per session, like
  * the reference's single-Integer accumulator
  * (`AggregateDeniedCounts.java:5`). Sessions emit exactly once, when
  * the event-time watermark passes session end (last + gap), matching
  * Append-mode `session_window` emission; zero-count sessions are
  * suppressed (`App.java:132`).
  */
object SessionState {

  /** `ts` must be the watermarked event-time column on streaming inputs
    * (event-time timeouts require the watermark to survive into the
    * stateful operator, so it stays a Timestamp field here).
    */
  final case class SessionEvent(key: String, ts: Timestamp, denied: Boolean, weight: Long) {
    def eventMillis: Long = ts.getTime
  }
  final case class OpenSession(start: Long, last: Long, denies: Long)
  final case class SessionResult(key: String, denies: Long,
      session_start: Timestamp, session_end: Timestamp)

  /** Interval-merge fold: absorb sorted `events` into `open` sessions
    * (both ordered by start; events within `gap` of a session extend
    * it). Pure — shared by the batch and streaming paths.
    */
  private[graft] def mergeEvents(
      open: List[OpenSession],
      events: Seq[SessionEvent],
      gapMillis: Long): List[OpenSession] = {
    val sorted = (open.map(s => Left(s): Either[OpenSession, SessionEvent]) ++
      events.map(Right(_)))
      .sortBy {
        case Left(s) => (s.start, 0)
        case Right(e) => (e.eventMillis, 1)
      }
    sorted.foldLeft(List.empty[OpenSession]) { (acc, item) =>
      val (start, last, denies) = item match {
        case Left(s) => (s.start, s.last, s.denies)
        case Right(e) => (e.eventMillis, e.eventMillis, if (e.denied) e.weight else 0L)
      }
      acc match {
        case head :: tail if start <= head.last + gapMillis =>
          OpenSession(head.start, math.max(head.last, last),
            head.denies + denies) :: tail
        case _ => OpenSession(start, last, denies) :: acc
      }
    }.reverse
  }

  private def toResult(key: String, s: OpenSession, gapMillis: Long) =
    SessionResult(key, s.denies,
      new Timestamp(s.start), new Timestamp(s.last + gapMillis))

  /** Batch and streaming entry. Streaming inputs must carry a watermark
    * on their event-time column upstream (the caller converts it to
    * `eventMillis`).
    */
  def deniedCounts(
      events: Dataset[SessionEvent],
      gapMillis: Long): Dataset[SessionResult] = {
    implicit val resEnc = Encoders.product[SessionResult]
    implicit val keyEnc = Encoders.STRING
    if (!events.isStreaming) {
      events.groupByKey(_.key).flatMapGroups { (key, it) =>
        mergeEvents(Nil, it.toSeq, gapMillis)
          .filter(_.denies != 0)
          .map(toResult(key, _, gapMillis))
          .iterator
      }
    } else {
      implicit val stateEnc = Encoders.kryo[List[OpenSession]]
      events.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[SessionEvent], state: GroupState[List[OpenSession]]) =>
          val wm = state.getCurrentWatermarkMs()
          val open = state.getOption.getOrElse(Nil)
          val merged = mergeEvents(open, it.toSeq, gapMillis)
          val (closed, stillOpen) = merged.partition(_.last + gapMillis <= wm)
          if (stillOpen.isEmpty) state.remove()
          else {
            state.update(stillOpen)
            // wake up when the watermark can close the earliest session
            state.setTimeoutTimestamp(stillOpen.map(_.last + gapMillis).min)
          }
          closed.filter(_.denies != 0).map(toResult(key, _, gapMillis)).iterator
      }
    }
  }
}
