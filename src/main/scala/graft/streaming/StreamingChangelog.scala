package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming snapshot maintenance — [[graft.operators.Changelog]]'s
  * continuous twin: CDC change rows arrive (key, seq, op, payload) and
  * the operator maintains each key's LATEST version in the state store,
  * emitting a row whenever a key's current version changes. A
  * downstream materializer applies the emitted stream to storage
  * (upsert on "U", delete on "D"); the last emit per key, tombstones
  * dropped, IS the batch snapshot `Changelog.applyLog` would produce
  * from the same log — the equivalence the spec pins.
  *
  * State per key is ONE version row (seq + op + payload) — the
  * snapshot itself, sharded across the state store by key, never
  * driver-resident. Out-of-order arrivals are handled by the max-seq
  * comparison: a stale change (seq below the stored version) emits
  * nothing and leaves state untouched, so replaying a CDC stream with
  * duplicates/reordering converges to the same snapshot.
  *
  * Same unified-API shape as [[StreamingDedup]]/[[StreamingQuota]]:
  * the batch branch of [[latestVersions]] is the oracle-checkable twin
  * (keep-latest reduce per key — including tombstones, since the
  * emitted stream must carry deletes to the materializer).
  */
object StreamingChangelog {

  final case class Change(key: Long, seq: Long, op: String, payload: String)

  def latestVersions(changes: Dataset[Change]): Dataset[Change] = {
    implicit val chEnc = Encoders.product[Change]
    implicit val keyEnc = Encoders.scalaLong
    def newer(a: Change, b: Change): Change = if (a.seq >= b.seq) a else b
    if (!changes.isStreaming) {
      changes
        .groupByKey(_.key)
        .reduceGroups(newer _)
        .map(_._2)
    } else {
      changes.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[Change], state: GroupState[Change]) =>
          val prev = state.getOption
          val best = (prev.iterator ++ it).reduce(newer _)
          if (prev.exists(_.seq >= best.seq)) Iterator.empty
          else {
            state.update(best)
            Iterator.single(best)
          }
      }
    }
  }
}
