package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming quota enforcement — the curation decision layer's ingest
  * twin: rows arrive, each group (language, source, topic …) has a
  * budget from an upstream decision (temperature allocation, DoReMi
  * reweighting, a hand-set table), and the stream ADMITS rows until
  * each group's budget is exhausted, then drops that group forever.
  *
  * State per group is ONE long (the admitted count) in the state store
  * — |groups|-sized state regardless of stream lifetime, the smallest
  * stateful footprint of any operator here. The quota DECISION table is
  * |groups|-sized by construction, so it rides into every task in the
  * closure (the broadcast-quota pattern of [[graft.operators.Sampling
  * .quotaSample]] — collect it once from the decision frame).
  *
  * Determinism contract: within a micro-batch a group's rows are
  * admitted in ascending `seq` order; across batches in arrival order.
  * On the SAME total arrival sequence the admitted set equals
  * [[graft.operators.Sampling.quotaAdmit]]'s — the oracle-checkable
  * batch twin the spec pins this against (same unified-API shape as
  * [[StreamingDedup]]: the batch branch IS that twin).
  */
object StreamingQuota {

  final case class Arrival(group: String, id: Long, seq: Long)

  def admit(
      arrivals: Dataset[Arrival],
      allocs: Map[String, Long]
  ): Dataset[Arrival] = {
    implicit val arrEnc = Encoders.product[Arrival]
    implicit val keyEnc = Encoders.STRING
    def takeInOrder(it: Iterator[Arrival], room: Long): Seq[Arrival] =
      if (room <= 0L) Nil
      else it.toSeq.sortBy(a => (a.seq, a.id))
        .take(math.min(room, Int.MaxValue.toLong).toInt)
    if (!arrivals.isStreaming) {
      arrivals.groupByKey(_.group).flatMapGroups { (g, it) =>
        takeInOrder(it, allocs.getOrElse(g, 0L)).iterator
      }
    } else {
      implicit val stateEnc = Encoders.scalaLong
      arrivals.groupByKey(_.group).flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[Arrival], state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val take = takeInOrder(it, allocs.getOrElse(g, 0L) - admitted)
          if (take.nonEmpty) state.update(admitted + take.size)
          take.iterator
      }
    }
  }
}
