package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Space-saving heavy-hitters sketch as a typed `Aggregator` — the
  * bounded-memory path to "top k most frequent values" over a
  * high-cardinality column. Exact top-k needs a full groupBy (state ∝
  * distinct values); this keeps at most `capacity` counters per
  * aggregation buffer. Single-stream guarantee (Metwally et al.,
  * "Efficient computation of frequent and top-k elements in data
  * streams"): any item with true count > N/capacity is retained, and
  * `err` bounds its overcount. The distributed merge sums counters and
  * keeps the top `capacity` (dropped tails can undercount — the usual
  * sketch-merge tradeoff; the spec pins heavy-hitter recall on skewed
  * data).
  */
object TopKSketch {

  final case class Counter(item: String, count: Long, err: Long)

  final class SpaceSaving(capacity: Int, k: Int)
      extends Aggregator[String, Map[String, (Long, Long)], Seq[Counter]] {

    override def zero: Map[String, (Long, Long)] = Map.empty

    override def reduce(b: Map[String, (Long, Long)], item: String): Map[String, (Long, Long)] =
      b.get(item) match {
        case Some((c, e)) => b.updated(item, (c + 1, e))
        case None if b.size < capacity => b.updated(item, (1L, 0L))
        case None =>
          // space-saving step: the new item inherits the evicted
          // minimum's count as its overcount bound
          val (minK, (minC, _)) = b.minBy(_._2._1)
          (b - minK).updated(item, (minC + 1, minC))
      }

    override def merge(
        a: Map[String, (Long, Long)],
        b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
      val m = mutable.Map.from(a)
      b.foreach { case (kk, (c, e)) =>
        val (c0, e0) = m.getOrElse(kk, (0L, 0L))
        m(kk) = (c0 + c, e0 + e)
      }
      if (m.size <= capacity) m.toMap
      else m.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity).toMap
    }

    override def finish(b: Map[String, (Long, Long)]): Seq[Counter] =
      b.toSeq
        .map { case (i, (c, e)) => Counter(i, c, e) }
        .sortBy(c => (-c.count, c.item))
        .take(k)

    override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
      Encoders.kryo[Map[String, (Long, Long)]]
    override def outputEncoder: Encoder[Seq[Counter]] = ExpressionEncoder()
  }

  /** Column aggregate: approx top-k of a string column with bounded
    * (`capacity`-counter) state.
    */
  def approxTopK(c: Column, k: Int, capacity: Int): Column =
    udaf(new SpaceSaving(capacity, k)).apply(c)
}
