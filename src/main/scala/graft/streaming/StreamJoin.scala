package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the ad-tech "clicks within N minutes
  * of the impression" pattern, and the streaming analog of
  * [[graft.operators.RangeJoin]].
  *
  * Both inputs must carry watermarks (set by the caller via
  * `withWatermark`); the time-bound join condition is what lets the
  * state store evict buffered rows once the watermark passes their
  * window, so state stays bounded by (watermark delay + interval
  * width) × input rate — never the full stream.
  *
  * The same function works on batch DataFrames (the condition is plain
  * Catalyst), which is how the spec cross-checks streaming results
  * against a batch twin.
  */
object StreamJoin {

  /** Join `left` rows to `right` rows with equal keys whose time lies
    * in `[leftTime - before, leftTime + after]`.
    *
    * @param before   interval string, e.g. "0 seconds"
    * @param after    interval string, e.g. "10 minutes"
    * @param joinType "inner" or the streaming-supported outer types
    *                 ("left_outer", "right_outer", "full_outer");
    *                 outer results emit once the watermark closes the
    *                 match window
    */
  def interval(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      before: String,
      after: String,
      joinType: String = "inner"
  ): DataFrame =
    left.join(
      right,
      left.col(leftKey) === right.col(rightKey) &&
        right.col(rightTime) >= left.col(leftTime) - expr(s"INTERVAL $before") &&
        right.col(rightTime) <= left.col(leftTime) + expr(s"INTERVAL $after"),
      joinType)
}
