package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamJoin

/** Stream-stream interval join over MemoryStreams: clicks attribute to
  * impressions within the window; inner joins emit immediately, outer
  * joins emit unmatched rows once the watermark closes the window; the
  * streaming result matches the batch twin on the same data.
  */
class StreamJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("inner interval join: clicks within 10 min of their impression") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[(String, Timestamp)]
    val clicks = MemoryStream[(String, Timestamp)]

    val joined = StreamJoin.interval(
      impressions.toDF().toDF("ad_id", "imp_ts").withWatermark("imp_ts", "30 seconds"),
      clicks.toDF().toDF("c_ad_id", "click_ts").withWatermark("click_ts", "30 seconds"),
      leftKey = "ad_id", rightKey = "c_ad_id",
      leftTime = "imp_ts", rightTime = "click_ts",
      before = "0 seconds", after = "10 minutes")
      .select(col("ad_id"), col("imp_ts"), col("click_ts"))

    val q = joined.writeStream
      .format("memory").queryName("sj_inner_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      impressions.addData(
        ("ad1", ts("2024-01-01 10:00:00")),
        ("ad2", ts("2024-01-01 10:00:00")))
      clicks.addData(
        ("ad1", ts("2024-01-01 10:05:00")), // within window -> joins
        ("ad2", ts("2024-01-01 10:20:00")), // 20 min later -> outside
        ("ad9", ts("2024-01-01 10:01:00"))) // no impression -> dropped
      q.processAllAvailable()

      val rows = spark.table("sj_inner_out")
        .as[(String, Timestamp, Timestamp)].collect()
      assert(rows.toSet == Set(
        ("ad1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"))))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched impressions after watermark close") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[(String, Timestamp)]
    val clicks = MemoryStream[(String, Timestamp)]

    val joined = StreamJoin.interval(
      impressions.toDF().toDF("ad_id", "imp_ts").withWatermark("imp_ts", "10 seconds"),
      clicks.toDF().toDF("c_ad_id", "click_ts").withWatermark("click_ts", "10 seconds"),
      leftKey = "ad_id", rightKey = "c_ad_id",
      leftTime = "imp_ts", rightTime = "click_ts",
      before = "0 seconds", after = "1 minute",
      joinType = "left_outer")
      .select(col("ad_id"), col("click_ts"))

    val q = joined.writeStream
      .format("memory").queryName("sj_outer_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      impressions.addData(("lonely", ts("2024-01-01 10:00:00")))
      clicks.addData(("other", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()

      // advance both watermarks far past the lonely impression's window
      // (two batches: the watermark used by batch N is computed from
      // batch N-1, and outer-row eviction runs on the batch after that)
      impressions.addData(("late", ts("2024-01-01 11:00:00")))
      clicks.addData(("late2", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      impressions.addData(("later", ts("2024-01-01 12:00:00")))
      clicks.addData(("later2", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()

      val unmatched = spark.table("sj_outer_out")
        .filter(col("ad_id") === "lonely")
        .collect()
      assert(unmatched.length == 1)
      assert(unmatched.head.isNullAt(1)) // no click -> null click_ts
    } finally q.stop()
  }

  test("streaming inner join equals the batch twin on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val impData = Seq(
      ("a", ts("2024-01-01 09:00:00")),
      ("a", ts("2024-01-01 09:30:00")),
      ("b", ts("2024-01-01 09:10:00")))
    val clickData = Seq(
      ("a", ts("2024-01-01 09:05:00")),
      ("a", ts("2024-01-01 09:31:00")),
      ("b", ts("2024-01-01 10:00:00")))

    val impressions = MemoryStream[(String, Timestamp)]
    val clicks = MemoryStream[(String, Timestamp)]
    val streaming = StreamJoin.interval(
      impressions.toDF().toDF("ad_id", "imp_ts").withWatermark("imp_ts", "1 hour"),
      clicks.toDF().toDF("c_ad_id", "click_ts").withWatermark("click_ts", "1 hour"),
      "ad_id", "c_ad_id", "imp_ts", "click_ts", "0 seconds", "10 minutes")
      .select(col("ad_id"), col("imp_ts"), col("click_ts"))

    val q = streaming.writeStream
      .format("memory").queryName("sj_twin_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      impressions.addData(impData: _*)
      clicks.addData(clickData: _*)
      q.processAllAvailable()

      val batch = StreamJoin.interval(
        impData.toDF("ad_id", "imp_ts"),
        clickData.toDF("c_ad_id", "click_ts"),
        "ad_id", "c_ad_id", "imp_ts", "click_ts", "0 seconds", "10 minutes")
        .select(col("ad_id"), col("imp_ts"), col("click_ts"))
        .as[(String, Timestamp, Timestamp)].collect().toSet

      val streamed = spark.table("sj_twin_out")
        .as[(String, Timestamp, Timestamp)].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }
}
