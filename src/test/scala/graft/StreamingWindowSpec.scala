package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming tumbling-window aggregation (the streaming twin of
  * q_window_tumbling): windows emit once the watermark passes their end;
  * late rows beyond the watermark are dropped.
  */
class StreamingWindowSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling windows emit on watermark close; late data is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = in.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("stream_tumbling")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (ts("2024-01-01 10:05:00"), "view", 1.0),
        (ts("2024-01-01 10:20:00"), "view", 1.0),
        (ts("2024-01-01 10:40:00"), "click", 1.0))
      q.processAllAvailable()
      // advance the watermark past 11:00 -> the 10:00 window closes
      in.addData((ts("2024-01-01 11:30:00"), "view", 1.0))
      q.processAllAvailable()
      // this row is for the closed 10:00 window, far behind the
      // watermark -> dropped, not merged
      in.addData((ts("2024-01-01 10:50:00"), "view", 99.0))
      q.processAllAvailable()

      val rows = spark.table("stream_tumbling")
        .select("w_start", "event_type", "n")
        .as[(Timestamp, String, Long)].collect().sortBy(r => (r._1.getTime, r._2))
      assert(rows.toSeq == Seq(
        (ts("2024-01-01 10:00:00"), "click", 1L),
        (ts("2024-01-01 10:00:00"), "view", 2L)))
    } finally q.stop()
  }
}
