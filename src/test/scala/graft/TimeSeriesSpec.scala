package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: values at 00:10, 00:40 (same bucket), 03:20 — gap over 01,02
  // user 2: single event
  private lazy val events = Seq(
    (1L, ts("2024-01-01 00:10:00"), 10.0, 100L),
    (1L, ts("2024-01-01 00:40:00"), 11.0, 101L),
    (1L, ts("2024-01-01 03:20:00"), 12.0, 102L),
    (2L, ts("2024-01-01 05:00:00"), 99.0, 103L)
  ).toDF("user_id", "ts", "value", "event_id")

  test("hourly grid: last-in-bucket wins, gaps forward-fill, span is per-key") {
    val out = TimeSeries.resampleFfill(events, "user_id", "ts", "value", "event_id", 3600L)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      (1L, "2024-01-01 00:00:00.0", 11.0), // last of the two in bucket 0
      (1L, "2024-01-01 01:00:00.0", 11.0), // filled
      (1L, "2024-01-01 02:00:00.0", 11.0), // filled
      (1L, "2024-01-01 03:00:00.0", 12.0),
      (2L, "2024-01-01 05:00:00.0", 99.0)  // span starts at user 2's first event
    ))
  }

  test("timestamp tie within a bucket breaks by the tie column") {
    val tied = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0, 1L),
      (1L, ts("2024-01-01 00:00:00"), 2.0, 2L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleFfill(tied, "user_id", "ts", "value", "event_id", 3600L)
      .select("value").as[Double].collect()
    assert(out.toSeq == Seq(2.0))
  }
}
