package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.SessionState
import graft.streaming.SessionState.{OpenSession, SessionEvent}

/** The flatMapGroupsWithState session twin must agree with the native
  * session_window kernel (batch) and emit the reference scenario's
  * results on a stream.
  */
class SessionStateSpec extends SparkSpec {

  import spark.implicits._

  private val Gap = 1200 * 1000L // 1200 s in millis
  private def t(s: String) = Timestamp.valueOf(s).getTime

  test("mergeEvents: gap-transitive merging and weight accumulation") {
    def ev(ms: Long, denied: Boolean, w: Long) =
      SessionEvent("u", new Timestamp(ms), denied, w)
    val evs = Seq(ev(1000L, denied = true, 10), ev(1500L, denied = false, 5),
      ev(10000L, denied = true, 2))
    val out = SessionState.mergeEvents(Nil, evs, gapMillis = 1000L)
    assert(out == List(OpenSession(1000L, 1500L, 10L), OpenSession(10000L, 10000L, 2L)))
    // merging new events into existing open state
    val out2 = SessionState.mergeEvents(out, Seq(ev(2400L, denied = true, 7)), 1000L)
    assert(out2 == List(OpenSession(1000L, 2400L, 17L), OpenSession(10000L, 10000L, 2L)))
  }

  test("batch twin equals the native session_window kernel on fixture events") {
    val ev = graft.queries.Q.events(spark, "/root/testdata/sf0.001")
    val typed = ev.select(
      col("user_id").cast("string").as("key"),
      col("ts"),
      (col("event_type") === "error").as("denied"),
      col("value").cast("long").as("weight")).as[SessionEvent]

    val custom = SessionState.deniedCounts(typed, 1800 * 1000L)
      .select(col("key"), col("denies"),
        unix_millis(col("session_start")).as("s"),
        unix_millis(col("session_end")).as("e"))
      .as[(String, Long, Long, Long)].collect().toSet

    val native = graft.operators.Sessionize.deniedCounts(
      ev.withColumn("w", col("value").cast("long")), "ts", "user_id",
      "1800 seconds", col("event_type") === "error", col("w"))
      .select(col("user_id").cast("string"), col("denies"),
        unix_millis(col("session_start")), unix_millis(col("session_end")))
      .as[(String, Long, Long, Long)].collect().toSet

    assert(custom == native)
  }

  test("streaming: reference 4-event scenario emits (wdyson,10) and (bob,2)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Boolean, Long)]
    val typed = in.toDF().toDF("key", "ts", "denied", "weight")
      .withWatermark("ts", "0 seconds")
      .as[SessionEvent]
    val q = SessionState.deniedCounts(typed, Gap)
      .writeStream.format("memory").queryName("session_state_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData(
        ("wdyson", Timestamp.valueOf("2021-04-01 10:00:00"), true, 10L),
        ("wdyson", Timestamp.valueOf("2021-04-01 10:10:00"), false, 1L),
        ("bob", Timestamp.valueOf("2021-04-01 10:10:00"), true, 1L),
        ("bob", Timestamp.valueOf("2021-04-01 10:20:00"), true, 1L))
      q.processAllAvailable()
      // push the watermark far past every session end
      in.addData(("zz", Timestamp.valueOf("2021-04-02 00:00:00"), false, 0L))
      q.processAllAvailable()
      in.addData(("zz", Timestamp.valueOf("2021-04-03 00:00:00"), false, 0L))
      q.processAllAvailable()

      val rows = spark.table("session_state_out")
        .select("key", "denies", "session_start", "session_end")
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getTimestamp(2).getTime, r.getTimestamp(3).getTime))
        .sortBy(_._1)
      assert(rows.length == 2)
      val Array(bob, wdyson) = rows
      assert(wdyson._1 == "wdyson" && wdyson._2 == 10L)
      assert(wdyson._3 == t("2021-04-01 10:00:00") && wdyson._4 == t("2021-04-01 10:10:00") + Gap)
      assert(bob._1 == "bob" && bob._2 == 2L)
      assert(bob._3 == t("2021-04-01 10:10:00") && bob._4 == t("2021-04-01 10:20:00") + Gap)
    } finally q.stop()
  }
}
