package graft

import java.sql.Timestamp

import graft.operators.AsofJoin

/** As-of join semantics: backward direction, tie-at-equal-time included,
  * null when no prior build row, per-key isolation.
  */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latest build time at-or-before each probe row, per key") {
    val probe = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 10:30:00")),
      (4L, 30L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val build = Seq(
      (10L, ts("2024-01-01 09:30:00")),
      (10L, ts("2024-01-01 11:59:00")),
      (20L, ts("2024-01-01 10:30:00")), // exact tie -> included
      (20L, ts("2024-01-01 11:00:00"))  // after probe -> excluded
    ).toDF("user_id", "ts")

    val out = AsofJoin
      .lastTimeBefore(probe, build, "user_id", "ts", "last_ts")
      .collect()
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Timestamp]("last_ts")))
      .toMap

    assert(out(1L).contains(ts("2024-01-01 09:30:00")))
    assert(out(2L).contains(ts("2024-01-01 11:59:00")))
    assert(out(3L).contains(ts("2024-01-01 10:30:00")))
    assert(out(4L).isEmpty) // key 30 has no build rows
  }

  test("forward direction: earliest build time at-or-after, per key") {
    val probe = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 10:30:00")),
      (4L, 30L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val build = Seq(
      (10L, ts("2024-01-01 09:30:00")),  // before probe 1 -> excluded
      (10L, ts("2024-01-01 11:59:00")),  // first after probe 1
      (20L, ts("2024-01-01 10:30:00")),  // exact tie -> included
      (20L, ts("2024-01-01 11:00:00"))
    ).toDF("user_id", "ts")

    val out = AsofJoin
      .firstTimeAfter(probe, build, "user_id", "ts", "next_ts")
      .collect()
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Timestamp]("next_ts")))
      .toMap

    assert(out(1L).contains(ts("2024-01-01 11:59:00")))
    assert(out(2L).isEmpty) // nothing after 12:00 for key 10
    assert(out(3L).contains(ts("2024-01-01 10:30:00"))) // tie included
    assert(out(4L).isEmpty) // key 30 has no build rows
  }

  test("NULL probe times match nothing in either direction (ASOF semantics)") {
    val probe = Seq(
      (1L, 10L, Option(ts("2024-01-01 10:00:00"))),
      (2L, 10L, Option.empty[Timestamp]) // NULL time -> no match
    ).toDF("event_id", "user_id", "ts")
    val build = Seq((10L, ts("2024-01-01 09:00:00")), (10L, ts("2024-01-01 11:00:00")))
      .toDF("user_id", "ts")

    val back = AsofJoin.lastTimeBefore(probe, build, "user_id", "ts", "m")
      .collect().map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Timestamp]("m"))).toMap
    assert(back(1L).contains(ts("2024-01-01 09:00:00")))
    assert(back(2L).isEmpty)

    val fwd = AsofJoin.firstTimeAfter(probe, build, "user_id", "ts", "m")
      .collect().map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Timestamp]("m"))).toMap
    assert(fwd(1L).contains(ts("2024-01-01 11:00:00")))
    assert(fwd(2L).isEmpty)
  }

  test("nearest: picks the closer side, exact ties go backward, single exchange") {
    val probe = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // back 09:30 (30m) vs fwd 10:45 (45m) → back
      (2L, 10L, ts("2024-01-01 10:40:00")), // back 09:30 (70m) vs fwd 10:45 (5m) → fwd
      (3L, 10L, ts("2024-01-01 09:30:00")), // exact match both directions → itself
      (4L, 11L, ts("2024-01-01 10:00:00")), // only forward exists
      (5L, 12L, ts("2024-01-01 10:00:00"))  // no build rows at all
    ).toDF("event_id", "user_id", "ts")
    val build = Seq(
      (10L, ts("2024-01-01 09:30:00")), (10L, ts("2024-01-01 10:45:00")),
      (11L, ts("2024-01-01 23:00:00"))
    ).toDF("user_id", "ts")

    val df = AsofJoin.nearestTime(probe, build, "user_id", "ts", "m")
    val out = df.collect()
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Timestamp]("m"))).toMap
    assert(out(1L).contains(ts("2024-01-01 09:30:00")))
    assert(out(2L).contains(ts("2024-01-01 10:45:00")))
    assert(out(3L).contains(ts("2024-01-01 09:30:00")))
    assert(out(4L).contains(ts("2024-01-01 23:00:00")))
    assert(out(5L).isEmpty)

    // midpoint tie: 10:00 probe between 09:00 and 11:00 → backward wins
    val tieProbe = Seq((9L, 20L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val tieBuild = Seq((20L, ts("2024-01-01 09:00:00")), (20L, ts("2024-01-01 11:00:00")))
      .toDF("user_id", "ts")
    val tie = AsofJoin.nearestTime(tieProbe, tieBuild, "user_id", "ts", "m").head()
    assert(tie.getAs[Timestamp]("m") == ts("2024-01-01 09:00:00"))

    // count on a FRESH plan: after an action, AQE's final plan prints
    // materialized shuffle stages and double-counts the exchange
    val fresh = AsofJoin.nearestTime(probe, build, "user_id", "ts", "m")
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(fresh.queryExecution.executedPlan.toString).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges")
  }

  test("probe schema is preserved and row count unchanged") {
    val probe = Seq((1L, 5L, ts("2024-01-01 00:00:00"), "x"))
      .toDF("event_id", "user_id", "ts", "payload")
    val build = Seq((5L, ts("2023-12-31 00:00:00"))).toDF("user_id", "ts")
    val out = AsofJoin.lastTimeBefore(probe, build, "user_id", "ts", "last_ts")
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts", "payload", "last_ts"))
    assert(out.count() == 1)
  }
}
