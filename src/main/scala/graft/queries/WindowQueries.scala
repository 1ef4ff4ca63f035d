package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** Time-window and analytic coverage beyond the session window:
  * tumbling/sliding event-time windows, as-of join, grouping sets,
  * approximate distinct, and explode/UDTF-style token flattening.
  */
object WindowQueries {

  val all: Seq[Q] = Seq(

    // Tumbling 1-hour event-time window (batch twin of the streaming
    // tumbling aggregation).
    Q(
      "q_window_tumbling",
      (spark, dir) =>
        Q.events(spark, dir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("total"))
          .select(col("w.start").as("w_start"), col("event_type"),
            col("n"), col("total")),
      Some(
        """SELECT date_trunc('hour', ts) AS w_start, event_type,
          |       COUNT(*) AS n,
          |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
          |FROM events GROUP BY 1, 2""".stripMargin
      )
    ),

    // Sliding 1-hour window every 30 minutes: each event lands in
    // exactly 2 epoch-aligned windows.
    Q(
      "q_window_sliding",
      (spark, dir) =>
        Q.events(spark, dir)
          .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").as("w_start"), col("event_type"), col("n")),
      Some(
        """SELECT make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 1800 - i) * 1800)
          |                      * 1000000) AS w_start,
          |       event_type, COUNT(*) AS n
          |FROM events, UNNEST([0, 1]) AS u(i)
          |GROUP BY 1, 2""".stripMargin
      )
    ),

    // As-of join: for each purchase, the user's most recent view at or
    // before the purchase time (single-shuffle union+window operator).
    Q(
      "q_asof_join",
      (spark, dir) => {
        val ev = Q.events(spark, dir)
        AsofJoin.lastTimeBefore(
          probe = ev.filter(col("event_type") === "purchase")
            .select("event_id", "user_id", "ts"),
          build = ev.filter(col("event_type") === "view"),
          keyCol = "user_id", timeCol = "ts", outCol = "last_view_ts")
      },
      Some(
        """SELECT p.event_id, p.user_id, p.ts,
          |       (SELECT max(v.ts) FROM events v
          |        WHERE v.user_id = p.user_id AND v.event_type = 'view'
          |          AND v.ts <= p.ts) AS last_view_ts
          |FROM events p WHERE p.event_type = 'purchase'""".stripMargin
      )
    ),

    // Forward as-of: next view at-or-after each purchase (merge_asof
    // "forward"), same single-shuffle union kernel mirrored.
    Q(
      "q_asof_forward",
      (spark, dir) => {
        val ev = Q.events(spark, dir)
        AsofJoin.firstTimeAfter(
          probe = ev.filter(col("event_type") === "purchase")
            .select("event_id", "user_id", "ts"),
          build = ev.filter(col("event_type") === "view"),
          keyCol = "user_id", timeCol = "ts", outCol = "next_view_ts")
      },
      Some(
        """SELECT p.event_id, p.user_id, p.ts,
          |       (SELECT min(v.ts) FROM events v
          |        WHERE v.user_id = p.user_id AND v.event_type = 'view'
          |          AND v.ts >= p.ts) AS next_view_ts
          |FROM events p WHERE p.event_type = 'purchase'""".stripMargin
      )
    ),

    // Nearest as-of (merge_asof "nearest", ties backward): both
    // directions in one union + one key exchange.
    Q(
      "q_asof_nearest",
      (spark, dir) => {
        val ev = Q.events(spark, dir)
        AsofJoin.nearestTime(
          probe = ev.filter(col("event_type") === "purchase")
            .select("event_id", "user_id", "ts"),
          build = ev.filter(col("event_type") === "view"),
          keyCol = "user_id", timeCol = "ts", outCol = "nearest_view_ts")
      },
      Some(
        """SELECT event_id, user_id, ts,
          |  CASE WHEN back IS NULL THEN fwd
          |       WHEN fwd IS NULL THEN back
          |       WHEN epoch_us(ts) - epoch_us(back) <= epoch_us(fwd) - epoch_us(ts) THEN back
          |       ELSE fwd END AS nearest_view_ts
          |FROM (
          |  SELECT p.event_id, p.user_id, p.ts,
          |    (SELECT max(v.ts) FROM events v
          |     WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts) AS back,
          |    (SELECT min(v.ts) FROM events v
          |     WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts >= p.ts) AS fwd
          |  FROM events p WHERE p.event_type = 'purchase') t""".stripMargin
      )
    ),

    // GROUPING SETS through the SQL frontend (finer than cube/rollup).
    Q(
      "q_grouping_sets",
      (spark, dir) => {
        Q.t(spark, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
        spark.sql(
          """SELECT l_returnflag, l_linestatus,
            |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
            |       COUNT(*) AS n
            |FROM lineitem_gs
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
            |""".stripMargin)
      },
      Some(
        """SELECT l_returnflag, l_linestatus,
          |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          |       COUNT(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))""".stripMargin
      )
    ),

    // Approximate distinct (HLL++): checked against the exact count
    // in-engine (within 10%), so the oracle stays engine-portable.
    Q(
      "q_approx_distinct",
      (spark, dir) =>
        Q.events(spark, dir)
          .groupBy(col("event_type"))
          .agg(
            countDistinct(col("user_id")).as("n_users"),
            approx_count_distinct(col("user_id")).as("n_approx"))
          .select(col("event_type"), col("n_users"),
            (abs(col("n_approx") - col("n_users")) <=
              col("n_users") * lit(0.1)).as("approx_ok")),
      Some(
        """SELECT event_type,
          |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
          |       TRUE AS approx_ok
          |FROM events GROUP BY 1""".stripMargin
      )
    ),

    // RANGE frame over event time: per-user rolling 1-hour sum
    // (interval-bounded frame, vs q_window_running's ROWS frame).
    Q(
      "q_window_range",
      (spark, dir) =>
        Q.events(spark, dir).select(
          col("event_id"), col("user_id"), col("ts"),
          sum(col("value").cast("decimal(18,4)")).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("user_id"))
              .orderBy(col("ts").cast("long"))
              .rangeBetween(-3599, 0))
            .cast("double").as("rolling_1h")),
      Some(
        """SELECT event_id, user_id, ts,
          |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
          |    PARTITION BY user_id ORDER BY CAST(epoch(ts) AS BIGINT)
          |    RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_1h
          |FROM events""".stripMargin
      )
    ),

    // Explode / UDTF-style flattening: corpus term frequencies.
    Q(
      "q_wordcount",
      (spark, dir) =>
        Q.t(spark, dir, "documents")
          .select(explode(split(col("text"), "\\s+")).as("tok"))
          .filter(col("tok") =!= "")
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= 50),
      Some(
        """SELECT tok, COUNT(*) AS cnt
          |FROM (SELECT UNNEST(regexp_split_to_array(text, '\s+')) AS tok
          |      FROM documents)
          |WHERE tok <> ''
          |GROUP BY tok HAVING COUNT(*) >= 50""".stripMargin
      )
    )
  )
}
