package graft

import org.apache.spark.sql.functions._

import graft.operators.Frontier

/** Crawl-frontier scheduling: per-host politeness slots, the literal
  * delay lookup, host-hash worker sharding, and the one-exchange plan
  * shape.
  */
class FrontierSpec extends SparkSpec {
  import spark.implicits._

  private val frontier = Seq(
    ("a.com", "http://a.com/1"), ("a.com", "http://a.com/3"),
    ("a.com", "http://a.com/2"),
    ("b.com", "http://b.com/x"), ("b.com", "http://b.com/y"),
    ("c.com", "http://c.com/only")
  ).toDF("host", "canon")

  private val delays = Seq("a.com" -> 1000L, "b.com" -> 250L)

  test("schedule: slots are a dense 0..n-1 rank per host in canon order") {
    val got = Frontier.schedule(frontier, delays, defaultDelayMs = 500L, workers = 4)
      .collect().map(r => (r.getAs[String]("canon"),
        r.getAs[Long]("slot"), r.getAs[Long]("fetch_at_ms"))).toSet
    assert(got == Set(
      ("http://a.com/1", 0L, 0L), ("http://a.com/2", 1L, 1000L),
      ("http://a.com/3", 2L, 2000L),
      ("http://b.com/x", 0L, 0L), ("http://b.com/y", 1L, 250L),
      // c.com has no directive: the scheduler default applies
      ("http://c.com/only", 0L, 0L)))
  }

  test("schedule: worker shard is stable per host and within [0, workers)") {
    val rows = Frontier.schedule(frontier, delays, 500L, workers = 4)
      .select(col("host"), col("worker")).collect()
      .map(r => (r.getAs[String]("host"), r.getAs[Int]("worker")))
    assert(rows.forall { case (_, w) => w >= 0 && w < 4 })
    // one worker per host — politeness state never splits
    assert(rows.groupBy(_._1).values.forall(_.map(_._2).distinct.size == 1))
    // and the assignment is the documented polynomial hash, so a
    // re-run (or another engine) shards identically
    val expected = Frontier.schedule(frontier, delays, 500L, workers = 4)
      .select(col("host"), col("worker")).distinct().collect()
      .map(r => (r.getAs[String]("host"), r.getAs[Int]("worker"))).toSet
    assert(rows.toSet == expected)
  }

  test("schedule: empty delay table means every host takes the default") {
    val got = Frontier.schedule(frontier, Nil, defaultDelayMs = 100L, workers = 2)
      .filter(col("host") === "a.com")
      .collect().map(_.getAs[Long]("fetch_at_ms")).sorted.toSeq
    assert(got == Seq(0L, 100L, 200L))
  }

  test("schedule: exactly ONE exchange — the per-host window") {
    graft.queries.Q.requireMaxShuffles(
      Frontier.schedule(frontier, delays, 500L, workers = 4), 1)
  }

  test("schedule: priority column orders slots DESC before the URL tiebreak") {
    val pri = Seq(
      ("a.com", "http://a.com/low", 10L),
      ("a.com", "http://a.com/hi", 90L),
      ("a.com", "http://a.com/alsohi", 90L) // tie -> canon order
    ).toDF("host", "canon", "priority")
    val got = Frontier.schedule(pri, delays, 500L, workers = 2,
      priorityCol = Some("priority"))
      .collect().map(r => r.getAs[String]("canon") -> r.getAs[Long]("slot")).toMap
    assert(got == Map(
      "http://a.com/alsohi" -> 0L, "http://a.com/hi" -> 1L,
      "http://a.com/low" -> 2L), got.toString)
    // still exactly one exchange
    graft.queries.Q.requireMaxShuffles(
      Frontier.schedule(pri, delays, 500L, 2, priorityCol = Some("priority")), 1)
  }

  test("schedule: duplicate domains in the delay table collapse to the max") {
    // merged robots refreshes can repeat a domain — the literal map
    // must not throw DUPLICATED_MAP_KEY; the polite MAX wins
    val got = Frontier.schedule(frontier,
      Seq("a.com" -> 1000L, "a.com" -> 2000L, "b.com" -> 250L), 500L, workers = 2)
      .filter(col("host") === "a.com")
      .collect().map(_.getAs[Long]("fetch_at_ms")).sorted.toSeq
    assert(got == Seq(0L, 2000L, 4000L))
  }

  test("revisitSchedule: exponential backoff on unchanged streaks, capped; one exchange") {
    val hist = Seq(
      // hot page: every fetch changed -> streak 0, base interval
      ("u/hot", 100L, true), ("u/hot", 200L, true), ("u/hot", 300L, true),
      // cooling page: last change at the 2nd of 4 fetches -> streak 2
      ("u/cool", 100L, true), ("u/cool", 200L, true),
      ("u/cool", 300L, false), ("u/cool", 400L, false),
      // dormant page: never changed across 12 fetches -> cap
      ("u/dead", 100L, false), ("u/dead", 200L, false), ("u/dead", 300L, false),
      ("u/dead", 400L, false), ("u/dead", 500L, false), ("u/dead", 600L, false),
      ("u/dead", 700L, false), ("u/dead", 800L, false), ("u/dead", 900L, false),
      ("u/dead", 1000L, false), ("u/dead", 1100L, false), ("u/dead", 1200L, false)
    ).toDF("canon", "fetch_ms", "changed")
    val got = Frontier.revisitSchedule(hist, baseMs = 100L, maxMs = 10000L)
      .collect().map(r => r.getAs[String]("canon") ->
        ((r.getAs[Long]("last_fetch_ms"), r.getAs[Long]("unchanged_streak"),
          r.getAs[Long]("interval_ms"), r.getAs[Long]("next_fetch_ms")))).toMap
    assert(got("u/hot") == ((300L, 0L, 100L, 400L)))
    assert(got("u/cool") == ((400L, 2L, 400L, 800L)))
    // 12 unchanged fetches: 100 << 12 = 409600, capped at 10000
    assert(got("u/dead") == ((1200L, 12L, 10000L, 11200L)))
    graft.queries.Q.requireMaxShuffles(
      Frontier.revisitSchedule(hist, 100L, 10000L), 1)
    // shift-overflow guard: a streak far past the cap exponent must
    // never wrap negative
    val long = (0 until 80).map(i => ("u/x", i * 10L, false)).toDF("canon", "fetch_ms", "changed")
    val x = Frontier.revisitSchedule(long, 1L, Long.MaxValue / 4).head()
    assert(x.getAs[Long]("interval_ms") > 0L)
    // tied timestamps are deterministic: changed orders LAST (wins
    // recency — the conservative re-fetch-sooner reading), so the
    // streak is 0 regardless of input row order
    for (rows <- Seq(
      Seq(("u/t", 100L, false), ("u/t", 100L, true)),
      Seq(("u/t", 100L, true), ("u/t", 100L, false)))) {
      val t = Frontier.revisitSchedule(
        rows.toDF("canon", "fetch_ms", "changed"), 100L, 10000L).head()
      assert(t.getAs[Long]("unchanged_streak") == 0L &&
        t.getAs[Long]("interval_ms") == 100L, rows.toString)
    }
  }

  test("scheduleJoined: under the guard the delay frame collects + broadcasts — literal parity, one exchange") {
    val delayDf = delays.toDF("domain", "delay_ms")
    val joined = Frontier.scheduleJoined(frontier, delayDf, defaultDelayMs = 500L, workers = 4)
    val literal = Frontier.schedule(frontier, delays, defaultDelayMs = 500L, workers = 4)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[String]("canon"), r.getAs[Long]("slot"),
        r.getAs[Long]("fetch_at_ms"), r.getAs[Int]("worker"))).toSet
    assert(rows(joined) == rows(literal))
    assert(joined.columns.toSeq == literal.columns.toSeq)
    // the guarded side is a driver-local relation riding a broadcast:
    // the lookup costs the frontier NOTHING — still exactly one
    // exchange (the per-host window), plus the typed broadcast join
    graft.queries.Q.requireBroadcastJoin(joined)
    graft.queries.Q.requireMaxShuffles(joined, 1)
    // duplicate domains collapse to the MAX exactly like the literal
    // path — and never fan out frontier rows
    val dup = Frontier.scheduleJoined(frontier,
      Seq("a.com" -> 1000L, "a.com" -> 2000L, "b.com" -> 250L)
        .toDF("domain", "delay_ms"), 500L, workers = 2)
    assert(dup.count() == frontier.count())
    val dupA = dup.filter(col("host") === "a.com")
      .collect().map(_.getAs[Long]("fetch_at_ms")).sorted.toSeq
    assert(dupA == Seq(0L, 2000L, 4000L), dupA.toString)
  }

  test("scheduleJoined: past the guard, 1e5 domains ride a shuffle join the window reuses — no plan literals") {
    // the CreateMap-literal seam this form replaces: a web frontier has
    // 10^7-10^8 registrable domains with crawl-delays, where a literal
    // map explodes plan size and driver memory. Force the worst case:
    // broadcast disabled entirely, guard far below the table.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val delayDf = spark.range(0, 100000).select(
        concat(lit("h"), col("id"), lit(".com")).as("domain"),
        (col("id") % 7 * 100L + 100L).as("delay_ms"))
      val fr = spark.range(0, 2000).select(
        concat(lit("h"), col("id") % 1000, lit(".com")).as("host"),
        concat(lit("http://h"), col("id") % 1000, lit(".com/p/"), col("id")).as("canon"))
        .unionByName(Seq(("nodelay.com", "http://nodelay.com/p"))
          .toDF("host", "canon"))
      val out = Frontier.scheduleJoined(fr, delayDf, defaultDelayMs = 500L,
        workers = 8, maxBroadcastDomains = 1000L)
      // the join shuffles BOTH sides on the host key and the per-host
      // window REUSES that partitioning: the frontier crosses the wire
      // once — two exchanges total, none of them the frontier twice
      graft.queries.Q.requireMaxShuffles(out, 2)
      assert(graft.queries.Q.planNodes(out).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]))
      // and the delay table never enters the plan TEXT — the literal
      // seam is the regression target
      assert(!out.queryExecution.executedPlan.toString.contains("h77777.com"))
      // sampled closed-form: host h3.com delay = 3%7*100+100 = 400;
      // its two urls order ".../p/1003" < ".../p/3" (string order)
      val h3 = out.filter(col("host") === "h3.com").collect()
        .map(r => r.getAs[String]("canon") -> r.getAs[Long]("fetch_at_ms")).toMap
      assert(h3 == Map("http://h3.com/p/1003" -> 0L, "http://h3.com/p/3" -> 400L), h3.toString)
      // absent domain takes the scheduler default
      val nd = out.filter(col("host") === "nodelay.com").head()
      assert(nd.getAs[Long]("fetch_at_ms") == 0L && nd.getAs[Long]("slot") == 0L)
      val h9 = out.filter(col("host") === "h9.com").collect()
        .map(_.getAs[Long]("fetch_at_ms")).sorted.toSeq
      assert(h9 == Seq(0L, 300L), h9.toString) // 9%7*100+100 = 300
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("schedule: contract guards") {
    intercept[IllegalArgumentException] {
      Frontier.schedule(frontier, delays, 500L, workers = 0)
    }
    intercept[IllegalArgumentException] {
      Frontier.schedule(frontier, delays, -1L, workers = 4)
    }
  }
}
