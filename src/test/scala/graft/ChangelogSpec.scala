package graft

import org.apache.spark.sql.functions._

import graft.operators.Changelog
import graft.queries.Q

/** CDC changelog application: keep-latest-version semantics, tombstone
  * drop, insert of log-only keys, and the map-side WindowGroupLimit
  * plan fact that makes hot keys safe at scale.
  */
class ChangelogSpec extends SparkSpec {

  import spark.implicits._

  private def base =
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "v", "x")

  test("latest upsert wins; tombstoned key drops; untouched key survives") {
    val log = Seq(
      (1L, "a1", 11, 1L, "U"),
      (1L, "a2", 12, 2L, "U"),
      (2L, "xx", 0, 5L, "D"),
      (4L, "new", 40, 1L, "U") // insert: key absent from the base
    ).toDF("k", "v", "x", "seq", "op")
    val out = Changelog.applyLog(base, log, Seq("k"), "seq", "op")
      .as[(Long, String, Int)].collect().toSet
    assert(out == Set((1L, "a2", 12), (3L, "c", 30), (4L, "new", 40)))
  }

  test("a delete followed by a later upsert resurrects the key") {
    val log = Seq(
      (3L, "zz", 0, 1L, "D"),
      (3L, "c2", 31, 2L, "U")
    ).toDF("k", "v", "x", "seq", "op")
    val out = Changelog.applyLog(base, log, Seq("k"), "seq", "op")
      .as[(Long, String, Int)].collect().toSet
    assert(out == Set((1L, "a", 10), (2L, "b", 20), (3L, "c2", 31)))
  }

  test("empty log returns the base unchanged") {
    val log = Seq.empty[(Long, String, Int, Long, String)]
      .toDF("k", "v", "x", "seq", "op")
    val out = Changelog.applyLog(base, log, Seq("k"), "seq", "op")
      .as[(Long, String, Int)].collect().toSet
    assert(out == Set((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)))
  }

  test("base carrying the seq/op columns is rejected") {
    val bad = base.withColumn("seq", lit(0L))
    val log = Seq((1L, "a1", 11, 1L, "U")).toDF("k", "v", "x", "seq", "op")
    intercept[IllegalArgumentException] {
      Changelog.applyLog(bad, log, Seq("k"), "seq", "op")
    }
  }

  test("keep-latest ranking plans a map-side (Partial) WindowGroupLimit") {
    val log = Seq((1L, "a1", 11, 1L, "U")).toDF("k", "v", "x", "seq", "op")
    val out = Changelog.applyLog(base, log, Seq("k"), "seq", "op")
    out.count(): Unit
    Q.requireMapSideGroupLimit(out, 1)
  }

  test("snapshotDiff: classifies added/removed/changed, never emits the unchanged bulk") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "t")
    val v2 = Seq((1L, "a"), (2L, "B2"), (4L, "d"), (5L, "e")).toDF("k", "t")
    val got = Changelog.snapshotDiff(v1, v2, "k", "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 5L -> "added"))
    // identical snapshots diff to empty — the unchanged bulk never
    // reaches the output (the projection drops it, not a consumer)
    assert(Changelog.snapshotDiff(v1, v1, "k", "t").isEmpty)
    // NULL payloads are values, not absences: text -> NULL is changed,
    // NULL -> text is changed, NULL -> NULL is unchanged
    val nb = Seq((1L, "a"), (2L, null: String), (3L, null: String)).toDF("k", "t")
    val na = Seq((1L, null: String), (2L, "b"), (3L, null: String)).toDF("k", "t")
    val nulls = Changelog.snapshotDiff(nb, na, "k", "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nulls == Map(1L -> "changed", 2L -> "changed"))
    // applyLog/diff closure: diffing base against applyLog(base, log)
    // recovers exactly the log's effect
    val log = Seq((2L, "B2", 1L, "U"), (3L, "x", 2L, "D"), (5L, "e", 3L, "U"))
      .toDF("k", "t", "seq", "op")
    val applied = Changelog.applyLog(v1, log, Seq("k"), "seq", "op")
    val viaLog = Changelog.snapshotDiff(v1, applied, "k", "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaLog == Map(2L -> "changed", 3L -> "removed", 5L -> "added"))
  }

  test("fetchVerdicts: 304 IS the unchanged verdict; 2xx bodies diff; failures get none") {
    import spark.implicits._
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("k", "t")
    val fetches = Seq(
      (1L, 200, "a"),            // re-fetched, equal → no diff row
      (2L, 200, "b CHANGED"),    // re-fetched, differs → changed
      (3L, 304, null: String),   // conditional GET: unchanged, NO body
      (4L, 503, null: String),   // fetch failure: no verdict here
      (6L, 200, "new page"))     // never seen → added
      .toDF("k", "status", "t")
    val got = Changelog.fetchVerdicts(prev, fetches, "k", "t", "status")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the 304 row must NOT read as 'removed' (the naive diff would),
    // and the 503/never-refetched keys (4, 5) get no verdict at all
    assert(got == Map(2L -> "changed", 3L -> "unchanged", 6L -> "added"))
  }

  test("fetchVerdicts: one verdict per key on 2xx+304 races; first-seen 304 gets none") {
    import spark.implicits._
    val prev = Seq((1L, "a"), (2L, "b")).toDF("k", "t")
    val fetches = Seq(
      (1L, 304, null: String), // retry race: the key ALSO has a 2xx row...
      (1L, 200, "a CHANGED"),  // ...whose body is the fresher signal — wins
      (2L, 304, null: String), // clean conditional GET → unchanged
      (9L, 304, null: String)) // 304 with NO prior snapshot → no verdict
      .toDF("k", "status", "t")
    val got = Changelog.fetchVerdicts(prev, fetches, "k", "t", "status")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // exactly one verdict per key — no conflicting duplicates
    assert(got.length == got.map(_._1).distinct.length)
    assert(got.toMap == Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("conditionalFetchPlan: last-known validators persist, update, and gate the plan") {
    import spark.implicits._
    val hist = Seq(
      // key 1: etag in round 1, a 304-ish round 2 with NO validators —
      // the held tag persists ("last known", not "last seen")
      (1L, 100L, "W/\"e1\"", null: String),
      (1L, 200L, null: String, null: String),
      // key 2: etag replaced by a newer row
      (2L, 100L, "W/\"e2a\"", null: String),
      (2L, 200L, "W/\"e2b\"", null: String),
      // key 3: only Last-Modified -> If-Modified-Since revalidation
      (3L, 100L, null: String, "Mon, 01 Jan 2026"),
      // key 4: no validators ever -> full fetch
      (4L, 100L, null: String, null: String),
      // key 5: both validators, from different rounds
      (5L, 100L, null: String, "Tue, 02 Jan 2026"),
      (5L, 200L, "W/\"e5\"", null: String)
    ).toDF("k", "t", "etag", "lm")
    val plan = Changelog.conditionalFetchPlan(hist, "k", "t", "etag", "lm")
    Q.requireMaxShuffles(plan, 1)
    val got = plan.collect().map(r => r.getAs[Long]("key") ->
      ((r.getAs[String]("if_none_match"), r.getAs[String]("if_modified_since"),
        r.getAs[String]("plan")))).toMap
    assert(got(1L) == (("W/\"e1\"", null, "revalidate")))
    assert(got(2L) == (("W/\"e2b\"", null, "revalidate")))
    assert(got(3L) == ((null, "Mon, 01 Jan 2026", "revalidate")))
    assert(got(4L) == ((null, null, "full")))
    assert(got(5L) == (("W/\"e5\"", "Tue, 02 Jan 2026", "revalidate")))
  }
}
