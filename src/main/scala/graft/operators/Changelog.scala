package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application — folding a keyed changelog of
  * upserts and deletes into a base snapshot. This is the maintenance
  * primitive behind every continuously-updated corpus table (document
  * stores with takedowns, label corrections, re-crawled pages): the
  * snapshot is rewritten from (base ∪ log) by keeping each key's
  * highest-sequence version and dropping keys whose latest version is
  * a tombstone.
  *
  * Scale shape: ONE key-partitioned shuffle over (base ∪ log). The
  * keep-latest ranking is `row_number` over (key, seq desc) filtered
  * to 1, which Spark plans with a map-side (Partial) WindowGroupLimit
  * — each map task forwards at most one candidate row per key below
  * the exchange, so a key with a million changelog entries ships one
  * row, not a million. No broadcast, no driver state; at 100 TB the
  * cost is the one shuffle of the DELTA plus the touched base
  * partitions (pair with partition pruning on the base read when the
  * log's key range is known).
  */
object Changelog {

  /** Apply a changelog to a base snapshot.
    *
    * @param base    current snapshot, at most one row per key, no
    *                `seqCol`/`opCol` columns — treated as version
    *                `Long.MinValue` upserts so any log entry outranks it
    * @param log     change rows: the base's data columns plus `seqCol`
    *                (monotone change sequence — unique per key, as CDC
    *                offsets are) and `opCol` ("U" upsert / "D" delete;
    *                a delete's data columns are ignored)
    * @return the new snapshot: per key the highest-seq version's data
    *         columns; keys whose latest entry is a delete are absent
    */
  def applyLog(
      base: DataFrame,
      log: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String
  ): DataFrame = {
    require(
      !base.columns.contains(seqCol) && !base.columns.contains(opCol),
      s"base snapshot must not carry $seqCol/$opCol")
    val rn = Iterator.iterate("__rn")(_ + "_").dropWhile(log.columns.contains).next()
    val tagged = base
      .withColumn(seqCol, lit(Long.MinValue))
      .withColumn(opCol, lit("U"))
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc)
    tagged
      .unionByName(log)
      .withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1 && col(opCol) =!= "D")
      .drop(rn, seqCol, opCol)
  }

  /** Diff two snapshot VERSIONS of a keyed table — the audit twin of
    * [[applyLog]] (what changed between dataset v1 and v2: the release
    * note every curation cycle owes its consumers). Returns only the
    * difference rows — (key, change ∈ added | removed | changed) —
    * never the unchanged bulk.
    *
    * Scale shape: each side collapses to (key, 32-byte sha-256 digest)
    * MAP-SIDE before the one full-outer key shuffle, so shuffle bytes
    * are ∝ keys, not documents ([[Dedup]]'s digest-not-text
    * discipline); unchanged keys drop in the post-join projection, so
    * the output is ∝ the delta. With both snapshots bucketed on the
    * key the exchange disappears entirely.
    */
  def snapshotDiff(
      before: DataFrame,
      after: DataFrame,
      keyCol: String,
      payloadCol: String
  ): DataFrame = {
    // explicit presence markers: a NULL payload hashes to NULL, which
    // would otherwise be indistinguishable from an absent key (a row
    // going text -> NULL must read 'changed', not 'removed')
    def side(df: DataFrame, h: String, p: String) =
      df.select(col(keyCol).as("key"), sha2(col(payloadCol), 256).as(h),
        lit(true).as(p))
    side(before, "__hb", "__pb")
      .join(side(after, "__ha", "__pa"), Seq("key"), "full_outer")
      .select(col("key"),
        when(col("__pb").isNull, "added")
          .when(col("__pa").isNull, "removed")
          .when(!(col("__ha") <=> col("__hb")), "changed")
          .as("change"))
      .filter(col("change").isNotNull)
  }

  /** Change verdicts for a REFRESH-CRAWL round from the fetch STATUS
    * first (the protocol's own signal), the payload diff second: real
    * refresh crawlers send If-Modified-Since / If-None-Match, and a
    * `304 Not Modified` row IS an unchanged verdict with NO payload
    * to diff — forcing it through a content diff would misread the
    * absent body as 'removed'. Rows with status 304 emit
    * (key, 'unchanged') directly; rows with a 2xx body diff against
    * `prev` via [[snapshotDiff]] (restricted to the keys this round
    * actually re-fetched WITH a body, so conditional-GET keys can't
    * leak into the diff as removals). Other statuses (4xx/5xx — fetch
    * failures) get NO verdict here; the availability layer owns them.
    *
    * Scale shape: one semi-join to scope the diff + snapshotDiff's
    * digest exchange; the 304 arm is map-only — exactly the rows the
    * server saved the crawler from downloading also skip the digest
    * machinery.
    */
  def fetchVerdicts(
      prev: DataFrame,
      fetches: DataFrame,
      keyCol: String,
      payloadCol: String,
      statusCol: String
  ): DataFrame = {
    val ok = fetches
      .filter(col(statusCol) >= 200 && col(statusCol) < 300)
      .select(col(keyCol), col(payloadCol))
    val notModified = fetches
      .filter(col(statusCol) === 304)
      .select(col(keyCol).as("key"), lit("unchanged").as("change"))
    val prevScoped = prev.join(ok.select(col(keyCol)), Seq(keyCol), "left_semi")
    snapshotDiff(prevScoped, ok, keyCol, payloadCol)
      .unionByName(notModified)
  }
}
