package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual levers for when AQE's
  * runtime skew-join splitting isn't available (streaming) or the skew
  * is in an aggregation's state rather than its partitions.
  *
  * Results are identical to the unsalted formulations (pinned by spec);
  * only the physical distribution changes: a key that would land on one
  * executor is spread across `salts` partitions.
  */
object Skew {

  /** Two-stage salted aggregation: partial aggregate on (key, salt),
    * final aggregate on key. Useful when per-key partial state is too
    * large for one task (e.g. giant `collect_set`/distinct state on a
    * hot key) — plain sums already get map-side combine from Catalyst
    * and don't need this.
    *
    * The salt spreads rows of the same key round-robin-ish via the
    * physical row id; its value never reaches the result.
    */
  def saltedSum(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: Column,
      salts: Int
  ): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(valueCol).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as("total"))
  }

  /** Salted equi-join for a skewed probe side: probe rows get a salt in
    * [0, salts), the build side is replicated once per salt value, and
    * the join key becomes (key, salt) — a hot key's rows spread over
    * `salts` tasks instead of one. Build-side cost: ×salts rows
    * (use only when build is small-ish but too big / too skewed to
    * broadcast outright).
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"
  ): DataFrame = {
    // right/full-outer would emit each unmatched build row once per
    // salt replica; only probe-preserving join types are sound here
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")(normalized),
      s"saltedJoin: build side is replicated; joinType '$joinType' would duplicate unmatched build rows")
    val saltedProbe = probe
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val saltedBuild = build
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedProbe
      .join(saltedBuild, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
