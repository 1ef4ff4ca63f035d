package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomPrune

/** Bloom-pruned join: exact equality with the plain join (false
  * positives must be removed by the join) and the plan property that
  * justifies it — the probe scan carries the might_contain filter
  * BEFORE the join.
  */
class BloomPruneSpec extends SparkSpec {

  import spark.implicits._

  private lazy val probe = (0L until 5000L).map(i => (i % 997, i)).toDF("k", "payload")
  private lazy val build = (0L until 997L by 13L).toDF("k").withColumn("tag", col("k") * 2)

  test("pruned join equals the plain join exactly") {
    val pruned = BloomPrune.prunedJoin(probe, build, "k", "k")
      .select(probe("k"), col("payload"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = probe.join(build.withColumnRenamed("k", "bk"), col("k") === col("bk"))
      .select(col("k"), col("payload"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pruned == plain)
    assert(plain.nonEmpty)
  }

  test("the might_contain filter sits on the probe side, below the join") {
    val plan = BloomPrune.prunedJoin(probe, build, "k", "k")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom filter in plan:\n$plan")
    // the filter must reference the probe scan, not the join output:
    // in the optimized plan the Filter node sits under the Join
    val joinIdx = plan.indexOf("Join")
    val mcIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0 && mcIdx > joinIdx,
      s"might_contain not under the join:\n$plan")
  }
}
