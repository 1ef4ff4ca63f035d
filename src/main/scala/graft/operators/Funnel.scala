package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: for each user, the earliest time each stage
  * of an event sequence was reached, where stage i+1 must occur
  * STRICTLY AFTER the time stage i was reached (the product-analytics
  * "conversion funnel", and the reference's sessionization sibling —
  * same per-user event-time grouping, different aggregate).
  *
  * Single shuffle: every stage time is a windowed conditional min over
  * the same user partitioning, and the final one-row-per-user collapse
  * reuses that partitioning (no second exchange). Stage count is
  * static, so the plan is k window passes over one sort — at 100 TB
  * this is one key-shuffle of the event log, same as sessionization.
  */
object Funnel {

  /** Returns (userCol, t1..tk timestamps, n_steps int). A stage's time
    * is NULL (and n_steps stops) when no qualifying event exists. Users
    * appear once each, including those who completed zero stages.
    */
  def steps(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]
  ): DataFrame = {
    require(stages.nonEmpty, "Funnel.steps: need at least one stage")
    val w = Window.partitionBy(col(userCol))
    val staged = stages.zipWithIndex.foldLeft(
      df.select(col(userCol), col(tsCol).as("__ts"), col(typeCol).as("__et"))
    ) { case (acc, (stage, i)) =>
      val cond =
        if (i == 0) col("__et") === stage
        else col("__et") === stage && col("__ts") > col(s"t$i")
      acc.withColumn(s"t${i + 1}", min(when(cond, col("__ts"))).over(w))
    }
    // in-order fold nests earlier stages inside later ones, so the
    // OUTERMOST test is the deepest stage — the max completed stage
    // wins (t_{i+1} non-null implies t_i non-null)
    val nSteps = stages.indices.foldLeft(lit(0)) { case (acc, i) =>
      when(col(s"t${i + 1}").isNotNull, lit(i + 1)).otherwise(acc)
    }
    val aggs = stages.indices.map(i => first(col(s"t${i + 1}")).as(s"t${i + 1}")) :+
      first(col("n_steps")).as("n_steps")
    staged
      .withColumn("n_steps", nSteps)
      .groupBy(col(userCol))
      .agg(aggs.head, aggs.tail: _*)
  }
}
