package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salting must be result-invariant: salted formulations equal their
  * plain twins on skewed data (one key holding most rows).
  */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  // 10k rows for "hot", a handful for others
  private lazy val skewed = spark.range(10000)
    .select(lit("hot").as("k"), col("id").cast("double").as("v"))
    .union(Seq(("cold1", 1.0), ("cold2", 2.0)).toDF("k", "v"))

  test("salted two-stage sum equals plain groupBy sum") {
    val plain = skewed.groupBy("k").agg(sum("v").as("total"))
      .as[(String, Double)].collect().toMap
    val salted = Skew.saltedSum(skewed, Seq("k"), col("v"), salts = 8)
      .as[(String, Double)].collect().toMap
    assert(salted == plain)
  }

  test("salted join equals plain join, including unmatched-row behavior") {
    val build = Seq(("hot", 10), ("cold1", 20), ("unused", 99)).toDF("k", "w")
    val plain = skewed.join(build, Seq("k"), "inner")
      .agg(count(lit(1)), sum(col("v") * col("w"))).head()
    val salted = Skew.saltedJoin(skewed, build, "k", salts = 8)
      .agg(count(lit(1)), sum(col("v") * col("w"))).head()
    assert(plain == salted)
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // force tiny thresholds so the fixture-scale hot key trips AQE's
    // skew detection, and disable broadcast so the join stays SMJ
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // both join children must be Sort-over-shuffle directly: an
      // aggregate between shuffle and join would break AQE's
      // OptimizeSkewedJoin pattern match
      val big = spark.range(200000)
        .select(lit("hot").as("k"), col("id").cast("double").as("v"))
        .union(Seq(("cold1", 1.0), ("cold2", 2.0)).toDF("k", "v"))
      val right = Seq(("hot", 10.0), ("cold1", 5.0)).toDF("k", "w")
      val joined = big.join(right, Seq("k"))
      // execute THIS plan instance via collect (count()/foreach build
      // separate QueryExecutions and leave joined's plan non-final)
      assert(joined.collect().length == 200001)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
