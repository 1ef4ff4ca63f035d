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
}
