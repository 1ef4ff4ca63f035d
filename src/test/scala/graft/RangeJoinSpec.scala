package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketized range join must equal the naive inequality join. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  test("bucketized equals naive on overlapping intervals and edge points") {
    val points = Seq(0.0, 4.9, 5.0, 7.5, 10.0, 23.3, 99.9)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("pid", "p")
    // overlapping + touching intervals, incl. one spanning many buckets
    val intervals = Seq(
      (1L, 0.0, 5.0), (2L, 5.0, 10.0), (3L, 4.0, 8.0), (4L, 0.0, 100.0))
      .toDF("iid", "lo", "hi")

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").as[(Long, Long)].collect().toSet

    val naive = pairs(RangeJoin.pointInIntervalNaive(points, intervals, "p", "lo", "hi"))
    val bucketized = pairs(RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 3.0))
    assert(bucketized == naive)
    // sanity: hi is exclusive, lo inclusive
    assert(naive.contains((2L, 2L)) && !naive.contains((2L, 1L)))
  }

  test("equivalence holds on fixture data with a coarse width") {
    val line = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_linenumber"), col("l_extendedprice").as("p"))
    val bands = spark.range(0, 22).select(
      col("id").as("iid"), (col("id") * 5000.0).as("lo"), ((col("id") + 1) * 5000.0).as("hi"))
    val naive = RangeJoin.pointInIntervalNaive(line, bands, "p", "lo", "hi").count()
    val fast = RangeJoin.pointInInterval(line, bands, "p", "lo", "hi", 7777.0).count()
    assert(naive == fast)
    assert(naive == line.count()) // bands cover the full price range
  }
}
