package graft

import org.apache.spark.sql.functions._

/** Count-Min sketch properties: conservation (every hash row holds the
  * full token mass), mergeability (per-half merge == full build,
  * cell-exact), and the one-sided error guarantee (estimates never
  * undercount any token).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 60L)
    .map(i => (i, s"tok${i % 7} tok${i % 3} filler$i"))
    .toDF("id", "text")

  private def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
    df.collect().map(r =>
      (r.getAs[Int]("row"), r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt")).toMap

  test("countMin: each hash row conserves the total token mass") {
    val sk = cells(graft.operators.Sketch.countMin(docs, "text", 32))
    val total = 60L * 3 // three tokens per doc
    for (i <- graft.operators.Sketch.CmsMults.indices)
      assert(sk.collect { case ((r, _), c) if r == i => c }.sum == total, s"row $i")
  }

  test("countMin: per-half sketches merged equal the full build cell-exactly") {
    val full = cells(graft.operators.Sketch.countMin(docs, "text", 32))
    val merged = cells(graft.operators.Sketch.countMinMerge(
      graft.operators.Sketch.countMin(docs.filter($"id" % 2 === 0), "text", 32),
      graft.operators.Sketch.countMin(docs.filter($"id" % 2 === 1), "text", 32)))
    assert(merged == full)
  }

  test("countMin: estimates never undercount ANY token (one-sided error)") {
    val sk = graft.operators.Sketch.countMinArrays(
      graft.operators.Sketch.countMin(docs, "text", 32), 32)
    val checked = docs
      .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .withColumn("e", graft.operators.Sketch.countMinEstimate(col("t"), sk, 32))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      assert(r.getAs[Long]("e") >= r.getAs[Long]("c"),
        s"undercount for ${r.getAs[String]("t")}: ${r.getAs[Long]("e")} < ${r.getAs[Long]("c")}")
    }
    // tok0 (29 occurrences: 9 via i%7==0 plus 20 via i%3==0) estimates
    // at least its true mass; every estimate is bounded by the per-row
    // total mass (180 = 60 docs x 3 tokens), since no cell can exceed
    // its row's sum
    assert(checked.map(_.getAs[Long]("e")).max <= 180L)
  }
}
