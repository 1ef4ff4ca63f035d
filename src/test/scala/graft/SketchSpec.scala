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

  // --- HyperLogLog -------------------------------------------------------

  private def keys(n: Int): org.apache.spark.sql.DataFrame =
    (0 until n).map(i => s"key$i").toDF("k")

  private def regs(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    graft.operators.Sketch.hllRegisters(df, "k").collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("register")).toMap

  test("hllRegisters: bucket and rank match the closed-form reference per token") {
    val expected = (0 until 200).map { i =>
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"key$i"), 42L)
      val v = (h >>> 6) & 0xFFFFFFFFL
      val rho = if (v == 0L) 33L else 33L - (64 - java.lang.Long.numberOfLeadingZeros(v))
      (h & 63L, rho)
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    assert(regs(keys(200)) == expected)
  }

  test("hllMerge: per-half register sets merge to exactly the full build") {
    val df = keys(1000).withColumn("__i", monotonically_increasing_id())
    val full = regs(keys(1000))
    val merged = graft.operators.Sketch.hllMerge(
      graft.operators.Sketch.hllRegisters(df.filter($"__i" % 2 === 0), "k"),
      graft.operators.Sketch.hllRegisters(df.filter($"__i" % 2 === 1), "k"))
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("register")).toMap
    assert(merged == full)
    // duplicate-absorbing: re-merging the full set with itself is a no-op
    val idem = graft.operators.Sketch.hllMerge(
      graft.operators.Sketch.hllRegisters(df, "k"),
      graft.operators.Sketch.hllRegisters(df, "k"))
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("register")).toMap
    assert(idem == full)
  }

  private def estRow(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    val r = graft.operators.Sketch.hllEstimate(
      graft.operators.Sketch.hllRegisters(df, "k")).head()
    (r.getAs[Long]("est"), r.getAs[String]("method"))
  }

  test("hllEstimate: raw-regime estimates land within 3 RSE across cardinalities") {
    for (n <- Seq(1000, 10000, 50000)) {
      val (est, method) = estRow(keys(n))
      assert(method == "raw", s"n=$n fired $method")
      val rse = 1.04 / math.sqrt(graft.operators.Sketch.HllBuckets.toDouble)
      assert(math.abs(est - n).toDouble / n <= 3 * rse,
        s"n=$n est=$est outside 3·RSE")
    }
  }

  test("hllEstimate: small cardinalities take the linear-counting branch and stay tight") {
    for (n <- Seq(1, 10, 60)) {
      val (est, method) = estRow(keys(n))
      assert(method == "linear", s"n=$n fired $method")
      assert(math.abs(est - n) <= math.max(2L, n / 4L), s"n=$n est=$est")
    }
    // duplicates never move the registers: 10 distinct keys repeated
    // 50x estimate exactly like 10 distinct keys
    val dup = (0 until 500).map(i => s"key${i % 10}").toDF("k")
    assert(estRow(dup) == estRow(keys(10)))
  }
}
