package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order correctness (against a reference bit-interleave) and the
  * locality property that justifies the layout: a z-sorted partition
  * covers compact ranges of BOTH source columns.
  */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  private def refInterleave(x: Long, y: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 32) {
      out |= ((x >>> i) & 1L) << (2 * i)
      out |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  test("zValue matches the reference bit-interleave, incl. 32-bit extremes") {
    val cases = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (123456L, 654321L),
      (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL), (0xFFFFFFFFL, 0xFFFFFFFFL),
      (0x80000000L, 0x7FFFFFFFL))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == refInterleave(x, y), s"x=$x y=$y")
    }
  }

  test("property: zValue is monotone along each axis with the other fixed") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val coords = Gen.listOfN(60, Gen.choose(0L, 0xFFFFFFFFL))
      .apply(Gen.Parameters.default, Seed(42L)).get.sorted.distinct
    val df = coords.map(c => (c, 7L, c)).toDF("x", "fixed", "orig")
    val zx = df.select(Layout.zValue(col("x"), col("fixed")).as("z"), col("orig"))
      .collect().sortBy(_.getLong(1)).map(_.getLong(0))
    // unsigned comparison (bit 63 can be set when y's bit 31 is — here y=7, so plain)
    assert(zx.toSeq == zx.sorted.toSeq, "z not monotone in x")
    val zy = df.select(Layout.zValue(col("fixed"), col("x")).as("z"), col("orig"))
      .collect().sortBy(_.getLong(1)).map(r => r.getLong(0) ^ Long.MinValue) // unsigned order
    assert(zy.toSeq == zy.sorted.toSeq, "z not monotone in y (unsigned)")
  }

  test("zValue ignores bits above 32 (documented domain)") {
    val got = Seq((0x100000001L, 2L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"))).as[Long].head()
    assert(got == refInterleave(1L, 2L))
  }

  test("compactionGroups bins contiguous files to ~target bytes per partition") {
    val files = Seq(
      ("a", 1L, 40L), ("a", 2L, 40L), ("a", 3L, 40L), // 40+40 < 100, third crosses
      ("a", 4L, 250L), // oversized file: own group
      ("a", 5L, 10L),
      ("b", 1L, 10L)
    ).toDF("dir", "f", "bytes")
    val out = graft.operators.Layout
      .compactionGroups(files, "dir", "f", "bytes", targetBytes = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out(("a", 1L)) == 0L && out(("a", 2L)) == 0L) // start offsets 0, 40
    assert(out(("a", 3L)) == 0L) // starts at 80 — still bin 0
    assert(out(("a", 4L)) == 1L) // starts at 120
    assert(out(("a", 5L)) == 3L) // starts at 370 — after the oversized file
    assert(out(("b", 1L)) == 0L) // partitions bin independently
  }

  test("zOrderBy partitions cover compact ranges of both columns") {
    val n = 1 << 12
    // a 64x64 grid, shuffled input order
    val grid = (0 until n).map(i => ((i * 2654435761L) % 64, (i * 40503L) % 64))
      .toDF("x", "y")
    val parts = Layout.zOrderBy(grid, col("x"), col("y"), numPartitions = 16)
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy("p")
      .agg(count(lit(1)).as("cnt"),
        (max("x") - min("x")).as("xspan"), (max("y") - min("y")).as("yspan"))
      .collect()
    assert(parts.length > 4)
    // each roughly-equal partition of a 64x64 z-curve covers a bounded
    // sub-square, far below the full 63-wide span on both axes at once
    parts.foreach { r =>
      val (xspan, yspan) = (r.getAs[Long]("xspan"), r.getAs[Long]("yspan"))
      assert(xspan.min(yspan) <= 32, s"partition spans x=$xspan y=$yspan — no 2-D locality")
    }
  }
}
