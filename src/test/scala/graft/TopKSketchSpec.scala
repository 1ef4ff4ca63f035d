package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKSketch

/** Heavy-hitters guarantees on skewed data: true heavy items always
  * surface, counts are within the error bound, state stays bounded.
  */
class TopKSketchSpec extends SparkSpec {

  import spark.implicits._

  test("heavy hitters surface with bounded overcount on skewed input") {
    // zipf-ish: "h0" x 4000, "h1" x 2000, "h2" x 1000, 4000 distinct noise
    val rows =
      Seq.fill(4000)("h0") ++ Seq.fill(2000)("h1") ++ Seq.fill(1000)("h2") ++
        (1 to 4000).map(i => s"noise$i")
    val df = scala.util.Random.shuffle(rows).toDF("item").repartition(8)

    val top = df.agg(TopKSketch.approxTopK(col("item"), k = 3, capacity = 64).as("top"))
      .selectExpr("explode(top) AS c").select("c.item", "c.count", "c.err")
      .as[(String, Long, Long)].collect()

    assert(top.map(_._1).toSeq == Seq("h0", "h1", "h2"))
    val exact = Map("h0" -> 4000L, "h1" -> 2000L, "h2" -> 1000L)
    top.foreach { case (item, count, err) =>
      assert(count >= exact(item), s"$item undercounted: $count")
      assert(count - err <= exact(item), s"$item overcount beyond bound")
    }
  }

  test("grouped sketch: per-group top tokens on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = docs.select(col("lang"),
      explode(split(col("text"), "\\s+")).as("tok")).filter(col("tok") =!= "")

    val sketch = toks.groupBy("lang")
      .agg(TopKSketch.approxTopK(col("tok"), k = 5, capacity = 256).as("top"))
      .selectExpr("lang", "explode(top) AS c").select("lang", "c.item")
      .as[(String, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)

    // exact top-3 per language must be recalled by the capacity-256 sketch
    val exact = toks.groupBy("lang", "tok").count()
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("count").desc, col("tok"))))
      .filter(col("r") <= 3)
      .select("lang", "tok").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)

    exact.foreach { case (lang, toks3) =>
      assert(toks3.subsetOf(sketch(lang)), s"$lang: sketch missed ${toks3 -- sketch(lang)}")
    }
  }
}
