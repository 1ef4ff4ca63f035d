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

  test("CMS heavy-hitter screen never misses: est >= threshold for every true-heavy token") {
    import graft.operators.{Sketch, TextAnalysis}
    // skewed corpus: "hot" dominates, "warm" is mid, the rest is noise
    val docs = (
      (1L to 40L).map(i => (i, "hot hot hot warm")) ++
        (41L to 80L).map(i => (i, s"n$i m$i hot"))
    ).toDF("doc_id", "text")
    val w = 32 // DELIBERATELY tiny: heavy collisions, to stress one-sidedness
    val arr = Sketch.countMinArrays(Sketch.countMin(docs, "text", w), w)
    val toks = docs.select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    val exact = toks.groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // token mass rides the sketch: any row's cell sum IS the count
    assert(arr(0).sum == exact.values.sum)
    for (thresh <- Seq(1L, 10L, 40L, 120L)) {
      val passed = toks
        .filter(Sketch.countMinEstimate(col("token"), arr, w) >= thresh)
        .select("token").distinct().collect().map(_.getString(0)).toSet
      val trueHeavy = exact.filter(_._2 >= thresh).keySet
      assert(trueHeavy.subsetOf(passed),
        s"thresh=$thresh: CMS screen missed ${trueHeavy -- passed} — one-sided error violated")
    }
    // and the full topk chain returns the exact heavy hitters
    val thresh = 40L
    val out = toks
      .filter(Sketch.countMinEstimate(col("token"), arr, w) >= thresh)
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thresh)
      .orderBy(col("cnt").desc, col("token").asc).limit(5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out == Seq("hot" -> 160L, "warm" -> 40L), out.toString)
  }
}
