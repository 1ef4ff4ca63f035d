package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Retrieval-fusion semantics: scale-safe global top-k ranking and
  * reciprocal-rank fusion.
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  test("topKRanked ranks deterministically and plans a parallel top-k") {
    val df = Seq((1L, 0.3), (2L, 0.9), (3L, 0.9), (4L, 0.1))
      .toDF("id", "score")
    val top = Retrieval.topKRanked(df, Seq(col("score").desc, col("id").asc), k = 3)
    val got = top.select("id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(got.toSeq == Seq((2L, 1), (3L, 2), (1L, 3))) // tie 2-3 by id

    // the limit must plan as a parallel per-partition top-k, not a
    // global sort: the single-partition rank window then sees k rows
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("rrfFuse sums 1/(k0+rank) per list; n_lists counts the sources") {
    val lex = Seq((10L, 1), (11L, 2)).toDF("id", "rank")
    val vec = Seq((11L, 1), (12L, 2)).toDF("id", "rank")
    val fused = Retrieval.rrfFuse(Seq("bm25" -> lex, "ann" -> vec), "id")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("rrf"), r.getAs[Long]("n_lists"))).toMap
    assert(fused(10L) == ((1.0 / 61.0, 1L)))
    assert(fused(12L) == ((1.0 / 62.0, 1L)))
    // doc in both lists: ann contribution folds before bm25 (name order)
    assert(fused(11L)._1 == 1.0 / 61.0 + 1.0 / 62.0 && fused(11L)._2 == 2L)
    // found-by-both outranks either single-source doc
    assert(fused(11L)._1 > fused(10L)._1 && fused(11L)._1 > fused(12L)._1)
  }

  test("rrfFuse rejects duplicate list names and empty input") {
    val l = Seq((1L, 1)).toDF("id", "rank")
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq("a" -> l, "a" -> l), "id")
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq.empty, "id")
    }
  }
}
