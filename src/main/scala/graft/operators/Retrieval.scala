package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-fusion operators: global top-k ranking and reciprocal-rank
  * fusion — the glue of a hybrid lexical+vector retriever
  * ([[TextAnalysis.bm25]] supplies the lexical ranks, [[Similarity]]'s
  * ANN operators the vector ranks).
  *
  * Reference context: the reference pipeline has no retrieval surface
  * at all (SURVEY.md §2 "absent" list) — north-star extension for
  * RAG-style data pipelines.
  */
object Retrieval {

  /** Global top-k with EXPLICIT ranks, scale-safely: `orderBy(...)
    * .limit(k)` plans as a parallel per-partition top-k
    * (TakeOrderedAndProject — no global sort, no single-task pass over
    * the corpus); the explicit rank window then runs over the k
    * surviving rows only, so its single partition is bounded by k, not
    * by the data. (Ranking the corpus THEN filtering would put every
    * row through one task — the anti-pattern this helper exists to
    * avoid.) Include a unique tie-break column in `order` so ranks are
    * deterministic.
    */
  def topKRanked(
      df: DataFrame,
      order: Seq[Column],
      k: Int,
      rankCol: String = "rank"
  ): DataFrame = {
    require(!df.columns.contains(rankCol),
      s"topKRanked: input already has a '$rankCol' column; pass a different rankCol")
    df.orderBy(order: _*).limit(k)
      .withColumn(rankCol, row_number().over(Window.orderBy(order: _*)))
  }

  /** Reciprocal-rank fusion of named ranked lists:
    * rrf(d) = Σ_{lists containing d} 1/(k0 + rank_list(d)) — the
    * standard score-free way to combine heterogeneous retrievers (BM25
    * ranks and cosine ranks are not on a common scale; ranks are).
    * Output: (idCol, rrf, n_lists) — n_lists is how many retrievers
    * surfaced the doc, a useful confidence signal on its own.
    *
    * Deterministic by construction: each contribution is one IEEE
    * division of exact small integers and the per-doc sum folds in
    * list-name order, so fused scores are bit-reproducible across
    * engines (oracle-gated by q_hybrid_retrieval). Lists are already
    * top-k-bounded, so the union and the (id)-keyed aggregation move
    * at most Σk rows — cost is independent of corpus size.
    */
  def rrfFuse(
      lists: Seq[(String, DataFrame)],
      idCol: String,
      rankCol: String = "rank",
      k0: Int = 60
  ): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: need at least one ranked list")
    require(lists.map(_._1).distinct.size == lists.size,
      "rrfFuse: list names must be unique")
    val tagged = lists.map { case (tag, df) =>
      df.select(col(idCol), lit(tag).as("__src"),
        (lit(1.0) / (lit(k0).cast("double") + col(rankCol).cast("double")))
          .as("__c"))
    }.reduce(_ unionAll _)
    tagged
      .groupBy(col(idCol))
      .agg(
        sort_array(collect_list(struct(col("__src"), col("__c")))).as("cs"),
        count(lit(1)).as("n_lists"))
      .select(col(idCol),
        aggregate(col("cs"), lit(0.0), (acc, x) => acc + x("__c")).as("rrf"),
        col("n_lists"))
  }
}
