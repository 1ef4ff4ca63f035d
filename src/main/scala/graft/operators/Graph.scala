package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph propagation operators — the provenance-weighting layer a
  * web-corpus pipeline runs over its domain link graph (rank domains
  * by link structure, then weight or screen documents by their
  * domain's rank — the Common-Crawl-style authority signal).
  *
  * Spark-first shape: the corpus-sized edge list COLLAPSES to a
  * weighted adjacency (one groupBy — the only corpus shuffle), and the
  * iterations run as joins + aggregations over the collapsed graph,
  * which is bounded by |domains|² regardless of corpus size. No GraphX
  * and no RDDs needed: DataFrame joins ARE message passing here, and
  * Catalyst broadcasts the (tiny) rank vector onto the adjacency each
  * round.
  */
object Graph {

  /** INTEGER-exact PageRank in micro-units: ranks start at 10^6, each
    * iteration computes per-edge shares as
    * `(rank(s) · 850000) div (out(s) · 10^6)` (floor division — the
    * 0.85 damping factor in fixed-point) summed into each destination
    * with edge multiplicity, plus the 0.15 teleport (150000 micro).
    * Every step is integer arithmetic with explicit floors, so the
    * result is bit-exact in ANY engine — the same discipline as the
    * t-closeness and DSIR decision tables, applied to an iterative
    * graph computation. Dangling-node mass is dropped (the standard
    * simplification; ranks remain a valid authority ordering).
    *
    * Exactness bound: rank·850000 stays far inside Long for any graph
    * whose total in-weight per node is below ~10^10 — beyond that,
    * lift the multiplications to DECIMAL(38,0) as tCloseness does.
    *
    * @param edges one row per link (multigraph; duplicates weight the
    *              edge — exactness holds because identical edges have
    *              identical shares, so weight·floor == Σ-per-edge)
    * @return (node, rank_micro) after `iters` rounds
    */
  def pageRankInt(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int
  ): DataFrame = {
    require(iters >= 1, "Graph.pageRankInt: at least one iteration")
    // collapse the corpus-sized multigraph ONCE; everything after is
    // |domains|^2-bounded
    val adj = edges
      .groupBy(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .agg(count(lit(1)).as("__w"))
    val nodes = adj.select(col("__src").as("node"))
      .unionByName(adj.select(col("__dst").as("node")))
      .distinct()
    val deg = adj.groupBy(col("__src")).agg(sum(col("__w")).as("__out"))
    var r = nodes.withColumn("rank_micro", lit(1000000L))
    var i = 0
    while (i < iters) {
      val contrib = adj
        .join(deg, "__src")
        .join(r.select(col("node").as("__src"), col("rank_micro")), "__src")
        .select(col("__dst").as("node"),
          (col("__w") *
            expr("(rank_micro * 850000L) div (__out * 1000000L)")).as("__share"))
        .groupBy(col("node")).agg(sum(col("__share")).as("__in"))
      r = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + coalesce(col("__in"), lit(0L))).as("rank_micro"))
      i += 1
    }
    r
  }
}
