package graft

import org.apache.spark.sql.functions._

/** Integer-exact PageRank: hand-walked fixed-point arithmetic on a
  * tiny graph, multigraph weighting, and the collapsed-adjacency
  * iteration shape.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankInt: two iterations match the hand-walked fixed-point ranks") {
    // A->B, A->C, B->C, C->A. r0 = 1e6 each; deg A=2, B=1, C=1.
    // iter1 shares: A-edges 425000 each, B 850000, C 850000
    //   r1: A = 150000+850000 = 1000000; B = 575000; C = 1425000
    // iter2 shares: A 425000, B floor(575000*.85)=488750, C 1211250
    //   r2: A = 1361250; B = 575000; C = 1063750
    val edges = Seq(("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"))
      .toDF("src", "dst")
    val r = graft.operators.Graph.pageRankInt(edges, "src", "dst", iters = 2)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("A" -> 1361250L, "B" -> 575000L, "C" -> 1063750L), r.toString)
  }

  test("pageRankInt: duplicated edges weight exactly like per-edge summation") {
    // two parallel A->B edges + A->C: B receives 2 shares of out=3
    val multi = Seq(("A", "B"), ("A", "B"), ("A", "C")).toDF("src", "dst")
    val r = graft.operators.Graph.pageRankInt(multi, "src", "dst", iters = 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val share = (1000000L * 850000L) / (3L * 1000000L) // 283333
    assert(r("B") == 150000L + 2 * share && r("C") == 150000L + share, r.toString)
    // dangling nodes (B, C emit nothing) still appear with teleport-only
    assert(r("A") == 150000L)
  }
}
