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
  * round. The adjacency is ADDITIVE (edge counts sum), so it joins the
  * engine's mergeable-summary family: maintain it per ingest batch
  * with [[mergeAdj]] and never rescan history.
  */
object Graph {

  /** Collapse a corpus-sized multigraph edge list into its weighted
    * adjacency `(src, dst, w)` — the ONE corpus shuffle of every
    * operator in this class; everything downstream of the collapse is
    * |domains|²-bounded. Duplicate edges weight the edge (exactness
    * holds because identical edges have identical per-edge shares, so
    * `w · floor == Σ-per-edge`).
    */
  def collapseEdges(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(count(lit(1)).as("w"))

  /** Merge two weighted adjacencies by cell-wise sum. Edge counts are
    * ADDITIVE, so merging per-batch collapses equals collapsing the
    * concatenated corpora bit-exactly — the same mergeable-summary
    * discipline as the Count-Min cells, moment sketches, and DSIR
    * bucket models, applied to the graph layer.
    */
  def mergeAdj(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("w")).as("w"))

  /** One integer-PageRank round over the collapsed graph: per-edge
    * shares `(rank(s) · 850000) div (out(s) · 10^6)` (floor division —
    * 0.85 damping in fixed-point micro-units) summed into each
    * destination with edge weight, plus the 0.15 teleport (150000).
    */
  private def rankStep(adj: DataFrame, deg: DataFrame, nodes: DataFrame,
      r: DataFrame): DataFrame = {
    val contrib = adj
      .join(deg, "src")
      .join(r.select(col("node").as("src"), col("rank_micro")), "src")
      .select(col("dst").as("node"),
        (col("w") *
          expr("(rank_micro * 850000L) div (__out * 1000000L)")).as("__share"))
      .groupBy(col("node")).agg(sum(col("__share")).as("__in"))
    nodes.join(contrib, Seq("node"), "left")
      .select(col("node"),
        (lit(150000L) + coalesce(col("__in"), lit(0L))).as("rank_micro"))
  }

  private def degreesOf(adj: DataFrame): DataFrame =
    adj.groupBy(col("src")).agg(sum(col("w")).as("__out"))

  private def nodesOf(adj: DataFrame): DataFrame =
    adj.select(col("src").as("node"))
      .unionByName(adj.select(col("dst").as("node")))
      .distinct()

  /** Persist + materialize an iteration frame, then REBASE its logical
    * plan onto the materialized RDD. The persist alone reuses the DATA,
    * but each round's logical plan would still embed every prior round
    * — analysis cost and plan/explain strings grow per iteration and
    * OOM the driver ~30 rounds deep (AQE logs the full explain string
    * on every plan update). The RDD rebase makes every round's plan
    * constant-size; recompute on cache eviction falls back to RDD
    * lineage (swap for `localCheckpoint(true)` on clusters where
    * eviction cascades matter). Returns (persistedHandle, rebasedFrame)
    * — unpersist the handle once the next round is pinned.
    */
  private def pin(df: DataFrame): (DataFrame, DataFrame) = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count(): Unit
    (p, df.sparkSession.createDataFrame(p.rdd, p.schema))
  }

  /** INTEGER-exact PageRank in micro-units over a collapsed adjacency
    * `(src, dst, w)`: ranks start at 10^6; every step is integer
    * arithmetic with explicit floors, so the result is bit-exact in
    * ANY engine — the t-closeness/DSIR decision-table discipline
    * applied to an iterative graph computation. Dangling-node mass is
    * dropped (the standard simplification; ranks remain a valid
    * authority ordering).
    *
    * Exactness bound: rank·850000 stays far inside Long for any graph
    * whose total in-weight per node is below ~10^10 — beyond that,
    * lift the multiplications to DECIMAL(38,0) as tCloseness does.
    *
    * Iteration lineage is CUT per round: each iteration's rank frame
    * persists (it is |domains|-bounded — the whole point of collapsing
    * first) and its predecessor unpersists once the child is pinned,
    * exactly the [[Vocab.mergedDict]] cache discipline — without it,
    * iteration k's plan embeds all k−1 prior rounds and analysis +
    * recompute cost grow superlinearly past ~10 iterations. The
    * RETURNED frame stays persisted; the caller owns its unpersist
    * (gates route it through scratch parquet and release before
    * returning, the mergedDict contract).
    */
  def pageRankFromAdj(adj: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "Graph.pageRankFromAdj: at least one iteration")
    val adjP = adj.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    adjP.count(): Unit
    val nodes = nodesOf(adjP).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = degreesOf(adjP).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var (rP, rCut) = pin(nodes.withColumn("rank_micro", lit(1000000L)))
    var i = 0
    while (i < iters) {
      val (nP, nCut) = pin(rankStep(adjP, deg, nodes, rCut))
      rP.unpersist()
      rP = nP; rCut = nCut
      i += 1
    }
    adjP.unpersist(); nodes.unpersist(); deg.unpersist()
    rP
  }

  /** [[pageRankFromAdj]] over a raw edge list (collapses first). Kept
    * as the one-call form the fixed-iteration gates use; same
    * caller-unpersists contract on the returned frame.
    */
  def pageRankInt(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int
  ): DataFrame =
    pageRankFromAdj(collapseEdges(edges, srcCol, dstCol), iters)

  /** Connected components of the collapsed adjacency, treated as
    * UNDIRECTED — the domain-graph clustering a web pipeline runs for
    * link-farm detection and per-site grouping. Min-label propagation:
    * every round each node takes the minimum of its own label and its
    * neighbors' (string order — matching SQL MIN), converging in
    * O(component diameter) rounds; each round is one join + partial
    * aggregation over the |domains|²-bounded symmetrized edge set,
    * with the [[pin]] discipline keeping every round's plan
    * constant-size. Returns (node, component) with components labeled
    * by their lexicographically smallest member; the returned frame is
    * persisted — caller unpersists ([[Vocab.mergedDict]] contract).
    */
  def connectedComponents(adj: DataFrame): DataFrame = {
    val edges = adj.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(adj.select(col("dst").as("u"), col("src").as("v")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    edges.count(): Unit
    var (lP, lCut) = pin(
      nodesOf(adj).select(col("node"), col("node").as("component")))
    var changed = 1L
    while (changed > 0) {
      // ONE action per round (the pageRankConverged discipline): the
      // moved-count sum both materializes the persisted frame and reads
      // off the convergence scalar — no second pass over the cache
      val stepped = edges
        .join(lCut.select(col("node").as("v"), col("component").as("__c")), "v")
        .groupBy(col("u").as("node")).agg(min(col("__c")).as("__nb"))
        .join(lCut, "node")
        .select(col("node"),
          least(col("component"), col("__nb")).as("component"),
          (col("__nb") < col("component")).as("__moved"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      changed = stepped
        .agg(coalesce(sum(col("__moved").cast("long")), lit(0L)))
        .first().getLong(0)
      val nCut = adj.sparkSession.createDataFrame(stepped.rdd, stepped.schema)
      lP.unpersist()
      lP = stepped; lCut = nCut.select(col("node"), col("component"))
    }
    val (outP, _) = pin(lCut)
    lP.unpersist(); edges.unpersist()
    outP
  }

  /** INTEGER-exact HITS (Kleinberg 1999) in micro-units over a
    * collapsed adjacency `(src, dst, w)` — the authority signal's
    * two-sided twin: authority = endorsed BY good hubs, hub = points
    * AT good authorities, the pairing PageRank's single score can't
    * separate (a link directory is a great hub and a terrible
    * authority). Both scores start at 10^6; each round computes
    * auth(n) = Σ_in w·hub, renormalizes by the round's MAX back to
    * [0, 10^6] (max-normalization keeps every step in exact integer
    * arithmetic — the decision-table discipline; L2 would force
    * floats), then hub(n) = Σ_out w·auth' over the NEW authorities
    * (the classic update order). Nodes without in-edges get authority
    * 0, without out-edges hub 0.
    *
    * Exactness bound: Σ w·score stays inside Long while a node's total
    * in/out weight is below ~9·10^12 (score ≤ 10^6) — same contract
    * note as [[pageRankFromAdj]]. The renorm multiply (Σ · 10^6) runs
    * in DECIMAL(38,0) — on Longs it would wrap silently (non-ANSI
    * Spark) once a node's collapsed weight passed ~9·10^6, a mass a
    * popular domain reaches long before the sum itself overflows.
    *
    * Same scale shape as the siblings: the corpus collapsed first, the
    * iterations are joins + partial aggs over the |domains|²-bounded
    * frame, each round's (node, auth, hub) frame pins and drops its
    * predecessor so lineage stays flat. The per-round max rides a
    * broadcast crossJoin inside the plan — no extra driver action.
    * Returned frame stays persisted; caller unpersists
    * ([[Vocab.mergedDict]] contract).
    */
  /** Max-renormalize a raw `(node, __v)` score frame back to
    * [0, 10^6] over the full node set (absent nodes score 0) — the
    * HITS round's normalizer. Decimal multiply: __v ≤ total_w·10^6,
    * and ×10^6 on Longs wraps past total_w ≈ 9.2e6 — the KMV-path
    * discipline (exact integral division, floored identically; __v ≤
    * __mx so the quotient is back in [0, 10^6] and the cast is safe).
    * The per-round max rides a broadcast crossJoin inside the plan —
    * no extra driver action.
    */
  private def renormOver(nodes: DataFrame)(raw: DataFrame, outName: String): DataFrame = {
    val mx = raw.agg(max(col("__v")).as("__mx"))
    nodes.join(raw, Seq("node"), "left")
      .crossJoin(broadcast(mx))
      .select(col("node"),
        when(col("__mx") > 0,
          coalesce(expr(
            "CAST(CAST(__v AS DECIMAL(38,0)) * 1000000 div CAST(__mx AS DECIMAL(38,0)) AS BIGINT)"),
            lit(0L)))
          .otherwise(lit(0L)).as(outName))
  }

  /** One HITS round from the previous hub frame: renormed authorities
    * (from in-edges) then renormed hubs (from out-edges over the NEW
    * authorities) — the classic update order, all integer.
    */
  private def hitsStep(adjP: DataFrame, nodes: DataFrame, prevHub: DataFrame)
      : (DataFrame, DataFrame => DataFrame) = {
    val auth = renormOver(nodes)(
      adjP.join(prevHub.select(col("node").as("src"), col("hub_micro")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("w") * col("hub_micro")).as("__v")),
      "auth_micro")
    (auth, aCut => renormOver(nodes)(
      adjP.join(aCut.select(col("node").as("dst"), col("auth_micro")), "dst")
        .groupBy(col("src").as("node"))
        .agg(sum(col("w") * col("auth_micro")).as("__v")),
      "hub_micro"))
  }

  def hitsInt(adj: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "Graph.hitsInt: at least one iteration")
    val adjP = adj.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    adjP.count(): Unit
    val nodes = nodesOf(adjP).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var (sP, sCut) = pin(nodes
      .withColumn("auth_micro", lit(1000000L))
      .withColumn("hub_micro", lit(1000000L)))
    var i = 0
    while (i < iters) {
      // pin the round's authorities before deriving hubs from them:
      // auth feeds BOTH the hub update and the round's output join, and
      // unpinned it would recompute (adjacency scan + broadcast agg)
      // once per consumer — measured 3-4x per-round wall on the probe
      val (auth, hubOf) = hitsStep(adjP, nodes, sCut)
      val (aP, aCut) = pin(auth)
      val (nP, nCut) = pin(aCut.join(hubOf(aCut), "node"))
      aP.unpersist(); sP.unpersist()
      sP = nP; sCut = nCut
      i += 1
    }
    adjP.unpersist(); nodes.unpersist()
    sP
  }

  /** Result of a convergence-looped rank computation: the final rank
    * frame (persisted — caller unpersists), the number of iterations
    * actually executed, and the last step's max per-node rank change.
    */
  final case class RankConvergence(ranks: DataFrame, itersRun: Int, lastDeltaMicro: Long)

  /** PageRank run TO CONVERGENCE: iterate until the largest per-node
    * rank change of a round is ≤ `tolMicro` (an integer criterion —
    * with floor-divided integer shares the iteration reaches an exact
    * fixed point, so `tolMicro = 0` is meaningful and deterministic),
    * capped at `maxIters` as the backstop for graphs whose integer map
    * oscillates. This is how real PageRank runs (20–50 rounds), which
    * is exactly the regime where unbounded lineage kills the naive
    * loop — here every round persists its |domains|-bounded rank frame
    * and drops its predecessor, so per-iteration cost is flat.
    *
    * The per-round delta is ONE scalar aggregation over the two cached
    * |domains|-bounded rank frames — a bounded driver action per
    * iteration (decision-table discipline), not a corpus action.
    */
  def pageRankConverged(
      adj: DataFrame,
      maxIters: Int,
      tolMicro: Long
  ): RankConvergence = {
    require(maxIters >= 1, "Graph.pageRankConverged: at least one iteration")
    require(tolMicro >= 0, "Graph.pageRankConverged: non-negative tolerance")
    val adjP = adj.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (adjP.isEmpty) {
      adjP.unpersist()
      // derive the empty frame from the adjacency so the node column
      // keeps its real type (string, long, ...) — a hardcoded-string
      // schema would differ from the non-empty path's on typed ids
      return RankConvergence(
        nodesOf(adj).withColumn("rank_micro", lit(1000000L)).limit(0),
        0, 0L)
    }
    val nodes = nodesOf(adjP).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = degreesOf(adjP).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var (rP, rCut) = pin(nodes.withColumn("rank_micro", lit(1000000L)))
    var i = 0
    var delta = Long.MaxValue
    while (i < maxIters && delta > tolMicro) {
      // ONE action per round: the step result carries its predecessor
      // rank, so the max-|Δ| aggregation both materializes the persisted
      // frame and reads off the convergence scalar — no separate count
      val stepped = rankStep(adjP, deg, nodes, rCut)
        .join(rCut.select(col("node"), col("rank_micro").as("__prev")), "node")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      delta = stepped
        .agg(max(abs(col("rank_micro") - col("__prev"))))
        .first().getLong(0)
      val nCut = adj.sparkSession
        .createDataFrame(stepped.rdd, stepped.schema)
        .select(col("node"), col("rank_micro"))
      rP.unpersist()
      rP = stepped; rCut = nCut
      i += 1
    }
    adjP.unpersist(); nodes.unpersist(); deg.unpersist()
    // one final pin projects the carried __prev away so the returned
    // handle is a clean (node, rank_micro) frame the caller unpersists
    val (outP, _) = pin(rP.select(col("node"), col("rank_micro")))
    rP.unpersist()
    RankConvergence(outP, i, delta)
  }

  /** Result of a convergence-looped HITS run: the final
    * (node, auth_micro, hub_micro) frame (persisted — caller
    * unpersists), iterations executed, and the last round's max
    * per-node HUB change.
    */
  final case class HitsConvergence(scores: DataFrame, itersRun: Int, lastDeltaMicro: Long)

  /** HITS run TO CONVERGENCE — [[pageRankConverged]]'s twin for the
    * two-score update: iterate [[hitsInt]] rounds until the largest
    * per-node HUB change of a round is ≤ `tolMicro`, capped at
    * `maxIters` (integer max-renorm dynamics can 2-cycle on
    * adversarial graphs — the cap is the oscillation backstop, and
    * the stopping rule is deterministic either way). The HUB delta
    * alone decides: auth_k is a pure function of hub_{k−1}, so
    * hub_k == hub_{k−1} makes the NEXT round reproduce the same
    * (auth, hub) pair — the hub fixed point IS the pair's fixed
    * point; a one-sided tolerance keeps the criterion one scalar.
    *
    * Same lineage discipline as the sibling: each round persists its
    * |domains|-bounded frame and drops its predecessor; the delta is
    * ONE bounded aggregation per round, never a corpus action.
    */
  def hitsConverged(adj: DataFrame, maxIters: Int, tolMicro: Long): HitsConvergence = {
    require(maxIters >= 1, "Graph.hitsConverged: at least one iteration")
    require(tolMicro >= 0, "Graph.hitsConverged: non-negative tolerance")
    val adjP = adj.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (adjP.isEmpty) {
      adjP.unpersist()
      return HitsConvergence(
        nodesOf(adj)
          .withColumn("auth_micro", lit(1000000L))
          .withColumn("hub_micro", lit(1000000L)).limit(0),
        0, 0L)
    }
    val nodes = nodesOf(adjP).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var (sP, sCut) = pin(nodes
      .withColumn("auth_micro", lit(1000000L))
      .withColumn("hub_micro", lit(1000000L)))
    var i = 0
    var delta = Long.MaxValue
    while (i < maxIters && delta > tolMicro) {
      val (auth, hubOf) = hitsStep(adjP, nodes, sCut)
      val (aP, aCut) = pin(auth) // round output feeds hub AND the join
      // ONE action per round: the step result carries the previous hub,
      // so the max-|Δ| aggregation both materializes the frame and
      // reads off the convergence scalar
      val stepped = aCut.join(hubOf(aCut), "node")
        .join(sCut.select(col("node"), col("hub_micro").as("__prev")), "node")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      delta = stepped
        .agg(max(abs(col("hub_micro") - col("__prev"))))
        .first().getLong(0)
      val nCut = adj.sparkSession
        .createDataFrame(stepped.rdd, stepped.schema)
        .select(col("node"), col("auth_micro"), col("hub_micro"))
      aP.unpersist(); sP.unpersist()
      sP = stepped; sCut = nCut
      i += 1
    }
    adjP.unpersist(); nodes.unpersist()
    val (outP, _) = pin(sP.select(col("node"), col("auth_micro"), col("hub_micro")))
    sP.unpersist()
    HitsConvergence(outP, i, delta)
  }
}
