package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Dedup, Sessionize, Similarity}
import graft.queries.Q

/** Plan-shape assertions for the scale-critical properties: shuffle
  * counts, broadcast choices, map-side-only signature stages, and scan
  * pruning. These are the properties that decide whether an operator
  * survives a 100× scale-up, so they're pinned as tests, not just
  * inspected by hand.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countOcc(s: String, needle: String): Int =
    s.sliding(needle.length).count(_ == needle)

  test("sessionization is a single shuffle") {
    val plan = physical(Sessionize.deniedCounts(
      Q.events(spark, sf), "ts", "user_id", "600 seconds",
      denied = col("event_type") === "error",
      weight = col("value").cast(DecimalType(18, 4))))
    assert(countOcc(plan, "Exchange hashpartitioning") == 1, plan)
  }

  test("sessionization scan prunes to the referenced columns") {
    val plan = physical(Sessionize.deniedCounts(
      Q.events(spark, sf), "ts", "user_id", "600 seconds",
      denied = col("event_type") === "error",
      weight = col("value").cast(DecimalType(18, 4))))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("ts") && readSchema.contains("user_id"))
    assert(!readSchema.contains("props") && !readSchema.contains("event_id"),
      readSchema)
  }

  test("minhash signatures are map-side only (zero shuffles)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = physical(Dedup.minhashSignatures(docs, "doc_id", "text", 3, 32))
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("graft_minhash_sig"), plan)
  }

  test("simhash values are map-side only (zero shuffles)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = physical(Dedup.simhash(docs, "doc_id", "text"))
    assert(!plan.contains("Exchange"), plan)
  }

  test("brute-force ANN broadcasts the query side, never shuffles the corpus") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = physical(Similarity.bruteForceTopK(
      emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", 5))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
    // the only hash exchange is the final per-query ranking window
    assert(countOcc(plan, "Exchange hashpartitioning") <= 1, plan)
  }

  test("jaccard pairs plan is join-free: two shuffles, sizes ride the buckets") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = physical(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.4))
    assert(!plan.contains("Join"), plan)
    assert(countOcc(plan, "Exchange hashpartitioning") == 2, plan)
  }

  test("minhash signature joins broadcast the small side at this scale") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = physical(Dedup.minhashLshPairs(docs, "doc_id", "text"))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("keepLatest is a single shuffle (rank state, no join)") {
    val events = Q.events(spark, sf)
    val plan = physical(Dedup.keepLatest(events, Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc)))
    assert(countOcc(plan, "Exchange hashpartitioning") == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("salted aggregation is the two-stage shape: (key,salt) then key") {
    val events = Q.events(spark, sf)
    val plan = physical(graft.operators.Skew.saltedSum(
      events, Seq("event_type"), col("value").cast(DecimalType(18, 4)), 8))
    assert(countOcc(plan, "Exchange hashpartitioning") == 2, plan)
  }

  test("correlated EXISTS plans as a broadcast left-semi join at small scale") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val plan = physical(cust.join(orders,
      cust("c_custkey") === orders("o_custkey") &&
        orders("o_totalprice") > cust("c_acctbal") * 100,
      "left_semi"))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
  }

  test("single-row scalar subquery broadcasts, never shuffles the fact side") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val g = orders.agg(Q.davg(col("o_totalprice")).as("global_avg"))
    val plan = physical(orders.crossJoin(broadcast(g))
      .filter(col("o_totalprice") > col("global_avg")))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(countOcc(plan, "Exchange hashpartitioning") == 0, plan)
  }

  test("statistical moments aggregate in one shuffle (partial + final)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val plan = physical(li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        Q.dsum(col("l_quantity")).as("sx"),
        sum((col("l_quantity").cast(DecimalType(18, 4)) *
          col("l_quantity").cast(DecimalType(18, 4))).cast(DecimalType(18, 4)))
          .cast("double").as("sxx")))
    assert(countOcc(plan, "Exchange hashpartitioning") == 1, plan)
    assert(plan.contains("partial_"), plan)
  }

  test("as-of joins are single-shuffle union kernels, no join operator") {
    val events = Q.events(spark, sf)
    val probe = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val build = events.filter(col("event_type") === "view")
    Seq(
      graft.operators.AsofJoin.lastTimeBefore(probe, build, "user_id", "ts", "m"),
      graft.operators.AsofJoin.firstTimeAfter(probe, build, "user_id", "ts", "m")
    ).foreach { df =>
      val plan = physical(df)
      assert(countOcc(plan, "Exchange hashpartitioning") == 1, plan)
      assert(!plan.contains("Join"), plan)
    }
  }

  test("tpch q19: OR-of-conjuncts derives pushed ranges on BOTH scans") {
    val plan = physical(graft.SparkEntry.queries("q_tpch_q19")(spark, sf))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    // Catalyst must extract the per-side residuals of the disjunction:
    // quantity ranges reach the lineitem scan, brand/size reach part —
    // at 100 TB this is the difference between scanning l_quantity
    // row-groups and scanning the whole fact table.
    assert(pushed.contains("l_quantity"), plan)
    assert(pushed.contains("p_brand"), plan)
  }

  test("tpch q4/q20/q21: correlation compiles to semi/anti joins, not aggregated subquery joins") {
    val q4 = physical(graft.SparkEntry.queries("q_tpch_q4")(spark, sf))
    assert(q4.contains("LeftSemi"), q4)
    val q20 = physical(graft.SparkEntry.queries("q_tpch_q20")(spark, sf))
    assert(q20.contains("LeftSemi"), q20)
    val q21 = physical(graft.SparkEntry.queries("q_tpch_q21")(spark, sf))
    assert(q21.contains("LeftSemi") && q21.contains("LeftAnti"), q21)
    // the inequality correlation must not degrade to a cartesian product
    Seq(q4, q20, q21).foreach(p => assert(!p.contains("CartesianProduct"), p))
  }

  test("tpch q13: left-join histogram pushes the priority filter into the orders scan") {
    val plan = physical(graft.SparkEntry.queries("q_tpch_q13")(spark, sf))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("o_orderpriority"), plan)
  }

  test("tpch q7/q8: fixed-cardinality dims broadcast; no cartesian pair blowup") {
    Seq("q_tpch_q7", "q_tpch_q8").foreach { n =>
      val plan = physical(graft.SparkEntry.queries(n)(spark, sf))
      assert(plan.contains("BroadcastExchange"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    }
  }

  test("codegen kernels run inside whole-stage codegen") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = physical(Dedup.simhash(docs, "doc_id", "text"))
    // "*(n)" marks operators fused into WholeStageCodegen stage n; the
    // kernel projection must carry it (a CodegenFallback expression
    // would print an unstarred Project)
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_simhash64") && l.trim.startsWith("*(")), plan)
  }

  test("k-means assignment never shuffles the corpus side") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = physical(graft.operators.Clustering.assign(
      emb, "vec_id", "embedding",
      graft.operators.Clustering.initialCentroids(emb, "vec_id", "embedding", 8)))
    // the only exchanges belong to the k-row centroid collapse + its
    // broadcast; the corpus flows scan -> broadcast join -> project
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("IVF centroid assignment never shuffles the corpus side") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = physical(Similarity.assignToCentroids(
      emb, emb.filter(col("vec_id") < 16), "vec_id", "embedding"))
    // broadcast argmax fold, same shape as Clustering.assign — the old
    // window-over-id ranking pushed k rows per vector through an exchange
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("semanticDedup: no cartesian — the pair join is an equi-join on the cell") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = physical(Similarity.semanticDedup(
      emb, emb.filter(col("vec_id") < 16), "vec_id", "embedding", 0.4))
    assert(!plan.contains("CartesianProduct"), plan)
    // within-cell compare co-locates on centroid_id via hash exchange
    // or broadcasts at this scale; either way no all-pairs operator
    assert(plan.contains("centroid_id"), plan)
  }

  test("capPerGroup is a single shuffle on the group key (rank state only)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = physical(graft.operators.Sampling.capPerGroup(
      docs.select(col("doc_id"), col("source")), "source", "doc_id", 10))
    assert(countOcc(plan, "Exchange hashpartitioning") == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("group z-score broadcasts the moments, no second corpus shuffle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = physical(graft.operators.Normalize.zscoreByGroup(
      docs, "lang", "n_chars", Seq("doc_id", "lang", "n_chars")))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // exactly one hash exchange: the moments aggregation itself
    assert(countOcc(plan, "Exchange hashpartitioning") == 1, plan)
  }

  test("anchor extraction is fully codegen: no ScalaUDF anywhere in the plan") {
    import spark.implicits._
    val pages = Seq((1L, "http://h.example/",
      """<html><body><a href="p1">plain</a><a href="#f">skip</a></body></html>"""))
      .toDF("media_id", "page_url", "html")
    val out = graft.operators.Html.anchors(pages, "page_url", "html")
    val udfs = out.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
      })
    }.flatten
    assert(udfs.isEmpty, s"anchor extraction must not ride a ScalaUDF:\n$udfs")
    val plan = physical(out)
    assert(plan.contains("graft_html_anchors"), plan)
    // and the rows are the same ones the Scala API yields
    assert(out.collect().map(r => (r.getString(2), r.getString(3))).toSeq ==
      Seq(("http://h.example/p1", "plain")))
  }

  test("CDX lookup keys ride native codegen: no ScalaUDF, broadcast join, no shuffle") {
    import spark.implicits._
    val idx = Seq((1L, "com,site)/p0", "2026", "http://site.com/p0", "c.warc.gz",
      0L, 800L, 200, "text/html"))
      .toDF("media_id", "surt_key", "ts", "url", "filename", "offset", "length",
        "status", "mime")
    val wanted = Seq("http://WWW.Site.com/p0", "ftp://x/").toDF("url_wanted")
    val out = graft.operators.Cdx.lookup(
      org.apache.spark.sql.functions.broadcast(wanted), "url_wanted", idx)
    val udfs = out.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
      })
    }.flatten
    assert(udfs.isEmpty, s"surt keys must not ride a ScalaUDF:\n$udfs")
    // the key is the native expression (constant-folded away over this
    // literal local table — visible pre-optimization, and foldability
    // itself is something a ScalaUDF never gets)
    assert(out.queryExecution.analyzed.toString.contains("graft_surt"))
    val plan = physical(out)
    assert(plan.contains("BroadcastHashJoin"), plan)
    graft.queries.Q.requireNoShuffle(out)
    assert(out.collect().map(_.getAs[String]("url_wanted")).toSeq ==
      Seq("http://WWW.Site.com/p0"))
  }

  test("boilerplate gram builder runs inside whole-stage codegen") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = physical(docs.select(
      graft.functions.GraftFunctions.distinctNgrams(col("text"), 3).as("g")))
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_distinct_ngrams") && l.trim.startsWith("*(")), plan)
  }
}
