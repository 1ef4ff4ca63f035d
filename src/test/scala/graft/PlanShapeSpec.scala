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

  test("codegen kernels run inside whole-stage codegen") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = physical(Dedup.simhash(docs, "doc_id", "text"))
    // "*(n)" marks operators fused into WholeStageCodegen stage n; the
    // kernel projection must carry it (a CodegenFallback expression
    // would print an unstarred Project)
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_simhash64") && l.trim.startsWith("*(")), plan)
  }
}
