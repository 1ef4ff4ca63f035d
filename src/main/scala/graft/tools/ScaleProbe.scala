package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Scale-behavior probe: times the bucket-candidate operators on 1x/2x/
  * 4x/8x self-replications of the fixture corpus (ids shifted per copy so
  * replicas are near-dups of each other — the worst realistic case for
  * candidate generation). Near-linear growth validates the bucket-join
  * design; super-linear growth flags a quadratic leak.
  *
  * Usage: runMain graft.tools.ScaleProbe [sfDir]
  */
object ScaleProbe {

  private def replicate(df: DataFrame, idCol: String, copies: Int): DataFrame = {
    val shift = df.agg(max(col(idCol))).head.getLong(0) + 1L
    (0 until copies).map { c =>
      df.withColumn(idCol, col(idCol) + lit(c * shift))
    }.reduce(_ unionByName _)
  }

  private def time(label: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val rows = body
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val events = graft.queries.Q.events(spark, sfDir)

    Seq(1, 2, 4, 8).foreach { k =>
      val d = replicate(docs, "doc_id", k)
      val e = replicate(emb, "vec_id", k)
      time(s"minhash_lsh x$k") {
        Dedup.minhashLshPairs(d, "doc_id", "text").count()
      }
      time(s"jaccard x$k") {
        Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.4).count()
      }
      time(s"jaccard_collapsed x$k") {
        Dedup.nearDupPairsCollapsed(d, "doc_id", "text", 3, 0.4).count()
      }
      time(s"simhash_pairs x$k") {
        Dedup.simhashPairs(d, "doc_id", "text").count()
      }
      time(s"srp_neardup x$k") {
        Similarity.srpNearDupPairs(e, "vec_id", "embedding", 0.99).count()
      }
      // exact-collapse first, THEN clusters over the collapsed corpus —
      // the production composition; stays flat under replication
      time(s"clusters_collapsed x$k") {
        Dedup.nearDupClusters(
          Dedup.dropExactDuplicates(d, "doc_id", "text"),
          "doc_id", "text", 3, 0.4).count()
      }
      // replicas of a doc share a base id → k "versions" per key; the
      // representative shape (many keys, bounded versions per key)
      val nDocs = docs.count() // outside the timed block: unrelated work
      time(s"keep_latest x$k") {
        val versioned = d.withColumn("base_id",
          pmod(col("doc_id"), lit(nDocs)))
        Dedup.keepLatest(versioned, Seq("base_id"), Seq(col("doc_id").desc)).count()
      }
      // broadcast-screen decontamination: bench side fixed, corpus ×k —
      // must scale with the corpus scan, not the product
      time(s"decontaminate x$k") {
        graft.operators.Decontaminate.contaminatedDocs(
          d, docs.filter(col("doc_id") < 50), "doc_id", "text", 5).count()
      }
      // fuzzy join runs on the DISTINCT vocabulary — replication must
      // not grow it (the dedupe-the-vocab-not-the-rows design)
      time(s"fuzzy_names x$k") {
        val names = d.groupBy(col("text").substr(1, 20).as("name"))
          .agg(min(col("doc_id")).as("id"))
        graft.operators.FuzzyJoin.selfPairs(names, "id", "name", 2).count()
      }
      // event ops replicated by USER (new user ids per copy): both are
      // key-partitioned — growth must be linear in users
      val ev = replicate(events, "user_id", k)
      time(s"resample_ffill x$k") {
        graft.operators.TimeSeries.resampleFfill(
          ev, "user_id", "ts", "value", "event_id", 3600L).count()
      }
      time(s"funnel x$k") {
        graft.operators.Funnel.steps(
          ev, "user_id", "ts", "event_type", Seq("view", "click", "purchase")).count()
      }
      // passage dedup: replicated docs contribute only duplicate
      // passages, so surviving rows stay FLAT while scan cost grows
      // linearly — the exact-collapse shape at sub-document granularity
      time(s"passage_dedup x$k") {
        Dedup.dedupPassages(d, "doc_id", "text", 32, 32).count()
      }
      // k-means assignment is map-side (broadcast centroid fold):
      // growth must track the scan alone, no shuffle to inflate
      time(s"kmeans_assign x$k") {
        graft.operators.Clustering.assign(e, "vec_id", "embedding",
          graft.operators.Clustering.initialCentroids(
            emb, "vec_id", "embedding", 8)).count()
      }
      // semantic dedup: replicas are exact cell-mates of their base
      // vector, so within-cell pair work grows k^2 per cell — the
      // survivors must stay FLAT (one per base vector) while the
      // candidate cost demonstrates why cell count is the scale dial
      time(s"semantic_dedup x$k") {
        Similarity.semanticDedup(e,
          emb.orderBy(col("vec_id")).limit(64),
          "vec_id", "embedding", 0.99).count()
      }
      // production k-means update: one partial-aggregated shuffle,
      // scalar reducer state — growth must be linear in the scan
      time(s"kmeans_update_scale x$k") {
        graft.operators.Clustering.updateStepAtScale(e, "vec_id", "embedding",
          graft.operators.Clustering.initialCentroids(
            emb, "vec_id", "embedding", 8)).count()
      }
    }
    spark.stop()
  }
}
