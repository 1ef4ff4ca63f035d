package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Decontaminate
import graft.streaming.StreamEnrich

class StreamEnrichSpec extends SparkSpec {

  import spark.implicits._

  test("stream-static broadcast enrichment joins every micro-batch against the dim") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("k", "tier")
    val in = MemoryStream[(Long, Long)]
    val out = StreamEnrich.withDim(in.toDF().toDF("k", "v"), dim, "k", "k")
      .select(col("v"), col("tier"))
    val q = out.writeStream.format("memory").queryName("se_dim_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, 10L), (3L, 30L))
      q.processAllAvailable()
      in.addData((2L, 20L)) // second batch joins the same static snapshot
      q.processAllAvailable()
      val rows = spark.table("se_dim_out")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(rows == Set((10L, Some("gold")), (30L, None), (20L, Some("silver"))))
    } finally q.stop()
  }

  test("streaming decontamination keeps exactly the batch-clean docs") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")
    ).toDF("id", "text")
    val docs = Seq(
      (1L, "a doc with the quick brown fox jumps inside it"),
      (2L, "nothing shared with any benchmark material here at all"),
      (3L, "too short")
    )

    val in = MemoryStream[(Long, String)]
    val cleaned = StreamEnrich.dropContaminated(
      in.toDF().toDF("id", "text"), bench, "text", n = 5)
    val q = cleaned.writeStream.format("memory").queryName("se_clean_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("se_clean_out").select("id").as[Long].collect().toSet
      val batch = Decontaminate.dropContaminated(
        docs.toDF("id", "text"), bench, "id", "text", n = 5)
        .select("id").as[Long].collect().toSet
      assert(streamed == batch)
      assert(streamed == Set(2L, 3L))
    } finally q.stop()
  }
}
