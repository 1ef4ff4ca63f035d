package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.{Sampling, TextAnalysis}

/** The corpus-shaping operators are pure column expressions, so the
  * SAME code runs on streaming inputs unchanged (Spark's unified API —
  * the capability the reference's duplicated bounded/unbounded
  * pipelines lack). Pinned here for sampling and chunking: streaming
  * results equal the batch twin on identical data.
  */
class StreamingCorpusOpsSpec extends SparkSpec {

  import spark.implicits._

  test("hash sampling filters a stream exactly like the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val data = (0L until 500L).map(i => (i, s"doc $i"))

    val in = MemoryStream[(Long, String)]
    val sampled = Sampling.sampleByHash(
      in.toDF().toDF("doc_id", "text"), "doc_id", keepBuckets = 20)
    val q = sampled.writeStream
      .format("memory").queryName("sc_sample_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("sc_sample_out").select("doc_id")
        .as[Long].collect().toSet
      val batch = Sampling.sampleByHash(
        data.toDF("doc_id", "text"), "doc_id", keepBuckets = 20)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty && batch.size < 500)
    } finally q.stop()
  }

  test("context-window chunking explodes a stream exactly like the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val doc = (1 to 100).map(i => s"tok$i").mkString(" ")
    val data = Seq((1L, doc), (2L, "short text"))

    val in = MemoryStream[(Long, String)]
    val chunked = in.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        posexplode(TextAnalysis.chunkTokens(col("text"), window = 32, stride = 16))
          .as(Seq("chunk_id", "chunk_text")))
    val q = chunked.writeStream
      .format("memory").queryName("sc_chunk_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("sc_chunk_out")
        .as[(Long, Int, String)].collect().toSet
      val batch = data.toDF("doc_id", "text")
        .select(col("doc_id"),
          posexplode(TextAnalysis.chunkTokens(col("text"), window = 32, stride = 16))
            .as(Seq("chunk_id", "chunk_text")))
        .as[(Long, Int, String)].collect().toSet
      assert(streamed == batch)
      // 100 tokens, window 32, stride 16: chunks start at 0,16,...,80 (ceil(68/16)=5 → 6 chunks)
      assert(batch.count(_._1 == 1L) == 6)
      assert(batch.count(_._1 == 2L) == 1)
    } finally q.stop()
  }
}
