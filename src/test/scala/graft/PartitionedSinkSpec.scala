package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.PartitionedSink

/** The written dt=YYYYMMDD tree must exist on disk and prune at read
  * time (PartitionFilters, not data filters).
  */
class PartitionedSinkSpec extends SparkSpec {

  test("batch write produces a prunable dt tree") {
    val dir = Files.createTempDirectory("graft_sink").toFile.getAbsolutePath
    val ev = graft.queries.Q.events(spark, "/root/testdata/sf0.001")
    PartitionedSink.writeDatePartitioned(ev, "ts", dir)

    val dts = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("dt="))
    assert(dts.length > 1, s"expected multiple dt= partitions, got ${dts.toSeq}")

    val firstDt = dts.map(_.stripPrefix("dt=")).min
    val read = spark.read.parquet(dir).filter(col("dt") > firstDt)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"), plan)

    // pruning keeps counts correct
    val expected = PartitionedSink.withDt(ev, "ts").filter(col("dt") > firstDt).count()
    assert(read.count() == expected)
  }

  test("upsert replaces only the batch's own dt partitions (dynamic overwrite)") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val dir = Files.createTempDirectory("graft_upsert").toFile.getAbsolutePath

    // day 1 + day 2 initial state
    PartitionedSink.upsertBatchDatePartitioned(
      Seq((1L, ts("2024-01-01 10:00:00"), 100.0), (2L, ts("2024-01-02 10:00:00"), 200.0))
        .toDF("k", "t", "v"), "t", dir)
    // correction for day 2 only (revised value, extra row)
    PartitionedSink.upsertBatchDatePartitioned(
      Seq((2L, ts("2024-01-02 10:00:00"), 250.0), (3L, ts("2024-01-02 11:00:00"), 300.0))
        .toDF("k", "t", "v"), "t", dir)

    val rows = spark.read.parquet(dir)
      .select(col("k"), col("dt").cast("string"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set(
      (1L, "20240101", 100.0),      // day 1 untouched
      (2L, "20240102", 250.0),      // day 2 replaced, not appended
      (3L, "20240102", 300.0)
    ))
  }

  test("streaming upsert: late corrections overwrite their day via foreachBatch") {
    import spark.implicits._
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = Timestamp.valueOf(s)
    val dir = Files.createTempDirectory("graft_supsert").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_supsert_ck").toFile.getAbsolutePath

    val in = MemoryStream[(Long, Timestamp, Double)]
    val q = PartitionedSink.streamUpsertDatePartitioned(
      in.toDF().toDF("k", "t", "v"), "t", dir, ckpt).start()
    try {
      in.addData((1L, ts("2024-03-01 09:00:00"), 1.0))
      q.processAllAvailable()
      in.addData((1L, ts("2024-03-01 09:00:00"), 2.0)) // correction, same day
      q.processAllAvailable()
      val rows = spark.read.parquet(dir).select("k", "v").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows == Set((1L, 2.0))) // replaced, not duplicated
    } finally q.stop()
  }
}
