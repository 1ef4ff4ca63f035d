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
}
