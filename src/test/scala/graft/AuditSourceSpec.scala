package graft

import java.nio.file.Files

import graft.sources.AuditSource

/** S1/S2: recursive file source + date-directory pruning semantics
  * (`DateFileFilter.java:14-38`): date dirs older than min_date are
  * skipped, non-date paths always pass.
  */
class AuditSourceSpec extends SparkSpec {

  test("recursive batch source reads nested date directories") {
    val root = Files.createTempDirectory("audits").toFile
    for ((d, line) <- Seq("20210101" -> "a", "20210301" -> "b", "notadate" -> "c")) {
      val dir = new java.io.File(root, d)
      dir.mkdirs()
      Files.writeString(new java.io.File(dir, "audit.log").toPath, line + "\n")
    }
    val all = AuditSource.batch(spark, root.getAbsolutePath)
    assert(all.count() == 3)

    val pruned = AuditSource.filterByPathDate(all, "20210201")
    val kept = pruned.collect().map(_.getString(0)).sorted.toSeq
    // 20210101 pruned; 20210301 kept; non-date dir passes (reference
    // behavior: unparseable path segments are not filtered)
    assert(kept == Seq("b", "c"))
  }

  test("hive-partitioned dt tree prunes via partition filter") {
    val root = Files.createTempDirectory("audits_dt").toFile
    for ((d, line) <- Seq("20210101" -> "old", "20210301" -> "new")) {
      val dir = new java.io.File(root, s"dt=$d")
      dir.mkdirs()
      Files.writeString(new java.io.File(dir, "audit.log").toPath, line + "\n")
    }
    val pruned = AuditSource.batchPartitioned(spark, root.getAbsolutePath, Some("20210201"))
    assert(pruned.select("value").collect().map(_.getString(0)).toSeq == Seq("new"))
    // the filter must actually prune at the source: the plan's partition
    // filters mention dt
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("dt"))
  }
}
