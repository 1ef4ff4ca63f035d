package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.AuditSessionPipeline

/** The reference's full production path, end to end on real files:
  * continuous text source over a date-partitioned tree → lenient JSON
  * parse → watermark → session windows → formatted strings → sink
  * (`App.main`, `App.java:136-162`) — driven as a streaming query over a
  * directory this test populates, plus the batch twin over the same
  * files through the same transform.
  */
class PipelineE2ESpec extends SparkSpec {

  private def auditLine(user: String, time: String, result: Int, count: Int): String =
    s"""{"repoType":9,"repo":"cm_kafka","reqUser":"$user","evtTime":"$time",""" +
      s""""access":"describe","result":$result,"policy":5,"event_count":$count,""" +
      s""""seq_num":1,"event_dur_ms":0,"tags":[],"cluster_name":"cl1"}"""

  private def writeTree(root: java.io.File): Unit = {
    val day = new java.io.File(root, "20210401")
    day.mkdirs()
    Files.writeString(new java.io.File(day, "audit-1.log").toPath,
      Seq(
        auditLine("wdyson", "2021-04-01 10:00:00.000", 0, 10),
        auditLine("wdyson", "2021-04-01 10:10:00.000", 1, 1),
        "{malformed json",
        auditLine("bob", "2021-04-01 10:10:00.000", 0, 1)
      ).mkString("", "\n", "\n"))
    Files.writeString(new java.io.File(day, "audit-2.log").toPath,
      auditLine("bob", "2021-04-01 10:20:00.000", 0, 1) + "\n")
  }

  test("streaming: file tree -> parse -> sessionize -> formatted memory sink") {
    val root = Files.createTempDirectory("audit_e2e").toFile
    writeTree(root)

    val lines = graft.sources.AuditSource.stream(spark, root.getAbsolutePath)
    // watermark 0 so bounded input emits all sessions once files drain
    val out = AuditSessionPipeline.formatted(lines, gapSeconds = 1200, watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("e2e_out")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // a later-arriving file pushes the watermark past both session
      // ends, closing them (same mechanics as production: sessions emit
      // when newer events arrive)
      val day2 = new java.io.File(root, "20210402")
      day2.mkdirs()
      Files.writeString(new java.io.File(day2, "audit-3.log").toPath,
        auditLine("zz", "2021-04-02 10:00:00.000", 1, 1) + "\n")
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = spark.table("e2e_out").collect().map(_.getString(0)).sorted
      assert(rows.length == 2, rows.toSeq)
      assert(rows.exists(_.startsWith("user='bob' denies=2")), rows.toSeq)
      assert(rows.exists(_.startsWith("user='wdyson' denies=10")), rows.toSeq)
    } finally q.stop()
  }

  test("Trigger.AvailableNow backfill: processes the whole tree, then terminates itself") {
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("audit_backfill").toFile
    writeTree(root)
    // the closing record that pushes the watermark past both sessions —
    // present BEFORE the query starts (a backfill over historical data)
    val day2 = new java.io.File(root, "20210402")
    day2.mkdirs()
    Files.writeString(new java.io.File(day2, "audit-3.log").toPath,
      auditLine("zz", "2021-04-02 10:00:00.000", 1, 1) + "\n")

    val lines = graft.sources.AuditSource.stream(spark, root.getAbsolutePath)
    val out = AuditSessionPipeline.formatted(lines, gapSeconds = 1200, watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("backfill_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      // AvailableNow drains everything present at start, then STOPS on
      // its own — the batch-catchup mode a backfill job uses
      assert(q.awaitTermination(120000), "query did not self-terminate")
      val rows = spark.table("backfill_out").collect().map(_.getString(0)).sorted
      assert(rows.length == 2, rows.toSeq)
      assert(rows.exists(_.startsWith("user='bob' denies=2")), rows.toSeq)
      assert(rows.exists(_.startsWith("user='wdyson' denies=10")), rows.toSeq)
    } finally q.stop()
  }

  test("streaming files sink: sessions land as parquet, exactly-once manifest") {
    val root = Files.createTempDirectory("audit_e2e_files").toFile
    writeTree(root)
    val outDir = Files.createTempDirectory("audit_e2e_sink").toFile
    val cpDir = Files.createTempDirectory("audit_e2e_cp").toFile

    val config = AuditSessionPipeline.Config(
      auditPath = root.getAbsolutePath,
      pollSeconds = 1,
      minDate = None,
      gapSeconds = 1200,
      output = "files",
      checkpoint = Some(cpDir.getAbsolutePath),
      kafkaTopic = None,
      kafkaOptions = Map.empty,
      outputPath = Some(outDir.getAbsolutePath))

    val lines = graft.sources.AuditSource.stream(spark, root.getAbsolutePath)
    val out = AuditSessionPipeline.formatted(lines, gapSeconds = 1200, watermark = "0 seconds")
    val q = AuditSessionPipeline.writer(out, config).start()
    try {
      q.processAllAvailable()
      val day2 = new java.io.File(root, "20210402")
      day2.mkdirs()
      Files.writeString(new java.io.File(day2, "audit-3.log").toPath,
        auditLine("zz", "2021-04-02 10:00:00.000", 1, 1) + "\n")
      q.processAllAvailable()
      q.processAllAvailable()

      // read back through the sink's commit manifest (_spark_metadata)
      val rows = spark.read.parquet(outDir.getAbsolutePath)
        .collect().map(_.getString(0)).sorted
      assert(rows.length == 2, rows.toSeq)
      assert(rows.exists(_.startsWith("user='bob' denies=2")), rows.toSeq)
      assert(rows.exists(_.startsWith("user='wdyson' denies=10")), rows.toSeq)
    } finally q.stop()
  }

  test("batch twin: same files, same transform, same results") {
    val root = Files.createTempDirectory("audit_e2e_batch").toFile
    writeTree(root)
    val lines = graft.sources.AuditSource.batch(spark, root.getAbsolutePath)
    val res = AuditSessionPipeline.transform(lines, gapSeconds = 1200)
      .collect().map(r => r.getAs[String]("reqUser") -> r.getAs[Long]("denies")).toMap
    assert(res == Map("wdyson" -> 10L, "bob" -> 2L))
  }

  test("batch backfill with min_date: pruned listing -> parse -> sessionize") {
    val root = Files.createTempDirectory("audit_e2e_prune").toFile
    writeTree(root) // 20210401 with the 4-event scenario
    // an older day that min_date must exclude at LISTING time — its
    // denied events would otherwise add a third session
    val oldDay = new java.io.File(root, "20210301")
    oldDay.mkdirs()
    Files.writeString(new java.io.File(oldDay, "audit-0.log").toPath,
      auditLine("mallory", "2021-03-01 09:00:00.000", 0, 7) + "\n")

    val props = new java.util.Properties()
    props.setProperty("audit.path", root.getAbsolutePath)
    props.setProperty("audit.min_date", "20210401")
    props.setProperty("session.duration", "1200")
    val config = AuditSessionPipeline.Config.fromProperties(props)

    val lines = AuditSessionPipeline.batchLines(spark, config)
    val res = AuditSessionPipeline.transform(lines, gapSeconds = 1200)
      .collect().map(r => r.getAs[String]("reqUser") -> r.getAs[Long]("denies")).toMap
    assert(res == Map("wdyson" -> 10L, "bob" -> 2L)) // mallory pruned

    // and without min_date the excluded day IS processed
    val all = AuditSessionPipeline.batchLines(
      spark, config.copy(minDate = None))
    val resAll = AuditSessionPipeline.transform(all, gapSeconds = 1200)
      .collect().map(r => r.getAs[String]("reqUser") -> r.getAs[Long]("denies")).toMap
    assert(resAll == Map("wdyson" -> 10L, "bob" -> 2L, "mallory" -> 7L))
  }
}
