package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 + S2 of the reference: the continuously-monitored audit-log
  * directory source with optional min-date pruning.
  *
  * Reference behavior (`App.java:36-47`, `DateFileFilter.java:14-38`):
  * recursively tail a directory tree of newline-delimited JSON files,
  * re-listing every `audit.poll` seconds; optionally skip directories
  * named `YYYYMMDD` older than `audit.min_date`; hidden/`_`-prefixed
  * files are always skipped (Spark file sources do this by default too).
  *
  * Spark-first mapping: `readStream.format("text")` with
  * `recursiveFileLookup`; the poll interval becomes the query trigger
  * (`Trigger.ProcessingTime`), configured at sink time. Date pruning:
  *
  *   - **Scale path (preferred):** lay the tree out Hive-style
  *     (`dt=YYYYMMDD/...`) and filter on the `dt` partition column —
  *     Catalyst's PruneFileSourcePartitions then skips whole directories
  *     at listing time, exactly `DateFileFilter`'s effect, at any scale.
  *   - **Compatibility path:** for a bare `YYYYMMDD/` tree (no `key=`),
  *     derive the date from `input_file_name()` and filter. Correct, but
  *     prunes after listing; only the row scan is saved.
  */
object AuditSource {

  /** Streaming text source over a (possibly partitioned) directory tree.
    *
    * @param maxFilesPerTrigger backpressure knob: cap files ingested per
    *        micro-batch so a large backlog (or a bulk backfill drop)
    *        drains in bounded-size batches instead of one giant one —
    *        essential when pointing the stream at months of history
    */
  def stream(
      spark: SparkSession,
      path: String,
      maxFilesPerTrigger: Option[Int] = None
  ): DataFrame = {
    val reader = spark.readStream
      .format("text")
      .option("recursiveFileLookup", "true")
    maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
      .load(path)
  }

  /** Batch twin — identical downstream operators apply (unified API). */
  def batch(spark: SparkSession, path: String): DataFrame =
    spark.read
      .format("text")
      .option("recursiveFileLookup", "true")
      .load(path)

  /** Hive-partitioned (`dt=YYYYMMDD`) variants: partition pruning does the
    * directory skipping that DateFileFilter hand-implements.
    */
  def streamPartitioned(spark: SparkSession, path: String, minDate: Option[String]): DataFrame = {
    val df = spark.readStream.format("text").load(path)
    applyMinDate(df, minDate)
  }

  def batchPartitioned(spark: SparkSession, path: String, minDate: Option[String]): DataFrame =
    applyMinDate(spark.read.format("text").load(path), minDate)

  /** BASIC_ISO_DATE (`YYYYMMDD`) min-date filter on the dt partition
    * column; comparison is lexicographic = chronological for this format
    * (same trick DateFileFilter relies on).
    */
  private def applyMinDate(df: DataFrame, minDate: Option[String]): DataFrame =
    minDate.fold(df)(d => df.filter(col("dt") >= lit(d)))

  /** Compatibility pruning for bare `YYYYMMDD/` trees: extract the date
    * component from the file path; non-date paths always pass (matching
    * `DateFileFilter.java:29-33`). Prunes AFTER listing — prefer
    * [[batchPruned]] (enumeration-time skip) or the `dt=` layout.
    */
  def filterByPathDate(df: DataFrame, minDate: String): DataFrame = {
    val dateInPath = regexp_extract(input_file_name(), "/([0-9]{8})/", 1)
    df.filter(dateInPath === "" || dateInPath >= lit(minDate))
  }

  /** Glob alternation matching exactly the level-1 directory names the
    * min-date rule keeps, so a file source can prune at LISTING time
    * without freezing the directory set:
    *
    *   - 8-digit names `>= minDate` lexicographically — one branch per
    *     digit position (the standard prefix-range decomposition), so
    *     day directories created AFTER stream start still match (unlike
    *     an enumerate-the-survivors-at-start glob, which would go stale
    *     the first midnight);
    *   - every non-8-digit name and every name containing a non-digit
    *     (the reference passes names that don't parse as dates,
    *     `DateFileFilter.java:29-33`).
    *
    * Hadoop compiles `{a,b,...}` to ONE regex alternation, so a name
    * matching several branches lists once — no duplicate reads.
    *
    * Parse-check parity for 8-digit NON-dates: names whose month is not
    * 01–12 or whose day is not 01–31 cannot parse, so `DateFileFilter`
    * keeps them regardless of the min — six keep-branches below
    * enumerate exactly those shapes (`00001332`, `20241490`, …).
    * Residual documented divergence: day-vs-month-length and leap
    * rules are not glob-expressible (`20210230` fails STRICT parse and
    * the reference keeps it, but this glob prunes it when below min) —
    * [[batchPruned]]/[[DatePrunedFileIndex]] run the real parse and
    * have full parity. Every parseable date compares identically
    * (lexicographic == chronological for BASIC_ISO_DATE), and 8-digit
    * non-dates ABOVE the min (`99999999`) pass both either way.
    */
  private[graft] def minDateGlob(minDate: String): String = {
    require(minDate.matches("[0-9]{8}"),
      s"audit.min_date must be BASIC_ISO_DATE (YYYYMMDD), got: $minDate")
    val ge = minDate +: (0 until 8).collect {
      case i if minDate(i) < '9' =>
        minDate.take(i) + s"[${(minDate(i) + 1).toChar}-9]" + "[0-9]" * (7 - i)
    }
    val d = "[0-9]"
    // 8-digit shapes that cannot be dates: month 00 / 13-99, day 00 / 32-99
    val nonParse = Seq(
      d * 4 + "00" + d * 2,
      d * 4 + "1[3-9]" + d * 2,
      d * 4 + "[2-9]" + d * 3,
      d * 6 + "00",
      d * 6 + "3[2-9]",
      d * 6 + "[4-9]" + d)
    val nonDate = (1 to 7).map("?" * _) ++ Seq("*[^0-9]*", d * 9 + "*")
    (ge ++ nonParse ++ nonDate).mkString("{", ",", "}")
  }

  /** Streaming source with ENUMERATION-time date pruning for bare
    * `YYYYMMDD/` trees: the [[minDateGlob]] pattern rides the load path,
    * so the file-stream source's recurring poll never lists — let alone
    * splits or schedules — a below-min-date day directory, while new
    * surviving days appearing later still match. This is the streaming
    * twin of [[batchPruned]] (the reference prunes during every poll,
    * `DateFileFilter.java:19-38` wired at `App.java:39-41`); the glob
    * prunes the day level, and [[filterByPathDate]] composes on top when
    * date dirs can also appear deeper in the tree.
    */
  def streamPruned(
      spark: SparkSession,
      path: String,
      minDate: String,
      maxFilesPerTrigger: Option[Int] = None
  ): DataFrame =
    stream(spark, s"${path.stripSuffix("/")}/${minDateGlob(minDate)}",
      maxFilesPerTrigger)

  /** Enumeration-time pruning for bare `YYYYMMDD/` trees — full
    * `DateFileFilter` parity: the listing itself never descends into
    * below-min-date directories ([[DatePrunedFileIndex]]), so file
    * splits and tasks scale with the surviving days only. Use when the
    * tree cannot be re-laid-out Hive-style.
    */
  def batchPruned(spark: SparkSession, path: String, minDate: Option[String]): DataFrame =
    batchPrunedWithIndex(spark, path, minDate)._1

  /** As [[batchPruned]], also returning the index (tests assert which
    * directories the walk visited).
    */
  private[graft] def batchPrunedWithIndex(
      spark: SparkSession,
      path: String,
      minDate: Option[String]
  ): (DataFrame, DatePrunedFileIndex) = {
    import org.apache.spark.sql.execution.datasources.HadoopFsRelation
    import org.apache.spark.sql.execution.datasources.text.TextFileFormat
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val index = new DatePrunedFileIndex(spark, new org.apache.hadoop.fs.Path(path), minDate)
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = StructType(Nil),
      dataSchema = StructType(Seq(StructField("value", StringType))),
      bucketSpec = None,
      fileFormat = new TextFileFormat(),
      options = Map.empty)(classic)
    (classic.baseRelationToDataFrame(relation), index)
  }
}
