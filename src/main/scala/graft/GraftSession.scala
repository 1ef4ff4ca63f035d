package graft

import org.apache.spark.sql.SparkSession

/** The library's recommended SparkSession setup — what a deployment
  * would configure before using graft operators:
  *
  *   - UTC session timezone (the audit timestamp format is zone-less;
  *     reproducible epoch-millis output, `App.java:72-73` semantics);
  *   - [[graft.functions.GraftExtensions]] installed so the native
  *     expressions are callable from SQL (`graft_dot`,
  *     `graft_poly_hash`, `graft_simhash64`);
  *   - AQE left on (runtime coalescing + skew-join splitting);
  *   - shuffle parallelism sized to the caller's cluster, not the
  *     200-partition default.
  *
  * All settings are plain configs — users with an existing session can
  * replicate them instead of calling this.
  */
object GraftSession {

  def builder(shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")

  /** Local session for tests / single-node runs. */
  def local(cores: Int): SparkSession =
    builder(shufflePartitions = cores)
      .master(s"local[$cores]")
      .getOrCreate()
}
