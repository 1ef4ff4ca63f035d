package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling — the intake report a pipeline runs before trusting a
  * new source: per column, row count, null count, and exact distinct
  * count. One aggregation job per profiled column unioned into a single
  * result (each is one partial-aggregated shuffle; `count distinct`
  * plans as the standard two-phase expand — swap in HLL
  * (`approx_count_distinct`) at 100 TB when exactness isn't required,
  * mirroring the q_hll_distinct / q_approx_distinct pair).
  *
  * Output: (column, n_rows, n_null, n_distinct) — all exact integers,
  * so the oracle is a UNION ALL of per-column SELECTs.
  */
object Profile {

  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.columns: need at least one column")
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        count(when(col(c).isNull, lit(1))).as("n_null"),
        countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"))
    }.reduce(_ unionAll _)
  }

  /** The intake-scale profile: same (column, n_rows, n_null,
    * n_distinct) report as [[columns]] from ONE scan of the table —
    * every per-column counter and an HLL++ distinct sketch
    * (`approx_count_distinct`, relative error `rsd`) ride a single
    * aggregation into one wide row, which a map-side explode then
    * unpivots back to one row per column. Profiling C columns of a
    * 100 TB table costs one scan + one scalar-state shuffle instead of
    * [[columns]]'s C scans and C exact-distinct expands; keep the
    * exact variant for narrow tables where exactness matters more
    * than passes.
    */
  def columnsFast(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "Profile.columnsFast: need at least one column")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        count(when(col(c).isNull, lit(1))).as(s"__null_$c"),
        approx_count_distinct(col(c), rsd).as(s"__dist_$c")))
    val entries = cols.map(c => struct(
      lit(c).as("column"), col("n_rows"),
      col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("p"))
      .select("p.*")
  }

  /** k-anonymity audit: annotate every row with the size of its
    * quasi-identifier group and whether that group clears `k` — the
    * release gate for training exports carrying attributes that could
    * re-identify a person when combined (Sweeney's k-anonymity model).
    * Rows with `keep = false` are the ones a privacy-preserving export
    * must suppress or generalize.
    *
    * Scale shape: quasi-identifier combinations are low-cardinality by
    * construction (that is what makes them quasi-identifiers), so the
    * group-size table partial-aggregates to a tiny frame that joins
    * back by BROADCAST — the corpus is scanned twice but never
    * shuffled. The window-count alternative would hash-partition the
    * full corpus by group; this shape stays scan-bound at 100 TB.
    */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "Profile.kAnonymity: need at least one quasi-identifier")
    val groups = df
      .groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("k_group"))
    df.join(broadcast(groups), quasiIds)
      .withColumn("keep", col("k_group") >= k)
  }
}
