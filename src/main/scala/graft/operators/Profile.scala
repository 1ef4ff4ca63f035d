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
}
