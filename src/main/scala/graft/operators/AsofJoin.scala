package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each probe row, the most recent build-side event
  * time at or before the probe's time, per key. Spark has no native
  * as-of operator; the naive formulation (equi-join on key + time
  * inequality + per-pair rank) shuffles the full cross product of each
  * key group.
  *
  * This implementation is the single-shuffle union trick: tag both
  * inputs, union them, and take a per-key running `last(build_time)`
  * over (time, side) ordering — build rows sort before probe rows at
  * equal times, giving `build.time <= probe.time` semantics (DuckDB /
  * pandas `merge_asof` "backward" direction). One exchange on the key,
  * no join blowup, state is one column — this is the 100 TB shape.
  */
object AsofJoin {

  /** @param probe    rows to annotate (any schema)
    * @param build    rows providing the as-of times
    * @param keyCol   equi-key present in both inputs
    * @param timeCol  orderable time column present in both inputs
    * @param outCol   name of the appended column: latest build time
    *                 ≤ the probe row's time, null if none
    */
  def lastTimeBefore(
      probe: DataFrame,
      build: DataFrame,
      keyCol: String,
      timeCol: String,
      outCol: String
  ): DataFrame = {
    val probeCols = probe.columns
    val pu = probe.select(
      col(keyCol).as("__key"), col(timeCol).as("__t"), lit(1).as("__side"),
      struct(probeCols.map(col): _*).as("__row"))
    val bu = build.select(
      col(keyCol).as("__key"), col(timeCol).as("__t"), lit(0).as("__side"))
      .withColumn("__row", lit(null).cast(pu.schema("__row").dataType))

    // rowsBetween(-∞, -1): strictly-previous rows; a build row at the
    // exact probe time sorts first (side 0 < 1), so ties are included —
    // matching ASOF `probe.t >= build.t`
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, -1)

    pu.unionByName(bu)
      .withColumn(outCol,
        last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(probeCols.map(c => col(s"__row.$c")) :+ col(outCol): _*)
  }

  /** Forward as-of: the earliest build-side time at or after each probe
    * row's time, per key (merge_asof "forward" direction). Same
    * single-shuffle union trick mirrored: probe rows sort before build
    * rows at equal times, and the window looks strictly ahead.
    */
  def firstTimeAfter(
      probe: DataFrame,
      build: DataFrame,
      keyCol: String,
      timeCol: String,
      outCol: String
  ): DataFrame = {
    val probeCols = probe.columns
    val pu = probe.select(
      col(keyCol).as("__key"), col(timeCol).as("__t"), lit(0).as("__side"),
      struct(probeCols.map(col): _*).as("__row"))
    val bu = build.select(
      col(keyCol).as("__key"), col(timeCol).as("__t"), lit(1).as("__side"))
      .withColumn("__row", lit(null).cast(pu.schema("__row").dataType))

    // rowsBetween(1, +∞): strictly-following rows; a build row at the
    // exact probe time sorts after (side 1 > 0), so ties are included —
    // matching ASOF `build.t >= probe.t`
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(1, Window.unboundedFollowing)

    pu.unionByName(bu)
      .withColumn(outCol,
        first(when(col("__side") === 1, col("__t")), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(probeCols.map(c => col(s"__row.$c")) :+ col(outCol): _*)
  }
}
