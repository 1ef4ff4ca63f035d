package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-wise score normalization — the standard per-domain/per-language
  * calibration step before mixing corpus quality scores (a raw length
  * or LM score is not comparable across sources; its z-score within the
  * source is).
  *
  * Scale shape: one partial-aggregated shuffle computes per-group
  * (Σx, Σx², n); the tiny group table is BROADCAST back onto the rows,
  * so the data side is scanned once and never re-shuffled. Group count
  * is assumed dimension-like (languages, sources) — exactly when
  * z-scoring is meaningful.
  *
  * Determinism: moments are exact integer sums (the value column must
  * be integral, e.g. lengths or counts); the double chain per row
  * (two divisions, one multiply, subtract, IEEE sqrt, divide) is a
  * fixed op order, so values are bit-exact across engines.
  */
object Normalize {

  /** Per-group moments of an integral column: (group, __sx, __sx2, __n).
    * The reference-corpus statistics a scoring pass normalizes against.
    */
  def groupMoments(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    // widen before squaring: an IntegerType value column would wrap at
    // v >= 46341 under Int multiplication before the Long sum
    val v = col(valueCol).cast("long")
    df.groupBy(col(groupCol)).agg(
      sum(v).as("__sx"),
      sum(v * v).as("__sx2"),
      count(lit(1)).as("__n"))
  }

  /** Merge per-group moment tables by summation — the aggregation-
    * lifecycle primitive: moments are EXACT integer sums, so corpus
    * statistics maintained as (Σx, Σx², n) per group update under
    * appends without rescanning the corpus — merge the persisted table
    * with the delta batch's moments and the result is bit-identical to
    * a full recompute (q_zscore_incremental pins this through the
    * z-score chain). Cost ∝ group count, not data size.
    */
  def mergeMoments(groupCol: String, tables: Seq[DataFrame]): DataFrame = {
    require(tables.nonEmpty, "mergeMoments: need at least one moments table")
    tables.reduce(_ unionByName _)
      .groupBy(col(groupCol))
      .agg(
        sum(col("__sx")).as("__sx"),
        sum(col("__sx2")).as("__sx2"),
        sum(col("__n")).as("__n"))
  }

  /** Score rows against PRECOMPUTED moments — the stream-static shape:
    * moments come from a batch pass over the reference corpus and are
    * broadcast into the (possibly streaming) scoring pass, which stays
    * stateless. Output: `keep` columns plus `z`.
    */
  def zscoreAgainst(
      df: DataFrame,
      moments: DataFrame,
      groupCol: String,
      valueCol: String,
      keep: Seq[String]
  ): DataFrame = {
    val v = col(valueCol).cast("long")
    val mean = col("__sx").cast("double") / col("__n").cast("double")
    val variance = col("__sx2").cast("double") / col("__n").cast("double") - mean * mean
    val z: Column = when(variance <= 0, lit(0.0))
      .otherwise((v.cast("double") - mean) / sqrt(variance))
    df.join(broadcast(moments), groupCol)
      .select(keep.map(col) :+ z.as("z"): _*)
  }

  /** Per-group z-score of an integral column. Output: the input columns
    * in `keep` plus `z`. Degenerate groups (zero variance) score 0.
    */
  def zscoreByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      keep: Seq[String]
  ): DataFrame =
    zscoreAgainst(df, groupMoments(df, groupCol, valueCol), groupCol, valueCol, keep)
}
