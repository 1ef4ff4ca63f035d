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

  /** Per-group z-score of an integral column. Output: the input columns
    * in `keep` plus `z`. Degenerate groups (zero variance) score 0.
    */
  def zscoreByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      keep: Seq[String]
  ): DataFrame = {
    // widen before squaring: an IntegerType value column would wrap at
    // v >= 46341 under Int multiplication before the Long sum
    val v = col(valueCol).cast("long")
    val g = df.groupBy(col(groupCol)).agg(
      sum(v).as("__sx"),
      sum(v * v).as("__sx2"),
      count(lit(1)).as("__n"))
    val mean = col("__sx").cast("double") / col("__n").cast("double")
    val variance = col("__sx2").cast("double") / col("__n").cast("double") - mean * mean
    val z: Column = when(variance <= 0, lit(0.0))
      .otherwise((v.cast("double") - mean) / sqrt(variance))
    df.join(broadcast(g), groupCol)
      .select(keep.map(col) :+ z.as("z"): _*)
  }
}
