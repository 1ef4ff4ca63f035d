package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization — the storage/bandwidth lever for ANN at
  * scale: int8 symmetric per-vector quantization shrinks a float
  * embedding column 4× (and the shuffle that moves it).
  *
  * Determinism discipline: rounding is `floor(x + 0.5)` (Java
  * `Math.round` semantics) rather than `round()`, whose half-way rule
  * differs across engines; every double op (widen, ·127, /maxabs,
  * +0.5) is in a fixed order, so Spark and the DuckDB oracle agree
  * bit-for-bit. All map-side built-in higher-order functions — no
  * shuffle, no UDF.
  */
object Quantize {

  /** Per-vector symmetric int8 quantization of an `array<float>` column.
    * Returns (idCol, qvec: array<int> in [−127, 127], scale: double) —
    * dequantize as q·scale. Zero vectors (maxabs 0) quantize to zeros
    * with scale 0 (the 0/0 → NaN guard).
    */
  def toInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val maxabs = array_max(transform(col(vecCol), v => abs(v)))
    val q = transform(
      col(vecCol),
      v => when(maxabs === 0.0f, lit(0))
        .otherwise(floor(v.cast("double") * 127.0 / maxabs.cast("double") + 0.5).cast("int"))
    )
    df.select(
      col(idCol),
      q.as("qvec"),
      (maxabs.cast("double") / 127.0).as("scale")
    )
  }

  /** Dequantize back to doubles (lossy inverse, for spec round-trip
    * error bounds): v ≈ q · scale.
    */
  def fromInt8(qvecCol: String, scaleCol: String): Column =
    transform(col(qvecCol), q => q.cast("double") * col(scaleCol))
}
