package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Audit

/** P1 + P2 of the reference pipeline: parse newline-delimited JSON audit
  * lines into typed rows and drop unusable records.
  *
  * Reference semantics (`Audit.java:39-47`, `App.java:49-53`):
  *   - unknown JSON properties are ignored;
  *   - a malformed line parses to `null` (never throws);
  *   - records with a null `reqUser` are dropped (parse-nulls collapse
  *     into the same predicate, since every field of a failed parse is
  *     null).
  *
  * Spark-first mapping: `from_json` in PERMISSIVE mode gives exactly the
  * lenient-parse / null-on-corrupt contract with zero custom code, stays
  * inside whole-stage codegen, and lets Catalyst prune the parsed struct
  * down to the fields downstream operators actually read
  * (`OptimizeJsonExprs` rewrites `from_json(...).field` chains) — an
  * optimization the row-at-a-time reference cannot perform.
  */
object AuditJson {

  /** `lines` must have a single string column named `value` (the schema
    * of `spark.read.text` / `readStream.text`). Works identically on
    * batch and streaming DataFrames.
    */
  def parse(lines: DataFrame): DataFrame =
    lines
      .select(
        from_json(
          col("value"),
          Audit.schema,
          Map("timestampFormat" -> Audit.TimestampFormat)
        ).as("a")
      )
      .select(col("a.*"))
      .filter(col("reqUser").isNotNull)
}
