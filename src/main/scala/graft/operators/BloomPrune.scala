package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge

/** Bloom-filter join pruning — the manual form of Spark's runtime row
  * filter (`InjectRuntimeFilter`): build a compact bloom filter over
  * the (selective) build side's join keys, broadcast it, and drop
  * probe rows that cannot match BEFORE they reach the join's shuffle.
  *
  * At 100 TB this is the difference between shuffling the whole fact
  * table and shuffling the ~matching fraction: the filter is a few MB
  * regardless of probe size, rides a 1-row broadcast, and the probe
  * scan-side filter is codegen'd. False positives are removed by the
  * join itself, so results are exactly those of the plain join — which
  * is what the oracle checks.
  *
  * Uses Spark's native `BloomFilterAggregate` / `BloomFilterMightContain`
  * Catalyst expressions over `xxhash64(key)` (the same pairing the
  * optimizer's runtime filter injects), wired through [[ColumnBridge]].
  */
object BloomPrune {

  /** One-row DataFrame holding a bloom filter (binary) over `key`. */
  def bloomOf(build: DataFrame, key: String, expectedItems: Long): DataFrame =
    build.agg(ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col(key))), expectedItems)
        .toAggregateExpression()).as("__bf"))

  /** `might_contain(bloom, xxhash64(c))` as a Column. */
  private def mightContain(bloom: Column, c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom),
      ColumnBridge.expression(xxhash64(c))))

  /** Inner-join `probe ⋈ build` with the probe side pre-pruned by a
    * bloom filter of the build keys. Exactly equal to the plain join
    * (the join removes bloom false positives); the bloom stage only
    * cuts what the probe shuffles. `might_contain` requires its filter
    * as a scalar subquery, so the 1-row bloom aggregate rides in via
    * `Dataset.scalar()` (planned as a reusable broadcast subquery).
    */
  def prunedJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L
  ): DataFrame = {
    val bf = bloomOf(build, buildKey, expectedItems).scalar()
    val joined = probe
      .filter(mightContain(bf, probe(probeKey)))
      .join(build, probe(probeKey) === build(buildKey))
    // same-named keys would leave an ambiguous duplicate column; keep
    // the probe side (values are equal on joined rows)
    if (probeKey == buildKey) joined.drop(build(buildKey)) else joined
  }
}
