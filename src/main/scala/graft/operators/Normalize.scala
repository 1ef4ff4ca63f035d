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
    *
    * Overflow bounds: `__sx` is a long sum — exact while Σ|x| < 2^63
    * (|x| ≤ 1e9 needs ~9e9 rows per group to wrap; document counts and
    * lengths stay far inside). `__sx2` would NOT: Σx² wraps Int64 at
    * |x| ~ 1e5 over ~1e9 rows — silent z-score corruption at exactly
    * the 100 TB regime this exists for — so it accumulates as
    * DECIMAL(38,0): still exact integer arithmetic, still mergeable by
    * summation ([[mergeMoments]]), headroom to Σx² < 10^38.
    */
  def groupMoments(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    // widen before squaring: an IntegerType value column would wrap at
    // v >= 46341 under Int multiplication before the sum; the per-row
    // square is exact in DECIMAL(18,0)² → (37,0) for |x| < 10^18
    val v = col(valueCol).cast("long")
    val vd = col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 0))
    df.groupBy(col(groupCol)).agg(
      sum(v).as("__sx"),
      sum(vd * vd).as("__sx2"),
      count(lit(1)).as("__n"))
  }

  /** Merge per-group moment tables by summation — the aggregation-
    * lifecycle primitive: moments are EXACT integer sums (long Σx,
    * decimal Σx² — see [[groupMoments]]'s overflow bounds), so corpus
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

  /** Keep each group's top `keepPpm`-per-million rows by a score
    * column — rank-based threshold calibration ("keep the best decile
    * per language"), the selection rule quality scores feed. Rank
    * arithmetic only (no value-space percentile), so the kept set is
    * engine-exact: a row survives iff its (score desc, id asc) rank is
    * within ceil(n·keepPpm/1e6) of its group — integer ceiling
    * division, deterministic ties.
    *
    * One window pass per group (shuffle on the group key); the group
    * count rides the same partition, so no second aggregation job. At
    * a pathologically hot group, pre-thin like [[graft.operators
    * .Sampling.capPerGroup]] documents.
    */
  def topFractionByGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String,
      keepPpm: Long
  ): DataFrame = {
    require(keepPpm >= 0 && keepPpm <= 1000000L, "keepPpm in [0, 1e6]")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val wr = w.orderBy(col(scoreCol).desc, col(idCol).asc)
    val rn = Iterator.iterate("__rn")(_ + "_").dropWhile(df.columns.contains).next()
    val n = Iterator.iterate("__n")(_ + "_").dropWhile(df.columns.contains).next()
    df.withColumn(rn, row_number().over(wr))
      .withColumn(n, count(lit(1)).over(w))
      // ceil(n·ppm / 1e6) via true integer `div` (Column `/` is double)
      .filter(col(rn) <=
        expr(s"(`$n` * ${keepPpm}L + 999999L) div 1000000L"))
      .drop(rn, n)
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

  /** Embedding-space outlier screen: each vector's max absolute
    * per-lane z-score against the corpus's lane distribution — the
    * out-of-distribution filter an embedding-bearing pipeline runs
    * before clustering or ANN indexing trusts the geometry (a corrupt
    * encoder batch or wrong-modality rows light up as |z| spikes on
    * some lane).
    *
    * Determinism discipline: lane values snap to the 2⁻²⁰ grid (one
    * IEEE multiply + floor), so per-lane Σx and Σx² are order-free
    * integer sums; each z is then a fixed chain of two divisions, a
    * multiply-subtract, IEEE sqrt, and a divide (identical in both
    * engines), and the per-vector reduction is `array_max(abs(...))` —
    * order-free. Degenerate lanes (variance ≤ 0) score 0.
    *
    * Scale shape: ONE corpus-sized partial-agg shuffle builds the
    * dim-row lane-stats table (reducer state = dim longs — Σ(xq²) ≤
    * 2⁴⁰ per row, so the long sum holds to ~8e6 rows per lane per map
    * task and DECIMAL(38,0) is the swap past ~10¹² rows, as in
    * [[groupMoments]]); the stats collapse to a single broadcast array
    * row and scoring is a map-side fold over each vector — the corpus
    * never shuffles for the score, the [[graft.operators.Clustering]]
    * assignment shape.
    */
  def embeddingOutliers(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double
  ): DataFrame =
    scoreAgainstLaneStats(vecs, idCol, vecCol, laneStats(vecs, vecCol), tau)

  private val Grid = 1048576.0 // 2^20

  /** The reference half of [[embeddingOutliers]]: per-lane grid-snapped
    * integer moments collapsed to ONE broadcastable array row (sorted
    * by lane) — persist this next to an embedding corpus and every
    * later scoring pass (batch or streaming) skips the stats shuffle.
    */
  def laneStats(vecs: DataFrame, vecCol: String): DataFrame =
    vecs
      .select(posexplode(col(vecCol)).as(Seq("lane", "x")))
      .select(col("lane"),
        floor(col("x").cast("double") * Grid).cast("long").as("xq"))
      .groupBy(col("lane"))
      .agg(
        sum(col("xq")).as("sq"),
        sum(col("xq") * col("xq")).as("sq2"),
        count(lit(1)).as("n"))
      .agg(
        sort_array(collect_list(struct(col("lane"), col("sq"), col("sq2"), col("n"))))
          .as("__lane_stats"))

  /** The scoring half of [[embeddingOutliers]] against a precomputed
    * [[laneStats]] row. Pure map-side (one-row broadcast cross join +
    * a per-vector fold), so the SAME call screens a STREAMING frame of
    * arriving vectors against a static reference corpus — stateless,
    * Append-mode, no watermark — mirroring the digest/near-dup/semantic
    * ingest screens in [[graft.streaming.StreamingDedup]].
    */
  def scoreAgainstLaneStats(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      stats: DataFrame,
      tau: Double
  ): DataFrame = {
    val laneScore = array_max(transform(sequence(lit(0), size(col(vecCol)) - 1), i => {
      val s = element_at(col("__lane_stats"), i + 1)
      val xq = floor(element_at(col(vecCol), i + 1).cast("double") * lit(Grid))
        .cast("long")
      val mean = s("sq").cast("double") / s("n").cast("double")
      val variance = s("sq2").cast("double") / s("n").cast("double") - mean * mean
      abs(when(variance <= 0.0, lit(0.0))
        .otherwise((xq.cast("double") - mean) / sqrt(variance)))
    }))
    vecs
      .crossJoin(broadcast(stats))
      .select(
        col(idCol),
        // Total expression: an empty (or null) vector makes
        // sequence(0, size - 1) DESCEND and element_at(vec, 1) throw —
        // the same hazard Vocab.pairStats guards. This operator IS the
        // screen for corrupt/wrong-modality rows, so a degenerate row
        // must surface as a flagged outlier (+∞ score), not kill the
        // batch job or the Append-mode stream.
        when(size(col(vecCol)) > 0, laneScore)
          .otherwise(lit(Double.PositiveInfinity)).as("out_score"))
      .withColumn("is_outlier", col("out_score") > tau)
  }
}
