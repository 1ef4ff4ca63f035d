package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch — the mergeable frequency estimator that answers
  * "how often does token X occur" over 100 TB without materializing
  * the full term dictionary: d hash rows × w buckets of exact integer
  * counts (d·w cells total, independent of corpus size), point
  * estimates as the MIN over the d counters a key hashes to —
  * one-sided error (estimates never undercount), bounded overcount
  * (Cormode & Muthukrishnan 2005).
  *
  * Joins the engine's mergeable-summary family (HLL distincts, moment
  * merges, MinHash signature merges, DSIR bucket models): counts are
  * ADDITIVE, so per-shard sketches merge by cell-wise sum and equal
  * the full build bit-exactly — maintain incrementally per ingest
  * batch, never rescan history. All integer arithmetic over the same
  * polynomial token hash as the DSIR chain, so every cell and every
  * estimate is oracle-checkable in SQL.
  */
object Sketch {

  val CmsMod: Long = 1000000007L

  /** One multiplier per hash row — distinct odd constants over the
    * shared polynomial-hash modulus. d = CmsMults.size = 4.
    */
  val CmsMults: Seq[Long] = Seq(31L, 37L, 41L, 43L)

  private def bucketOf(token: Column, mult: Long, w: Int): Column =
    pmod(graft.functions.GraftFunctions.polyHash(token, mult, CmsMod), lit(w.toLong))

  /** Build the sketch over a text column's whitespace tokens: ONE
    * corpus scan (each token explodes into its d (row, bucket) cells —
    * constant fan-out), one partial-agg shuffle into the d·w-cell
    * table. Returns (row, bucket, cnt); absent cells are zero.
    */
  def countMin(docs: DataFrame, textCol: String, w: Int): DataFrame = {
    require(w > 0, "Sketch.countMin: positive width")
    val cells = array(CmsMults.zipWithIndex.map { case (m, i) =>
      struct(lit(i).as("row"), bucketOf(col("__t"), m, w).as("bucket"))
    }: _*)
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .select(explode(cells).as("__c"))
      .groupBy(col("__c.row").as("row"), col("__c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two sketches (same d, w): cell-wise sum — equals building
    * on the concatenated corpora bit-exactly (counts are additive).
    */
  def countMinMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Collect a sketch into dense per-row arrays for map-side
    * estimation — d·w longs, the bounded decision-table
    * materialization (same contract as the DSIR model arrays).
    */
  def countMinArrays(sketch: DataFrame, w: Int): Array[Array[Long]] = {
    require(w > 0, "Sketch.countMinArrays: positive width")
    val out = Array.fill(CmsMults.size, w)(0L)
    sketch.select(col("row").cast("int"), col("bucket").cast("int"),
      col("cnt").cast("long"))
      .collect()
      .foreach { r =>
        val (row, b) = (r.getInt(0), r.getInt(1))
        require(row >= 0 && row < CmsMults.size && b >= 0 && b < w,
          s"Sketch.countMinArrays: cell ($row, $b) outside d=${CmsMults.size}, w=$w — " +
            "was the sketch built with a different width?")
        // SUM, not overwrite: an unaggregated union of sketches then
        // behaves as the cell-wise merge instead of silently dropping
        // counts (which would break the never-undercount guarantee)
        out(row)(b) += r.getLong(2)
      }
    out
  }

  /** Map-side point estimate against a collected sketch: the MIN over
    * the d counters the token hashes to. Never undercounts; pure
    * projection, no shuffle — streaming-safe like [[Sampling.dsirScore]].
    */
  def countMinEstimate(token: Column, sketch: Array[Array[Long]], w: Int): Column =
    CmsMults.zipWithIndex.map { case (m, i) =>
      coalesce(
        try_element_at(lit(sketch(i)), bucketOf(token, m, w).cast("int") + 1),
        lit(0L))
    }.reduce(least(_, _))
}
