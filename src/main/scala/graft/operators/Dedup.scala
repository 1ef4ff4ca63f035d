package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines, ordered by
  * cost: exact (hash group-by), n-gram Jaccard over shared-shingle
  * candidates, MinHash+LSH (the 100 TB path), and SimHash.
  *
  * Scale notes:
  *   - Exact dedup is one shuffle on a 64-hex digest — at 100 TB, group
  *     on the digest, never on the document text (shuffle bytes ∝ key
  *     size).
  *   - All-pairs similarity is quadratic and never run directly; both
  *     fuzzy variants generate candidates first (shared shingle / shared
  *     LSH bucket), so the join key distributes and only near-candidates
  *     meet. Hot shingles are capped (`MaxShingleFreq`) — the classic
  *     stop-shingle guard that keeps the candidate join skew-free.
  *   - All hashes are deterministic integer arithmetic (no engine-private
  *     hash functions), so results are reproducible and oracle-checkable.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: canonical row per distinct text = min id. Returns
    * (digest, canonical_id, n_copies).
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(sha2(col(textCol), 256).as("digest"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Keep one row per distinct text (first by id). */
  def dropExactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val canon = exactGroups(docs, idCol, textCol)
      .select(col("canonical_id").as(idCol))
    docs.join(canon, Seq(idCol), "left_semi")
  }

  // ------------------------------------------------------------- shingles

  /** Token n-gram shingles (distinct), as strings. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, "\\s+")
    array_distinct(
      transform(
        sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))
      )
    )
  }

  /** Deterministic polynomial hash of a string — engine-portable (pure
    * integer arithmetic over code points). Modulus and multiplier are
    * sized so h·mult + 0x10FFFF never exceeds a signed 64-bit long:
    * engines that check overflow (DuckDB) and engines that wrap (JVM)
    * then agree bit-for-bit.
    */
  val StrHashMod = 1000000007L
  def strHash(c: Column): Column =
    aggregate(
      filter(split(c, ""), ch => ch =!= ""),
      lit(0L),
      (h, ch) => (h * lit(131L) + ascii(ch)) % lit(StrHashMod)
    )

  /** Candidate-pair guard: shingles occurring in more than this many docs
    * are dropped from candidate generation (they pair everything with
    * everything — pure skew, no signal).
    */
  val MaxShingleFreq = 1000

  /** Near-duplicate pairs by exact n-gram Jaccard similarity, restricted
    * to pairs sharing ≥1 (non-hot) shingle. Returns
    * (id_a, id_b, n_a, n_b, n_common, jaccard) with id_a < id_b.
    */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double
  ): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("shingle"))
      .select(col("id"), strHash(col("shingle")).as("sh"))
      .distinct()

    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))

    val filtered = sh
      .withColumn("freq", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))))
      .filter(col("freq") <= MaxShingleFreq)
      .drop("freq")

    val a = filtered.select(col("id").as("id_a"), col("sh"))
    val b = filtered.select(col("id").as("id_b"), col("sh"))
    val common = a
      .join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))

    common
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn(
        "jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double")
      )
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_a", "n_b", "n_common", "jaccard")
  }

  // -------------------------------------------------------------- minhash

  /** MinHash parameters: k independent permutations h_i(x) = (a_i·x + b_i)
    * mod p over shingle hashes, banded for LSH. Fixed constants →
    * reproducible across runs and engines. p and the a_i stay below 2^31
    * so a_i·x never overflows a signed 64-bit long.
    */
  val MinhashP = 1000000007L
  def hashA(i: Int): Long = (2654435761L + 40503L * i) % MinhashP
  def hashB(i: Int): Long = (2246822519L + 604171L * i) % MinhashP

  /** MinHash signatures: one row per doc, `signature` = array of k mins.
    * Single shuffle (the groupBy on id); signature computation is
    * map-side.
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      k: Int
  ): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("shingle"))
      .select(col("id"), strHash(col("shingle")).as("sh"))
    val minExprs = (0 until k).map { i =>
      min((col("sh") % lit(MinhashP) * lit(hashA(i)) + lit(hashB(i))) % lit(MinhashP))
        .as(s"h$i")
    }
    sh.groupBy(col("id"))
      .agg(minExprs.head, minExprs.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"h$i")): _*).as("signature"))
  }

  /** MinHash+LSH candidate pairs: band the k-wide signature into
    * `bands` bands of k/bands rows; docs sharing any full band land in
    * the same bucket; bucket join yields candidates; estimated Jaccard =
    * fraction of agreeing signature positions. Returns
    * (id_a, id_b, est_jaccard).
    *
    * The 100 TB path: signatures are ~k·8 bytes/doc regardless of doc
    * size, the bucket join shuffles only (band_hash → id), and buckets
    * are naturally small for non-duplicate data.
    */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      k: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5
  ): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    val sigs = minhashSignatures(docs, idCol, textCol, n, k)

    val banded = sigs.select(
      col("id"),
      col("signature"),
      posexplode(
        array((0 until bands).map(b =>
          slice(col("signature"), b * rows + 1, rows)): _*)
      ).as(Seq("band", "band_sig"))
    )

    // shuffle a compact (band, hash) key, not the long[] itself; false
    // bucket collisions are removed by the signature check below
    val bucketed = banded.select(
      col("id"), col("signature"),
      col("band"), xxhash64(col("band_sig")).as("bucket"))
    val a = bucketed.select(col("id").as("id_a"), col("signature").as("sig_a"),
      col("band"), col("bucket"))
    val b = bucketed.select(col("id").as("id_b"), col("signature").as("sig_b"),
      col("band"), col("bucket"))

    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn(
        "est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), e => e))
          .cast("double") / lit(k.toDouble)
      )
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over token hashes: bit j of the result is set when
    * the sum over tokens of ±1 (sign of token-hash bit j) is positive.
    * Computed as 64 conditional sums in one aggregation — no bit-position
    * explode, stays in whole-stage codegen.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(
      col(idCol).as("id"),
      explode(split(col(textCol), "\\s+")).as("tok")
    )
    val withHash = toks.select(col("id"), strHash(col("tok")).as("th"))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("th"), j) % 2 =!= 0, 1).otherwise(-1)).as(s"b$j")
    }
    val bits = withHash.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val value = (0 until 64)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
    bits.select(col("id"), value.as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxDist, candidates
    * from matching 16-bit blocks (pigeonhole: ≤3 differing bits ⇒ at
    * least one of 4 blocks identical).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxDist: Int = 3): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val blocked = sh.select(
      col("id"),
      col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), b * 16) % 65536): _*)).as(Seq("block", "block_val"))
    )
    val a = blocked.select(col("id").as("id_a"), col("simhash").as("sh_a"), col("block"), col("block_val"))
    val b = blocked.select(col("id").as("id_b"), col("simhash").as("sh_b"), col("block"), col("block_val"))
    a.join(b, Seq("block", "block_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("dist", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }
}
