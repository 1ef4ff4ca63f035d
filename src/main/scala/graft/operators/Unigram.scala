package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer — the OTHER vocabulary
  * family real models train with, next to BPE ([[Vocab]]): instead of
  * greedily merging pairs, start from a LARGE candidate set of
  * substrings, fit piece probabilities by EM over the corpus, and
  * PRUNE to the target size (Kudo 2018, the published algorithm).
  *
  * Determinism discipline (what makes every stage oracle-gateable):
  *   - piece probabilities stay INTEGER counts; log-probabilities are
  *     FIXED-POINT table reads — `ilog(c) = floor(ln(c)·2^20 + 0.5)`
  *     over the shared ln table ([[TextAnalysis.LnTable]], the same
  *     doubles DuckDB reads) — so Viterbi scores are exact longs and
  *     EM is bit-exact across engines (the exact-integer PageRank
  *     discipline applied to EM);
  *   - the E-step uses VITERBI counts (the hard-EM variant the
  *     published implementation also ships): each word's best
  *     segmentation under `score(seg) = Σ ilog(count_i) − m·ilog(T)`,
  *     ties broken by the MINIMAL split bitmask (bit i−1 = a split
  *     after char i) — a total deterministic order both engines can
  *     state;
  *   - seeding keeps every single character plus the top-N multi-char
  *     substrings by (count desc, piece asc) — the frequent-substring
  *     candidate set;
  *   - pruning keeps every single character plus the top-`target`
  *     multi-char pieces by (em count desc, piece asc) — characters
  *     are the coverage floor, exactly as published.
  *
  * Scale shape: word counting is one shuffle; substring counting one
  * more (the candidate explosion is bounded by maxLen); the EM step
  * BROADCASTS the vocabulary (bounded by construction — topN + the
  * alphabet, the DSIR decision-table pattern) and pays one shuffle for
  * the count rollup; encoding is map-only over words with the same
  * broadcast. Reference scope: north-star tokenizer surface (the
  * reference has no tokenizer — `App.java`).
  */
object Unigram {

  /** Fixed-point scale: 2^20. */
  val LogScale: Double = 1048576.0

  /** `floor(ln(c)·2^20 + 0.5)` over the shared table — both engines
    * compute the identical double product, so the long is bit-exact.
    * Counts beyond the table are out of the gate contract (callers
    * keep fixture totals inside; real corpora scale counts down).
    */
  def ilog(c: Long): Long = {
    require(c >= 1 && c <= TextAnalysis.LnTableSize,
      s"Unigram.ilog: count $c outside the shared table")
    math.floor(TextAnalysis.LnTable((c - 1).toInt) * LogScale + 0.5).toLong
  }

  /** Corpus word frequencies: (word, freq). One shuffle. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** SEED candidates: every single character, plus the top-N
    * multi-char substrings (length 2..maxLen, all positions,
    * overlapping occurrences counted, weighted by word frequency) by
    * (count desc, piece asc). Output (piece, count, is_char).
    */
  def seed(docs: DataFrame, textCol: String, maxLen: Int = 4, topN: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val subs = wordCounts(docs, textCol)
      .as[(String, Long)]
      .flatMap { case (w, f) =>
        for {
          len <- 1 to math.min(maxLen, w.length)
          i <- 0 to w.length - len
        } yield (w.substring(i, i + len), f)
      }
      .toDF("piece", "f")
      .groupBy("piece")
      .agg(sum(col("f")).as("count"))
      .withColumn("is_char", length(col("piece")) === 1)
    // top-N via orderBy+limit (TakeOrderedAndProject: per-partition
    // top-k, then one merge of N rows) — a row_number window here
    // would sort EVERY multi-char candidate through one task, the
    // single-partition scale killer at a web-corpus substring count
    val chars = subs.filter(col("is_char"))
    val multi = subs.filter(!col("is_char"))
      .orderBy(col("count").desc, col("piece").asc)
      .limit(topN)
    chars.unionByName(multi)
  }

  /** Viterbi segmentation of one word under fixed-point scores:
    * maximize `Σ ilog(count_i) − m·ilog(T)`, ties to the minimal
    * split bitmask. Null when some position has no covering piece
    * (countable — a word outside the alphabet never guesses).
    */
  def segment(word: String, counts: Map[String, Long], total: Long,
      maxLen: Int = 8): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val logT = ilog(total)
    // best(j): (score, splitMask) over word(0, j); null = unreachable
    val score = new Array[Long](n + 1)
    val mask = new Array[Long](n + 1)
    val ok = new Array[Boolean](n + 1)
    val from = new Array[Int](n + 1)
    ok(0) = true
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxLen)
      while (i < j) {
        if (ok(i)) {
          counts.get(word.substring(i, j)) match {
            case Some(c) =>
              val s = score(i) + ilog(c) - logT
              val m = mask(i) | (if (i > 0) 1L << (i - 1) else 0L)
              if (!ok(j) || s > score(j) || (s == score(j) && m < mask(j))) {
                ok(j) = true; score(j) = s; mask(j) = m; from(j) = i
              }
            case None => ()
          }
        }
        i += 1
      }
      j += 1
    }
    if (!ok(n)) return null
    // walk back through the recorded predecessors
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var p = n
    while (p > 0) { out += word.substring(from(p), p); p = from(p) }
    out.reverse.toSeq
  }

  /** Materialize a vocab frame into (counts map, total) — bounded by
    * construction (topN + alphabet), the documented decision-table
    * collect the DSIR/CMS layers share. ZERO-count pieces (an EM
    * step's explicit zeros) are dead for segmentation — ln(0) has no
    * table row — and drop here, so EM chains: emStep(emStep(…)).
    */
  private def vocabTable(vocab: DataFrame): (Map[String, Long], Long) = {
    val rows = vocab.select(col("piece"), col("count").cast("long")).collect()
    val m = rows.filter(_.getLong(1) > 0L).map(r => r.getString(0) -> r.getLong(1)).toMap
    (m, m.values.sum)
  }

  /** One Viterbi-EM step: every word re-segments under the current
    * counts; the new count of a piece is Σ freq(word) · occurrences in
    * that word's best segmentation. Unused pieces keep an explicit 0
    * (pruning must SEE them); unsegmentable words drop countably.
    * One shuffle (the rollup) + the bounded vocab broadcast.
    */
  def emStep(words: DataFrame, vocab: DataFrame, maxLen: Int = 8): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val (counts, total) = vocabTable(vocab)
    val bc = spark.sparkContext.broadcast((counts, total))
    val used = words.select(col("word"), col("freq").cast("long"))
      .as[(String, Long)]
      .flatMap { case (w, f) =>
        val (c, t) = bc.value
        Option(segment(w, c, t, maxLen)).toSeq.flatten.map(p => (p, f))
      }
      .toDF("piece", "f")
      .groupBy("piece")
      .agg(sum(col("f")).as("count"))
    vocab.select(col("piece")).join(used, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("count"), lit(0L)).as("count"))
  }

  /** PRUNE to target: every single character survives (coverage
    * floor); multi-char pieces rank by (count desc, piece asc), top
    * `target` kept. Output (piece, count, is_char).
    */
  def prune(vocab: DataFrame, target: Int): DataFrame = {
    val byCount = org.apache.spark.sql.expressions.Window
      .partitionBy(col("is_char"))
      .orderBy(col("count").desc, col("piece").asc)
    vocab
      .withColumn("is_char", length(col("piece")) === 1)
      .withColumn("__rn", row_number().over(byCount))
      .filter(col("is_char") || col("__rn") <= target)
      .drop("__rn")
  }

  /** ENCODE: per word, the Viterbi pieces under `vocab`, joined by
    * '|' with their count (unsegmentable → NULL seg, countable).
    * Map-only over the word frame + the bounded broadcast.
    */
  def encodeWords(words: DataFrame, vocab: DataFrame, maxLen: Int = 8): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val (counts, total) = vocabTable(vocab)
    val bc = spark.sparkContext.broadcast((counts, total))
    words.select(col("word"), col("freq").cast("long"))
      .as[(String, Long)]
      .map { case (w, f) =>
        val seg = segment(w, bc.value._1, bc.value._2, maxLen)
        (w, f, if (seg == null) null else seg.mkString("|"),
          if (seg == null) 0 else seg.length)
      }
      .toDF("word", "freq", "seg", "n_pieces")
  }
}
