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
    * The primitive stays STRICT (counts 1..table size); every operator
    * entry point routes counts through [[rescale]] first, so a real
    * corpus's word frequencies can never throw executor-side.
    */
  def ilog(c: Long): Long = {
    require(c >= 1 && c <= TextAnalysis.LnTableSize,
      s"Unigram.ilog: count $c outside the shared table")
    math.floor(TextAnalysis.LnTable((c - 1).toInt) * LogScale + 0.5).toLong
  }

  /** Deterministic COUNT RESCALE — the count-division discipline that
    * keeps model counts inside the shared ln table on real corpora:
    * while the count TOTAL exceeds the table, every count halves
    * (floor, min 1). Integer-only and order-free, so both engines
    * derive the identical rescaled model; halving shifts all
    * log-probabilities by ~ln 2 uniformly (up to the min-1 floor and
    * the table's own quantization), preserving the Viterbi ranking
    * structure EM needs. Gate fixtures keep totals inside the table
    * (zero halvings — a no-op); this path exists so pointing
    * [[wordCounts]] at a web corpus cannot throw. The vocabulary
    * itself must fit the table (bounded by construction: topN +
    * alphabet), or no integer model exists — that is a model-size
    * error, surfaced eagerly.
    */
  def rescale(counts: Map[String, Long]): (Map[String, Long], Long) = {
    require(counts.size <= TextAnalysis.LnTableSize,
      s"Unigram.rescale: ${counts.size} pieces exceed the ln table — " +
        "prune the vocabulary below the table size first")
    var m = counts
    var total = m.valuesIterator.sum
    while (total > TextAnalysis.LnTableSize) {
      m = m.map { case (p, c) => p -> math.max(1L, c >> 1) }
      total = m.valuesIterator.sum
    }
    (m, total)
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
    * (countable — a word outside the alphabet never guesses), and
    * null for words LONGER THAN 64 CHARS: the split bitmask is a
    * 64-bit total order whose splits land on bits 0..62 only while
    * n ≤ 64 — at 65 the sign bit inverts the "minimal" comparison and
    * past that the JVM shift wraps mod 64, so the determinism contract
    * would silently break. Real corpora's 100-char tokens (URLs,
    * hashes, DNA) degrade countably here, never mis-order.
    */
  def segment(word: String, counts: Map[String, Long], total: Long,
      maxLen: Int = 8): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    if (n > 64) return null
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
    rescale(m)
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

  /** UTF-8 byte order — the binary collation Spark's UTF8String and
    * DuckDB both sort strings by. JVM `String.compareTo` is UTF-16
    * code-unit order, which DIVERGES above the BMP; id assignment must
    * match the engines' ORDER BY, so the local sort uses this.
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** PIECE → ID export — the (piece, tid, count) vocabulary file a
    * SentencePiece consumer loads: 1-based lexicographic (binary
    * UTF-8) rank over the model's pieces, the SAME id discipline as
    * [[Vocab.subwordIds]], so both tokenizer families feed one pack /
    * export chain. The ranking window runs over the BOUNDED vocabulary
    * (topN + alphabet — the documented vocab-sized frame), never the
    * corpus.
    */
  def pieceIds(vocab: DataFrame): DataFrame =
    vocab.groupBy(col("piece")).agg(sum(col("count").cast("long")).as("count"))
      .withColumn("tid",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("piece"))).cast("long"))
      .select(col("piece"), col("tid"), col("count"))

  /** The tokenizer's REAL output — per-document token-id sequences
    * under the unigram model: (idCol, pos, token_id) with `pos` the
    * 1-based position in the document's id stream, ids the
    * [[pieceIds]] ranks ([[Vocab.encodeIds]]' exact shape, so the
    * downstream pack chain is shared verbatim). Segmentation is the
    * same fixed-point Viterbi as [[encodeWords]]; unsegmentable words
    * (no covering piece, or past the 64-char bitmask bound) drop
    * countably — the covering-vocabulary discipline.
    *
    * Scale shape: the bounded vocab (counts + ids) broadcasts; the
    * corpus pays one map-side word explode + segmentation and ONE
    * doc-keyed window shuffle for the position ranking. Nothing
    * corpus-sized sorts globally.
    */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, maxLen: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = vocab.select(col("piece"), col("count").cast("long")).collect()
    // ids over ALL pieces (the export id space); segmentation counts
    // over the live (>0) pieces, rescaled into the ln table
    val ids = rows.map(_.getString(0)).distinct.sortWith(utf8Less)
      .zipWithIndex.map { case (p, i) => p -> (i + 1).toLong }.toMap
    val (counts, total) = rescale(
      rows.filter(_.getLong(1) > 0L).map(r => r.getString(0) -> r.getLong(1)).toMap)
    val bc = spark.sparkContext.broadcast((counts, total, ids))
    val pieces = docs
      .select(col(idCol).cast("long"),
        posexplode(split(col(textCol), "\\s+")).as(Seq("__p", "__w")))
      .filter(col("__w") =!= "")
      .as[(Long, Int, String)]
      .flatMap { case (id, p, w) =>
        val (c, t, im) = bc.value
        Option(segment(w, c, t, maxLen)).toSeq.flatten.zipWithIndex.map {
          case (piece, q) => (id, p, q, im(piece))
        }
      }
      .toDF(idCol, "__p", "__q", "token_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__p").asc, col("__q").asc)
    pieces
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("pos"), col("token_id"))
  }

  /** Inverse of [[encodeIds]] under the same vocabulary — reassemble
    * each document's whitespace-stripped text from its id stream
    * ([[Vocab.decodeIds]]' exact shape and contract). The round trip
    * `decodeIds(encodeIds(docs)) == strip-spaces(docs)` holds only
    * when segmentation covered every word, ids mapped to the right
    * pieces, and positions carried exact document order. One
    * doc-keyed shuffle + the bounded piece-table broadcast.
    */
  def decodeIds(ids: DataFrame, idCol: String, vocab: DataFrame): DataFrame = {
    val pid = pieceIds(vocab).select(col("tid").as("token_id"), col("piece"))
    ids
      .join(broadcast(pid), "token_id")
      .groupBy(col(idCol))
      .agg(concat_ws("",
        transform(
          array_sort(collect_list(struct(col("pos"), col("piece")))),
          x => x.getField("piece"))).as("text_nospace"))
  }
}
