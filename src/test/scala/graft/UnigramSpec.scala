package graft

import graft.operators.Unigram

/** Unigram-LM tokenizer: fixed-point scoring, Viterbi segmentation
  * (proved against exhaustive enumeration), seeding, EM, pruning.
  */
class UnigramSpec extends SparkSpec {

  private def enumerate(word: String, counts: Map[String, Long], total: Long,
      maxLen: Int = 8): Seq[String] = {
    // every segmentation via split bitmask; keep (max score, min mask)
    val n = word.length
    val logT = Unigram.ilog(total)
    var best: (Long, Long, Seq[String]) = null
    (0L until (1L << (n - 1))).foreach { m =>
      val bounds = 0 +: (1 until n).filter(i => ((m >> (i - 1)) & 1) == 1) :+ n
      val pieces = bounds.sliding(2).map(b => word.substring(b(0), b(1))).toSeq
      if (pieces.forall(p => p.length <= maxLen && counts.contains(p))) {
        val s = pieces.map(p => Unigram.ilog(counts(p)) - logT).sum
        if (best == null || s > best._1 || (s == best._1 && m < best._2))
          best = (s, m, pieces)
      }
    }
    if (best == null) null else best._3
  }

  test("segment: DP equals exhaustive enumeration, including ties") {
    val counts = Map("a" -> 10L, "b" -> 10L, "c" -> 3L, "ab" -> 100L,
      "bc" -> 100L, "abc" -> 7L, "ca" -> 5L, "aa" -> 5L)
    val total = counts.values.sum
    val words = Seq("a", "ab", "abc", "abca", "aab", "cabcab", "abcabc",
      "aaaa", "cc", "bca", "ababab")
    words.foreach { w =>
      assert(Unigram.segment(w, counts, total) == enumerate(w, counts, total),
        s"word $w")
    }
    // "ab|c" vs "a|bc": equal-count pieces tie on score; the minimal
    // split bitmask (split after 1 → mask 1) wins over (split after 2
    // → mask 2)
    assert(Unigram.segment("abc", Map("a" -> 5L, "bc" -> 5L, "ab" -> 5L, "c" -> 5L,
      "b" -> 1L), 21L) == Seq("a", "bc"))
    // unknown character: null, never a guess
    assert(Unigram.segment("axb", counts, total) == null)
    assert(Unigram.segment("", counts, total) == Seq.empty)
  }

  test("ilog is the shared-table fixed point; out-of-table refuses") {
    assert(Unigram.ilog(1L) == 0L)
    assert(Unigram.ilog(2L) ==
      math.floor(StrictMath.log(2.0) * 1048576.0 + 0.5).toLong)
    intercept[IllegalArgumentException](Unigram.ilog(0L))
    intercept[IllegalArgumentException](Unigram.ilog(20000L))
  }

  test("seed: chars always survive; top-N multi-char by (count, piece)") {
    import spark.implicits._
    val docs = Seq("ab ab abc", "ab bc").toDF("text")
    val got = Unigram.seed(docs, "text", maxLen = 3, topN = 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // words: ab(3), abc(1), bc(1)
    // chars: a=4 (3 ab + 1 abc... a appears in ab×3 and abc×1), b, c
    assert(got("a") == 4L && got("b") == 5L && got("c") == 2L)
    // multi-char counts: ab=4 (3 + 1 in abc), bc=2 (abc + bc), abc=1
    // topN=2 keeps ab, bc; abc drops
    assert(got.get("ab").contains(4L) && got.get("bc").contains(2L))
    assert(!got.contains("abc"))
  }

  test("emStep: Viterbi counts roll up; unused pieces keep explicit 0") {
    import spark.implicits._
    val words = Seq(("ab", 3L), ("abc", 1L)).toDF("word", "freq")
    val vocab = Seq(("a", 4L), ("b", 4L), ("c", 1L), ("ab", 4L), ("bc", 2L))
      .toDF("piece", "count")
    val got = Unigram.emStep(words, vocab).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // "ab" → [ab] (score ilog(4)-T beats ilog(4)+ilog(4)-2T since T big)
    // "abc" → best of [ab,c] / [a,bc] / [abc not in vocab] / chars
    val counts = vocab.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val t = counts.values.sum
    val seg = Unigram.segment("abc", counts, t)
    assert(got("ab") == 3L + (if (seg.contains("ab")) 1L else 0L))
    assert(got.contains("c") && got.contains("bc"))
    assert(got.values.forall(_ >= 0L))
    // every vocab piece has a row (explicit zero, not absence)
    assert(got.size == 5)
  }

  test("emStep chains: zero-count pieces drop from the model, never ilog(0)") {
    import spark.implicits._
    val words = Seq(("ab", 5L), ("b", 2L)).toDF("word", "freq")
    val vocab = Seq(("a", 3L), ("b", 3L), ("ab", 9L), ("zz", 1L)).toDF("piece", "count")
    val it1 = Unigram.emStep(words, vocab)
    val m1 = it1.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(m1("zz") == 0L) // never segmentable: explicit zero
    // iteration 2 must not throw on the zero (ilog(0) has no table row)
    val it2 = Unigram.emStep(words, it1)
    val m2 = it2.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(m2.keySet == m1.keySet && m2("zz") == 0L)
    assert(m2("ab") == 5L && m2("b") == 2L)
  }

  test("hardening: 100-char words degrade countably; web-scale counts rescale, never throw") {
    import spark.implicits._
    val counts = Map("a" -> 10L, "b" -> 10L, "ab" -> 100L)
    // past 64 chars the 64-bit split bitmask cannot state the tie
    // order — countable null, never a mis-ordered segmentation
    assert(Unigram.segment("ab" * 50, counts, 120L) == null)
    assert(Unigram.segment("a" * 65, counts, 120L) == null)
    // 64 chars is still inside the bound (splits land on bits 0..62)
    assert(Unigram.segment("ab" * 32, counts, 120L) == Seq.fill(32)("ab"))
    // counts far past the ln table: the rescale discipline halves them
    // into range — the operator entry points must PASS, not throw
    val words = Seq(("ab" * 50, 1L), ("ab", 1000000L)).toDF("word", "freq")
    val vocab = Seq(("a", 3000000L), ("b", 2000000L), ("ab", 9000000L))
      .toDF("piece", "count")
    val enc = Unigram.encodeWords(words, vocab).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(enc("ab") == "ab") // the rescaled model still segments
    assert(enc("ab" * 50) == null) // the long word degrades countably
    val em = Unigram.emStep(words, vocab).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(em("ab") == 1000000L) // freq WEIGHTS are never ilog'd — exact
    // rescale: deterministic halving, min-1 floor, total inside table
    val (m, t) = Unigram.rescale(Map("x" -> 1L, "y" -> (1L << 40)))
    assert(t <= graft.operators.TextAnalysis.LnTableSize)
    assert(m("x") == 1L && m("y") >= 1L && m("y") <= t)
    // id emission under a rescaled model: a < ab < b → ab is id 2
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val ids = Unigram.encodeIds(docs, "doc_id", "text", vocab).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(ids == Seq((1L, 2L), (2L, 2L)))
    // and the decode round trip reassembles the stripped text
    val rt = Unigram.decodeIds(
      Unigram.encodeIds(docs, "doc_id", "text", vocab), "doc_id", vocab)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rt == Seq((1L, "abab")))
  }

  test("prune + encode: chars never pruned; encode emits pieces and NULLs") {
    import spark.implicits._
    val vocab = Seq(("a", 0L), ("b", 1L), ("ab", 9L), ("bc", 5L), ("abc", 1L))
      .toDF("piece", "count")
    val pruned = Unigram.prune(vocab, target = 1).collect()
      .map(_.getString(0)).toSet
    assert(pruned == Set("a", "b", "ab")) // chars + top-1 multi
    val words = Seq(("abab", 2L), ("xy", 1L)).toDF("word", "freq")
    val enc = Unigram.encodeWords(words,
      Seq(("a", 2L), ("b", 2L), ("ab", 8L)).toDF("piece", "count"))
    graft.queries.Q.requireNoShuffle(enc)
    val m = enc.collect().map(r => r.getString(0) -> ((r.getString(2), r.getInt(3)))).toMap
    assert(m("abab") == (("ab|ab", 2)))
    assert(m("xy") == ((null, 0)))
  }
}
