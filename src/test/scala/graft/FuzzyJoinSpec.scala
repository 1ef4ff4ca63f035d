package graft

import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {

  import spark.implicits._

  test("finds within-distance pairs via shared grams; respects the threshold") {
    val rows = Seq(
      (1L, "silver widget"),
      (2L, "silver widgett"), // dist 1 from 1
      (3L, "silver trinket"), // shares "silver " grams but edit-distance ≫ 2
      (4L, "copper bolt")     // unrelated
    ).toDF("id", "name")
    val out = FuzzyJoin.selfPairs(rows, "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((1L, 2L, 1)))
  }

  test("identical strings pair at distance 0; ids stay ordered") {
    val rows = Seq((7L, "alpha beta"), (3L, "alpha beta")).toDF("id", "name")
    val out = FuzzyJoin.selfPairs(rows, "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((3L, 7L, 0)))
  }

  test("strings shorter than 3 chars never pair (no fabricated grams)") {
    // sequence(1, 0) is DESCENDING in Spark — without the length guard,
    // 1–2-char strings would gram as themselves and self-pair
    val rows = Seq((1L, "ab"), (2L, "ab"), (3L, ""), (4L, "a")).toDF("id", "name")
    assert(FuzzyJoin.selfPairs(rows, "id", "name", maxDist = 2).count() == 0)
  }

  test("hot grams above the frequency cap generate no candidates") {
    // 5 strings all sharing only the hot gram "aaa" (cap 4 excludes it)
    val rows = (1L to 5L).map(i => (i, s"aaa${i}zz${i}q")).toDF("id", "name")
    val out = FuzzyJoin.selfPairs(rows, "id", "name", maxDist = 10, maxGramFreq = 4)
    assert(out.count() == 0)
  }

  test("matches a brute-force reference on a small random vocabulary") {
    val vocab = Seq("red bolt", "red bold", "blue bolt", "blue belt",
      "green gear", "green bear", "greem gear", "tiny cog")
    val rows = vocab.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "name")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def grams(s: String) = (0 to s.length - 3).map(i => s.substring(i, i + 3)).toSet
    val expected = (for {
      i <- vocab.indices; j <- vocab.indices if i < j
      if grams(vocab(i)).intersect(grams(vocab(j))).nonEmpty // candidate precondition
      d = lev(vocab(i), vocab(j)) if d <= 2
    } yield (i.toLong, j.toLong, d)).toSet
    val got = FuzzyJoin.selfPairs(rows, "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
    assert(expected.nonEmpty)
  }
}
