package graft.queries

/** DuckDB-SQL builders for oracles whose semantics involve 64-bit
  * *wrapping* arithmetic: XXH64 token hashes (the SimHash base,
  * `GraftMath.simhash64`), xorshift64 hyperplane streams
  * (`GraftMath.srpSignature`), and Java-long rolling hashes
  * (`Multimodal.decodeStub`).
  *
  * DuckDB BIGINT ops overflow-check rather than wrap, so everything is
  * emulated in HUGEINT over the unsigned domain [0, 2^64):
  *   - wrapping multiply splits one operand into 32-bit halves (a plain
  *     128-bit product of two 64-bit values would overflow HUGEINT);
  *   - XOR round-trips through two's-complement BIGINT (`xor()` is
  *     bitwise there, which equals the unsigned XOR bit pattern);
  *   - rotation is a disjoint pair of modular shifts (never overflows);
  *   - logical shift right is integer division by 2^k.
  *
  * The XXH64 port follows the reference algorithm (Cyan4973/xxHash
  * spec, as implemented by `o.a.s.sql.catalyst.expressions.XXH64`) with
  * Spark's SQL seed 42, including the 32-byte stripe path, and is
  * validated against `xxhash64()` on empty/short/4-byte/31/33/64-byte
  * inputs plus the whole fixture corpus.
  *
  * Byte extraction uses `ascii()` per character, which equals the UTF-8
  * byte only for ASCII text — a fixture-wide property the MinHash
  * oracle already relies on.
  */
object OracleSql {

  private val M = "18446744073709551616" // 2^64
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"

  private val Mask64 = BigInt(1) << 64
  private val Seed = BigInt(42)
  private val V10 = ((Seed + BigInt(P1) + BigInt(P2)) mod Mask64).toString
  private val V20 = ((Seed + BigInt(P2)) mod Mask64).toString
  private val V30 = Seed.toString
  private val V40 = ((Seed - BigInt(P1)) mod Mask64).toString
  private val HSmall = ((Seed + BigInt(P5)) mod Mask64).toString

  /** Unsigned HUGEINT [0,2^64) → two's-complement BIGINT. */
  private def u2s(a: String): String =
    s"CAST(CASE WHEN ($a) >= 9223372036854775808 THEN ($a) - $M ELSE ($a) END AS BIGINT)"

  /** Two's-complement BIGINT → unsigned HUGEINT [0,2^64). */
  private def s2u(a: String): String =
    s"(CASE WHEN ($a) < 0 THEN CAST($a AS HUGEINT) + $M ELSE CAST($a AS HUGEINT) END)"

  /** 64-bit wrapping multiply in HUGEINT (split-multiplicand). */
  private def mul(a: String, b: String): String =
    s"((($a) % 4294967296) * ($b) + ((($a) // 4294967296) * (($b) % 4294967296) % 4294967296) * 4294967296) % $M"

  /** Left-rotate by r over the unsigned 64-bit domain. */
  private def rotl(a: String, r: Int): String = {
    val lo = BigInt(1) << (64 - r)
    s"((($a) % $lo) * ${BigInt(1) << r} + ($a) // $lo)"
  }

  private def xor64(a: String, b: String): String =
    s2u(s"xor(${u2s(a)}, ${u2s(b)})")

  /** Little-endian 8-byte lane from 1-indexed byte position p of `bs`. */
  private def word8(p: String): String =
    (0 until 8).map(k => s"bs[CAST(($p) + $k AS INT)] * ${BigInt(1) << (8 * k)}")
      .mkString("(", " + ", ")")

  private def word4(p: String): String =
    (0 until 4).map(k => s"bs[CAST(($p) + $k AS INT)] * ${BigInt(1) << (8 * k)}")
      .mkString("(", " + ", ")")

  /** XXH64 round with `acc`/`lane` as lambda-variable names. */
  private val Round = mul(rotl(s"(acc + ${mul("lane", P2)}) % $M", 31), P1)

  /** round(0, lane): `mul` already reduces mod 2^64. */
  private def round0(lane: String): String = mul(rotl(mul(lane, P2), 31), P1)

  /** Per-stripe accumulator a (0..3) folded over all 32-byte stripes. */
  private def stripeAcc(a: Int, init: String): String = {
    val lanes =
      s"list_transform(generate_series(0, CAST(ns AS BIGINT) - 1), i -> ${word8(s"i*32 + ${a * 8} + 1")})"
    s"list_reduce(list_prepend(CAST($init AS HUGEINT), $lanes), (acc, lane) -> $Round)"
  }

  private def mergeRound(h: String, v: String): String =
    s"(${mul(xor64(h, round0(v)), P1)} + $P4) % $M"

  /** CTE chain computing `th` — the unsigned-HUGEINT xxhash64 (seed 42)
    * of `tok` — for every row of `src`, which must provide (id, tok).
    * Ends with CTE `xh(id, tok, th)`.
    */
  def xxh64Ctes(src: String): String = s"""
tb AS (
  SELECT id, tok,
    CASE WHEN tok = '' THEN CAST([] AS HUGEINT[])
         ELSE list_transform(str_split(tok, ''), c -> CAST(ascii(c) AS HUGEINT)) END AS bs,
    CAST(octet_length(encode(tok)) AS HUGEINT) AS n
  FROM $src
), st AS ( SELECT *, n // 32 AS ns FROM tb
), vs AS (
  SELECT *, ${stripeAcc(0, V10)} AS v1, ${stripeAcc(1, V20)} AS v2,
            ${stripeAcc(2, V30)} AS v3, ${stripeAcc(3, V40)} AS v4
  FROM st
), hm0 AS (
  SELECT *, (${rotl("v1", 1)} + ${rotl("v2", 7)} + ${rotl("v3", 12)} + ${rotl("v4", 18)}) % $M AS hm
  FROM vs
), hm1 AS ( SELECT *, ${mergeRound("hm", "v1")} AS hma FROM hm0
), hm2 AS ( SELECT *, ${mergeRound("hma", "v2")} AS hmb FROM hm1
), hm3 AS ( SELECT *, ${mergeRound("hmb", "v3")} AS hmc FROM hm2
), hm4 AS ( SELECT *, ${mergeRound("hmc", "v4")} AS hmd FROM hm3
), h0 AS (
  SELECT *, ((CASE WHEN n >= 32 THEN hmd ELSE CAST($HSmall AS HUGEINT) END) + n) % $M AS h_len,
         ns * 32 AS i0
  FROM hm4
), h8 AS (
  SELECT *, list_reduce(
    list_prepend(h_len,
      list_transform(generate_series(0, CAST((n - i0) // 8 AS BIGINT) - 1),
                     t -> ${word8("i0 + t*8 + 1")})),
    (acc, lane) -> (${mul(rotl(xor64("acc", round0("lane")), 27), P1)} + $P4) % $M) AS h_8,
    i0 + ((n - i0) // 8) * 8 AS i4
  FROM h0
), h4 AS (
  SELECT *, CASE WHEN n - i4 >= 4
    THEN (${mul(rotl(xor64("h_8", mul(word4("i4 + 1"), P1)), 23), P2)} + $P3) % $M
    ELSE h_8 END AS h_4,
    i4 + (CASE WHEN n - i4 >= 4 THEN 4 ELSE 0 END) AS ib
  FROM h8
), hb AS (
  SELECT *, list_reduce(
    list_prepend(h_4,
      list_transform(generate_series(CAST(ib + 1 AS BIGINT), CAST(n AS BIGINT)),
                     p -> bs[CAST(p AS INT)])),
    (acc, lane) -> ${mul(rotl(xor64("acc", mul("lane", P5)), 11), P1)}) AS h_b
  FROM h4
), f1 AS ( SELECT *, ${xor64("h_b", "h_b // 8589934592")} AS fa FROM hb
), f2 AS ( SELECT *, ${mul("fa", P2)} AS fb FROM f1
), f3 AS ( SELECT *, ${xor64("fb", "fb // 536870912")} AS fc FROM f2
), f4 AS ( SELECT *, ${mul("fc", P3)} AS fd FROM f3
), xh AS ( SELECT id, tok, ${xor64("fd", "fd // 4294967296")} AS th FROM f4
)"""

  /** CTE chain ending in `sims(id, simhash)` — `GraftMath.simhash64` of
    * `text` per `doc_id` row of `docSrc`: whitespace tokens (Java
    * split-with-limit−1 semantics = `regexp_split_to_array`), XXH64
    * per token, ±1 votes per bit, bit set when votes > 0; the result
    * re-signed to a Spark LongType value.
    */
  def simhashCtes(docSrc: String): String = s"""
toks AS (
  SELECT doc_id AS id, unnest(regexp_split_to_array(text, '\\s+')) AS tok FROM $docSrc
),${xxh64Ctes("toks")},
votes AS (
  SELECT id, j, SUM(CASE WHEN (th // power(2::HUGEINT, j)::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM xh CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j)
  GROUP BY id, j
), sims AS (
  SELECT id,
    ${u2s("SUM(CASE WHEN v > 0 THEN power(2::HUGEINT, j)::HUGEINT ELSE 0 END)")} AS simhash
  FROM votes GROUP BY id
)"""

  /** Ordered left-fold sum of a DOUBLE list expression — replicates the
    * `s += x_i` index-order accumulation of the Scala kernels bitwise
    * (list_sum makes no order guarantee; a left fold does).
    */
  def orderedSum(lst: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, $lst), (a, b) -> a + b)"

  /** Morton/Z-order oracle query: the part1by1 magic-mask cascade of
    * `Layout.zValue` as a CTE chain. Every step stays below 2^63 (so
    * plain BIGINT shifts are safe); only the final `y-spread << 1`
    * combine can reach bit 63, so it runs in HUGEINT and is re-signed
    * to match Spark's wrapping `shiftleft`. Output: ($idCol, zval).
    */
  def zorderQuery(src: String, idCol: String, xExpr: String, yExpr: String): String = {
    val steps = Seq(
      (16, "281470681808895"), (8, "71777214294589695"),
      (4, "1085102592571150095"), (2, "3689348814741910323"),
      (1, "6148914691236517205"))
    val chain = steps.zipWithIndex.map { case ((s, m), i) =>
      s"z${i + 1} AS (SELECT $idCol, (xs | (xs << $s)) & $m AS xs, (ys | (ys << $s)) & $m AS ys FROM z$i)"
    }.mkString(", ")
    s"""WITH z0 AS (SELECT $idCol, ($xExpr) & 4294967295 AS xs, ($yExpr) & 4294967295 AS ys FROM $src),
       |$chain
       |SELECT $idCol, ${u2s("CAST(xs AS HUGEINT) + CAST(ys AS HUGEINT) * 2")} AS zval FROM z5""".stripMargin
  }

  /** ±1 hyperplane-component literals for the SRP signature, as VALUES
    * rows (j, sg DOUBLE[]). Replicates the xorshift64 stream of
    * `GraftMath.srpSignature` (seed ^ j·golden, zero-state fallback) —
    * data-independent constants of the algorithm, like the XXH64 primes.
    */
  def srpSignRows(planes: Int, dim: Int, seed: Long): String =
    (0 until planes).map { j =>
      var state = seed ^ (j.toLong * 0x9E3779B97F4A7C15L)
      if (state == 0L) state = 0x2545F4914F6CDD1DL
      val signs = Seq.fill(dim) {
        state ^= (state << 13)
        state ^= (state >>> 7)
        state ^= (state << 17)
        if ((state & 1L) == 0L) "1.0" else "-1.0"
      }
      s"($j, [${signs.mkString(", ")}]::DOUBLE[])"
    }.mkString(", ")
}
