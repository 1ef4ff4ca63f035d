package graft

import graft.operators.ZstdDecode

/** Pure-JVM zstd decoder vs the REFERENCE implementation: every golden
  * payload below was produced by the real `zstd` CLI (v1.5.x) at a
  * different level/shape, so Huffman literals (1- and 4-stream,
  * direct and FSE-compressed weights), FSE-coded sequences
  * (predefined AND compressed tables, repeat modes across blocks),
  * raw/RLE blocks, multi-block frames, frames with and without
  * declared content size, and the XXH64 content checksum are all
  * certified against bytes this codebase did not generate.
  */
class ZstdDecodeSpec extends SparkSpec {

  private def b64(s: String): Array[Byte] = java.util.Base64.getDecoder.decode(s)

  private val G1B64: String =
      "KLUv/WQIBr0BAMQCdGhlIHF1aWNrIGJyb3duIGZveCBqdW1wcyBvdmVyIHRoZSBsYXp5IGRv" +
      "Zy4CANRC9QFDmGU0h31/"
  private val G2B64: String =
      "KLUv/WQQDU0BAKLCBwzgbcNADBOR3R0jwQK03sfqfaTex+l9lN7H6H2E3hcBABpv81UZtVtj" +
      "Ww=="
  private val G3B64: String =
      "KLUv/WRYAmUIACQQAAECAQIDBAUGBwgJCgsMDQ4PEBESExQVFhcYGRobHB0eHyAhIiMkJSYn" +
      "KCkqKywtLi8wMTIzNDU2Nzg5Ojs8PT4/QEFCQ0RFRkdISUpLTE1OT1BRUlNUVVZXWFlaW1xd" +
      "Xl9gYWJjZGVmZ2hpamtsbW5vcHFyc3R1dnd4eXp7fH1+f4CBgoOEhYaHiImKi4yNjo+QkZKT" +
      "lJWWl5iZmpucnZ6foKGio6SlpqeoqaqrrK2ur7CxsrO0tba3uLm6u7y9vr/AwcLDxMXGx8jJ" +
      "ysvMzc7P0NHS09TV1tfY2drb3N3e3+Dh4uPk5ebn6Onq6+zt7u/w8fLz9PX29/j5+vv8/f7/" +
      "AgDyQAXu5IZgPu3v"
  private val G4B64: String =
      "KLUv/aRMWQYA7AIANANzZW50ZW5jZSAwIGhhcyB3b3JkcyBhbmQgcGhyYXNlcmVwZWF0cy4g" +
      "MTIzNDU2Nzg5MTEPoDB2z/obUNOEpRub/VzKl56JR2MCPbKpWaZMTTZlarbNRNX0B5YCTAAA" +
      "CCABAPz/ORACTAAACG8BAPz/ORACRQAACCABAEjZDoRlUrCE"
  private val G5B64: String =
      "KLUv/WQsAGEJAI3xv8s9lvbkRVtL9wlDM2yvCJwGaVL0m66bke9cl7SF6wkubQV3HNPyegFt" +
      "vQni7M1tFVMje+AsWpSO/qZZXcdwgvf/9yJQGtmXtszv2YG+Vj50UdKglbBhBsv+ZEHNk+uh" +
      "Rb5t9LUDT9oamKNiQn2UF3rlSloxaSRMNMrkx3HBoO8464fQksJCbPGi44FC2ElqgN8+Qy/h" +
      "VA4RZmphE/AQIye/9v2z8/5b/g6ZJSvbf3cfHjDe5Ud5x4MCkrRQrGFH+kiufjnCq2zwq/zv" +
      "JzdLpi1qm99T9P6yXZkS8HtanOzUpOsEAtyzRoDyKV94zsP0uuXCR4ND2oSp42X9nMKCnwEH" +
      "ROwd2jqgJVrM96Ld+0VL+FL/ggf0F+rHu+7gQRHpmsIEO33PpLA/sfY2U8Q="
  private val G6B64: String =
      "KLUv/QRYrVkAelk8ChSQm3KdTV+ZX3R32kpKkns3DmdmaLAAlwCXALfc5UZCd7mRkDeK7lZ4" +
      "KfpdbiR0c6Fwl5uQ73IjjnCXm6lQD3e5kdAp+l1uJHSXGwm5m5DvciMxarjLjcS9iBB3OXe5" +
      "kVC4y+mWu9xI6C43EvJGcZcbCd3lRkLehHSXGwnd5UZCXijc5WYq1MNdbiQc7nIz0pAuq4xp" +
      "KBFykHRZeoa2UcgoKgAODBwAECAAeKAgwYIGCAgAGIBAAAAGCBYQaNBAgAIABRIACAAcGDgQ" +
      "GwmFu5xuucuNhO5yIyFvFN2t8FL0u9xI6OZC4S43Id/lRhzhLjdToR7uciOhU/S73EjoLjcS" +
      "cjch3+VGYtRwlxuJexEh7nLuciOhcJfTLXe5kdBdbiTkjaK7FV6KfpcbCd1cKNzlJuS73Igj" +
      "3OVmKtTDXW4kdIp+lxsJ3eVGQu4m5LvcSIwa7nIjcS8ixF3OXW4kFO5yChHiLucuNxIKdznd" +
      "cpcbCd3lRkLeKLpb4aXod7mR0M2Fwl1uQr7LjTjCXW6mQj3c5UZCp+h3uZHQXW4k5G5CvsuN" +
      "xKjhLjcS9yJC3OXc5UZC4S6nW+5yI6G73EjIG0V3K7wU/S43Erq5ULjLTch3uRFHuMvNVKiH" +
      "u9xI6BT9LjcSusuNhNxNyHe5kRg13OVG4l5EiLucuwwuNxL3IkLc5dzlRkLhLqdb7nIjobvc" +
      "SMgbRXcrvBT9LjcSurlQuMtNyHe5EUe4y81UqIe73EjoFP0uNxK6y42E3E3Id7mRGDXc5Ubi" +
      "XkSIu5y73Ego3OV0y11uJHSXGwl5o+huhZei3+VGQjcXCne5CfkuN+IId7mZCvVwlxsJnaLf" +
      "5UZCd7mRkLsJ+S43EqOGu9xI3IuK06gEsD/9PwCDHYaA8bQHFMAHUV4GAv6t+HlxCLi2P92X" +
      "ShIyNn7QVVbeENKWQl9VjDPqEgru3B6/FFhE0bP/rs7NxsMDsjAYCfaqBK0WnJHuB7K4mM2j" +
      "n8Vyh/ffP2EK4Udil85P48zaC+5LmAXM1QosuOAs4+HnroWnam/fzxNSKyyow2a9XLMTyih8" +
      "AydJoyAnBUNM4FyVy4nbyoQDXtdbZFX1v7VDttw3LDo7BI917cpQdLaU0KnCzvD9NtbMqYS4" +
      "ABZ/9TrRv4bD5eJnhyLfgRPiWVhRyYokidS8c7QrGw/Sr8eZgrvfEsT/wre7dj9ej6J1QpoK" +
      "G+JuH8PDzfd+c9368gPdTXi+y4bs5rZXyWDCoAppA4HuzA7T062uAmx/eEKw2+WYZ3egXVTp" +
      "p9KErI2/f5WVN4S0pdBXFeOMuoSCO7fHLwUWUfTsv6tz8/FwkDwtZsL9bkGrBWYge4EsD0bi" +
      "6Gfx3PP990+YQviR2KX62zij5qLpEmYBN/UCAyY463jYuWthrdrb9/OE1AoL6rgRL9fshLIK" +
      "38AJ0inIQcEQEzhX9WPytzLhgNfVNtnV/W/tkCz3DYrOHslDXZ+7XL8tJ3SqsDLc7Dtrx1RC" +
      "WBCLv1qdaVvD5VPws0Ox5sAJ8SysqGRFkkRq3jnalY0H6dfjTMHdbwnif+HbXbsf16d6nZCm" +
      "woL824OweLe931T3uvwIdxKer7Jhu6nlUSCYMKhCWgigO7GL9HSrqwDbH54Q7HY55tkdaJcV" +
      "2KAkIWvn799l5Q0hbSl0UcE8oj6h4M/t8UuBRRS9++/rzG0eHAQPCxFwvlrQaMEZ6X4EywOR" +
      "OPpZPPd8//0TphB+pHbp3BTuqL1ouoRZwF2twoIJzjo0/Ny1sFTk7ft5QmqFhXWYjIcjdkJZ" +
      "hX/gBOlU4KTggAmcK3ox+VuRcMDqapvs6v63dkiWv4JFZ4/ksa7dWYrflhM6VdgZPv/O2jGV" +
      "EAfA5q9eZ9rWcPEc/O1Y7DtwQjwLKwpZkSCRmn8OfmfzQdp9GEMw91uD8F7wdsdu5/epXiek" +
      "obAg7+cwLNx87zfVvW5/0t2E57tsyG5qaZUMJgyqkBYC6E7sMh3d6zqA1IUlBLtVDHlyB9hF" +
      "l34qTcjY+ftXWXlBSNsKXVQRjqpLaLhze/xaIBFlz/77OjMfDwfI0oBIuN8taLXADGQ/kMXF" +
      "bB79LJY7vP/+CVMIPxK7dH4aZ9ReNF+CLHCuVnDQBHY5TTs3LSwVeft+npBaYWEdJuPhiJ1Q" +
      "VuEfOEE6FTgpOGAC54peTP5WJBywutomu7r/jR2y5b5hw5sDeajrU4ais6WEThVWju+2s2ZM" +
      "J8QBsPmr1wn+NVwsFz87FPkOnBDPwopKViRJ5Oado0/ZeJB+HcYQzP2WIP4Xvt21+3A5iFYJ" +
      "aSosyL85TA8z2/NNda/JDlAn4fkqG7K7S14lgwmDKqSFAGpmdpGObnUVROvDEgLdLsY8uQPs" +
      "sgM/lSZkbfz9u6y8IKRtha6iGEfVJTTcuT1+LZCIsmf/fZ2Zj4eD5GkxE+53C1otMAPZD2Rx" +
      "MZtHP4vlDu+/f8IUwo/ELp2fxhm1F82XIAucqxUcNIFZxsPOXQtrRJaanyWkVlhYh8l6uWYn" +
      "lFX4J0zSxgFKCg6YwLmiF5O/FQkHrK62ya7uf2OHbLlv2PDmQB7q+pSh6GwpoVOFleO77awZ" +
      "0wlxAGz+6nWCfw0Xy8XPDpo8B0qIZWFFISsSJFLzz8GubDxIvx5jCuY+axTeC9/u2u38PtXr" +
      "hDQUNsT9HIaHu8/5prrV7U+6m/B8lw3bTS2PAsGEQRXyQgDdiVm2g1tdBZH+8IRgt8sxz+5A" +
      "u6jST6UJWRt//yorbwhpS6GrKOZRdQkNd26fXwskouzdf1/nZuPgIFgYyIDzVYJWC9xI9yJ4" +
      "HMjk0c/iuef7758whfAjtUvlpnBGzwXTJcwC5+oVBk1hl9G0c9PCErW37+cJqRUW1GGzXq7Z" +
      "CWUVvgkmSKcCJwdHSPBc0cuJ+8qEA15X32xV97+1Q7bcNyw6OwSPdX3ucv22nNCpws6w3Xfy" +
      "zOmEOAA2f/U6wb6Gy6fgZ4dizYET4llYUciKBInU/HOwKxsP0q/HmYK73xLE/8K3u3Y/rk/1" +
      "OiFNhQX5twdhYe57tqnuNdkB6iQ832XDdnPbq2QwYRCFvABE9mIG6elW10G2Pzwh2K1iyJM7" +
      "wC6qsFNpQtbG37/LygtC2lboKopxRH1Cw53b55cCiSh79t/Xudk8OAAeFjLAfLWg1YIz0r1A" +
      "lgdE8+hnsdzh/fdPmEL4kdil89M4s/aC+xJmAXO1AgsuOMt4+Llr4ana2/fzhNQKC+qwWS/X" +
      "7ISyCt+ETdK5yEnhABI4V+Rz874y4YLV9TfbVf1v7Jg99g2K3g7IQ12bu1y/LSd0qrAzbPed" +
      "NGM6IQ6IzV+tTrSNwHIp+NmxSFOghHgWVBSyIkkiNf8c/M7mg/Trcabg7rdG4b3w7a7dzu9T" +
      "vU5IQ2FD3M9heLj7nG+qe012gDoJz3fZkN3c9ioZTBhUIS0A0bnYZTq613UAqQtLCHarGPLk" +
      "DrCLKuxUmpC18ffvsvKCkLYVuopiHFWX0HDn9vBLgUQUPfvv6tx8PBwkT4uZcL9b0GqBGch+" +
      "IIuL2Tz6WSx3eP/9E6YQfqR2of427ui54LoEWcBMreCgKcx6nn7uWlgq8vb9PCG1wsI6TMbD" +
      "ETuhrMI/cIJ0KnBScMAEzpWG7WKrdsK+Ql92apLpfjhhXIW0YUGygY7liPl2ziXRgXRxCa8V" +
      "IqxDU1tO7hPSKPxhoLnDWLGl76x4juRsTtgbNAVg6pYV8/YFvwPsMlktNSasEAQmiHo0MImd" +
      "zxlBsEsYommTyOOWASKAzdXVQY7QbvTnrzZBibCoFjnQrYUeGAGVIoKiBAGQCAmEmKikCz7q" +
      "ZDIOyCczQBnzJkbApNCK/8CY23U="
  private val G5PlainB64: String =
      "jfG/yz2W9uRFW0v3CUMzbK8InAZpUvSbrpuR71yXtIXrCS5tBXcc0/J6AW29CeLszW0VUyN7" +
      "4CxalI7+plldx3CC9//3IlAa2Ze2zO/Zgb5WPnRR0qCVsGEGy/5kQc2T66FFvm30tQNP2hqY" +
      "o2JCfZQXeuVKWjFpJEw0yuTHccGg7zjrh9CSwkJs8aLjgULYSWqA3z5DL+FUDhFmamET8BAj" +
      "J7/2/bPz/lv+DpklK9t/dx8eMN7lR3nHgwKStFCsYUf6SK5+OcKrbPCr/O8nN0umLWqb31P0" +
      "/rJdmRLwe1qc7NSk6wQC3LNGgPIpX3jOw/S65cJHg0PahKnjZf2cwoKfAQdE7B3aOqAlWsz3" +
      "ot37RUv4Uv+CB/QX6se77uBBEemawgQ7fc+ksD+x"

  private def golden: Seq[(String, Array[Byte], Array[Byte])] = Seq(
    ("g1 level-3 text", b64(G1B64),
      ("the quick brown fox jumps over the lazy dog. " * 40).getBytes("UTF-8")),
    ("g2 level-19 repetitive", b64(G2B64),
      (0 until 600).map(i => s"word${i % 7} ").mkString.getBytes("UTF-8")),
    ("g3 level-1 runs+ramp", b64(G3B64),
      (0 until 100).map(i => (i % 3).toByte).toArray ++
        new Array[Byte](500) ++ (0 until 256).map(_.toByte).toArray),
    ("g4 multi-block 406KB", b64(G4B64),
      (0 until 9000).map(i => s"sentence ${i % 13} has words and phrases and repeats. ")
        .mkString.getBytes("UTF-8")),
    ("g5 incompressible (raw blocks)", b64(G5B64), b64(G5PlainB64)),
    ("g6 stdin (no content size, checksum)", b64(G6B64),
      (0 until 2000).map(i => s"mix ${i % 11} of patterns and entropy ${(i * 7) % 23}; ")
        .mkString.getBytes("UTF-8")))

  test("golden: real-zstd output decodes byte-exactly across levels and shapes") {
    for ((name, comp, plain) <- golden) {
      val r = ZstdDecode.decodeFrame(comp, 0)
      assert(r != null, s"$name failed to decode")
      assert(r._2 == comp.length, s"$name consumed ${r._2} of ${comp.length}")
      assert(java.util.Arrays.equals(r._1, plain),
        s"$name decoded ${r._1.length} bytes != expected ${plain.length}")
    }
  }

  test("member walk: concatenated frames, skippable frames, completed prefix") {
    val g1 = b64(G1B64); val g2 = b64(G2B64)
    val skippable = Array[Byte](0x53, 0x2A, 0x4D, 0x18, 4, 0, 0, 0, 9, 9, 9, 9)
    val cat = g1 ++ skippable ++ g2
    val members = ZstdDecode.zstdMembers(cat)
    assert(members.length == 2)
    assert(java.util.Arrays.equals(members(0), golden(0)._3))
    assert(java.util.Arrays.equals(members(1), golden(1)._3))
    // a corrupt SECOND frame keeps the verified first member
    val bad = g2.clone; bad(20) = (bad(20) ^ 0x55).toByte
    val withBad = g1 ++ bad ++ g1
    val got = ZstdDecode.zstdMembers(withBad)
    assert(got.length == 1 && java.util.Arrays.equals(got(0), golden(0)._3))
    // strict whole-payload: trailing junk refuses; clean concat decodes
    assert(ZstdDecode.zstdAll(cat ++ Array[Byte](1, 2)) == null)
    val all = ZstdDecode.zstdAll(cat)
    assert(java.util.Arrays.equals(all, golden(0)._3 ++ golden(1)._3))
  }

  test("adversarial input never throws: every truncation, every byte flip") {
    for ((_, comp, _) <- golden.take(3) :+ golden(5)) {
      for (cut <- 0 to comp.length - 1) { // every proper prefix
        val torn = java.util.Arrays.copyOf(comp, cut)
        assert(ZstdDecode.decodeFrame(torn, 0) == null)
        ZstdDecode.zstdMembers(torn) // must not throw
      }
      for (i <- comp.indices) { // every single-byte corruption
        val bad = comp.clone; bad(i) = (bad(i) ^ 0x5A).toByte
        ZstdDecode.decodeFrame(bad, 0) // must not throw
      }
    }
    // the checksum arm: g6 carries one — flipping any payload byte
    // past the header must be CAUGHT (null), never wrong bytes
    val g6 = b64(G6B64)
    for (i <- 20 until g6.length by 97) {
      val bad = g6.clone; bad(i) = (bad(i) ^ 1).toByte
      val r = ZstdDecode.decodeFrame(bad, 0)
      assert(r == null || java.util.Arrays.equals(r._1, golden(5)._3),
        s"flip at $i produced silently-wrong bytes")
    }
    assert(ZstdDecode.decodeFrame(null, 0) == null)
    assert(ZstdDecode.zstdMembers(null).isEmpty)
  }

  test("fixture encoders round-trip: raw, RLE, sequences, Huffman 1- and 4-stream") {
    // raw frames: empty, one block, multi-block, with checksum
    for (n <- Seq(0, 1, 100, 70000)) {
      val data = (0 until n).map(i => ((i * 7 + 3) % 251).toByte).toArray
      for (ck <- Seq(false, true)) {
        val r = ZstdDecode.decodeFrame(ZstdDecode.zstdFrameRaw(data, ck), 0)
        assert(r != null && java.util.Arrays.equals(r._1, data), s"raw n=$n ck=$ck")
      }
    }
    // RLE block
    val rle = ZstdDecode.decodeFrame(ZstdDecode.zstdFrameRle('z', 500, checksum = true), 0)
    assert(rle != null && rle._1.length == 500 && rle._1.forall(_ == 'z'))
    // sequences: period × repeats + tail, incl. an OVERLAPPING copy
    // (offset < match length — the LZ in-place repeat)
    for ((period, reps, tail) <- Seq(
      ("word ", 9, "end."), ("x", 40, ""), ("abcdefgh", 2, "!"))) {
      val f = ZstdDecode.zstdFrameSequences(
        period.getBytes("US-ASCII"), reps, tail.getBytes("US-ASCII"), checksum = true)
      val r = ZstdDecode.decodeFrame(f, 0)
      assert(r != null, s"seq $period x $reps")
      assert(new String(r._1, "US-ASCII") == period * reps + tail)
    }
    // Huffman literals, both stream layouts, against the real decoder
    val text = ("abacadabba" * 20).getBytes("US-ASCII")
    for (four <- Seq(false, true)) {
      val r = ZstdDecode.decodeFrame(
        ZstdDecode.zstdFrameHuffman(text, fourStream = four, checksum = true), 0)
      assert(r != null && java.util.Arrays.equals(r._1, text), s"huf four=$four")
    }
    // and every encoder output survives the adversarial walk: truncate
    // the sequences frame at each prefix — no throw, null decode
    val sf = ZstdDecode.zstdFrameSequences("word ".getBytes, 9, "end.".getBytes)
    for (cut <- 0 until sf.length)
      assert(ZstdDecode.decodeFrame(java.util.Arrays.copyOf(sf, cut), 0) == null)
  }

  test("entropy-coded fixture: FSE weights + Compressed_Mode sequences round-trip") {
    // the full entropy path in one synthesized frame: Huffman literals
    // under an FSE-COMPRESSED weight table, two sequences under
    // FSE-described LL/OF/ML tables with real state transitions — the
    // decoder these bytes must satisfy is the one the CLI golden bytes
    // certified
    for (r1 <- 2 to 12; r2 <- 3 to 17) {
      val f = ZstdDecode.zstdFrameEntropy(r1, r2)
      val r = ZstdDecode.decodeFrame(f, 0)
      assert(r != null, s"r1=$r1 r2=$r2 refused")
      assert(new String(r._1, "US-ASCII") == "abcd" * r1 + "bc" * r2 + "dd",
        s"r1=$r1 r2=$r2 wrong bytes")
    }
    // checksum honesty: with the XXH32 trailer, flipped payload bits
    // are caught or decode identically — never silently-wrong bytes
    val f = ZstdDecode.zstdFrameEntropy(5, 7)
    val want = "abcd" * 5 + "bc" * 7 + "dd"
    for (cut <- 0 until f.length)
      assert(ZstdDecode.decodeFrame(java.util.Arrays.copyOf(f, cut), 0) == null)
    for (i <- f.indices) {
      val bad = f.clone; bad(i) = (bad(i) ^ 0x5A).toByte
      val r = ZstdDecode.decodeFrame(bad, 0) // must not throw
      assert(r == null || new String(r._1, "US-ASCII") == want,
        s"flip at $i produced silently-wrong bytes")
    }
  }

  test("frame declaring a >= 2^63 content size refuses at the header") {
    // 8-byte FCS with bit 63 set parses as a negative Long; it must be
    // rejected outright — letting it through would skip BOTH the bomb
    // pre-gate and the declared-size equality check (r15 advice)
    val f = Array[Byte](0x28, 0xB5.toByte, 0x2F, 0xFD.toByte,
      0xE0.toByte, // FHD: 8-byte FCS + single-segment
      0, 0, 0, 0, 0, 0, 0, 0x80.toByte, // FCS = 0x8000000000000000
      1, 0, 0) // last raw block, size 0 — would decode empty if admitted
    assert(ZstdDecode.decodeFrame(f, 0) == null)
  }

  test("contract edges: dictionary frames refuse, bomb cap binds") {
    // frame header declaring dictionary id 7 -> out of contract
    val dict = Array[Byte](0x28, 0xB5.toByte, 0x2F, 0xFD.toByte,
      0x21, 7, 100, 1, 0, 0) // FHD 0x21: single-segment + 1-byte dict id
    assert(ZstdDecode.decodeFrame(dict, 0) == null)
    // the 406KB golden refuses under a 1000-byte output cap
    assert(ZstdDecode.decodeFrame(b64(G4B64), 0, maxOut = 1000) == null)
    // and the aggregate cap stops the member walk
    val g1 = b64(G1B64)
    assert(ZstdDecode.zstdMembers(g1 ++ g1 ++ g1, maxOutTotal = 4000L).length == 2)
  }

  private val DictB64: String =
      "N6Qw7AlGABEfEBg7FDoAAAAAAAAAADAzAAAAAACAUntvKaWUYQQhBGMKAAAAAITPFAAANGDA" +
      "gIEDAwNEFAZwMggGBgYGFBQGBgYGBgYGBgYGBgYGBgYGBhQGdpgmkXCbmdm2ASSoUONsGIYx" +
      "xhhjjDHGGGOMmZmZmW0bAQAAAAQAAAAIAAAAZHMgcmVwZWF0ZWQgY29udGVudDwvcD48L2Jv" +
      "ZHk+PC9odG1sPg0KDQpXQVJDLzEuMA0KV0FSQy1UeXBlOiByZXNwb25zZQ0KV0FSQy1UYXJn" +
      "ZXQtVVJJOiBodHRwOi8vc2l0ZTMuZXhhbXBsZS9wNDMNCkNvbnRlbnQtTGVuZ3RoOiAxNTYN" +
      "Cg0KSFRUUC8xLjEgMjAwIE9LDQpDb250ZW50LVR5cGU6IHRleHQvaHRtbDsgY2hhcnNldD11" +
      "dGYtOA0KU2VydmVyOiBncmFmdA0KDQo8aHRtbD48Ym9keT48aDE+VDQzPC9oMT48cD5wYWdl" +
      "IDMwMSBjcmF3bCB3b3JkcyByZXBlYXRlZCBjb250ZW50PC9wPjwvYm9keT48L2h0bWw+DQoN" +
      "CldBUkMvMS4wDQpXQVJDLVR5cGU6IHJlc3BvbnNlDQpXQVJDLVRhcmdldC1VUkk6IGh0dHA6" +
      "Ly9zaXRlMC5leGFtcGxlL3AyNQ0KQ29udGVudC1MZW5ndGg6IDE1Ng0KDQpIVFRQLzEuMSAy" +
      "MDAgT0sNCkNvbnRlbnQtVHlwZTogdGV4dC9odG1sOyBjaGFyc2V0PXV0Zi04DQpTZXJ2ZXI6" +
      "IGdyYWZ0DQoNCjxodG1sPjxib2R5PjxoMT5UMjU8L2gxPjxwPnBhZ2UgMTc1IGNyYXdsIHdv" +
      "cmRzIHJlcGVhdGVkIGNvbnRlbnQ8L3A+PC9ib2R5PjwvaHRtbD4NCg0KV0FSQy8xLjANCldB" +
      "UkMtVHlwZTogcmVzcG9uc2UNCldBUkMtVGFyZ2V0LVVSSTogaHR0cDovL3NpdGU0LmV4YW1w" +
      "bGUvcDU0DQpDb250ZW50LUxlbmd0aDogMTU2DQoNCkhUVFAvMS4xIDIwMCBPSw0KQ29udGVu" +
      "dC1UeXBlOiB0ZXh0L2h0bWw7IGNoYXJzZXQ9dXRmLTgNClNlcnZlcjogZ3JhZnQNCg0KPGh0" +
      "bWw+PGJvZHk+PGgxPlQ1NDwvaDE+PHA+cGFnZSAzNzggY3Jhd2wgd29yZHMgcmVwZWF0ZWQg" +
      "Y29udGVudDwvcD48L2JvZHk+PC9odG1sPg0KDQpXQVJDLzEuMA0KV0FSQy1UeXBlOiByZXNw" +
      "b25zZQ0KV0FSQy1UYXJnZXQtVVJJOiBodHRwOi8vc2l0ZTEuZXhhbXBsZS9wMTENCkNvbnRl" +
      "bnQtTGVuZ3RoOiAxNTUNCg0KSFRUUC8xLjEgMjAwIE9LDQpDb250ZW50LVR5cGU6IHRleHQv" +
      "aHRtbDsgY2hhcnNldD11dGYtOA0KU2VydmVyOiBncmFmdA0KDQo8aHRtbD48Ym9keT48aDE+" +
      "VDExPC9oMT48cD5wYWdlIDc3IGNyYXdsIGwgd29yZHMgcmVwZWF0ZWQgY29udGVudDwvcD48" +
      "L2JvZHk+PC9odG1sPg0KDQpXQVJDLzEuMA0KV0FSQy1UeXBlOiByZXNwb25zZQ0KV0FSQy1U" +
      "YXJnZXQtVVJJOiBodHRwOi8vc2l0ZTQuZXhhbXBsZS9wNA0KQ29udGVudC1MZW5ndGg6IDE1" +
      "NA0KDQpIVFRQLzEuMSAyMDAgT0sNCkNvbnRlbnQtVHlwZTogdGV4dC9odG1sOyBjaGFyc2V0" +
      "PXV0Zi04DQpTZXJ2ZXI6IGdyYWZ0DQoNCjxodG1sPjxib2R5PjxoMT5UNDwvaDE+PHA+cGFn" +
      "ZSAyOCBjcmF3bCB3b3JkcyByZXBlYXRlZCBjb250ZW50PC9wPjwvYm9keT48L2h0bWw+DQoN" +
      "CldBUkMvMS4wDQpXQVJDLVR5cGU6IHJlc3BvbnNlDQpXQVJDLVRhcmdldC1VUkk6IGh0dHA6" +
      "Ly9zaXRlMi5leGFtcGxlL3AyMg0KQ29udGVudC1MZW5ndGg6IDE1Ng0KDQpIVFRQLzEuMSAy" +
      "MDAgT0sNCkNvbnRlbnQtVHlwZTogdGV4dC9odG1sOyBjaGFyc2V0PXV0Zi04DQpTZXJ2ZXI6" +
      "IGdyYWZ0DQoNCjxodG1sPjxib2R5PjxoMT5UMjI8L2gxPjxwPnBhZ2UgMTU0IGNyYXdsIHdv" +
      "cmRzIHJlcGVhdGVkIGNvbnRlbnQ8L3A+PC9ib2R5PjwvaHRtbD4NCg0KV0FSQy8xLjANCldB" +
      "UkMtVHlwZTogcmVzcG9uc2UNCldBUkMtVGFyZ2V0LVVSSTogaHR0cDovL3NpdGUwLmV4YW1w" +
      "bGUvcDcwDQpDb250ZW50LUxlbmd0aDogMTU2DQoNCkhUVFAvMS4xIDIwMCBPSw0KQ29udGVu" +
      "dC1UeXBlOiB0ZXh0L2h0bWw7IGNoYXJzZXQ9dXRmLTgNClNlcnZlcjogZ3JhZnQNCg0KPGh0" +
      "bWw+PGJvZHk+PGgxPlQ3MDwvaDE+PHA+cGFnZSA0OTAgY3Jhd2wgd29yZHMgcmVwZWF0ZWQg" +
      "Y29udGVudDwvcD48L2JvZHk+PC9odG1sPg0KDQpXQVJDLzEuMA0KV0FSQy1UeXBlOiByZXNw" +
      "b25zZQ0KV0FSQy1UYXJnZXQtVVJJOiBodHRwOi8vc2l0ZTEuZXhhbXBsZS9wNg0KQ28="
  private val D3PlainB64: String =
      "V0FSQy8xLjANCldBUkMtVHlwZTogcmVzcG9uc2UNCldBUkMtVGFyZ2V0LVVSSTogaHR0cDov" +
      "L3NpdGUzLmV4YW1wbGUvcDMNCkNvbnRlbnQtTGVuZ3RoOiAxNTQNCg0KSFRUUC8xLjEgMjAw" +
      "IE9LDQpDb250ZW50LVR5cGU6IHRleHQvaHRtbDsgY2hhcnNldD11dGYtOA0KU2VydmVyOiBn" +
      "cmFmdA0KDQo8aHRtbD48Ym9keT48aDE+VDM8L2gxPjxwPnBhZ2UgMjEgY3Jhd2wgd29yZHMg" +
      "cmVwZWF0ZWQgY29udGVudDwvcD48L2JvZHk+PC9odG1sPg0KDQo="
  private val D3CompB64: String =
      "KLUv/QdgCUYAEY0AABgzMzEE/ChCj065YKYO4yI8qyZhNQ=="
  private val D17PlainB64: String =
      "V0FSQy8xLjANCldBUkMtVHlwZTogcmVzcG9uc2UNCldBUkMtVGFyZ2V0LVVSSTogaHR0cDov" +
      "L3NpdGUyLmV4YW1wbGUvcDE3DQpDb250ZW50LUxlbmd0aDogMTU2DQoNCkhUVFAvMS4xIDIw" +
      "MCBPSw0KQ29udGVudC1UeXBlOiB0ZXh0L2h0bWw7IGNoYXJzZXQ9dXRmLTgNClNlcnZlcjog" +
      "Z3JhZnQNCg0KPGh0bWw+PGJvZHk+PGgxPlQxNzwvaDE+PHA+cGFnZSAxMTkgY3Jhd2wgd29y" +
      "ZHMgcmVwZWF0ZWQgY29udGVudDwvcD48L2JvZHk+PC9odG1sPg0KDQo="
  private val D17CompB64: String =
      "KLUv/QdgCUYAEZUAADAxNzE3MTkE/KhKJMKBEia3b7NRKdU="
  private val D42PlainB64: String =
      "V0FSQy8xLjANCldBUkMtVHlwZTogcmVzcG9uc2UNCldBUkMtVGFyZ2V0LVVSSTogaHR0cDov" +
      "L3NpdGUyLmV4YW1wbGUvcDQyDQpDb250ZW50LUxlbmd0aDogMTU2DQoNCkhUVFAvMS4xIDIw" +
      "MCBPSw0KQ29udGVudC1UeXBlOiB0ZXh0L2h0bWw7IGNoYXJzZXQ9dXRmLTgNClNlcnZlcjog" +
      "Z3JhZnQNCg0KPGh0bWw+PGJvZHk+PGgxPlQ0MjwvaDE+PHA+cGFnZSAyOTQgY3Jhd2wgd29y" +
      "ZHMgcmVwZWF0ZWQgY29udGVudDwvcD48L2JvZHk+PC9odG1sPg0KDQo="
  private val D42CompB64: String =
      "KLUv/QdgCUYAEYUAACA0NDI5BPypuiSCgRIm13eVY7cw"

  test("dictionaries: real CLI-trained dict decodes real dict-compressed frames") {
    // the dictionary was produced by `zstd --train` over WARC-record
    // samples and each frame by `zstd -9 -D` — structured-dictionary
    // parsing (entropy tables incl. FSE-compressed Huffman weights,
    // stored repeat offsets, window content) certified against bytes
    // this codebase did not generate
    val dict = ZstdDecode.parseDict(b64(DictB64))
    assert(dict != null && dict.id != 0L)
    val cases = Seq((b64(D3CompB64), b64(D3PlainB64)),
      (b64(D17CompB64), b64(D17PlainB64)), (b64(D42CompB64), b64(D42PlainB64)))
    for (((comp, plain), i) <- cases.zipWithIndex) {
      // without the dictionary the frame must REFUSE (its header
      // declares the dictionary id — decoding anyway would be
      // silently-wrong bytes)
      assert(ZstdDecode.decodeFrame(comp, 0) == null, s"case $i decoded dict-less")
      val r = ZstdDecode.decodeFrame(comp, 0, dict = dict)
      assert(r != null, s"case $i failed with dict")
      assert(java.util.Arrays.equals(r._1, plain), s"case $i wrong bytes")
    }
    // the Common-Crawl layout: dictionary in a leading 0x184D2A5D
    // skippable frame, then the data frames — one reader, no flags
    val cc = ZstdDecode.dictFrame(b64(DictB64)) ++
      cases.map(_._1).reduce(_ ++ _)
    val members = ZstdDecode.zstdMembersAuto(cc)
    assert(members.length == 3)
    for (((_, plain), m) <- cases.zip(members))
      assert(java.util.Arrays.equals(m, plain))
    // ...and with the embedded dictionary itself zstd-COMPRESSED
    val ccz = ZstdDecode.dictFrame(ZstdDecode.zstdFrameRaw(b64(DictB64))) ++
      cases.map(_._1).reduce(_ ++ _)
    assert(ZstdDecode.zstdMembersAuto(ccz).length == 3)
    // a payload WITHOUT the convention walks exactly like zstdMembers
    assert(ZstdDecode.zstdMembersAuto(b64(G1B64)).length == 1)
    // corrupt embedded dictionary: NO members (a dict-less decode of
    // frames that reference it would be wrong bytes, not degrade)
    val badDict = b64(DictB64).clone
    badDict(40) = (badDict(40) ^ 0x5A).toByte
    ZstdDecode.zstdMembersAuto(ZstdDecode.dictFrame(badDict) ++ cases.head._1) // no throw
    // mismatched id refuses
    val otherBytes = b64(DictB64)
    otherBytes(4) = (otherBytes(4) ^ 1).toByte
    val other = ZstdDecode.parseDict(otherBytes)
    if (other != null)
      assert(ZstdDecode.decodeFrame(cases.head._1, 0, dict = other) == null)
    // raw-content dictionaries: window-prefix matches reach into the
    // dict across the base boundary and self-extend
    val period = "dictword ".getBytes("US-ASCII")
    val rawDict = ZstdDecode.parseDict("junk-prefix ".getBytes ++ period)
    assert(rawDict != null && rawDict.id == 0L)
    val f = ZstdDecode.zstdFrameDictSeq(period, 5, "tail!".getBytes, checksum = true)
    val r = ZstdDecode.decodeFrame(f, 0, dict = rawDict)
    assert(r != null && new String(r._1, "US-ASCII") == "dictword " * 5 + "tail!")
    // the same frame WITHOUT the dict refuses (offset reaches past
    // the window start)
    assert(ZstdDecode.decodeFrame(f, 0) == null)
    // every truncation of the dict parses or nulls, never throws
    for (cut <- 0 until b64(DictB64).length by 7)
      ZstdDecode.parseDict(java.util.Arrays.copyOf(b64(DictB64), cut))
  }
}
