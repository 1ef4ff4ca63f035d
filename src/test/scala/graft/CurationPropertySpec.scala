package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Sampling, Similarity}

/** Property-based invariants for the round-5 curation operators, checked
  * against independent in-JVM reimplementations on random inputs:
  *
  * capPerGroup —
  *   - each group keeps exactly min(n, |group|) rows;
  *   - kept rows are a subset of the input, deterministically;
  *   - locality: capping the union of groups equals the union of
  *     per-group caps (one group's members never affect another's).
  *
  * semanticDedup —
  *   - the smallest id of every non-empty cell survives;
  *   - no two same-cell survivors have cosine ≥ threshold (the
  *     dominance rule is strong enough to leave an independent set);
  *   - every dropped vector has a lower-id same-cell mate ≥ threshold;
  *   - survivors match an exact scalar reimplementation (same
  *     float→double casts, index-order sums, smallest-cid tie-break).
  */
class CurationPropertySpec extends SparkSpec {

  import spark.implicits._

  private def forAllSamples[T](gen: Gen[T], n: Int)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)) match {
        case Some(v) => body(v)
        case None => ()
      }
    }

  // ----------------------------------------------------------- capPerGroup

  private val rowGen = for {
    id <- Gen.choose(0L, 500L)
    grp <- Gen.oneOf("a", "b", "c", "d")
  } yield (id, grp)

  private val rowsGen = Gen.nonEmptyListOf(rowGen).map(_.distinctBy(_._1))

  test("capPerGroup: per-group size, subset, determinism, locality") {
    forAllSamples(rowsGen, 12) { rows =>
      val df = rows.toDF("doc_id", "src")
      val out = Sampling.capPerGroup(df, "src", "doc_id", n = 3)
        .as[(Long, String)].collect().toSet

      val byGroup = rows.groupBy(_._2)
      byGroup.foreach { case (g, members) =>
        assert(out.count(_._2 == g) == math.min(3, members.size), s"group $g")
      }
      assert(out.subsetOf(rows.toSet))
      val again = Sampling.capPerGroup(df, "src", "doc_id", n = 3)
        .as[(Long, String)].collect().toSet
      assert(again == out)
      // locality: capping each group alone keeps the same ids
      byGroup.foreach { case (g, members) =>
        val alone = Sampling.capPerGroup(members.toDF("doc_id", "src"),
          "src", "doc_id", n = 3).as[(Long, String)].collect().toSet
        assert(alone == out.filter(_._2 == g), s"group $g not local")
      }
    }
  }

  // --------------------------------------------------------- semanticDedup

  // small integer lanes produce plenty of parallel / near-parallel pairs
  private val vecGen = for {
    id <- Gen.choose(10L, 200L)
    lanes <- Gen.listOfN(4, Gen.choose(0, 3))
    if lanes.exists(_ != 0) // zero vectors excluded (NaN cosine domain)
  } yield (id, lanes.map(_.toFloat).toArray)

  private val vecsGen = Gen.nonEmptyListOf(vecGen).map(_.distinctBy(_._1))

  private val axes = Seq(
    (1L, Array(1f, 0f, 0f, 0f)),
    (2L, Array(0f, 1f, 0f, 0f)),
    (3L, Array(0f, 0f, 1f, 0f)),
    (4L, Array(0f, 0f, 0f, 1f)))

  /** Bitwise mirror of the Spark kernels: float→double casts, lane-order
    * sums, strict-> argmax over cid-ascending centroids.
    */
  private def cosD(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def cellOf(v: Array[Float]): Long =
    axes.foldLeft((-2.0, -1L)) { case (best @ (bs, _), (cid, c)) =>
      val s0 = cosD(v, c)
      val s = if (s0.isNaN) -2.0 else s0
      if (s > bs) (s, cid) else best
    }._2

  test("semanticDedup: min-id survives, survivors independent, drops justified") {
    forAllSamples(vecsGen, 12) { vs =>
      val df = vs.toDF("vec_id", "embedding")
      val cents = axes.toDF("vec_id", "embedding")
      val kept = Similarity.semanticDedup(df, cents, "vec_id", "embedding", 0.9)
        .select("vec_id").as[Long].collect().toSet

      val byId = vs.toMap
      val cells = vs.map { case (id, v) => id -> cellOf(v) }.toMap

      // independent reimplementation of the dominance rule
      val expected = vs.collect {
        case (id, v) if !vs.exists { case (oid, ov) =>
          oid < id && cells(oid) == cells(id) && cosD(ov, v) >= 0.9
        } => id
      }.toSet
      assert(kept == expected)

      // min id of each cell survives
      cells.groupBy(_._2).foreach { case (_, members) =>
        assert(kept.contains(members.keys.min))
      }
      // survivors form an independent set within each cell
      for (a <- kept; b <- kept if a < b && cells(a) == cells(b))
        assert(cosD(byId(a), byId(b)) < 0.9, s"$a,$b too similar")
      // every drop has a lower-id same-cell justification
      (cells.keySet -- kept).foreach { id =>
        assert(vs.exists { case (oid, ov) =>
          oid < id && cells(oid) == cells(id) && cosD(ov, byId(id)) >= 0.9
        }, s"$id dropped without cause")
      }
    }
  }

  // ------------------------------------------------------- dedupDeltaExact

  // small text alphabet forces plenty of cross- and within-batch
  // duplicates; disjoint id ranges mimic corpus-before-delta ingest order
  private val docGen = for {
    id <- Gen.choose(0L, 300L)
    text <- Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
  } yield (id, text)

  private val splitCorpusGen = for {
    corpus <- Gen.listOf(docGen).map(_.distinctBy(_._1))
    delta <- Gen.nonEmptyListOf(docGen)
      .map(_.distinctBy(_._1).map { case (id, t) => (id + 1000L, t) })
  } yield (corpus, delta)

  test("dedupDeltaExact == delta-side survivors of a full union rerun") {
    import graft.operators.Dedup
    forAllSamples(splitCorpusGen, 12) { case (corpus, delta) =>
      val corpusDf = corpus.toDF("doc_id", "text")
      val deltaDf = delta.toDF("doc_id", "text")
      val screened = Dedup.dedupDeltaExact(
        deltaDf, "doc_id", "text", Dedup.digestIndex(corpusDf, "text"))
        .as[(Long, String)].collect().toSet

      // independent in-JVM reimplementation on the union
      val union = corpus ++ delta
      val survivors = union.groupBy(_._2).values.map(_.minBy(_._1)).toSet
      val expected = survivors.filter(_._1 >= 1000L)
      assert(screened == expected)
    }
  }

  // ------------------------------------------------------- mergeSignatures

  test("mergeSignatures: lane-min over member signatures, any grouping") {
    import graft.operators.Dedup
    val docTextGen = for {
      id <- Gen.choose(0L, 60L)
      grp <- Gen.oneOf("x", "y", "z")
      ws <- Gen.listOfN(6, Gen.oneOf("ga", "gb", "gc", "gd", "ge"))
    } yield (id, grp, ws.mkString(" "))
    val corpusGen = Gen.nonEmptyListOf(docTextGen).map(_.distinctBy(_._1))

    forAllSamples(corpusGen, 8) { rows =>
      val df = rows.toDF("doc_id", "grp", "text")
      val sigs = Dedup.minhashSignatures(df, "doc_id", "text", n = 3, k = 8)
        .join(df.select(col("doc_id").as("id"), col("grp")), "id")
      val perDoc = sigs.collect().map(r =>
        r.getAs[String]("grp") ->
          r.getAs[scala.collection.Seq[Long]]("signature").toSeq).toSeq
      val merged = Dedup.mergeSignatures(sigs, "grp")
        .collect().map(r => r.getString(0) ->
          r.getAs[scala.collection.Seq[Long]]("signature").toSeq).toMap

      perDoc.groupBy(_._1).foreach { case (g, members) =>
        val laneMin = members.map(_._2).transpose.map(_.min)
        assert(merged(g) == laneMin, s"group $g")
      }
      assert(merged.keySet == perDoc.map(_._1).toSet)
    }
  }
}
