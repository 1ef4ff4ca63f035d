package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Sampling invariants: determinism across evaluations, disjoint +
  * exhaustive splits, and sane sample-rate behavior.
  */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private def ids = (0L until 10000L).toDF("id")

  test("sampling is deterministic: same ids survive on re-evaluation") {
    val a = Sampling.sampleByHash(ids, "id", 10).as[Long].collect().sorted.toSeq
    val b = Sampling.sampleByHash(ids, "id", 10).as[Long].collect().sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("train/holdout is disjoint and exhaustive") {
    val (train, holdout) = Sampling.trainHoldout(ids, "id", holdoutBuckets = 20)
    val t = train.as[Long].collect().toSet
    val h = holdout.as[Long].collect().toSet
    assert(t.intersect(h).isEmpty)
    assert(t.union(h).size == 10000)
  }

  test("sample rate lands near the requested fraction") {
    val n = Sampling.sampleByHash(ids, "id", 10).count()
    // 10% of 10k with a multiplicative hash: comfortably within ±3%
    assert(n > 700 && n < 1300, s"got $n of 10000")
  }

  test("mixture resample hits the per-stratum epoch factors and interleavable epochs") {
    val rows = (0L until 6000L).map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "s")
    val out = Sampling.mixtureResample(rows, "id", "s",
      epochs = Map("a" -> 2.5, "b" -> 0.4))
    val counts = out.groupBy("s").count().as[(String, Long)].collect().toMap
    // 2000 per stratum: a ≈ 5000, b ≈ 800, c (default 1.0) = exactly 2000
    assert(counts("a") > 4700 && counts("a") < 5300, counts.toString)
    assert(counts("b") > 650 && counts("b") < 950, counts.toString)
    assert(counts("c") == 2000, counts.toString)
    // every surviving id carries a dense 0..n-1 epoch range
    val epochs = out.filter(col("s") === "a").groupBy("id")
      .agg(count(lit(1)).as("n"), max(col("epoch")).as("mx"), min(col("epoch")).as("mn"))
      .filter(col("mx") =!= col("n") - 1 || col("mn") =!= 0)
    assert(epochs.count() == 0)
    // deterministic across evaluations
    assert(out.count() == Sampling.mixtureResample(rows, "id", "s",
      epochs = Map("a" -> 2.5, "b" -> 0.4)).count())
  }

  test("property: split stays disjoint+exhaustive for arbitrary ids (incl. negatives)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val idsGen = Gen.nonEmptyListOf(Gen.choose(Long.MinValue / 4, Long.MaxValue / 4))
    (1 to 10).foreach { i =>
      idsGen(Gen.Parameters.default, Seed(i.toLong)).foreach { raw =>
        val d = raw.distinct.toDF("id")
        val (train, holdout) = Sampling.trainHoldout(d, "id", 30)
        val t = train.as[Long].collect().toSet
        val h = holdout.as[Long].collect().toSet
        assert(t.intersect(h).isEmpty)
        assert(t.union(h).size == raw.distinct.size)
      }
    }
  }

  test("property: keepLatest returns exactly one row per key, the max-order one") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      key <- Gen.choose(1L, 6L)
      ver <- Gen.choose(0L, 100L)
    } yield (key, ver)
    (1 to 10).foreach { i =>
      Gen.nonEmptyListOf(rowGen)(Gen.Parameters.default, Seed(i.toLong)).foreach { rows =>
        // unique (key, ver) so the survivor is well-defined without tie-break
        val d = rows.distinct.toDF("key", "ver")
        val kept = graft.operators.Dedup
          .keepLatest(d, Seq("key"), Seq(col("ver").desc))
          .as[(Long, Long)].collect().toMap
        val expected = rows.distinct.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        assert(kept == expected)
      }
    }
  }

  test("stratified sampling applies per-stratum rates; keep-all keeps all") {
    val rows = (0L until 3000L).map(i => (i, if (i % 3 == 0) "rare" else "common"))
      .toDF("id", "kind")
    val sampled = Sampling.stratifiedSampleByHash(
      rows, "id", "kind", Map("rare" -> 100), defaultKeep = 10)
    val byKind = sampled.groupBy("kind").count()
      .as[(String, Long)].collect().toMap
    assert(byKind("rare") == 1000L) // rate 100/100 keeps every rare row
    assert(byKind("common") > 100 && byKind("common") < 300, byKind) // ~10% of 2000
    // deterministic on re-evaluation
    assert(sampled.count() == Sampling.stratifiedSampleByHash(
      rows, "id", "kind", Map("rare" -> 100), defaultKeep = 10).count())
  }

  test("capPerGroup keeps at most n per group, deterministically, unbiased by id order") {
    // 3 groups of very different sizes
    val d = ((0L until 100L).map(i => (i, "big")) ++
      (100L until 120L).map(i => (i, "mid")) ++
      (120L until 125L).map(i => (i, "small"))).toDF("doc_id", "src")
    val capped = Sampling.capPerGroup(d, "src", "doc_id", n = 10)
    val byGroup = capped.groupBy("src").count()
      .as[(String, Long)].collect().toMap
    assert(byGroup("big") === 10L)   // capped
    assert(byGroup("mid") === 10L)   // capped
    assert(byGroup("small") === 5L)  // under cap -> untouched
    // deterministic across evaluations
    val again = Sampling.capPerGroup(d, "src", "doc_id", n = 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == capped.select("doc_id").as[Long].collect().sorted.toSeq)
    // hash order, not id order: the kept "big" ids are not just 0..9
    val keptBig = capped.filter(col("src") === "big")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptBig != (0L until 10L).toSeq)
  }

  test("splitLabel agrees with the two-DataFrame split") {
    val labeled = ids
      .withColumn("split", Sampling.splitLabel(col("id"), 20))
    val byLabel = labeled.filter(col("split") === "holdout").count()
    val (_, holdout) = Sampling.trainHoldout(ids, "id", 20)
    assert(byLabel == holdout.count())
  }

  test("quotaSample: per-group quotas bind; hash order matches capPerGroup") {
    val df = (1L to 20L).map(i => (i, if (i <= 12) "a" else "b")).toDF("id", "g")
    val quota = Seq(("a", 3L), ("b", 0L)).toDF("g", "alloc")
    val kept = Sampling.quotaSample(df, "g", "id", quota)
    assert(kept.filter(col("g") === "b").count() == 0L)
    // same selection as capPerGroup(n=3) restricted to group a
    val viaCap = Sampling.capPerGroup(df.filter(col("g") === "a"), "g", "id", 3)
      .select("id").as[Long].collect().toSet
    assert(kept.select("id").as[Long].collect().toSet == viaCap)
  }

  test("excessLossWeights: hard domain gets all the weight, baseline gets zero") {
    val rated = Seq(
      ("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0), ("c", 1.0)
    ).toDF("lang", "rate")
    val w = Sampling.excessLossWeights(rated, "lang", "rate")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(w("a") == ((2L, 0.0)))
    assert(w("c") == ((1L, 0.0)))
    assert(w("b")._1 == 2L && math.abs(w("b")._2 - 1.0) < 1e-12)
  }

  test("excessLossWeights: all domains at baseline fall back to uniform") {
    val rated = Seq(("a", 3.0), ("b", 3.0), ("c", 3.0)).toDF("lang", "rate")
    val w = Sampling.excessLossWeights(rated, "lang", "rate")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(w.values.forall(v => math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("DoReMi iteration 2 converges: excess of the selected mixture shrinks") {
    // Engineered corpus: 'easy' docs are all one common token, 'mid'
    // docs mix it with a mid-frequency token, 'hard' docs are all
    // unique tokens. Round 1 (loss = -tab_rate, the shifted true loss):
    // hard takes most of the weight, easy takes 0 and vanishes from the
    // quota. Re-rating the SELECTED corpus (model rebuilt from it)
    // leaves every surviving doc with unique-only tokens -> all at
    // baseline -> round-2 weights uniform, excess spread 0 < round 1's.
    import org.apache.spark.sql.DataFrame
    val docs = (
      (1L to 4L).map(i => (i, "easy", "the the the the")) ++
      (5L to 8L).map(i => (i, "mid", "the cat")) ++
      (9L to 12L).map(i => (i, "hard", s"u${i}a u${i}b"))
    ).toDF("doc_id", "lang", "text")
    def rated(d: DataFrame): DataFrame = graft.operators.TextAnalysis
      .unigramSurprisal(d, "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("loss_rate", -(col("nll_tab") / col("n_tokens").cast("double")))
    def spread(d: DataFrame): Double = {
      val m = d.groupBy("lang").agg(avg("loss_rate").as("m"))
        .select("m").as[Double].collect()
      m.max - m.min
    }
    val rated1 = rated(docs)
    val w1 = Sampling.excessLossWeights(rated1, "lang", "loss_rate")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(w1("easy") == 0.0, s"easiest lang must sit at baseline: $w1")
    assert(w1("hard") > w1("mid") && w1("mid") > 0.0,
      s"hardest lang must take the largest weight: $w1")
    val quota = Sampling.excessLossWeights(rated1, "lang", "loss_rate")
      .select(col("lang"), floor(lit(6.0) * col("weight")).cast("long").as("alloc"))
    val sel = Sampling.quotaSample(
      docs.select(col("doc_id"), col("lang")), "lang", "doc_id", quota)
    val selDocs = docs.join(sel.select("doc_id"), "doc_id")
    assert(sel.filter(col("lang") === "easy").count() == 0L)
    assert(sel.filter(col("lang") === "hard").count() == 4L)
    val rated2 = rated(selDocs)
    val w2 = Sampling.excessLossWeights(rated2, "lang", "loss_rate")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(w2 == Map("mid" -> 0.5, "hard" -> 0.5),
      s"selected mixture re-rates to baseline -> uniform: $w2")
    assert(spread(rated2) < spread(rated1),
      "excess spread of the selected mixture must shrink")
  }

  test("budgetedQuotaSample: admits a hash-order prefix within each group's size budget") {
    val rows = (0L until 200L).map(i => (i, if (i % 2 == 0) "a" else "b", 10L))
      .toDF("id", "g", "sz")
    val quota = Seq(("a", 55L), ("b", 200L)).toDF("g", "alloc")
    val got = Sampling.budgetedQuotaSample(rows, "g", "id", "sz", quota)
      .as[(String, Long, Long)].collect()
    val byG = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    // 10-sized rows: budget 55 admits exactly 5 rows (50 chars); 200 admits 20
    assert(byG == Map("a" -> 50L, "b" -> 200L))
    // determinism: admitted sets reproduce exactly
    val again = Sampling.budgetedQuotaSample(rows, "g", "id", "sz", quota)
      .as[(String, Long, Long)].collect().toSet
    assert(again == got.toSet)
    // a group absent from the quota admits nothing
    val gotB = Sampling.budgetedQuotaSample(
      rows, "g", "id", "sz", Seq(("a", 30L)).toDF("g", "alloc"))
      .as[(String, Long, Long)].collect()
    assert(gotB.forall(_._1 == "a") && gotB.length == 3)
  }

  test("unimaxAlloc: small sources cap at maxEpochs, the rest water-fill") {
    // sizes 10/20/100 at 2 epochs → capacities 20/40/200; budget 150:
    // L1 = 150/3 = 50 > 20 → a capped; L2 = 130/2 = 65 > 40 → b capped;
    // L3 = 90 ≤ 200 → c level-limited at 90
    val rows = Seq(("a", 10L), ("b", 20L), ("c", 100L)).toDF("g", "sz")
    val got = Sampling.unimaxAlloc(rows, "g", "sz", budget = 150L, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map("a" -> (20L, 20L), "b" -> (40L, 40L), "c" -> (200L, 90L)))
  }

  test("unimaxAlloc: budget above total capacity allocates every capacity") {
    val rows = Seq(("a", 10L), ("b", 20L)).toDF("g", "sz")
    val got = Sampling.unimaxAlloc(rows, "g", "sz", budget = 1000L, maxEpochs = 3)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == Map("a" -> 30L, "b" -> 60L))
  }

  test("unimaxAlloc: tight budget levels every source uniformly") {
    val rows = Seq(("a", 100L), ("b", 200L), ("c", 300L)).toDF("g", "sz")
    val got = Sampling.unimaxAlloc(rows, "g", "sz", budget = 90L, maxEpochs = 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == Map("a" -> 30L, "b" -> 30L, "c" -> 30L))
    // total allocation never exceeds the budget
    assert(got.values.sum <= 90L)
  }

  test("unimaxAlloc: allocation is monotone in capacity and budget-bounded") {
    val rows = (0L until 1000L).map(i => (s"g${i % 7}", 1L + i % 13)).toDF("g", "sz")
    val got = Sampling.unimaxAlloc(rows, "g", "sz", budget = 2000L, maxEpochs = 2)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(got.map(_._3).sum <= 2000L)
    got.foreach { case (g, cap, alloc) =>
      assert(alloc <= cap, s"$g allocated past capacity")
    }
    // larger capacity never receives less
    val sorted = got.sortBy(_._2).toSeq
    sorted.sliding(2).foreach {
      case Seq((_, _, a1), (_, _, a2)) => assert(a1 <= a2)
      case _                           =>
    }
  }

  test("dsirLogRatios: target-like documents outscore background documents") {
    // target corpus speaks {alpha, beta}; background speaks {gamma, delta}.
    // A fresh raw doc written in target words must take a higher
    // per-token importance rate than one written in background words.
    val docs = (
      (1L to 20L).map(i => (i, "alpha beta alpha beta", true)) ++
        (21L to 60L).map(i => (i, "gamma delta gamma delta", false)) ++
        Seq((100L, "alpha beta alpha", false), (101L, "gamma delta gamma", false))
    ).toDF("id", "text", "is_tgt")
    val rated = Sampling.dsirLogRatios(docs, "id", "text", col("is_tgt"), buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rated(100L)._1 == 3L)
    val rateTarget = rated(100L)._2 / rated(100L)._1
    val rateBackground = rated(101L)._2 / rated(101L)._1
    assert(rateTarget > rateBackground,
      s"target-like rate $rateTarget must exceed background rate $rateBackground")
  }

  test("dsirLogRatios: deterministic across runs; countScale shift cancels in ordering") {
    val docs = (1L to 50L)
      .map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 11}", i % 4 == 0))
      .toDF("id", "text", "t")
    def rates(scale: Int) =
      Sampling.dsirLogRatios(docs, "id", "text", col("t"), buckets = 32, countScale = scale)
        .collect().map(r => r.getLong(0) -> r.getDouble(2) / r.getLong(1)).toMap
    val a = rates(1)
    assert(rates(1) == a) // bit-identical rerun
    // coarser count grids perturb values but keep the doc ORDERING close:
    // the extreme docs stay extreme (selection consumes the order)
    val b = rates(4)
    val topA = a.toSeq.sortBy { case (id, r) => (-r, id) }.take(5).map(_._1).toSet
    val topB = b.toSeq.sortBy { case (id, r) => (-r, id) }.take(5).map(_._1).toSet
    assert((topA & topB).nonEmpty)
  }

  test("lengthBatches: batch size bound, spread bound, and less waste than naive batching") {
    // skewed lengths: most docs short, a long tail
    val docs = (1L to 400L).map(i => (i, if (i % 10 == 0) 200L + i % 37 else 10L + i % 13))
      .toDF("id", "len")
    val assigned = Sampling.lengthBatches(docs, "id", "len",
      bucketWidth = 16, batchSize = 8, shards = 2)
    val batches = assigned.groupBy("bucket", "shard", "batch_id")
      .agg(count(lit(1)).as("n"), max("len").as("mx"), min("len").as("mn"), sum("len").as("sm"))
      .collect()
    batches.foreach { r =>
      assert(r.getAs[Long]("n") <= 8)
      // within-batch spread bounded by the bucket width
      assert(r.getAs[Long]("mx") - r.getAs[Long]("mn") < 16)
    }
    // every doc assigned exactly once
    assert(assigned.count() == 400 && assigned.select("id").distinct().count() == 400)
    // padding waste strictly below naive (unbucketed) hash-order batching
    def waste(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getAs[Long]("n") * r.getAs[Long]("mx") - r.getAs[Long]("sm")).sum
    val naive = Sampling.lengthBatches(docs, "id", "len",
      bucketWidth = 1000000, batchSize = 8, shards = 1)
      .groupBy("bucket", "shard", "batch_id")
      .agg(count(lit(1)).as("n"), max("len").as("mx"), sum("len").as("sm"))
      .collect()
    assert(waste(batches) < waste(naive))
  }

  test("dsirMergeModels: merging disjoint-half models equals refitting on the union") {
    val docs = (1L to 60L).map(i => (i, s"w${i % 9} w${i % 4} w${i % 7}", i % 3 == 0))
      .toDF("id", "text", "t")
    def model(df: org.apache.spark.sql.DataFrame) =
      Sampling.dsirBucketModel(df, "text", col("t"), buckets = 32)
    def asMap(m: org.apache.spark.sql.DataFrame) =
      m.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).toMap
    val refit = asMap(model(docs))
    val merged = asMap(Sampling.dsirMergeModels(
      model(docs.filter(col("id") % 2 === 0)),
      model(docs.filter(col("id") % 2 === 1))))
    assert(merged == refit) // counts AND delta bit patterns
  }

  test("dsirModelArrayCentered: 0 is the neutral point between target and background") {
    val train = (
      (1L to 30L).map(i => (i, "alpha beta alpha beta", true)) ++
        (31L to 60L).map(i => (i, "gamma delta gamma delta", false))
    ).toDF("id", "text", "t")
    val deltas = Sampling.dsirModelArrayCentered(
      Sampling.dsirBucketModel(train, "text", col("t"), buckets = 32), 32)
    val scored = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("id", "text")
      .select(col("id"), (Sampling.dsirScore(col("text"), deltas.toSeq, 32) / 2.0).as("rate"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // centered rate is a log-likelihood ratio: target words positive,
    // background words negative, neutral at zero
    assert(scored(1L) > 0.0, s"target-word rate ${scored(1L)} must be positive")
    assert(scored(2L) < 0.0, s"background-word rate ${scored(2L)} must be negative")
  }

  test("dsirSelect: budget binds, ranked by snapped rate with id ties") {
    val docs = (
      (1L to 10L).map(i => (i, "hot hot hot", true)) ++
        (11L to 30L).map(i => (i, "cold cold cold", false))
    ).toDF("id", "text", "t")
    val rated = Sampling.dsirLogRatios(docs, "id", "text", col("t"), buckets = 16)
    val kept = Sampling.dsirSelect(rated, "id", budget = 10)
      .collect().map(_.getLong(0)).toSet
    assert(kept.size == 10)
    // the ten target-worded docs rank above every background doc
    assert(kept == (1L to 10L).toSet)
  }

  test("largestRemainder: exact apportionment, distributed (windows, no collect)") {
    // weights 5/3/2/1 over budget 7: floors 3/1/1/0 (total 11), resid 2
    // remainders (7w mod 11): 2/10/3/7 -> bumps to b (10) and d (7)
    val w = Seq(("a", 5L), ("b", 3L), ("c", 2L), ("d", 1L)).toDF("g", "wt")
    val alloc = Sampling.largestRemainder(w, "g", "wt", 7L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(alloc == Map("a" -> 3L, "b" -> 2L, "c" -> 1L, "d" -> 1L), alloc.toString)
    assert(alloc.values.sum == 7L)

    // remainder tie broken by group name ascending
    val tie = Seq(("x", 1L), ("y", 1L), ("z", 2L)).toDF("g", "wt")
    // budget 2: floors 0/0/1, remainders 2/2/0 -> one bump, to x (name asc)
    val a2 = Sampling.largestRemainder(tie, "g", "wt", 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a2 == Map("x" -> 1L, "y" -> 0L, "z" -> 1L), a2.toString)

    // the plan ranks remainders via window functions — the distributed
    // shape (a driver collect-and-sort would leave no WindowExec)
    graft.queries.Q.requireWindow(Sampling.largestRemainder(w, "g", "wt", 7L))

    // allocations always sum to the budget (property over random-ish sizes)
    for (budget <- Seq(0L, 1L, 10L, 97L)) {
      val s = Sampling.largestRemainder(w, "g", "wt", budget)
        .agg(org.apache.spark.sql.functions.sum("alloc")).head().getLong(0)
      assert(s == budget, s"budget $budget allocated $s")
    }
  }
}
