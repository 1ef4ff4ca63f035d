package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine model TRAINING for curation filters — the missing half of
  * model-based filtering: [[TextAnalysis.classifierLogitMilli]] applies
  * a linear filter, this trains one, entirely inside the engine and
  * entirely deterministically.
  *
  * The trainer is the distributed BATCH perceptron: per epoch, every
  * misclassified row (y·(w·x) ≤ 0) contributes y·x to the weight
  * update, summed corpus-wide. With INTEGER features and ±1 labels the
  * epoch update is a plain integer sum — order-free, overflow-safe at
  * document-feature magnitudes, bit-identical in any engine — unlike
  * gradient descent, whose sigmoid + float accumulation can never pin
  * cross-engine. Exactness over convergence speed: the training TRACE
  * is a checkable artifact, which is what a curation audit needs from
  * an in-pipeline trainer.
  *
  * Scale shape: the model is a |features|-sized decision table living
  * driver-side between epochs (riding into each epoch as literals);
  * one epoch = ONE map-side partial aggregate over the corpus — no
  * shuffle wider than the |features|+2 aggregate row, no collect of
  * anything corpus-sized. epochs × one-pass, exactly the cost contract
  * of the Lloyd-step kernels.
  */
object Train {

  /** Train `epochs` batch-perceptron epochs of y ≈ sign(w·x) and
    * return the full training trace: one row per epoch carrying the
    * epoch's misclassified count and the weights AFTER its update
    * (`w_bias`, `w_1..w_k` in `featureCols` order). Weights start at
    * zero, so epoch 1's update is the class-weighted feature sum
    * (margin 0 counts as misclassified, per the classic rule).
    *
    * @param df          rows with INTEGER feature columns and a ±1 label
    * @param featureCols integer feature column names
    * @param labelCol    ±1 long label column
    */
  def perceptronTrace(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      epochs: Int
  ): DataFrame = {
    require(featureCols.nonEmpty && epochs > 0, "perceptronTrace: features and epochs")
    val spark = df.sparkSession
    import spark.implicits._
    val k = featureCols.length
    val w = Array.fill(k + 1)(0L) // bias first
    val trace = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Seq[Long])]
    var e = 1
    while (e <= epochs) {
      val margin: Column = featureCols.zipWithIndex
        .map { case (f, i) => col(f).cast("long") * lit(w(i + 1)) }
        .foldLeft(lit(w(0)): Column)(_ + _)
      val mis = col(labelCol).cast("long") * margin <= 0L
      val aggs =
        sum(when(mis, lit(1L)).otherwise(lit(0L))).as("n_mis") +:
          sum(when(mis, col(labelCol).cast("long")).otherwise(lit(0L))).as("g_bias") +:
          featureCols.zipWithIndex.map { case (f, i) =>
            sum(when(mis, col(labelCol).cast("long") * col(f).cast("long"))
              .otherwise(lit(0L))).as(s"g_$i")
          }
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      val nMis = r.getLong(0)
      w(0) += r.getLong(1)
      var i = 0
      while (i < k) { w(i + 1) += r.getLong(2 + i); i += 1 }
      trace += ((e, nMis, w.toSeq))
      e += 1
    }
    val base = trace.toSeq
      .map { case (ep, m, ws) => (ep, m, ws.head, ws.tail) }
      .toDF("epoch", "n_mis", "w_bias", "ws")
    featureCols.indices
      .foldLeft(base) { case (acc, i) =>
        acc.withColumn(s"w_${i + 1}", element_at(col("ws"), i + 1))
      }
      .drop("ws")
  }

  /** Train an optimal DECISION STUMP over integer features — the
    * convergent counterpart of [[perceptronTrace]] (batch-perceptron
    * updates can oscillate forever on noisy features; the stump's
    * exhaustive threshold search has no iteration to diverge). For
    * every feature and every observed value t, both polarities are
    * scored: `ge` predicts +1 on x ≥ t (error = #pos below t + #neg at
    * or above t), `lt` is its complement — the degenerate all-plus /
    * all-minus stumps appear at t = min, so the search space is
    * complete over observed values. All-integer histogram arithmetic:
    * one (feature, value) partial-agg shuffle, a feature-keyed window
    * over DISTINCT values (the q_ppl_buckets_hist scale shape), and a
    * |features|-sized decision table out.
    *
    * Returns one row per feature — (feature, thresh, polarity, n_err)
    * for that feature's best stump, ties broken by (thresh, polarity)
    * — plus `is_best` marking the overall argmin (ties by feature
    * name). This is the base learner a boosting loop would call.
    */
  def stumpTrain(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String
  ): DataFrame = {
    require(featureCols.nonEmpty, "stumpTrain: need features")
    val long = featureCols
      .map(f => df.select(lit(f).as("feature"), col(f).cast("long").as("v"),
        col(labelCol).cast("long").as("y")))
      .reduce(_ unionByName _)
    val hist = long
      .groupBy(col("feature"), col("v"))
      .agg(
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("np"),
        sum(when(col("y") === -1L, 1L).otherwise(0L)).as("nn"))
    val W = org.apache.spark.sql.expressions.Window
    val below = W.partitionBy(col("feature")).orderBy(col("v").asc)
      .rowsBetween(W.unboundedPreceding, -1)
    val whole = W.partitionBy(col("feature"))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val scored = hist
      .withColumn("posBelow", coalesce(sum(col("np")).over(below), lit(0L)))
      .withColumn("negBelow", coalesce(sum(col("nn")).over(below), lit(0L)))
      .withColumn("p", sum(col("np")).over(whole))
      .withColumn("ng", sum(col("nn")).over(whole))
      .withColumn("err_ge", col("posBelow") + col("ng") - col("negBelow"))
      .withColumn("err_lt", col("p") + col("ng") - col("err_ge"))
    val cands = scored
      .select(col("feature"), col("v").as("thresh"), lit("ge").as("polarity"),
        col("err_ge").as("n_err"))
      .unionByName(scored.select(col("feature"), col("v").as("thresh"),
        lit("lt").as("polarity"), col("err_lt").as("n_err")))
    val perFeature = W.partitionBy(col("feature"))
      .orderBy(col("n_err").asc, col("thresh").asc, col("polarity").asc)
    val overall = W.partitionBy()
      .orderBy(col("n_err").asc, col("feature").asc, col("thresh").asc,
        col("polarity").asc)
    cands
      .withColumn("__rf", row_number().over(perFeature))
      .filter(col("__rf") === 1)
      .withColumn("__ro", row_number().over(overall))
      .select(col("feature"), col("thresh"), col("polarity"), col("n_err"),
        (col("__ro") === 1).as("is_best"))
  }

  /** Apply a trained stump map-side: keep = (x ≥ t) for `ge`, the
    * complement for `lt` — the inference twin of [[stumpTrain]].
    */
  def stumpKeep(featureCol: Column, thresh: Long, polarity: String): Column =
    if (polarity == "ge") featureCol.cast("long") >= thresh
    else featureCol.cast("long") < thresh

  /** Apply a trained integer weight vector map-side: the signed margin
    * `w·x + bias` — filter on `margin > 0`. The inference twin of
    * [[perceptronTrace]]; pure projection, streaming-safe.
    */
  def linearMargin(weights: Seq[Long], featureCols: Seq[String]): Column = {
    require(weights.length == featureCols.length + 1,
      "linearMargin: weights = bias +: per-feature")
    featureCols.zipWithIndex
      .map { case (f, i) => col(f).cast("long") * lit(weights(i + 1)) }
      .foldLeft(lit(weights.head): Column)(_ + _)
  }
}
