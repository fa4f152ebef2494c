package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training for the quality/language filter the q98 family
  * only SCORES: [[TextAnalysis.linearScoreWithWeights]] ships a
  * `(bucket, weight)` table, and until now nothing in the library
  * could produce one from labeled data. The averaged batch perceptron
  * (Rosenblatt 1958; the averaged form of Freund & Schapire 1999,
  * "Large margin classification using the perceptron algorithm")
  * closes that: a fastText-style hashed bag-of-words linear model
  * trained by whole-corpus epochs, everything in EXACT integer
  * arithmetic — features are md5-hashed token counts, the learning
  * rate is 1, updates are sums of misclassified docs' signed feature
  * vectors, and the "averaged" weights are the integer SUM of the
  * per-epoch weight vectors (a positive scaling of the average, so
  * sign and ranking are identical and no division ever happens).
  * Every epoch is deterministic and the q190 DuckDB oracle unrolls
  * them weight for weight — a TRAINING run that hash-verifies
  * cross-engine, which SGD-with-shuffling fundamentally cannot.
  *
  * Batch (not stochastic) updates are what make this distributed-
  * friendly: an epoch is one features⋈weights join + two map-side-
  * combined aggregations, not a sequential pass. The classic
  * convergence theorem covers the batch variant on separable data
  * (spec-measured); the averaged vector smooths oscillation on
  * non-separable data (Freund & Schapire §4).
  *
  * Scale shape (100 TB): the feature frame is corpus-sized but narrow
  * (id, bucket, tf); the weight table is nBuckets rows — it rides a
  * broadcast-sized side automatically (no broadcast REQUIRED: the
  * join is on the bucket key either way). Per epoch: one shuffle on
  * the bucket key, one per-doc agg, one delta agg. Epoch frames are
  * localCheckpointed and freed one generation deep (the descent-loop
  * hygiene).
  */
object Classifier {

  /** Hashed bag-of-words features: (id, bucket, tf) per document —
    * lower/whitespace tokens (the q127 convention) md5-bucketed, plus
    * one constant BIAS feature at bucket = nBuckets (outside the hash
    * range) so the decision boundary need not pass through the
    * origin. */
  def hashedFeatures(docs: DataFrame, textCol: String, idCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "need at least one bucket")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val words = docs.select(col(idCol).as("id"), explode(toks).as("__w"))
      .filter(col("__w") =!= "")
      .select(col("id"),
        (graft.functions.PortableHash.md5Long60(col("__w"))
          % nBuckets).as("bucket"))
      .groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
    words.unionByName(docs.select(col(idCol).as("id"),
      lit(nBuckets.toLong).as("bucket"), lit(1L).as("tf")))
  }

  /** One weight table application: per-doc integer score
    * Σ tf·w[bucket] (absent buckets contribute 0 — left join,
    * zero-filled). */
  private def scoreWith(feats: DataFrame, weights: DataFrame)
      : DataFrame = feats
    .join(weights, Seq("bucket"), "left")
    .groupBy(col("id"))
    .agg(sum(col("tf") * coalesce(col("w"), lit(0L))).as("s"))

  /** TRAIN: averaged batch perceptron over `epochs` whole-corpus
    * passes. `labelCol` must hold ±1 longs. Returns the summed
    * per-epoch weight table (bucket, w) — hand it to
    * [[perceptronScore]] or persist it as the model artifact.
    *
    * Epoch t (w₀ = 0, so epoch 1 updates on EVERY doc):
    * {{{
    *   s(doc)  = Σ_b tf(doc,b) · w_t(b)
    *   mis_t   = {doc : y(doc) · s(doc) <= 0}
    *   Δ_t(b)  = Σ_{doc ∈ mis_t} y(doc) · tf(doc,b)
    *   w_{t+1} = w_t + Δ_t
    * }}} */
  def perceptronTrain(train: DataFrame, textCol: String, idCol: String,
      labelCol: String, nBuckets: Int = 4096,
      epochs: Int = 3): DataFrame =
    perceptronTrainOnFeatures(
      hashedFeatures(train, textCol, idCol, nBuckets)
        .join(train.select(col(idCol).as("id"),
          col(labelCol).cast("long").as("y")), Seq("id")),
      epochs)

  /** [[perceptronTrain]] from a PREBUILT labeled feature frame
    * (id, bucket, tf, y) — the shared-feature entry point
    * [[perceptronTrainMulti]] uses so K one-vs-rest trainings pay the
    * corpus tokenize/hash/aggregate ONCE instead of per class (the
    * feature build dominates; the per-class labeled join is
    * feature-frame-proportional). Identical training math, identical
    * output. */
  def perceptronTrainOnFeatures(labeledFeats: DataFrame,
      epochs: Int): DataFrame = {
    require(epochs >= 1, "need at least one epoch")
    val spark = labeledFeats.sparkSession
    import spark.implicits._
    val (feats, featsCkpt) = CheckpointHygiene.checkpointTracked(
      labeledFeats, eager = true)
    // driver model state (the [[perceptronTrainMulti]] convention,
    // applied to the binary trainer in r20): the weight table is
    // <= nBuckets longs, so each epoch is ONE distributed pass —
    // per-id score under the broadcast current weights, mistake
    // filter, per-bucket delta, <= nBuckets-row collect — instead of
    // the old per-epoch pair of eager weight-table checkpoints (the
    // q224 trainer spent most of its time scheduling those block
    // writes). Key-set semantics preserved exactly: a bucket exists
    // in the output iff some epoch's delta touched it, even at summed
    // weight 0.
    val wState = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    val avgState = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    (1 to epochs).foreach { _ =>
      val wDf = wState.toSeq.toDF("bucket", "__w")
      val mis = feats
        .join(broadcast(wDf), Seq("bucket"), "left")
        .groupBy(col("id"))
        .agg(sum(col("tf") * coalesce(col("__w"), lit(0L))).as("__s"),
          max(col("y")).as("__y"), min(col("y")).as("__ym"))
        // y must be constant per id — an input with conflicting labels
        // would otherwise silently train on y=+1 (ADVICE r20); the
        // check rides the aggregate that exists anyway, so it is free
        .filter(assert_true(col("__y") === col("__ym"),
          lit("perceptronTrainOnFeatures: conflicting labels for one " +
            "id — y must be constant per id")).isNull)
        .filter(col("__y") * col("__s") <= 0)
        .select(col("id"))
      val delta = feats.join(mis, Seq("id"), "left_semi")
        .groupBy(col("bucket"))
        .agg(sum(col("y") * col("tf")).as("__d"))
        .collect()
      delta.foreach { r =>
        val b = r.getLong(0)
        wState(b) = wState.getOrElse(b, 0L) + r.getLong(1)
      }
      // avg accumulates the POST-update weights over this epoch's key
      // set (keys only ever enter via deltas — same set the DataFrame
      // formulation's union-and-regroup produced)
      wState.foreach { case (b, w) =>
        avgState(b) = avgState.getOrElse(b, 0L) + w
      }
    }
    CheckpointHygiene.free(featsCkpt)
    avgState.toSeq.toDF("bucket", "w")
  }

  /** Persist a trained (bucket, w) table — the model artifact the
    * gate ships (the `trainOrLoadKnnGraph`/centroid convention applied
    * to the classifier family). Bit-exact round trip: two BIGINT
    * columns. */
  def saveWeights(weights: DataFrame, path: String): Unit =
    weights.select(col("bucket").cast("long"), col("w").cast("long"))
      .write.mode("overwrite").parquet(path)

  /** Bit-exact inverse of [[saveWeights]]. */
  def loadWeights(path: String)(
      implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read.parquet(path).select(col("bucket"), col("w"))

  /** Train-once-reuse: load the weight table at `path` if present,
    * else train via `build`, persist, and serve from the PERSISTED
    * copy — scoring lineage is a parquet scan, never the training
    * plan. */
  def trainOrLoadWeights(path: String)(build: => DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
    try { val w = loadWeights(path); w.queryExecution.analyzed; w }
    catch { case _: org.apache.spark.sql.AnalysisException =>
      saveWeights(build, path); loadWeights(path) }

  /** Multiclass TRAIN — one-vs-rest averaged perceptrons, the
    * fastText-supervised shape (Joulin et al. 2017) in exact integer
    * arithmetic: per class c the binary [[perceptronTrain]] runs with
    * y = +1 on c's docs and −1 on the rest, and the K weight tables
    * stack tagged by class (per-class output EXACTLY equals the
    * standalone binary run — `ClassifierSpec`). Classes come from the
    * data (collected DISTINCT — class count is small by definition;
    * the model is K·nBuckets rows). Deterministic: every epoch is the
    * deterministic batch update in exact integers, so the q199 DuckDB
    * oracle unrolls all K·epochs weight for weight.
    *
    * Scale shape (VERDICT r16 item 1 — the feature frame stays
    * K-FREE): ONE corpus tokenize/hash/aggregate builds (id, bucket,
    * tf, class), id-partitioned and checkpointed once. The weight
    * state is the MODEL — ≤ K·nBuckets longs, the driver/model-state
    * class (same boundary as IVF centroids and isotonic bins) — and
    * folds into each epoch's plan as a BROADCAST (bucket → K-vector)
    * table. Per epoch: one broadcast join + per-doc agg producing all
    * K scores as columns (the agg partial-combines map-side; its id
    * exchange carries one row per doc — NOT avoided by pre-pinning,
    * which a checkpoint erases under AQE, SCALE §9w), per-doc
    * misclassification flags joined straight
    * back, and ONE (bucket)-keyed aggregation
    * emitting every class's delta and key-presence marker, collected
    * at ≤ nBuckets rows. `epochs` driver round-trips, corpus scanned
    * twice per epoch, and the class axis multiplies only per-doc/
    * per-bucket COLUMNS, never corpus-scale rows (SCALE §9r's 3×-rows
    * → 4.2×-time superlinearity was the K× tagged frame). For K
    * beyond dozens, shard the class list and union the weight
    * tables.
    *
    * @return (label, bucket, w) */
  def perceptronTrainMulti(train: DataFrame, textCol: String,
      idCol: String, labelCol: String, nBuckets: Int = 4096,
      epochs: Int = 3): DataFrame = {
    require(epochs >= 1, "need at least one epoch")
    val spark = train.sparkSession
    import spark.implicits._
    val classes = train.select(col(labelCol).cast("string").as("__c"))
      .distinct().collect().map(_.getString(0)).sorted
    require(classes.nonEmpty, "no classes in training data")
    val k = classes.length
    // driver model-state boundary, enforced: the per-epoch collect is a
    // (≤ nBuckets+1) × (2K+1) long frame and the broadcast weight table
    // is K·nBuckets longs — both O(K·nBuckets). 2^24 cells ≈ 128 MB of
    // longs, comfortably inside a default driver; beyond it, shard the
    // class list (train class groups separately and union the weight
    // frames — per-class slices are independent by construction, the
    // ClassifierSpec binary-parity property) or lower nBuckets.
    require(k.toLong * (nBuckets + 1L) <= (1L << 24),
      s"perceptronTrainMulti: K=$k classes x nBuckets=$nBuckets is " +
        s"${k.toLong * (nBuckets + 1L)} weight cells > 2^24 — the " +
        "per-epoch driver collect/broadcast would no longer be " +
        "model-state-sized; shard the class list or reduce nBuckets")
    // no pre-pin before the checkpoint: AQE erases checkpoint
    // partitioning (SCALE §9w), so a repartition here is a pure extra
    // exchange — the per-epoch aggs pay their own (partial-combined)
    // exchanges either way
    val (lf, lfCkpt) = CheckpointHygiene.checkpointTracked(
      hashedFeatures(train, textCol, idCol, nBuckets)
        .join(train.select(col(idCol).as("id"),
          col(labelCol).cast("string").as("__c")), Seq("id")),
      eager = true)
    // driver-side model state: per class, bucket -> weight; key sets
    // replicate the DataFrame formulation exactly (a (label, bucket)
    // exists iff some epoch's delta touched it, even at weight 0)
    val wState = Array.fill(k)(
      scala.collection.mutable.LinkedHashMap.empty[Long, Long])
    val avgState = Array.fill(k)(
      scala.collection.mutable.LinkedHashMap.empty[Long, Long])
    val wSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("__ws",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false),
        nullable = false)))
    (1 to epochs).foreach { _ =>
      // fold the current weights in as (bucket, [w_0..w_{K-1}]) —
      // broadcast-sized by the model-state contract
      val wRows = wState.zipWithIndex
        .flatMap { case (m, ki) => m.iterator.map { case (b, w) =>
          (b, ki, w) } }
        .groupBy(_._1).toSeq
        .map { case (b, ws) =>
          val arr = Array.fill(k)(0L)
          ws.foreach { case (_, ki, w) => arr(ki) = w }
          org.apache.spark.sql.Row(b, arr.toSeq)
        }
      val wDf = spark.createDataFrame(
        spark.sparkContext.parallelize(wRows, 1), wSchema)
      // one pass: every class's integer score per doc as K columns
      val sCols = max(col("__c")).as("__c") +:
        (0 until k).map(ki =>
          sum(col("tf") *
            coalesce(element_at(col("__ws"), ki + 1), lit(0L)))
            .as(s"__s_$ki"))
      val scored = lf.join(broadcast(wDf), Seq("bucket"), "left")
        .groupBy(col("id"))
        .agg(sCols.head, sCols.tail: _*)
      // per-doc update multiplier per class: y if misclassified else 0
      // (y = +1 iff the doc's class is classes(ki), else -1)
      val fCols = (0 until k).map { ki =>
        val y = when(col("__c") === classes(ki), 1L).otherwise(-1L)
        when(y * col(s"__s_$ki") <= 0, y).otherwise(0L)
      }
      val flags = scored.select(col("id"), array(fCols: _*).as("__f"))
      // one (bucket)-keyed agg: per class the delta Σ y·tf over
      // misclassified docs and the key-presence marker (≥ 1 mis doc
      // carries the bucket) — ≤ nBuckets output rows, collected as
      // model state
      val dCols = (0 until k).flatMap { ki =>
        Seq(sum(col("tf") * element_at(col("__f"), ki + 1))
            .as(s"__d_$ki"),
          max(abs(element_at(col("__f"), ki + 1))).as(s"__p_$ki"))
      }
      val deltas = lf.join(flags, Seq("id"))
        .groupBy(col("bucket"))
        .agg(dCols.head, dCols.tail: _*)
        .collect()
      deltas.foreach { r =>
        val b = r.getLong(0)
        (0 until k).foreach { ki =>
          if (r.getLong(2 + 2 * ki) == 1L) { // __p_ki: key present
            val d = r.getLong(1 + 2 * ki)
            wState(ki).update(b, wState(ki).getOrElse(b, 0L) + d)
          }
        }
      }
      (0 until k).foreach { ki =>
        wState(ki).foreach { case (b, w) =>
          avgState(ki).update(b, avgState(ki).getOrElse(b, 0L) + w) }
      }
    }
    CheckpointHygiene.free(lfCkpt)
    avgState.zipWithIndex.flatMap { case (m, ki) =>
      m.iterator.map { case (b, w) => (classes(ki), b, w) }
    }.toSeq.toDF("label", "bucket", "w")
  }

  /** Persist a multiclass (label, bucket, w) table — [[saveWeights]]
    * with the class axis; bit-exact round trip (one STRING + two
    * BIGINT columns). */
  def saveWeightsMulti(weights: DataFrame, path: String): Unit =
    weights.select(col("label").cast("string"),
      col("bucket").cast("long"), col("w").cast("long"))
      .write.mode("overwrite").parquet(path)

  /** Bit-exact inverse of [[saveWeightsMulti]]. */
  def loadWeightsMulti(path: String)(
      implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read.parquet(path)
      .select(col("label"), col("bucket"), col("w"))

  /** Train-once-reuse for the multiclass model (the
    * [[trainOrLoadWeights]] convention): load if present, else train,
    * persist, and serve from the PERSISTED copy. */
  def trainOrLoadWeightsMulti(path: String)(build: => DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
    try { val w = loadWeightsMulti(path); w.queryExecution.analyzed; w }
    catch { case _: org.apache.spark.sql.AnalysisException =>
      saveWeightsMulti(build, path); loadWeightsMulti(path) }

  /** Multiclass SCORE against a [[perceptronTrainMulti]] table: per
    * doc every class's integer score, argmax decision tie-broken
    * (score DESC, label ASC) — a total order, so prediction is
    * deterministic and engine-portable.
    * @return (idCol, predicted, score) */
  def perceptronScoreMulti(docs: DataFrame, weights: DataFrame,
      textCol: String, idCol: String,
      nBuckets: Int = 4096): DataFrame = {
    val idOut = docs.select(col(idCol)).schema.head.name
    val feats = hashedFeatures(docs, textCol, idCol, nBuckets)
    val labels = weights.select(col("label")).distinct()
    // cross the (tiny) class list so absent-feature classes still score
    // (all-zero), then left-join the class-tagged weights
    val scored = feats.crossJoin(broadcast(labels))
      .join(weights.select(col("label"),
          col("bucket"), col("w").cast("long").as("w")),
        Seq("label", "bucket"), "left")
      .groupBy(col("id"), col("label"))
      .agg(sum(col("tf") * coalesce(col("w"), lit(0L))).as("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("s").desc, col("label").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id").as(idOut), col("label").as("predicted"),
        col("s").as("score"))
  }

  /** Per-threshold counts over distinct scores — the shared core of
    * [[prCurve]] and [[aucExact]]: per distinct score value v, the
    * positive/negative counts at v plus the EXCLUSIVE cumulative
    * counts below v ([[Packing.prefixSums]] — both cumsums in one
    * two-phase scan, no global window), and the 1-row class totals.
    * Returns (v, p, n, p_offset, n_offset, __P, __N). */
  private def thresholdCounts(scored: DataFrame, scoreCol: String,
      labelCol: String, numParts: Int): DataFrame = {
    val m = scored
      .select(col(scoreCol).cast("long").as("v"),
        (col(labelCol).cast("long") > 0).as("__pos"))
      .filter(col("v").isNotNull)
      .groupBy(col("v"))
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("p"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("n"))
    val tot = m.agg(sum(col("p")).as("__P"), sum(col("n")).as("__N"))
    Packing.prefixSums(m, "v", Seq("p", "n"), numParts)
      .crossJoin(broadcast(tot))
  }

  /** Exact precision–recall curve of an integer-scored classifier:
    * one row per DISTINCT score value v, reading "keep score ≥ v" —
    * tp/fp/fn are exact BIGINTs (tp = positives at-or-above v =
    * P − #pos-below-v off the prefix scan), precision and recall one
    * IEEE divide each of exact integers (the q68 argument, so the
    * whole curve hash-verifies cross-engine). The quality-filter
    * threshold-picking artifact: every operating point the filter
    * could run at, with its exact confusion counts.
    *
    * Scale shape: one (score value) hash-agg with conditional sums
    * (map-side combined; output ∝ distinct scores, not rows), the
    * [[Packing.prefixSums]] two-phase scan for both cumulative
    * counts, a 1-row totals broadcast — no global window, no join
    * against the row-scale frame. Scores must be integral (the
    * engine's classifiers emit exact integer scores by design);
    * labels are positive iff `labelCol > 0`. Needs ≥ 1 positive for
    * recall to be defined (the caller's contract, spec-pinned).
    *
    * @return (threshold, tp, fp, fn, prec, rec), one row per
    *         distinct score */
  def prCurve(scored: DataFrame, scoreCol: String, labelCol: String,
      numParts: Int = 0): DataFrame =
    thresholdCounts(scored, scoreCol, labelCol, numParts)
      .select(col("v").as("threshold"),
        (col("__P") - col("p_offset")).as("tp"),
        (col("__N") - col("n_offset")).as("fp"),
        col("p_offset").as("fn"),
        ((col("__P") - col("p_offset")).cast("double") /
          ((col("__P") - col("p_offset")) +
            (col("__N") - col("n_offset"))).cast("double")).as("prec"),
        ((col("__P") - col("p_offset")).cast("double") /
          col("__P").cast("double")).as("rec"))

  /** Exact ROC-AUC via the Mann–Whitney rank identity with midrank
    * tie handling: AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻).
    * Everything integer until one divide — with per-value counts
    * (p_v, n_v) and the exclusive negative cumsum nexc(v),
    * `u2_num = Σ_v p_v·(2·nexc(v) + n_v)` is exactly 2·U (ties counted
    * once, not half, hence the doubling) and `auc = u2_num / (2·P·N)`
    * is one IEEE divide of exact BIGINTs. All-ties degenerates to
    * exactly 0.5, perfect separation to exactly 1.0 (spec-pinned).
    * Overflow headroom: u2_num ≤ 2·P·N < 2⁶³ — ~2·10⁹ rows per class
    * balanced; beyond, pre-bin scores (AUC over binned scores is the
    * binned model's exact AUC).
    *
    * Same one-agg + prefix-scan shape as [[prCurve]]; the final sum
    * is a partial aggregate. Needs both classes non-empty.
    *
    * @return ONE row: (n_pos, n_neg, u2_num, auc) */
  def aucExact(scored: DataFrame, scoreCol: String, labelCol: String,
      numParts: Int = 0): DataFrame =
    thresholdCounts(scored, scoreCol, labelCol, numParts)
      .select(col("__P"), col("__N"),
        (col("p") * (lit(2L) * col("n_offset") + col("n"))).as("__c"))
      .groupBy(col("__P").as("n_pos"), col("__N").as("n_neg"))
      .agg(sum(col("__c")).as("u2_num"))
      .select(col("n_pos"), col("n_neg"), col("u2_num"),
        (col("u2_num").cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
          .as("auc"))

  /** Calibration / reliability bins: scores bucketed into fixed
    * integer-width bins, each bin reporting its exact counts and the
    * empirical positive rate — the reliability-diagram artifact (is a
    * higher filter score actually more often real?) and the input a
    * monotone calibrator (isotonic/Platt) trains on.
    *
    * Bin ids are FLOOR division in BOTH engines' semantics: scores go
    * negative (perceptron margins), where Spark's `div` truncates
    * toward zero but DuckDB's `//` floors — so the bin is computed as
    * `(v − pmod(v, w)) div w` (pmod makes the numerator exactly
    * divisible, so the truncating div IS the floor div). `lo` is the
    * bin's inclusive lower score bound. `rate` and `mean_score` are
    * one exact-integer divide each.
    *
    * Scale shape: one map + one hash-agg on the bin id (map-side
    * combined, output ∝ occupied bins). Empty bins don't appear.
    *
    * @return (bin, lo, n, n_pos, rate, mean_score) */
  def calibrationBins(scored: DataFrame, scoreCol: String,
      labelCol: String, binWidth: Long): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    val v = col(scoreCol).cast("long")
    val bin = expr(s"(CAST($scoreCol AS BIGINT) - " +
      s"pmod(CAST($scoreCol AS BIGINT), ${binWidth}L)) div ${binWidth}L")
    scored.filter(v.isNotNull)
      .select(bin.as("bin"), v.as("__v"),
        (col(labelCol).cast("long") > 0).as("__pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("__v")).as("__sv"))
      .select(col("bin"), (col("bin") * binWidth).as("lo"), col("n"),
        col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("rate"),
        (col("__sv").cast("double") / col("n").cast("double"))
          .as("mean_score"))
  }

  /** Per-group [[aucExact]] — the model-fairness / slice report
    * ("does the filter rank equally well in every language/source?"):
    * within every group, the exact Mann–Whitney 2·U and AUC between
    * the group's positives and negatives. One-sided groups (no
    * second class) are dropped, the [[Stats.ksStatisticByGroup]]
    * contract. Cumulative counts are windows PARTITIONED BY GROUP —
    * parallel across groups, memory ∝ a group's distinct scores; the
    * global form's prefix-scan is [[aucExact]]'s job.
    *
    * @return one row per two-sided group:
    *         (group, n_pos, n_neg, u2_num, auc) */
  def aucExactByGroup(scored: DataFrame, groupCol: String,
      scoreCol: String, labelCol: String): DataFrame = {
    val m = scored
      .select(col(groupCol).as("grp"),
        col(scoreCol).cast("long").as("v"),
        (col(labelCol).cast("long") > 0).as("__pos"))
      .filter(col("v").isNotNull)
      .groupBy(col("grp"), col("v"))
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("p"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    m.withColumn("nexc", sum(col("n")).over(w) - col("n"))
      .groupBy(col("grp"))
      .agg(sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
        sum(col("p") * (lit(2L) * col("nexc") + col("n"))).as("u2_num"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .select(col("grp").as(groupCol), col("n_pos"), col("n_neg"),
        col("u2_num"),
        (col("u2_num").cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
          .as("auc"))
  }

  /** Isotonic calibration — pool-adjacent-violators (Ayer et al. 1955;
    * the standard monotone calibrator, Zadrozny & Elkan 2002) over a
    * [[calibrationBins]] frame: adjacent bins whose empirical positive
    * rate DECREASES with score merge into pools until the rate is
    * non-decreasing; every bin then reports its pool's rate. All pool
    * arithmetic is exact integers — the violation test compares
    * rationals cross-multiplied (`pos_i·n_j > pos_j·n_i`), pool rates
    * stay (cal_pos, cal_n) pairs with ONE final divide — so the
    * calibrator is deterministic and replayable.
    *
    * PAVA is inherently sequential over the bin axis, so it runs on
    * the DRIVER over the collected bin table — bounded by the bin
    * count, the quantile-boundary model-state class (NEVER rows). The
    * distributed work stays in [[calibrationBins]]; serving is a
    * broadcast join ([[calibrateScores]]).
    *
    * @return one row per input bin: (bin, lo, n, n_pos, cal_pos,
    *         cal_n, cal_rate), cal_rate non-decreasing in bin */
  def isotonicCalibrate(bins: DataFrame): DataFrame = {
    val spark = bins.sparkSession
    import spark.implicits._
    val rows = bins.select(col("bin").cast("long"),
        col("lo").cast("long"), col("n").cast("long"),
        col("n_pos").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // PAVA with exact rational pool rates: (bins, n, pos)
    val pools = scala.collection.mutable.ArrayBuffer
      .empty[(Vector[(Long, Long, Long, Long)], Long, Long)]
    rows.foreach { b =>
      pools += ((Vector(b), b._3, b._4))
      // merge while the previous pool's rate exceeds the last's:
      // pos_prev/n_prev > pos_last/n_last  <=>  pos_prev*n_last >
      // pos_last*n_prev (all counts >= 0, n >= 1)
      while (pools.length >= 2 && {
        val a = pools(pools.length - 2); val c = pools.last
        a._3 * c._2 > c._3 * a._2
      }) {
        val c = pools.remove(pools.length - 1)
        val a = pools.remove(pools.length - 1)
        pools += ((a._1 ++ c._1, a._2 + c._2, a._3 + c._3))
      }
    }
    pools.toVector.flatMap { case (members, n, pos) =>
      members.map { case (bin, lo, bn, bpos) =>
        (bin, lo, bn, bpos, pos, n, pos.toDouble / n.toDouble) }
    }.toDF("bin", "lo", "n", "n_pos", "cal_pos", "cal_n", "cal_rate")
  }

  /** Serve calibrated probabilities as the isotonic STEP FUNCTION:
    * each row's score bins exactly as [[calibrationBins]] did (the
    * pmod floor-division) and takes the rate of the GREATEST trained
    * bin at or below it — which handles interior gap bins (empty bins
    * never trained) and extrapolates constant beyond both ends (below
    * the lowest trained bin clamps up to it; the standard isotonic
    * serving rule). The trained bin list folds in as an array literal
    * (bounded — the quantile-boundary state class) and the lookup is
    * one codegen'd higher-order filter + a broadcast equi-join.
    * @return input columns + (cal_rate) */
  def calibrateScores(scored: DataFrame, calibrator: DataFrame,
      scoreCol: String, binWidth: Long): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    val binVals = calibrator.select(col("bin").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq
    require(binVals.nonEmpty, "calibrator has no bins")
    val binExpr = expr(s"(CAST($scoreCol AS BIGINT) - " +
      s"pmod(CAST($scoreCol AS BIGINT), ${binWidth}L)) div ${binWidth}L")
    val cal = calibrator.select(col("bin").as("__cal_bin"),
      col("cal_rate"))
    scored
      .withColumn("__bin", coalesce(
        array_max(filter(typedlit(binVals), x => x <= binExpr)),
        lit(binVals.min)))
      .join(broadcast(cal), col("__bin") === col("__cal_bin"))
      .drop("__bin", "__cal_bin")
  }

  /** Persist an [[isotonicCalibrate]] table (the model-artifact
    * convention): six BIGINTs + the derived rate; bit-exact round
    * trip on the integer columns. */
  def saveCalibrator(calibrator: DataFrame, path: String): Unit =
    calibrator.select(col("bin").cast("long"), col("lo").cast("long"),
      col("n").cast("long"), col("n_pos").cast("long"),
      col("cal_pos").cast("long"), col("cal_n").cast("long"),
      col("cal_rate").cast("double"))
      .write.mode("overwrite").parquet(path)

  /** Bit-exact inverse of [[saveCalibrator]]. */
  def loadCalibrator(path: String)(
      implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read.parquet(path)

  /** Train-once-reuse for the calibrator (the `trainOrLoadWeights`
    * convention). */
  def trainOrLoadCalibrator(path: String)(build: => DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
    try { val c = loadCalibrator(path); c.queryExecution.analyzed; c }
    catch { case _: org.apache.spark.sql.AnalysisException =>
      saveCalibrator(build, path); loadCalibrator(path) }

  /** SCORE documents with a trained (bucket, w) table: per doc the
    * integer score and the sign decision (score > 0). Shares the
    * feature pipeline with [[perceptronTrain]] exactly. */
  def perceptronScore(docs: DataFrame, weights: DataFrame,
      textCol: String, idCol: String,
      nBuckets: Int = 4096): DataFrame = {
    val idOut = docs.select(col(idCol)).schema.head.name
    scoreWith(hashedFeatures(docs, textCol, idCol, nBuckets),
        weights.select(col("bucket"), col("w").cast("long").as("w")))
      .select(col("id").as(idOut), col("s").as("score"),
        (col("s") > 0).as("predicted"))
  }
}
