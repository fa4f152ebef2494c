package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classifier

/** Averaged batch perceptron (q190): hand-computed first-epoch
  * weights, convergence on separable data, graceful behavior on
  * unseen vocabulary, and determinism. */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val NB = 64

  test("epoch 1 on w0=0 updates on every doc: weights are the summed " +
      "signed feature counts (hand-checked through the score)") {
    // one positive doc "good good", one negative "bad": after epoch 1
    //   w[bucket(good)] = +2, w[bucket(bad)] = -1, w[bias] = 0
    // 3 epochs: nothing is misclassified after epoch 1 (scores +4/-1),
    // so w stays fixed and the averaged sum is 3x — same signs
    val train = Seq((1L, "good good", 1L), (2L, "bad", -1L))
      .toDF("doc_id", "text", "label")
    val w = Classifier.perceptronTrain(train, "text", "doc_id",
      "label", NB, epochs = 3)
    val scored = Classifier.perceptronScore(
        Seq((10L, "good"), (11L, "bad"), (12L, "good bad")
        ).toDF("doc_id", "text"), w, "text", "doc_id", NB)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // averaged = 3x epoch-1 weights: good=+6, bad=-3, bias=0
    assert(scored(10L) == 6L, s"score(good) = ${scored(10L)}")
    assert(scored(11L) == -3L, s"score(bad) = ${scored(11L)}")
    assert(scored(12L) == 3L, s"score(good bad) = ${scored(12L)}")
  }

  test("separable vocabulary converges to 100% train accuracy") {
    val train = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, s"alpha beta w$i", 1L)
      else (i.toLong, s"gamma delta w$i", -1L)
    }.toDF("doc_id", "text", "label")
    val w = Classifier.perceptronTrain(train, "text", "doc_id",
      "label", 256, epochs = 3)
    val acc = Classifier.perceptronScore(train, w, "text", "doc_id", 256)
      .join(train.select(col("doc_id"), col("label")), Seq("doc_id"))
      .select((col("predicted") === (col("label") > 0))
        .cast("long").as("c"))
      .agg(sum(col("c"))).head.getLong(0)
    assert(acc == 40L, s"train accuracy $acc/40")
  }

  test("unseen vocabulary at scoring time falls back to the bias " +
      "weight alone (zero-filled buckets, no crash, no NULL score)") {
    val train = Seq((1L, "good", 1L), (2L, "bad", -1L), (3L, "bad", -1L))
      .toDF("doc_id", "text", "label")
    // 4096 buckets: good/bad/zzz/qqq land in distinct buckets
    // (2873/2339/3917/1785 — checked against md5), so the unseen doc's
    // only nonzero contribution is the bias
    val w = Classifier.perceptronTrain(train, "text", "doc_id",
      "label", 4096, epochs = 1)
    // epoch 1: bias = sum of labels = -1; an all-unseen doc scores
    // exactly the bias
    val s = Classifier.perceptronScore(
        Seq((9L, "zzz qqq")).toDF("doc_id", "text"), w, "text",
        "doc_id", 4096)
      .collect().head
    assert(s.getLong(1) == -1L, s"unseen-vocab score ${s.getLong(1)}")
    assert(!s.getBoolean(2))
  }

  test("streaming twin: per-batch gating against the static model == " +
      "batch score+filter of the union") {
    val inDir = java.nio.file.Files.createTempDirectory("perc-in")
    val sink = java.nio.file.Files
      .createTempDirectory("perc-out").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("perc-ck").toString
    val train = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, s"alpha beta w$i", 1L)
      else (i.toLong, s"gamma delta w$i", -1L)
    }.toDF("doc_id", "text", "label")
    val w = Classifier.perceptronTrain(train, "text", "doc_id",
      "label", 256, epochs = 3)
    val b1 = Seq((100L, "alpha beta beta"), (101L, "gamma delta"))
    val b2 = Seq((200L, "alpha alpha"), (201L, "delta gamma gamma"))
    b1.toDF("doc_id", "text").coalesce(1)
      .write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    val q = graft.streaming.EventStreams.perceptronGateIngest(stream,
      w, "text", "doc_id", sink, ckpt, nBuckets = 256)
    try {
      q.processAllAvailable()
      b2.toDF("doc_id", "text").coalesce(1)
        .write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val streamed = spark.read.parquet(sink)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Classifier.perceptronScore(
          (b1 ++ b2).toDF("doc_id", "text"), w, "text", "doc_id", 256)
        .filter(col("predicted"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(streamed.map(_._1) == Set(100L, 200L),
        "only positive-vocab docs should pass the gate")
    } finally q.stop()
  }

  test("multiclass streaming router: per-batch tagging against the " +
      "static multi table == batch scoreMulti of the union") {
    val inDir = java.nio.file.Files.createTempDirectory("mc-in")
    val sink = java.nio.file.Files
      .createTempDirectory("mc-out").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("mc-ck").toString
    val train = (0 until 30).map { i =>
      val c = s"k${i % 3}"
      (i.toLong, s"${c}w${i % 4} ${c}w${(i + 1) % 4}", c)
    }.toDF("doc_id", "text", "label")
    val w = Classifier.perceptronTrainMulti(train, "text", "doc_id",
      "label", 256, epochs = 2)
    val b1 = Seq((100L, "k0w1 k0w2"), (101L, "k1w0 k1w1"))
    val b2 = Seq((200L, "k2w3 k2w0"), (201L, "k0w0 k1w0"))
    b1.toDF("doc_id", "text").coalesce(1)
      .write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    val q = graft.streaming.EventStreams.multiclassTagIngest(stream,
      w, "text", "doc_id", sink, ckpt, nBuckets = 256)
    try {
      q.processAllAvailable()
      b2.toDF("doc_id", "text").coalesce(1)
        .write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val streamed = spark.read.parquet(sink)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      val batch = Classifier.perceptronScoreMulti(
          (b1 ++ b2).toDF("doc_id", "text"), w, "text", "doc_id", 256)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(streamed.map(r => (r._1, r._2))
        .filter(p => Set(100L, 101L, 200L)(p._1)) ==
        Set((100L, "k0"), (101L, "k1"), (200L, "k2")),
        "router sent a clear-vocab doc to the wrong class")
    } finally q.stop()
  }

  test("weights persist bit-exactly; trainOrLoadWeights builds once " +
      "then serves from the model file") {
    implicit val s = spark
    val train = Seq((1L, "good good", 1L), (2L, "bad", -1L))
      .toDF("doc_id", "text", "label")
    val w = Classifier.perceptronTrain(train, "text", "doc_id",
      "label", NB, epochs = 2)
    val path = java.nio.file.Files.createTempDirectory("perc-model")
      .toString + "/w"
    var builds = 0
    def build = { builds += 1; w }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = Classifier.trainOrLoadWeights(path)(build)
    assert(builds == 1)
    assert(rows(first) == rows(w), "persisted weights diverged")
    val second = Classifier.trainOrLoadWeights(path)(build)
    assert(builds == 1, "second call re-trained instead of loading")
    assert(second.inputFiles.nonEmpty,
      "load not backed by the model file")
  }

  test("multiclass weights persist bit-exactly; trainOrLoadWeightsMulti " +
      "builds once then serves from the model file") {
    implicit val s = spark
    val train = (0 until 30).map { i =>
      val c = s"k${i % 3}"
      (i.toLong, s"${c}w${i % 4} ${c}w${(i + 1) % 4}", c)
    }.toDF("doc_id", "text", "label")
    val w = Classifier.perceptronTrainMulti(train, "text", "doc_id",
      "label", NB, epochs = 2)
    val path = java.nio.file.Files.createTempDirectory("perc-multi")
      .toString + "/wm"
    var builds = 0
    def build = { builds += 1; w }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val first = Classifier.trainOrLoadWeightsMulti(path)(build)
    assert(builds == 1)
    assert(rows(first) == rows(w), "persisted multi weights diverged")
    val second = Classifier.trainOrLoadWeightsMulti(path)(build)
    assert(builds == 1, "second call re-trained instead of loading")
    assert(second.inputFiles.nonEmpty,
      "load not backed by the model file")
  }

  test("training is deterministic run to run") {
    val train = (0 until 30).map { i =>
      (i.toLong, s"t${i % 7} u${i % 5} v${i % 3}",
        if (i % 3 == 0) 1L else -1L)
    }.toDF("doc_id", "text", "label")
    def weights() = Classifier.perceptronTrain(train, "text", "doc_id",
        "label", NB, epochs = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(weights() == weights(), "two identical trainings diverged")
  }

  test("multiclass: each class's weight table IS the binary one-vs-" +
      "rest run; argmax prediction is perfect on disjoint " +
      "vocabularies and ties break label-ascending") {
    val train = (0 until 60).map { i =>
      val c = s"k${i % 3}"
      (i.toLong, s"${c}w${i % 4} ${c}w${(i + 1) % 4} shared", c)
    }.toDF("doc_id", "text", "label")
    val multi = Classifier.perceptronTrainMulti(train, "text",
      "doc_id", "label", NB, epochs = 2)
    // per-class slice equals the standalone binary training
    Seq("k0", "k1", "k2").foreach { c =>
      val slice = multi.filter(col("label") === c)
        .select(col("bucket"), col("w"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val binary = Classifier.perceptronTrain(
          train.withColumn("__y",
            when(col("label") === c, 1L).otherwise(-1L)),
          "text", "doc_id", "__y", NB, epochs = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(slice == binary, s"class $c diverged from binary OVR")
    }
    // disjoint class vocabularies => argmax gets every doc right
    val pred = Classifier.perceptronScoreMulti(train, multi, "text",
        "doc_id", NB)
      .join(train.select(col("doc_id"), col("label")), Seq("doc_id"))
    assert(pred.filter(col("predicted") =!= col("label")).count() == 0)
    // tie-break: an all-zero weight table scores every class 0 ->
    // the lexicographically first label wins, deterministically
    import spark.implicits._
    val zeroW = Seq(("b", 0L, 0L), ("a", 0L, 0L))
      .toDF("label", "bucket", "w")
    val tied = Classifier.perceptronScoreMulti(
      Seq((1L, "x y")).toDF("doc_id", "text"), zeroW, "text",
      "doc_id", NB)
    assert(tied.collect().map(r => r.getString(1)).toSeq == Seq("a"))
  }

  test("prCurve: exact confusion counts per distinct threshold, " +
      "hand-checked with ties") {
    // scores: pos {3, 5, 5}, neg {1, 5} -> distinct v: 1, 3, 5
    // keep >= 1: tp=3 fp=2 fn=0 | >= 3: tp=3 fp=1 fn=0
    // keep >= 5: tp=2 fp=1 fn=1
    val scored = Seq((1L, 3L, 1L), (2L, 5L, 1L), (3L, 5L, 1L),
      (4L, 1L, -1L), (5L, 5L, -1L)).toDF("id", "score", "label")
    val got = Classifier.prCurve(scored, "score", "label")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got.keySet == Set(1L, 3L, 5L))
    assert(got(1L) == ((3L, 2L, 0L, 3.0 / 5.0, 1.0)), got(1L))
    assert(got(3L) == ((3L, 1L, 0L, 3.0 / 4.0, 1.0)), got(3L))
    assert(got(5L) == ((2L, 1L, 1L, 2.0 / 3.0, 2.0 / 3.0)), got(5L))
  }

  test("aucExact: perfect separation = 1.0, all ties = 0.5, " +
      "hand case with a tie = Mann-Whitney midranks") {
    val sep = Seq((1L, 10L, 1L), (2L, 9L, 1L), (3L, 2L, -1L),
      (4L, 1L, -1L)).toDF("id", "score", "label")
    val rSep = Classifier.aucExact(sep, "score", "label").head()
    assert((rSep.getLong(0), rSep.getLong(1), rSep.getLong(2),
      rSep.getDouble(3)) == ((2L, 2L, 8L, 1.0)), rSep.toString)
    val ties = Seq((1L, 7L, 1L), (2L, 7L, 1L), (3L, 7L, -1L),
      (4L, 7L, -1L)).toDF("id", "score", "label")
    assert(Classifier.aucExact(ties, "score", "label")
      .head().getDouble(3) == 0.5)
    // pos {3, 5}, neg {1, 5}: pairs (3>1)=1, (3,5)=0, (5>1)=1,
    // (5=5)=1/2 -> AUC = 2.5/4; u2 = 5
    val hand = Seq((1L, 3L, 1L), (2L, 5L, 1L), (3L, 1L, -1L),
      (4L, 5L, -1L)).toDF("id", "score", "label")
    val rh = Classifier.aucExact(hand, "score", "label").head()
    assert((rh.getLong(2), rh.getDouble(3)) == ((5L, 2.5 / 4.0)),
      rh.toString)
  }

  test("calibrationBins: floor-division bins exact on NEGATIVE scores, " +
      "counts and rates hand-checked") {
    // width 10: scores -15,-5 -> bin -2 [-20,-10) holds -15 only;
    // -5 -> bin -1 [-10,0); 0,9 -> bin 0; 10 -> bin 1
    val scored = Seq((1L, -15L, -1L), (2L, -5L, -1L), (3L, 0L, -1L),
      (4L, 9L, 1L), (5L, 10L, 1L)).toDF("id", "score", "label")
    val got = Classifier.calibrationBins(scored, "score", "label", 10L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got.keySet == Set(-2L, -1L, 0L, 1L), got.keySet.toString)
    assert(got(-2L) == ((-20L, 1L, 0L, 0.0, -15.0)), got(-2L))
    assert(got(-1L) == ((-10L, 1L, 0L, 0.0, -5.0)), got(-1L))
    assert(got(0L) == ((0L, 2L, 1L, 0.5, 4.5)), got(0L))
    assert(got(1L) == ((10L, 1L, 1L, 1.0, 10.0)), got(1L))
  }

  test("aucExactByGroup: per-group rows match the global operator run " +
      "per group; one-sided groups dropped") {
    val df = Seq(
      ("g1", 3L, 1L), ("g1", 5L, 1L), ("g1", 1L, -1L), ("g1", 5L, -1L),
      ("g2", 9L, 1L), ("g2", 2L, -1L),
      ("g3", 7L, 1L), ("g3", 8L, 1L))
      .toDF("grp", "score", "label")
    val got = Classifier.aucExactByGroup(df, "grp", "score", "label")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet == Set("g1", "g2"), got.keySet.toString)
    Seq("g1", "g2").foreach { g =>
      val r = Classifier.aucExact(df.filter(col("grp") === g),
        "score", "label").head()
      assert(got(g) == ((r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))), s"group $g vs global form")
    }
    assert(got("g1")._4 == 2.5 / 4.0 && got("g2")._4 == 1.0)
  }

  test("isotonicCalibrate: violating bins pool with exact rational " +
      "rates; monotone output; serving is the step function over gaps") {
    // bins (n, n_pos): b0 (4,1)=.25, b1 (2,2)=1.0, b2 (4,1)=.25 ->
    // b1,b2 violate -> pool (6,3)=.5; result .25, .5, .5 (monotone)
    val bins = Seq((0L, 0L, 4L, 1L), (1L, 10L, 2L, 2L),
      (3L, 30L, 4L, 1L)) // note bin 2 is an interior GAP
      .toDF("bin", "lo", "n", "n_pos")
    val cal = Classifier.isotonicCalibrate(bins)
    val got = cal.collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5),
        r.getDouble(6))).toMap
    assert(got(0L) == ((1L, 4L, 0.25)), got(0L))
    assert(got(1L) == ((3L, 6L, 0.5)), got(1L))
    assert(got(3L) == ((3L, 6L, 0.5)), got(3L))
    // serving (binWidth 10): score 5 -> bin 0; 25 -> gap bin 2 ->
    // greatest trained bin <= 2 is 1; -99 clamps up to bin 0;
    // 999 -> bin 99 -> greatest trained is 3
    val served = Classifier.calibrateScores(
        Seq((1L, 5L), (2L, 25L), (3L, -99L), (4L, 999L))
          .toDF("id", "score"), cal, "score", 10L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(served == Map(1L -> 0.25, 2L -> 0.5, 3L -> 0.25, 4L -> 0.5),
      served.toString)
  }

  test("isotonicCalibrate: already-monotone input unchanged; all-equal " +
      "rates single pool; persistence round-trips bit-exactly") {
    val mono = Seq((0L, 0L, 4L, 0L), (1L, 10L, 4L, 2L),
      (2L, 20L, 4L, 4L)).toDF("bin", "lo", "n", "n_pos")
    val calM = Classifier.isotonicCalibrate(mono)
    assert(calM.collect().map(r => (r.getLong(0), r.getLong(4),
      r.getLong(5))).toSet ==
      Set((0L, 0L, 4L), (1L, 2L, 4L), (2L, 4L, 4L)))
    val rates = calM.orderBy("bin").collect().map(_.getDouble(6))
    assert(rates.zip(rates.tail).forall { case (a, b) => a <= b })
    val dir = java.nio.file.Files
      .createTempDirectory("cal").toString + "/c"
    implicit val s: org.apache.spark.sql.SparkSession = spark
    Classifier.saveCalibrator(calM, dir)
    val back = Classifier.loadCalibrator(dir)
    assert(back.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
      r.getDouble(6))).toSet ==
      calM.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getDouble(6))).toSet)
    var built = 0
    def build = { built += 1; calM }
    val dir2 = java.nio.file.Files
      .createTempDirectory("cal2").toString + "/c"
    Classifier.trainOrLoadCalibrator(dir2)(build)
    Classifier.trainOrLoadCalibrator(dir2)(build)
    assert(built == 1, "trainOrLoad must build exactly once")
  }

  test("prCurve/aucExact: partition-count independent (the prefix-scan " +
      "contract) and consistent with each other on random scores") {
    val rng = new scala.util.Random(9)
    val scored = (1 to 400).map(i => (i.toLong,
      (rng.nextInt(40) + (if (i % 3 == 0) 10 else 0)).toLong,
      if (i % 3 == 0) 1L else -1L)).toDF("id", "score", "label")
    val ref = Classifier.aucExact(scored, "score", "label").head()
    for (parts <- Seq(1, 4)) {
      val r = Classifier
        .aucExact(scored, "score", "label", numParts = parts).head()
      assert(r.getLong(2) == ref.getLong(2), s"numParts=$parts")
      val pr = Classifier
        .prCurve(scored, "score", "label", numParts = parts).collect()
      // tp+fn = P at every threshold; tp non-increasing in threshold
      pr.foreach(row => assert(row.getLong(1) + row.getLong(3) ==
        ref.getLong(0)))
      val byThr = pr.sortBy(_.getLong(0)).map(_.getLong(1))
      assert(byThr.zip(byThr.tail).forall { case (a, b) => a >= b },
        "tp must be non-increasing in the threshold")
    }
  }
}
