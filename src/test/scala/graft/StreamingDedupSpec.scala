package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Streaming incremental dedup: micro-batches of documents screened
  * against a static corpus via foreachBatch — corpus-side state
  * (fingerprints, banded signatures, shingle sets) is prepared ONCE
  * before the query starts, each batch only probes it; near-dups of the
  * corpus are dropped per batch and novel docs append to the sink. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("prepared-corpus probe returns exactly the one-shot incrementalDedup result") {
    import spark.implicits._
    val corpus = (1L to 40L).map(i =>
      (i, s"corpus document number $i with some shared words of substance"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (101L, "corpus document number 7 with some shared words of substance"), // exact
      // trailing whitespace: different md5 (survives the exact screen) but
      // an IDENTICAL shingle set (split+trim), so Jaccard = 1.0 and the
      // band collision is guaranteed — a deterministic near-dup drop
      (102L, "corpus document number 9 with some shared words of substance  "),
      (103L, "entirely novel words that resemble nothing in the history"))
      .toDF("doc_id", "text")
    val oneShot = graft.operators.Dedup
      .incrementalDedup(batch, corpus, "text", "doc_id", jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val prepared = graft.operators.Dedup.prepareCorpus(corpus, "text", "doc_id")
    val viaPrepared = graft.operators.Dedup
      .incrementalDedupPrepared(batch, prepared, "text", "doc_id",
        jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaPrepared == oneShot)
    assert(viaPrepared == Seq(103L))
  }

  test("updateCorpusIndex: absorbing a batch == re-preparing the " +
      "union (the ingest loop closes); survives the parquet round " +
      "trip") {
    import spark.implicits._
    implicit val s = spark
    val corpus = (1L to 30L).map(i =>
      (i, s"corpus document number $i with some shared words of substance"))
      .toDF("doc_id", "text")
    val b1 = Seq(
      (101L, "a first wave of entirely new material about packing"),
      (102L, "a second strand of fresh text on quantized serving"))
      .toDF("doc_id", "text")
    // batch 2 contains a near-dup of batch 1 (trailing space) — it must
    // be caught ONLY if b1 was absorbed into the index
    val b2 = Seq(
      (201L, "a first wave of entirely new material about packing  "),
      (202L, "completely unrelated third-wave subject matter entirely"))
      .toDF("doc_id", "text")
    def screen(p: graft.operators.Dedup.PreparedCorpus) =
      graft.operators.Dedup
        .incrementalDedupPrepared(b2, p, "text", "doc_id",
          jaccardThreshold = 0.5)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val updated = graft.operators.Dedup.updateCorpusIndex(
      graft.operators.Dedup.prepareCorpus(corpus, "text", "doc_id"),
      b1, "text", "doc_id")
    val reprepared = graft.operators.Dedup.prepareCorpus(
      corpus.unionByName(b1), "text", "doc_id")
    assert(screen(updated) == screen(reprepared))
    assert(screen(updated) == Seq(202L),
      "the absorbed batch must catch its own near-dup")
    // parquet round trip of the UPDATED index screens identically
    val root = java.nio.file.Files.createTempDirectory("corpix")
      .resolve("ix").toString
    graft.operators.Dedup.saveCorpusIndex(updated, root)
    assert(screen(graft.operators.Dedup.loadCorpusIndex(spark, root))
      == Seq(202L))
  }

  test("deleteFromCorpusIndex: deleted docs stop matching near-dups; " +
      "fingerprints follow the survivors (or stay conservative)") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "to be deleted text about ephemeral takedown requests now"),
      (2L, "a permanent resident document with stable words here"))
      .toDF("doc_id", "text")
    val prepared = graft.operators.Dedup
      .prepareCorpus(corpus, "text", "doc_id")
    // near-dup + exact resubmission of the deleted doc
    val resub = Seq(
      (301L, "to be deleted text about ephemeral takedown requests now"),
      (302L, "to be deleted text about ephemeral takedown requests now  "))
      .toDF("doc_id", "text")
    def screen(p: graft.operators.Dedup.PreparedCorpus) =
      graft.operators.Dedup
        .incrementalDedupPrepared(resub, p, "text", "doc_id",
          jaccardThreshold = 0.5)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(screen(prepared) == Seq())
    val survivors = corpus.filter(col("doc_id") =!= 1L)
    val exact = graft.operators.Dedup.deleteFromCorpusIndex(prepared,
      Seq(1L).toDF("doc_id"), "doc_id",
      survivors = Some((survivors, "text")))
    // fully forgotten: both the exact and near-dup resubmissions pass
    assert(screen(exact) == Seq(301L, 302L))
    // conservative mode: signatures dropped but fingerprints kept —
    // the EXACT resubmission still rejects, the near-dup passes
    val conservative = graft.operators.Dedup.deleteFromCorpusIndex(
      prepared, Seq(1L).toDF("doc_id"), "doc_id")
    assert(screen(conservative) == Seq(302L))
  }

  test("micro-batched ingest keeps only documents novel vs the corpus") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("sdedup-in")
    val sink = java.nio.file.Files.createTempDirectory("sdedup-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("sdedup-ck").toString

    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today again"),
      (2L, "completely different text about spark sql execution engines"))
      .toDF("doc_id", "text")

    // batch 1: one exact dup, one near-dup (tail truncated), one novel
    Seq(
      (10L, "the quick brown fox jumps over the lazy dog today again"),
      (11L, "the quick brown fox jumps over the lazy dog today"),
      (12L, "entirely novel words nowhere near anything in history yet"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(inDir.resolve("b1").toString)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(inDir.toString + "/*")
    val q = EventStreams.dedupedIngest(stream, corpus, "text", "doc_id",
      sink, ckpt, jaccardThreshold = 0.5)
    try {
      q.processAllAvailable()
      val afterB1 = spark.read.parquet(sink)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(afterB1 == Seq(12L))

      // batch 2: another corpus near-dup + another novel doc
      Seq(
        (20L, "different text about spark sql execution engines"),
        (21L, "fresh unrelated content arriving in the second batch now"))
        .toDF("doc_id", "text")
        .coalesce(1).write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val afterB2 = spark.read.parquet(sink)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(afterB2 == Seq(12L, 21L))
    } finally q.stop()
  }

  // ------------------------------------------------- semantic (embeddings)

  /** 20 well-separated corpus vectors; batch = near-dups (perturbed
    * copies, cosine ≈ 1) + orthogonal-ish novel vectors. */
  private def corpusVecs = {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    (0 until 20).map(i =>
      (i.toLong, Seq.fill(16)(rng.nextDouble() * 2 - 1))).toDF("vec_id", "embedding")
  }

  test("incremental semantic screen matches batch-only semanticDedup policy") {
    import spark.implicits._
    val corpus = corpusVecs
    val base = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val batch = Seq(
      (100L, base(3).map(_ + 0.0005)),  // semantic dup of corpus vec 3
      (101L, base(7).map(_ + 0.0005)),  // semantic dup of corpus vec 7
      (102L, Seq.fill(16)(0.9)))        // novel direction
      .toDF("vec_id", "embedding")
    val prepared = graft.operators.Dedup
      .prepareEmbeddings(corpus, "embedding", "vec_id", nlist = 4)
    val kept = graft.operators.Dedup
      .semanticDedupIncremental(batch, prepared, "embedding", "vec_id",
        cosineThreshold = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(102L))
    // the screen agrees with the one-shot operator run over corpus∪batch:
    // exactly the batch ids semanticDedup would drop are screened out
    val oneShot = graft.operators.Dedup
      .semanticDedup(corpus.unionByName(batch), "embedding", "vec_id",
        cosineThreshold = 0.999, nlist = 4)
      .filter(col("dup_id") >= 100L)
      .select("dup_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(oneShot == Seq(100L, 101L))
  }

  test("embedding index: absorb == re-prepare with the same quantizer; " +
      "delete forgets; parquet round trip screens identically") {
    import spark.implicits._
    implicit val s = spark
    def vec(xs: Double*) = xs.map(_.toFloat).toArray
    val corpus = Seq(
      (1L, vec(1.0, 0.0, 0.0)), (2L, vec(0.0, 1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val prepared = graft.operators.Dedup
      .prepareEmbeddings(corpus, "embedding", "vec_id", nlist = 2)
    // z-leaning vectors with a small +x bias: both land in the
    // (1,0,0)-centroid's cluster deterministically (no tie), far from
    // every corpus vector by cosine
    val b1 = Seq((10L, vec(0.01, 0.0, 1.0))).toDF("vec_id", "embedding")
    // b2 is a near-copy of b1's vector: caught only if b1 was absorbed
    val b2 = Seq((20L, vec(0.01, 0.0, 0.98)),
      (21L, vec(0.7, 0.7, 0.0))).toDF("vec_id", "embedding")
    def screen(p: graft.operators.Dedup.PreparedEmbeddings) =
      graft.operators.Dedup
        .semanticDedupIncremental(b2, p, "embedding", "vec_id", 0.99)
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val updated = graft.operators.Dedup.updateEmbeddingIndex(
      prepared, b1, "embedding", "vec_id")
    val reprepared = graft.operators.Dedup.prepareEmbeddings(
      corpus.unionByName(b1), "embedding", "vec_id", nlist = 2,
      centroids = Some(prepared.centroids))
    assert(screen(updated) == screen(reprepared))
    assert(screen(updated) == Seq(21L),
      "the absorbed vector must catch its own near-copy")
    val root = java.nio.file.Files.createTempDirectory("embix")
      .resolve("ix").toString
    graft.operators.Dedup.saveEmbeddingIndex(updated, root)
    val loaded = graft.operators.Dedup.loadEmbeddingIndex(root)
    assert(loaded.centroids == updated.centroids &&
      loaded.scale == updated.scale)
    assert(screen(loaded) == Seq(21L))
    // delete vector 10 -> its near-copy becomes novel again
    val afterDel = graft.operators.Dedup.deleteFromEmbeddingIndex(
      updated, Seq(10L).toDF("vec_id"), "vec_id")
    assert(screen(afterDel) == Seq(20L, 21L))
  }

  test("micro-batched semantic ingest keeps only semantically novel vectors") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("semdedup-in")
    val sink = java.nio.file.Files.createTempDirectory("semdedup-out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("semdedup-ck").toString

    val corpus = corpusVecs
    val base = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

    // batch 1: one semantic dup of the corpus, one novel
    Seq((30L, base(5).map(_ + 0.0005)), (31L, Seq.fill(16)(0.8)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<DOUBLE>")
      .parquet(inDir.toString + "/*")
    val q = EventStreams.semanticDedupedIngest(stream, corpus,
      "embedding", "vec_id", sink, ckpt, cosineThreshold = 0.999, nlist = 4)
    try {
      q.processAllAvailable()
      val afterB1 = spark.read.parquet(sink)
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(afterB1 == Seq(31L))

      // batch 2: another corpus dup + another novel direction
      Seq((40L, base(12).map(_ + 0.0005)),
        (41L, (0 until 16).map(i => if (i % 2 == 0) 0.9 else -0.9)))
        .toDF("vec_id", "embedding")
        .coalesce(1).write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val afterB2 = spark.read.parquet(sink)
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(afterB2 == Seq(31L, 41L))
    } finally q.stop()
  }
}
