package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference pipeline is pure batch (SURVEY.md §2.10); these are the
  * north-star streaming capabilities a continuously-ingesting pipeline
  * needs. Each transform is written against a plain DataFrame so the SAME
  * code serves `read` (batch backfill) and `readStream` (live) — the
  * batch/streaming unification Spark's incremental execution model gives
  * for free.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type, with a watermark for
    * state eviction under late data. */
  def tumblingCounts(events: DataFrame, window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding-window rates (5-minute hops over an hour). */
  def slidingRates(events: DataFrame, window: String = "1 hour",
      slide: String = "5 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("n_events"))

  /** Declarative gap-merge session aggregation — the SCALE §10 batch
    * default (q105), IDENTICAL code as a streaming aggregation: the one
    * thing the q43 lag/cumsum chain and `mapGroupsWithState` cannot
    * claim. Streaming callers pass a watermark so session state is
    * evictable (a session closes once the watermark passes its end);
    * batch callers omit it. Output keeps the raw session timestamps —
    * presentation formatting is the caller's concern. */
  def sessionWindowAggregates(events: DataFrame,
      gap: String = "30 minutes",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class SessionSummary(user_id: Long, n_events: Long,
      total_value: Double, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, closed: Boolean)
  private final case class SessionState(n: Long, total: Double,
      startMs: Long, endMs: Long)

  /** Custom per-key state: user sessionization with an inactivity gap via
    * `mapGroupsWithState` (the reference has no equivalent; this is the
    * canonical KeyValueGroupedDataset stateful pattern). In batch mode the
    * state machine degenerates to a full-group fold, which is how the
    * spec exercises it hermetically. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L):
      Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionSummary](
          GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          val init = state.getOption.getOrElse(
            SessionState(0L, 0.0, Long.MaxValue, Long.MinValue))
          val next = sorted.foldLeft(init) { (st, e) =>
            val t = e.ts.getTime
            if (st.n > 0 && t - st.endMs > gapMs)
              // new session: reset (previous summary already emitted
              // incrementally in streaming mode; batch emits the last)
              SessionState(1L, e.value, t, t)
            else
              SessionState(st.n + 1, st.total + e.value,
                math.min(st.startMs, t), math.max(st.endMs, t))
          }
          state.update(next)
          SessionSummary(userId, next.n, next.total,
            new java.sql.Timestamp(next.startMs),
            new java.sql.Timestamp(next.endMs), closed = false)
      }
  }

  /** Streaming incremental dedup — the continuous-ingestion form of
    * [[graft.operators.Dedup.incrementalDedup]]: each micro-batch of
    * documents is screened against the static historical corpus (exact
    * fingerprint + MinHash-LSH anti-joins) and only novel documents reach
    * the sink. The screen is a multi-stage batch program (aggregations,
    * distinct, self-banding) that Structured Streaming cannot run
    * incrementally in a single query, so the correct boundary is
    * `foreachBatch` — the batch operator applied per micro-batch, the
    * same pattern the engine uses for its dwh sink bridge
    * (`ForeachBatchSpec`). The corpus side (fingerprints, banded LSH
    * signatures, shingle sets) is computed ONCE here, before the query
    * starts ([[graft.operators.Dedup.prepareCorpus]], eagerly
    * materialized), and every micro-batch probes those frames — so
    * per-batch cost is proportional to the batch, not the history.
    *
    * Returns the started query; novel rows append to `sinkPath`. */
  def dedupedIngest(
      docsStream: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String,
      sinkPath: String, checkpointPath: String,
      jaccardThreshold: Double = 0.8): org.apache.spark.sql.streaming.StreamingQuery = {
    val prepared = graft.operators.Dedup
      .prepareCorpus(corpus, textCol, idCol)
    docsStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Dedup
          .incrementalDedupPrepared(batch.toDF(), prepared, textCol, idCol,
            jaccardThreshold = jaccardThreshold)
          .write.mode("append").parquet(sinkPath)
      }
      .start()
  }

  /** Streaming EXACTSUBSTR decontamination — the suffix-array family's
    * streaming twin and the serving loop of
    * [[graft.operators.SuffixArray.SubstrIndex]]: each micro-batch of
    * documents is probed against the FROZEN persisted index
    * ([[graft.operators.SuffixArray.loadSubstrIndex]], loaded once
    * before the query starts — never rebuilt) and lands in the sink
    * with every ≥ minSpan-token run that occurs in the indexed corpus
    * removed ([[graft.operators.SuffixArray.exactSubstrProbe]], cost
    * proportional to the batch). Same `foreachBatch` boundary as
    * [[dedupedIngest]]: the probe is a multi-stage batch program over
    * precomputed corpus frames. Batch ≡ stream replay is spec-gated in
    * `StreamingDedupSpec`. */
  def substrDecontamIngest(
      docsStream: DataFrame, indexPath: String,
      textCol: String, idCol: String,
      sinkPath: String, checkpointPath: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val ix = graft.operators.SuffixArray
      .loadSubstrIndex(docsStream.sparkSession, indexPath)
    docsStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.SuffixArray
          .exactSubstrProbe(ix, batch.toDF(), textCol, idCol)
          .write.mode("append").parquet(sinkPath)
      }
      .start()
  }

  /** [[substrDecontamIngest]] with a GROWING corpus — the EXACTSUBSTR
    * analog of [[curationIngest]]'s absorb loop: each micro-batch is
    * probed against the CURRENT index, the cleaned survivors append to
    * the sink, and their (post-removal) text ABSORBS into the index
    * ([[graft.operators.SuffixArray.absorbSubstrIndex]]) so the NEXT
    * batch's probe also rejects copies of THIS batch's spans. Every
    * `checkpointEvery` batches the index persists as a new IndexStore
    * generation under `indexPath` and the live reference swaps to the
    * parquet-backed reload (bounding accumulated checkpoint lineage —
    * the curationIngest cadence; generations make the overwrite
    * crash-atomic for free). Batch-for-batch ≡ the sequential
    * probe→absorb replay (spec-gated in `SubstrIndexSpec`). */
  def substrDecontamIngestAccumulating(
      docsStream: DataFrame, indexPath: String,
      textCol: String, idCol: String,
      sinkPath: String, checkpointPath: String,
      checkpointEvery: Int = 8): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docsStream.sparkSession
    val index = new java.util.concurrent.atomic.AtomicReference(
      graft.operators.SuffixArray.loadSubstrIndex(spark, indexPath))
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    docsStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val cleaned = graft.operators.SuffixArray
          .exactSubstrProbe(index.get(), batch.toDF(), textCol, idCol)
          .localCheckpoint(true)
        cleaned.write.mode("append").parquet(sinkPath)
        // the probe output carries the q222 fixed shape (doc_id, ...,
        // text) — re-alias to the caller's column names for the absorb
        val absorbed = graft.operators.SuffixArray.absorbSubstrIndex(
          index.get(),
          cleaned.select(col("doc_id").as(idCol),
            col("text").as(textCol)), textCol, idCol)
        index.set(
          if (gen.incrementAndGet() % checkpointEvery == 0) {
            graft.operators.SuffixArray
              .saveSubstrIndex(absorbed, indexPath)
            graft.operators.SuffixArray
              .loadSubstrIndex(spark, indexPath)
          } else absorbed)
        ()
      }
      .start()
  }

  /** Streaming semantic dedup — the embedding twin of [[dedupedIngest]]
    * and the continuous-ingestion form of
    * [[graft.operators.Dedup.semanticDedup]]: each micro-batch of
    * (id, embedding) rows is screened against the static historical
    * corpus's cluster assignments
    * ([[graft.operators.Dedup.prepareEmbeddings]], computed once before
    * the query starts) and only semantically novel rows reach the sink.
    * Same `foreachBatch` boundary as the text path: the screen needs a
    * centroid matrix + materialized corpus frame that an incremental
    * streaming query can't build, while the per-batch probe is a plain
    * cluster-id equi-join whose cost is batch-proportional. */
  def semanticDedupedIngest(
      embStream: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String,
      sinkPath: String, checkpointPath: String,
      cosineThreshold: Double = 0.99, nlist: Int = 8,
      centroids: Option[Seq[Seq[Long]]] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val prepared = graft.operators.Dedup
      .prepareEmbeddings(corpus, vecCol, idCol, nlist, centroids = centroids)
    embStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Dedup
          .semanticDedupIncremental(batch.toDF(), prepared, vecCol, idCol,
            cosineThreshold)
          .write.mode("append").parquet(sinkPath)
      }
      .start()
  }

  /** Streaming perceptual-media gate — the r14 phash family's
    * streaming twin (VERDICT r14 item 6): each micro-batch of
    * (id, binary PGM payload) rows is fingerprinted
    * ([[graft.functions.PhashKernel]] dHash) and Hamming-screened
    * against the STATIC corpus fingerprint table (computed once before
    * the query starts — the [[dedupedIngest]] boundary); only
    * perceptually novel, well-formed images reach the sink. Malformed
    * payloads (null hash) are dropped — a gate that can't fingerprint
    * an image must not wave it through. Per-batch cost is
    * batch-proportional ([[graft.operators.Dedup.hammingScreen]]: the
    * batch side broadcasts into the chunk join). */
  def phashGateIngest(
      mediaStream: DataFrame, corpus: DataFrame,
      contentCol: String, idCol: String,
      sinkPath: String, checkpointPath: String,
      maxHamming: Int = 6): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.functions.Phash
    val corpusFps = corpus
      .select(col(idCol), Phash.dhash64(col(contentCol)).as("__fp"))
      .filter(col("__fp").isNotNull)
      .localCheckpoint(false)
    mediaStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val fps = batch.toDF()
          .withColumn("__fp", Phash.dhash64(col(contentCol)))
          .filter(col("__fp").isNotNull)
        graft.operators.Dedup
          .hammingScreen(fps, corpusFps, "__fp", idCol, maxHamming)
          .drop("__fp")
          .write.mode("append").parquet(sinkPath)
      }
      .start()
  }

  /** Streaming main-content extraction — q182's streaming twin: the
    * Kohlschütter/boilerpipe pass is per-page local (its only exchange
    * is the prev/next window over the page key, entirely inside one
    * page), so it bridges through `foreachBatch` as a stateless
    * projection: each micro-batch of (url, html) pages becomes
    * (url, main_text) rows, no cross-batch state. Upstream of
    * [[dedupedIngest]] this completes the streaming curation chain:
    * extract main content, then gate it. */
  def mainContentIngest(
      pagesStream: DataFrame, urlCol: String, htmlCol: String,
      sinkPath: String, checkpointPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    pagesStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sources.CrawlParse
          .mainContent(batch.toDF(), urlCol, htmlCol)
          .write.mode("append").parquet(sinkPath)
      }
      .start()

  /** Streaming beam-search serving — q183's streaming twin over the
    * PERSISTED backbone (VERDICT r14 items 5+6): each micro-batch of
    * query vectors runs the beam loop
    * ([[graft.operators.Ann.beamSearchPortable]]) against the static
    * corpus and a kNN graph the caller typically loads via
    * [[graft.operators.Ann.trainOrLoadKnnGraph]] — the index is built
    * (or loaded) once; every batch pays only query-proportional serving
    * cost. Results (id, neighbor_id, rank, d) append per batch. */
  def beamServeIngest(
      queryStream: DataFrame, graph: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int, ef: Int, maxRounds: Int,
      sinkPath: String, checkpointPath: String,
      scale: Int = 1000): org.apache.spark.sql.streaming.StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Ann
          .beamSearchPortable(graph, corpus, batch.toDF(), vecCol,
            idCol, k, ef, maxRounds, scale = scale)
          .write.mode("append").parquet(sinkPath)
      }
      .start()

  /** Streaming exact-fill sequence packing — the continuous-ingestion
    * form of [[graft.operators.Packing.packSequences]] (q194/q196):
    * each micro-batch of (id, token-count) rows is packed as the
    * CONTINUATION of everything packed before it — the batch's own
    * two-phase prefix sum, shifted by the running global token offset
    * — so the emitted (id, seq_id, piece_start, piece_tokens) rows are
    * IDENTICAL to what one batch run over the concatenated stream
    * would produce (spec: `StreamingPackSpec`). Sequences therefore
    * keep filling across batch boundaries: a batch rarely ends on a
    * sequence edge, and the next batch's first piece completes the
    * open sequence.
    *
    * The running offset is the one number of cross-batch state
    * (state ∝ 1, the two-phase scan's driver-boundary discipline).
    * On (re)start it is re-derived from the SINK — sum(piece_tokens)
    * over what was actually committed — so a restart resumes exactly
    * where the durable output ends rather than trusting in-memory
    * state (at-least-once caveat: a batch replayed after a crash
    * BETWEEN sink commit and checkpoint commit appends twice, the
    * standard foreachBatch contract; idempotent sinks dedup on
    * (id, seq_id)). */
  def packedIngest(
      docsStream: DataFrame, tokenCol: String, idCol: String,
      seqLen: Long, sinkPath: String, checkpointPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docsStream.sparkSession
    val offset = new java.util.concurrent.atomic.AtomicLong(
      try spark.read.parquet(sinkPath)
        .agg(coalesce(sum(col("piece_tokens")), lit(0L))).head.getLong(0)
      catch { case _: org.apache.spark.sql.AnalysisException => 0L })
    docsStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.toDF()
        val packed = graft.operators.Packing.packSequences(
          b, tokenCol, idCol, seqLen, baseOffset = offset.get())
        packed.write.mode("append").parquet(sinkPath)
        val batchTokens = b
          .agg(coalesce(sum(col(tokenCol)), lit(0L))).head.getLong(0)
        offset.addAndGet(batchTokens)
        ()
      }
      .start()
  }

  /** Streaming TOKENIZER-AWARE exact-fill packing — [[packedIngest]]
    * budgeted by what the trainer actually sees (q220's streaming
    * twin): each micro-batch's documents are counted under the static
    * trained unigram-LM model
    * ([[graft.operators.TextAnalysis.unigramTokenCounts]] — the
    * segmentation DP runs over the BATCH's word types only, so
    * per-batch cost is batch-proportional; the model is typically
    * [[graft.operators.TextAnalysis.trainOrLoadUnigramModel]]-served)
    * and packed as the continuation of the whole stream (the same
    * one-number offset state, sink-re-derived on restart, with the
    * same at-least-once caveat as [[packedIngest]]). */
  def tokenizedPackIngest(
      docsStream: DataFrame, textCol: String, idCol: String,
      model: DataFrame, seqLen: Long, sinkPath: String,
      checkpointPath: String, maxPiece: Int = 4, maxWord: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docsStream.sparkSession
    val m = model.localCheckpoint(false)
    val offset = new java.util.concurrent.atomic.AtomicLong(
      try spark.read.parquet(sinkPath)
        .agg(coalesce(sum(col("piece_tokens")), lit(0L))).head.getLong(0)
      catch { case _: org.apache.spark.sql.AnalysisException => 0L })
    docsStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val counts = graft.operators.TextAnalysis
          .unigramTokenCounts(batch.toDF(), textCol, idCol, m,
            maxPiece, maxWord)
          .localCheckpoint(true)
        graft.operators.Packing
          .packSequences(counts, "n_tokens", idCol, seqLen,
            baseOffset = offset.get())
          .write.mode("append").parquet(sinkPath)
        val batchTokens = counts
          .agg(coalesce(sum(col("n_tokens")), lit(0L))).head.getLong(0)
        offset.addAndGet(batchTokens)
        ()
      }
      .start()
  }

  /** END-TO-END streaming curation — the q196 pretraining data path as
    * a CONTINUOUS ingest, composing the library's stage twins in one
    * `foreachBatch` body per micro-batch of (id, text) documents:
    *
    *   1. quality gate — the TRAINED perceptron weights
    *      ([[graft.operators.Classifier.perceptronScore]], model
    *      offline, the [[perceptronGateIngest]] stage);
    *   2. blocklist — pattern gate
    *      ([[graft.operators.TextAnalysis.blocklistGate]]);
    *   3. near-dup screen against a LIVE corpus index
    *      ([[graft.operators.Dedup.incrementalDedupPrepared]] over the
    *      caller's seed [[graft.operators.Dedup.PreparedCorpus]]);
    *   4. ABSORB the novel survivors into the index
    *      ([[graft.operators.Dedup.updateCorpusIndex]] — so the NEXT
    *      batch's near-copies of this batch are caught; lineage
    *      flattened every `checkpointEvery` batches, the descent-loop
    *      hygiene);
    *   5. exact-fill sequence packing as the continuation of the
    *      whole stream ([[graft.operators.Packing.packSequences]] with
    *      the running token offset — the [[packedIngest]] one-number
    *      state, re-derived from the sink on restart).
    *
    * Sink rows: (idCol, seq_id, piece_start, piece_tokens) — exactly
    * the q194/q196 artifact, emitted continuously. Cross-batch state:
    * ONE number (the pack offset) + the live index frames (cost ∝
    * survivors, the [[graft.operators.Dedup.updateCorpusIndex]]
    * contract). Per-batch cost is batch-proportional: gates are
    * map-only over the batch, the screen probes prepared frames, the
    * pack is the batch's own two-phase scan.
    *
    * RESTART durability: the pack offset re-derives from the sink, but
    * the near-dup index is cross-batch state too — pass `indexPath` to
    * persist it ([[graft.operators.Dedup.saveCorpusIndex]]) on the
    * `checkpointEvery` cadence and REHYDRATE it at query start (a
    * saved index at that path overrides the caller's seed `history`).
    * Without `indexPath` the index reverts to the seed on restart, so
    * near-copies of docs absorbed before the crash are re-admitted —
    * with it, the exposure shrinks to the ≤ `checkpointEvery`−1
    * batches absorbed after the last save (the same at-least-once
    * granularity as the sink itself). */
  def curationIngest(
      docsStream: DataFrame, textCol: String, idCol: String,
      weights: DataFrame, patterns: Seq[String],
      history: graft.operators.Dedup.PreparedCorpus, seqLen: Long,
      sinkPath: String, checkpointPath: String,
      nBuckets: Int = 4096, jaccardThreshold: Double = 0.8,
      checkpointEvery: Int = 8,
      indexPath: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docsStream.sparkSession
    val w = weights.localCheckpoint(false)
    // rehydrate: a persisted index at indexPath wins over the seed —
    // immediately detached from its parquet files (checkpointed) so the
    // cadenced overwrite-save below never invalidates the live frames
    val seed = indexPath
      .flatMap { p =>
        val loaded =
          try Some(graft.operators.Dedup.loadCorpusIndex(spark, p))
          catch { case _: org.apache.spark.sql.AnalysisException => None }
        loaded.foreach { ix =>
          // a persisted index trained under different band parameters
          // would silently change the screen's semantics mid-pipeline
          require(ix.ngram == history.ngram &&
              ix.numHashes == history.numHashes &&
              ix.bands == history.bands,
            s"curationIngest: persisted index at $p has params " +
              s"(${ix.ngram},${ix.numHashes},${ix.bands}) != the seed's " +
              s"(${history.ngram},${history.numHashes},${history.bands})")
        }
        loaded.map(graft.operators.Dedup.checkpointCorpusIndex)
      }
      .getOrElse(history)
    val index = new java.util.concurrent.atomic.AtomicReference(seed)
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val offset = new java.util.concurrent.atomic.AtomicLong(
      try spark.read.parquet(sinkPath)
        .agg(coalesce(sum(col("piece_tokens")), lit(0L))).head.getLong(0)
      catch { case _: org.apache.spark.sql.AnalysisException => 0L })
    docsStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.toDF()
        val passedQuality = graft.operators.Classifier
          .perceptronScore(b, w, textCol, idCol, nBuckets)
          .filter(col("predicted")).select(col(idCol))
        val blockedIds = graft.operators.TextAnalysis
          .blocklistGate(b, textCol, idCol, patterns)
          .filter(col("blocked"))
          .select(col("doc_id").as(idCol)) // blocklistGate pins "doc_id"
        val gated = b.join(passedQuality, Seq(idCol), "left_semi")
          .join(blockedIds, Seq(idCol), "left_anti")
        val novel = graft.operators.Dedup
          .incrementalDedupPrepared(gated, index.get(), textCol, idCol,
            jaccardThreshold)
          .localCheckpoint(true)
        val absorbed = graft.operators.Dedup
          .updateCorpusIndex(index.get(), novel, textCol, idCol)
        index.set(
          if (gen.incrementAndGet() % checkpointEvery == 0) {
            val ck = graft.operators.Dedup.checkpointCorpusIndex(absorbed)
            // persist on the same cadence: the checkpointed frames are
            // RDD-backed, so overwriting the path is safe even when the
            // seed was loaded from it
            indexPath.foreach(p =>
              graft.operators.Dedup.saveCorpusIndex(ck, p))
            ck
          } else absorbed)
        val counted = novel.select(col(idCol),
          size(split(trim(col(textCol)), "\\s+")).cast("long")
            .as("__n_tokens"))
        graft.operators.Packing
          .packSequences(counted, "__n_tokens", idCol, seqLen,
            baseOffset = offset.get())
          .write.mode("append").parquet(sinkPath)
        val batchTokens = counted
          .agg(coalesce(sum(col("__n_tokens")), lit(0L))).head.getLong(0)
        offset.addAndGet(batchTokens)
        ()
      }
      .start()
  }

  /** Streaming per-batch DATA CARD — q218's streaming twin: every
    * micro-batch of (id, source, text, size) documents emits ONE card
    * row per source into the sink, tagged with the batch id — the
    * live dashboard a curation ingest publishes alongside its output:
    *
    *   - funnel: the trained quality gate
    *     ([[graft.operators.Classifier.perceptronScore]], model
    *     offline), the blocklist, and the near-dup screen against the
    *     caller's static history index
    *     ([[graft.operators.Dedup.incrementalDedupPrepared]]) — per
    *     source the doc/kept counts, token yield, and the screen's
    *     duplicate rate (here "duplicate" means rejected against
    *     HISTORY, the streaming analog of q218's in-corpus clusters);
    *   - drift: per-source exact KS
    *     ([[graft.operators.Stats.ksStatisticByGroup]]) of the
    *     batch's size distribution against a static reference
    *     (one-sided sources carry NULL);
    *   - mixture: the q146 plan over the batch's KEPT token inventory,
    *     PLUS the q221 temperature-scaled plan (p ∝ n^α over the same
    *     per-source kept-token inventory, r18) — the two mixture
    *     strategies a trainer compares, emitted side by side per
    *     batch.
    *
    * Per-batch cost is batch-proportional (gates map-only, the screen
    * probes prepared frames, drift joins the batch against the
    * materialized reference; both plans are driver arithmetic over the
    * per-source inventory). Rows append (batch_id, source, n_docs,
    * n_kept, kept_tokens, token_yield, n_dups, dup_rate, ks_drift,
    * weight_ppm, target_tokens, sample_rate, epochs, temp_s_q,
    * temp_target_tokens, temp_sample_rate, temp_epochs). */
  def dataCardIngest(
      docsStream: DataFrame, textCol: String, idCol: String,
      sourceCol: String, sizeCol: String,
      weights: DataFrame, patterns: Seq[String],
      history: graft.operators.Dedup.PreparedCorpus,
      reference: DataFrame, weightsPpm: Map[String, Long],
      budgetTokens: Long, sinkPath: String, checkpointPath: String,
      nBuckets: Int = 4096, jaccardThreshold: Double = 0.8,
      alphaHalvings: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = weights.localCheckpoint(false)
    val ref = reference.select(col(sourceCol), col(sizeCol))
      .localCheckpoint(false)
    docsStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        dataCardOfBatch(batch.toDF(), textCol, idCol, sourceCol,
          sizeCol, w, patterns, history, ref, weightsPpm, budgetTokens,
          nBuckets, jaccardThreshold, alphaHalvings)
          .select(lit(id).as("batch_id"), col(sourceCol),
            col("n_docs"), col("n_kept"), col("kept_tokens"),
            col("token_yield"), col("n_dups"), col("dup_rate"),
            col("ks_drift"), col("weight_ppm"), col("target_tokens"),
            col("sample_rate"), col("epochs"), col("temp_s_q"),
            col("temp_target_tokens"), col("temp_sample_rate"),
            col("temp_epochs"))
          .write.mode("append").parquet(sinkPath)
      }
      .start()
  }

  /** The per-batch card body of [[dataCardIngest]] — exposed so the
    * spec replays a batch through the identical composition. */
  private[graft] def dataCardOfBatch(
      b: DataFrame, textCol: String, idCol: String, sourceCol: String,
      sizeCol: String, weights: DataFrame, patterns: Seq[String],
      history: graft.operators.Dedup.PreparedCorpus,
      reference: DataFrame, weightsPpm: Map[String, Long],
      budgetTokens: Long, nBuckets: Int,
      jaccardThreshold: Double, alphaHalvings: Int = 1): DataFrame = {
    val passedQ = graft.operators.Classifier
      .perceptronScore(b, weights, textCol, idCol, nBuckets)
      .select(col(idCol), col("predicted"))
    val blockedIds = graft.operators.TextAnalysis
      .blocklistGate(b, textCol, idCol, patterns)
      .select(col("doc_id").as(idCol), col("blocked"))
    val novel = graft.operators.Dedup
      .incrementalDedupPrepared(b, history, textCol, idCol,
        jaccardThreshold)
      .select(col(idCol)).withColumn("__novel", lit(true))
    val flags = b.select(col(idCol), col(sourceCol), col(sizeCol),
        size(split(trim(col(textCol)), "\\s+")).cast("long")
          .as("__tok"))
      .join(passedQ, Seq(idCol))
      .join(blockedIds, Seq(idCol))
      .join(novel, Seq(idCol), "left")
      .withColumn("__dup", !coalesce(col("__novel"), lit(false)))
      .withColumn("__kept",
        col("predicted") && !col("blocked") && !col("__dup"))
    val funnel = flags.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("__tok")).as("total_tokens"),
        sum(when(col("__kept"), col("__tok")).otherwise(0L))
          .as("kept_tokens"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dups"))
    val drift = graft.operators.Stats.ksStatisticByGroup(
        b.select(col(sourceCol), col(sizeCol))
          .withColumn("__a", lit(true))
          .unionByName(reference.select(col(sourceCol), col(sizeCol))
            .withColumn("__a", lit(false))),
        sourceCol, col("__a"), sizeCol)
      .select(col(sourceCol), col("ks").as("ks_drift"))
    val plan = graft.operators.Sampling.mixturePlan(
        funnel.select(col(sourceCol), col("kept_tokens")),
        sourceCol, "kept_tokens", weightsPpm, budgetTokens)
      .select(col(sourceCol), col("weight_ppm"), col("target_tokens"),
        col("sample_rate"), col("epochs"))
    // the q221 temperature form over the SAME per-source kept-token
    // inventory — per-batch, like every other card column (r18)
    val tplan = graft.operators.Sampling.temperaturePlan(
        funnel.select(col(sourceCol), col("kept_tokens")),
        sourceCol, "kept_tokens", budgetTokens, alphaHalvings)
      .select(col(sourceCol), col("s_q").as("temp_s_q"),
        col("target_tokens").as("temp_target_tokens"),
        col("sample_rate").as("temp_sample_rate"),
        col("epochs").as("temp_epochs"))
    funnel.join(drift, Seq(sourceCol), "left")
      .join(broadcast(plan), Seq(sourceCol))
      .join(broadcast(tplan), Seq(sourceCol))
      .select(col(sourceCol), col("n_docs"), col("n_kept"),
        col("kept_tokens"),
        (col("kept_tokens").cast("double") /
          col("total_tokens").cast("double")).as("token_yield"),
        col("n_dups"),
        (col("n_dups").cast("double") / col("n_docs").cast("double"))
          .as("dup_rate"),
        col("ks_drift"), col("weight_ppm"), col("target_tokens"),
        col("sample_rate"), col("epochs"), col("temp_s_q"),
        col("temp_target_tokens"), col("temp_sample_rate"),
        col("temp_epochs"))
  }

  /** Streaming Gopher repetition gate — q223's streaming twin (r18):
    * each micro-batch of (id, text) documents gets the FULL
    * 13-fraction repetition report
    * ([[graft.operators.TextAnalysis.gopherRepetitionReport]] — per-doc
    * hash-aggs and per-doc windows, so the per-batch cost is
    * batch-proportional by construction) and ALL rows land with their
    * `repetition_pass` verdict — the [[calibratedGateIngest]]
    * convention: the sink doubles as the repetition-drift dashboard
    * (a rising fail rate is the boilerplate-flood alarm). */
  def repetitionGateIngest(
      docsStream: DataFrame, textCol: String, idCol: String,
      sinkPath: String, checkpointPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.TextAnalysis
          .gopherRepetitionReport(batch.toDF(), textCol, idCol)
          .write.mode("append").parquet(sinkPath)
        ()
      }
      .start()

  /** Streaming Kneser–Ney LM gate — q188's streaming twin: the KN
    * trigram model is trained ONCE on the static reference
    * ([[graft.operators.TextAnalysis.knTrigramModel]], every count
    * table materialized at query start — the [[phashGateIngest]]
    * boundary); each micro-batch of documents is scored against it
    * ([[graft.operators.TextAnalysis.knTrigramScore]]) and gated by a
    * FIXED kn_mean threshold. The corpus-relative tercile of the batch
    * gate becomes a constant cutoff here — exactly how CCNet deploys
    * its LM filter in production: thresholds derived offline from a
    * reference run, applied per document at ingest. Rows below the
    * cutoff are dropped; survivors append (id, n_trigrams, kn_sum,
    * kn_mean). Per-batch cost is batch-proportional: exploded batch
    * trigrams join the static model tables; nothing corpus-shaped
    * recomputes. */
  def knGateIngest(
      docsStream: DataFrame, reference: DataFrame,
      textCol: String, idCol: String, minKnMean: Double,
      sinkPath: String, checkpointPath: String,
      quant: Long = 1000000L): org.apache.spark.sql.streaming.StreamingQuery = {
    val model = graft.operators.TextAnalysis
      .knTrigramModel(reference, textCol).materialized
    docsStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.TextAnalysis
          .knTrigramScore(batch.toDF(), model, textCol, idCol, quant)
          .filter(col("kn_mean") >= minKnMean)
          .write.mode("append").parquet(sinkPath)
      }
      .start()
  }

  /** Streaming Moore–Lewis selection gate — q203's streaming twin:
    * BOTH Kneser–Ney models (in-domain and general) are trained ONCE
    * on their static references and materialized at query start; each
    * micro-batch is scored against both
    * ([[graft.operators.TextAnalysis.knTrigramScore]] twice — the
    * same trigram explode shape, so the batch pays two static-table
    * join passes) and only docs whose quantized score difference
    * clears `minDiff` (0 = the classic "in-domain likelier" rule)
    * reach the sink with (id, n_trigrams, kn_in, kn_gen, ml_diff)
    * attached. The targeted-selection deployment shape: models
    * offline, cross-entropy-difference gate at ingest. */
  def mooreLewisIngest(
      docsStream: DataFrame, refInDomain: DataFrame,
      refGeneral: DataFrame, textCol: String, idCol: String,
      sinkPath: String, checkpointPath: String, minDiff: Long = 0L,
      quant: Long = 1000000L): org.apache.spark.sql.streaming.StreamingQuery = {
    val mIn = graft.operators.TextAnalysis
      .knTrigramModel(refInDomain, textCol).materialized
    val mGen = graft.operators.TextAnalysis
      .knTrigramModel(refGeneral, textCol).materialized
    docsStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.toDF()
        val sIn = graft.operators.TextAnalysis
          .knTrigramScore(b, mIn, textCol, idCol, quant)
          .select(col(idCol), col("n_trigrams"),
            col("kn_sum").as("kn_in"))
        val sGen = graft.operators.TextAnalysis
          .knTrigramScore(b, mGen, textCol, idCol, quant)
          .select(col(idCol), col("kn_sum").as("kn_gen"))
        sIn.join(sGen, Seq(idCol))
          .select(col(idCol), col("n_trigrams"), col("kn_in"),
            col("kn_gen"),
            (col("kn_in") - col("kn_gen")).as("ml_diff"))
          .filter(col("ml_diff") > minDiff)
          .write.mode("append").parquet(sinkPath)
      }
      .start()
  }

  /** Streaming distribution-drift monitor — q206's streaming twin:
    * every micro-batch's empirical distribution of `valueCol` is
    * KS-tested against a STATIC reference corpus
    * ([[graft.operators.Stats.ksStatistic]] — exact integer ECDF-gap
    * numerator, one portable double divide) and the sink accumulates
    * one row per batch: (batch_id, n_a, n_b, at_value, d_num, ks,
    * drifted). The ingest-monitoring deployment shape: reference
    * profile offline, per-batch drift alarm at ingest — the numeric
    * companion of the χ² [[graft.operators.Stats.tokenDrift]].
    * Batches are tested INDEPENDENTLY (each batch is one sample), so
    * restarts re-test only unprocessed batches; `minKs` is the alarm
    * threshold on the [0,1] statistic. */
  def driftMonitorIngest(
      stream: DataFrame, reference: DataFrame, valueCol: String,
      sinkPath: String, checkpointPath: String,
      minKs: Double = 0.2): org.apache.spark.sql.streaming.StreamingQuery = {
    val ref = reference.select(col(valueCol)).localCheckpoint(false)
    stream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val b = batch.toDF()
        if (!b.isEmpty)
          graft.operators.Stats.ksStatistic(b, ref, valueCol)
            .select(lit(id).as("batch_id"), col("n_a"), col("n_b"),
              col("at_value"), col("d_num"), col("ks"),
              (col("ks") > minKs).as("drifted"))
            .write.mode("append").parquet(sinkPath)
      }
      .start()
  }

  /** Streaming model-quality monitor — q210's streaming twin: each
    * micro-batch of (score, label) pairs gets its EXACT ROC-AUC
    * ([[graft.operators.Classifier.aucExact]] — Mann–Whitney 2·U as
    * exact BIGINT, one portable divide) appended to the sink as
    * (batch_id, n_pos, n_neg, u2_num, auc, degraded). The
    * filter-regression alarm at ingest: a quality filter whose
    * live-labeled AUC drops under `minAuc` has drifted off its
    * training distribution and needs retraining — the eval-family
    * companion of [[driftMonitorIngest]]. Batches missing a class are
    * skipped (no second ECDF — the [[graft.operators.Stats]] KS
    * contract applied to AUC). */
  def evalMonitorIngest(
      stream: DataFrame, scoreCol: String, labelCol: String,
      sinkPath: String, checkpointPath: String,
      minAuc: Double = 0.8): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val b = batch.toDF()
        val twoSided = b
          .select((col(labelCol).cast("long") > 0).as("__p"))
          .agg(sum(when(col("__p"), 1L).otherwise(0L)).as("np"),
            sum(when(!col("__p"), 1L).otherwise(0L)).as("nn"))
          .head()
        if (twoSided.getLong(0) > 0 && twoSided.getLong(1) > 0)
          graft.operators.Classifier.aucExact(b, scoreCol, labelCol)
            .select(lit(id).as("batch_id"), col("n_pos"), col("n_neg"),
              col("u2_num"), col("auc"),
              (col("auc") < minAuc).as("degraded"))
            .write.mode("append").parquet(sinkPath)
      }
      .start()

  /** Streaming perceptron quality gate — q190's streaming twin: the
    * (bucket, weight) model is trained ONCE offline
    * ([[graft.operators.Classifier.perceptronTrain]] — or loaded from
    * a persisted artifact) and each micro-batch of documents is scored
    * against the materialized table
    * ([[graft.operators.Classifier.perceptronScore]]); only docs the
    * model accepts (score > 0, the sign decision) reach the sink, with
    * their scores attached. The fastText-filter deployment shape:
    * train offline, gate at ingest. Per-batch cost is one
    * feature-explode + bucket-key join against the static weights. */
  def perceptronGateIngest(
      docsStream: DataFrame, weights: DataFrame,
      textCol: String, idCol: String,
      sinkPath: String, checkpointPath: String,
      nBuckets: Int = 4096): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = weights.localCheckpoint(false)
    docsStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Classifier
          .perceptronScore(batch.toDF(), w, textCol, idCol, nBuckets)
          .filter(col("predicted"))
          .write.mode("append").parquet(sinkPath)
      }
      .start()
  }

  /** Streaming CALIBRATED quality gate — the q190→q215 chain as one
    * serving shape (the gate a production curation pipeline actually
    * runs): the perceptron scores each micro-batch against the static
    * weight table, the isotonic calibrator (fitted offline on the
    * score's reliability bins, typically
    * [[graft.operators.Classifier.trainOrLoadCalibrator]]-persisted)
    * turns the raw integer margin into a calibrated probability via
    * the step-function lookup
    * ([[graft.operators.Classifier.calibrateScores]] — interior gap
    * bins take the greatest trained bin below; scores under the lowest
    * trained bin clamp up to it), and the decision is `cal_rate >=
    * minProb` — a threshold with OPERATIONAL meaning ("estimated
    * P(keep-worthy) ≥ 0.9"), unlike the raw margin sign. ALL rows land
    * in the sink with their verdict (id, score, cal_rate, passed), so
    * the sink doubles as the monitoring stream: a batch whose pass
    * rate collapses is the drift alarm. Per-batch cost is one
    * feature-explode + bucket join + broadcast bin lookup. */
  def calibratedGateIngest(
      docsStream: DataFrame, weights: DataFrame, calibrator: DataFrame,
      textCol: String, idCol: String, binWidth: Long, minProb: Double,
      sinkPath: String, checkpointPath: String,
      nBuckets: Int = 4096): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = weights.localCheckpoint(false)
    val cal = calibrator.localCheckpoint(false)
    docsStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val scored = graft.operators.Classifier
          .perceptronScore(batch.toDF(), w, textCol, idCol, nBuckets)
        graft.operators.Classifier
          .calibrateScores(scored, cal, "score", binWidth)
          .select(col(idCol), col("score"), col("cal_rate"),
            (col("cal_rate") >= minProb).as("passed"))
          .write.mode("append").parquet(sinkPath)
      }
      .start()
  }

  /** Calibrated multiclass ROUTER — [[multiclassTagIngest]] with the
    * argmax margin calibrated to a CONFIDENCE before routing: the
    * caller fits the calibrator on (argmax score, prediction-correct)
    * reliability bins ([[graft.operators.Classifier.calibrationBins]]
    * over a labeled holdout → [[graft.operators.Classifier
    * .isotonicCalibrate]]), and each micro-batch's docs route to their
    * predicted class only when the calibrated P(correct) clears
    * `minProb` — low-confidence docs land with `routed = false`, the
    * review lane of a production router. Rows append
    * (id, predicted, score, cal_rate, routed). */
  def calibratedTagIngest(
      docsStream: DataFrame, weights: DataFrame, calibrator: DataFrame,
      textCol: String, idCol: String, binWidth: Long, minProb: Double,
      sinkPath: String, checkpointPath: String,
      nBuckets: Int = 4096): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = weights.localCheckpoint(false)
    val cal = calibrator.localCheckpoint(false)
    docsStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val scored = graft.operators.Classifier
          .perceptronScoreMulti(batch.toDF(), w, textCol, idCol, nBuckets)
        graft.operators.Classifier
          .calibrateScores(scored, cal, "score", binWidth)
          .select(col(idCol), col("predicted"), col("score"),
            col("cal_rate"), (col("cal_rate") >= minProb).as("routed"))
          .write.mode("append").parquet(sinkPath)
      }
      .start()
  }

  /** Streaming multiclass router — q199's streaming twin: a
    * [[graft.operators.Classifier.perceptronTrainMulti]] table
    * (trained offline, typically
    * [[graft.operators.Classifier.trainOrLoadWeights]]-style persisted)
    * tags each micro-batch's docs with the argmax class
    * ([[graft.operators.Classifier.perceptronScoreMulti]], same
    * deterministic (score DESC, label ASC) tie-break as the batch
    * path) — the language/domain ROUTER in front of per-class
    * downstream pipelines. All K classes score in one batch-
    * proportional join; rows append (id, predicted, score). */
  def multiclassTagIngest(
      docsStream: DataFrame, weights: DataFrame,
      textCol: String, idCol: String,
      sinkPath: String, checkpointPath: String,
      nBuckets: Int = 4096): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = weights.localCheckpoint(false)
    docsStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Classifier
          .perceptronScoreMulti(batch.toDF(), w, textCol, idCol, nBuckets)
          .write.mode("append").parquet(sinkPath)
      }
      .start()
  }

  /** Streaming hybrid retrieval — q191's streaming twin: each
    * micro-batch of query docs (id, text, embedding) is served against
    * a STATIC corpus both ways — its top-`qTerms` terms (by tf, the
    * MoreLikeThis cap) through the fixed-point BM25 top-k and its
    * vector through the beam loop over the persisted backbone — and
    * the exact-integer RRF fuses the two rankings per batch. The
    * corpus-side frames (documents, graph, embeddings) are the
    * caller's static tables (typically [[graft.operators.Ann
    * .trainOrLoadKnnGraph]] for the graph); per-batch cost is
    * query-proportional on both paths (BM25 prunes the corpus scan by
    * the batch's term set; the beam inherits the q183 contract). */
  def hybridServeIngest(
      queryStream: DataFrame, corpusDocs: DataFrame, graph: DataFrame,
      corpusEmb: DataFrame, textCol: String, idCol: String,
      docIdCol: String, vecCol: String, k: Int, ef: Int, maxRounds: Int,
      sinkPath: String, checkpointPath: String, qTerms: Int = 8,
      rrfK: Int = 60,
      scale: Int = 1000): org.apache.spark.sql.streaming.StreamingQuery = {
    // BM25 serves from the inverted-index snapshot, built ONCE at query
    // start (each frame checkpointed — the knGateIngest boundary; pass
    // a trainOrLoadBm25Index artifact upstream to skip even this): a
    // micro-batch pays a postings probe pruned by its own term set,
    // never a corpus re-tokenization
    val ixRaw = graft.operators.TextAnalysis
      .bm25Index(corpusDocs, textCol, docIdCol)
    val ix = graft.operators.TextAnalysis.Bm25Index(
      ixRaw.postings.localCheckpoint(false),
      ixRaw.termDf.localCheckpoint(false),
      ixRaw.stats.localCheckpoint(false))
    queryStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.toDF()
        val queryTerms = b
          .select(col(idCol).as("query_id"),
            explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
          .filter(col("term") =!= "")
          .groupBy(col("query_id"), col("term"))
          .agg(count(lit(1)).as("__tf"))
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("query_id"))
              .orderBy(col("__tf").desc, col("term").asc)))
          .filter(col("__rn") <= qTerms)
          .select(col("query_id"), col("term"))
        val bm25 = graft.operators.TextAnalysis
          .bm25FixedPointTopKFromIndex(ix, queryTerms, k)
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("query_id"))
              .orderBy(col("score_q").desc,
                col("doc_id").cast("string").asc)).cast("long"))
          .select(col("query_id"), col("doc_id"), col("rank"))
        val ann = graft.operators.Ann
          .beamSearchPortable(graph, corpusEmb, b, vecCol, idCol, k,
            ef, maxRounds, scale = scale)
          .select(col("id").as("query_id"),
            col("neighbor_id").as("doc_id"), col("rank"))
        graft.operators.TextAnalysis
          .reciprocalRankFusion(Seq(bm25, ann), "query_id", "doc_id",
            "rank", rrfK, k)
          .write.mode("append").parquet(sinkPath)
      }
      .start()
  }

  /** Streaming CDC — the continuous form of
    * [[graft.operators.Scd.snapshotDiff]], completing the
    * batch/streaming twin convention for the CDC primitive the SCD2
    * family builds on: each micro-batch of keyed after-image rows is
    * classified against the static before snapshot with the SAME
    * null-safe comparison ([[graft.operators.Scd.upsertDiff]] — the
    * batch operator applied per micro-batch via `foreachBatch`, the
    * [[dedupedIngest]] boundary) and the per-key delta rows
    * (`added` / `changed` / `unchanged`) append to the sink. `removed`
    * is undecidable batch-locally (a key absent from this batch may
    * arrive in the next); once the stream's key universe is complete,
    * [[graft.operators.Scd.removedKeys]] is the one-anti-join sweep,
    * and per-batch union + sweep ≡ one-shot `snapshotDiff`
    * (spec-pinned). Per-batch cost is batch-proportional: the batch
    * side broadcasts, the before snapshot is scanned, never shuffled.
    *
    * Returns the started query; delta rows append to `sinkPath`. */
  def cdcIngest(
      afterStream: DataFrame, before: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String],
      sinkPath: String, checkpointPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    afterStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Scd
          .upsertDiff(before, batch.toDF(), keyCols, compareCols)
          .write.mode("append").parquet(sinkPath)
      }
      .start()

  /** Streaming record linkage — the continuous-ingestion form of
    * [[graft.operators.Linkage.scoreAgainstReference]]: each micro-batch
    * of incoming records is blocked against the static reference and
    * scored with a PRE-CALIBRATED Fellegi–Sunter model (estimate
    * weights once — [[graft.operators.Linkage.estimateWeightsEM]] or
    * the gold-based estimator — before the query starts; scoring
    * itself is joins + a pure map, so it streams). Only pairs at or
    * above the decision threshold reach the sink. Same `foreachBatch`
    * boundary as [[dedupedIngest]]: the model is driver state the
    * incremental query can't re-derive, the per-batch probe is
    * batch-proportional. */
  def linkageIngest(
      recordStream: DataFrame, reference: DataFrame,
      idCol: String, blockCol: String, fields: Seq[String],
      weights: Map[String, (Double, Double)], threshold: Double,
      sinkPath: String, checkpointPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    recordStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Linkage
          .scoreAgainstReference(batch.toDF(), reference, idCol, blockCol,
            fields, weights, threshold)
          .filter(col("is_match"))
          .write.mode("append").parquet(sinkPath)
      }
      .start()

  /** Event-time variant of [[linkageIngest]]: incoming records carry an
    * event-time column, and the stream is screened with a watermark +
    * `dropDuplicatesWithinWatermark` on the record id BEFORE scoring —
    * so (a) a replayed record (at-least-once sources re-deliver) is
    * suppressed while its id is within the watermark horizon, and (b) a
    * record arriving later than the watermark allows is dropped by the
    * stateful operator rather than re-scored — the exactly-once-ish
    * ingest contract a linkage sink needs (double-scoring a record
    * would duplicate match rows downstream). State is one fingerprint
    * per id bounded by the watermark horizon, never stream-lifetime.
    *
    * Requires the NTZ-tolerant source normalization
    * ([[graft.Tables.normalizeTs]]): watermarks reject TIMESTAMP_NTZ. */
  def linkageIngestEventTime(
      recordStream: DataFrame, reference: DataFrame,
      idCol: String, blockCol: String, fields: Seq[String],
      weights: Map[String, (Double, Double)], threshold: Double,
      sinkPath: String, checkpointPath: String,
      tsCol: String = "ts", watermark: String = "10 minutes")
      : org.apache.spark.sql.streaming.StreamingQuery =
    recordStream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq(idCol))
      .writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Linkage
          .scoreAgainstReference(batch.toDF(), reference, idCol, blockCol,
            fields, weights, threshold)
          .filter(col("is_match"))
          .write.mode("append").parquet(sinkPath)
      }
      .start()

  /** Stream-stream interval join: every `trigger` event is matched to
    * the same user's `outcome` events that land within `maxLag` after it
    * — the funnel/attribution correlation shape, continuously. Both
    * sides carry a watermark and the join condition bounds event time on
    * both ends, which is exactly what Structured Streaming needs to
    * evict join state: a trigger row can be dropped once the outcome
    * watermark passes trigger_ts + maxLag. Without the range condition
    * the state store would grow without bound — the 100 TB streaming
    * failure mode.
    *
    * On batch frames the watermarks are no-ops and this degenerates to a
    * plain interval join, so the same code serves backfill and live —
    * the spec asserts that equivalence. */
  def correlateStreams(trigger: DataFrame, outcome: DataFrame,
      maxLag: String = "10 minutes",
      watermark: String = "20 minutes"): DataFrame = {
    val t = trigger.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("trigger_id"),
        col("ts").as("trigger_ts"), col("event_type").as("trigger_type"))
    val o = outcome.withWatermark("ts", watermark)
      .select(col("user_id").as("__ou"), col("event_id").as("outcome_id"),
        col("ts").as("outcome_ts"), col("event_type").as("outcome_type"))
    t.join(o,
        col("user_id") === col("__ou") &&
          col("outcome_ts") >= col("trigger_ts") &&
          col("outcome_ts") <= col("trigger_ts") + expr(s"INTERVAL $maxLag"))
      .select(col("user_id"), col("trigger_id"), col("trigger_type"),
        col("outcome_id"), col("outcome_type"),
        (col("outcome_ts").cast("long") - col("trigger_ts").cast("long"))
          .as("lag_sec"))
  }

  /** Left-outer [[correlateStreams]]: triggers with NO outcome inside
    * `maxLag` still emit — with NULL outcome columns — once the outcome
    * watermark passes `trigger_ts + maxLag` and Spark can prove no
    * match is coming. The abandonment half of the funnel (who clicked
    * and never bought), which the inner join silently drops. Same
    * state-eviction bound as the inner form: both sides watermarked,
    * the join condition bounds event time on both ends.
    *
    * On batch frames this degenerates to a plain left-outer interval
    * join (watermarks are no-ops, nothing is withheld), so the same
    * code serves backfill and live — the spec asserts that equivalence
    * and the streaming null-emission timing. */
  def correlateStreamsOuter(trigger: DataFrame, outcome: DataFrame,
      maxLag: String = "10 minutes",
      watermark: String = "20 minutes"): DataFrame = {
    val t = trigger.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("trigger_id"),
        col("ts").as("trigger_ts"), col("event_type").as("trigger_type"))
    val o = outcome.withWatermark("ts", watermark)
      .select(col("user_id").as("__ou"), col("event_id").as("outcome_id"),
        col("ts").as("outcome_ts"), col("event_type").as("outcome_type"))
    t.join(o,
        col("user_id") === col("__ou") &&
          col("outcome_ts") >= col("trigger_ts") &&
          col("outcome_ts") <= col("trigger_ts") + expr(s"INTERVAL $maxLag"),
        "left_outer")
      .select(col("user_id"), col("trigger_id"), col("trigger_type"),
        col("outcome_id"), col("outcome_type"),
        (col("outcome_ts").cast("long") - col("trigger_ts").cast("long"))
          .as("lag_sec"))
  }

  /** Exact streaming dedup with bounded state:
    * `dropDuplicatesWithinWatermark` keeps a key's fingerprint only
    * until the watermark passes it, so duplicate events arriving within
    * the window are suppressed while state stays proportional to the
    * watermark horizon, not the stream's lifetime — the streaming twin
    * of the batch exact dedup ([[graft.operators.Dedup.exactDedup]]). */
  def dedupWithinWatermark(events: DataFrame,
      keys: Seq[String] = Seq("event_id"),
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  final case class SpendState(total: Double, nEvents: Long, alerted: Long)
  final case class SpendAlert(user_id: Long, new_multiples: Long,
      total_value: Double, n_events: Long)

  /** Arbitrary stateful processing v2 (`transformWithState`,
    * Spark 4.x): a per-user cumulative-spend monitor that emits one
    * alert row each time a user's running `value` total crosses further
    * multiples of `threshold`. The `ValueState` (total, event count,
    * multiples already reported) lives in the state store across
    * micro-batches — exactly what the older `mapGroupsWithState`
    * sessionizer could express, but with the v2 API's typed state
    * handles and TTL hooks.
    *
    * `new_multiples` makes the contract batch-boundary independent:
    * Σ new_multiples over a user's alerts == floor(grand_total /
    * threshold) no matter how the stream was chopped into batches —
    * which is what the spec asserts against a plain batch aggregation.
    * State is one small fixed-size record per user, the streaming
    * bound that matters at scale. */
  class CumulativeSpendMonitor(threshold: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, SpendAlert] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[SpendState] = _
    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[SpendState]("spend",
        org.apache.spark.sql.Encoders.product[SpendState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SpendAlert] = {
      val prev = Option(st.get()).getOrElse(SpendState(0.0, 0L, 0L))
      var total = prev.total
      var n = prev.nEvents
      rows.foreach { e => total += e.value; n += 1 }
      val crossed = math.floor(total / threshold).toLong
      val fresh = crossed - prev.alerted
      st.update(SpendState(total, n, math.max(crossed, prev.alerted)))
      if (fresh > 0) Iterator.single(SpendAlert(key, fresh, total, n))
      else Iterator.empty
    }
  }

  private final case class TimedSession(n: Long, total: Double,
      startMs: Long, endMs: Long, timerMs: Long)

  /** Event-time sessionization with CLOSED sessions (`transformWithState`
    * + `TimeMode.EventTime` + timers) — what neither the declarative
    * `session_window` nor the `mapGroupsWithState` fold can express: a
    * session EMITS exactly once, as a final summary, when the WATERMARK
    * passes its end + gap (no more in-order data can extend it) — the
    * shape a downstream consumer wants when each session must be acted
    * on exactly once (billing, abuse scoring, funnel export).
    *
    * Mechanics: rows fold into per-user `ValueState`; every update
    * re-registers ONE event-time timer at `session_end + gap` (the
    * previous timer is deleted — never more than one live timer per
    * user). A row arriving beyond the gap closes the current session
    * inline and starts a fresh one; the timer handles the "no further
    * rows" close. Within a micro-batch Spark runs input first, then
    * expired timers, and both paths guard on state presence, so a
    * session is emitted exactly once regardless of which path closes
    * it. State per user is one fixed-size record + one timer — the
    * bounded-state contract; late rows are dropped by the watermark
    * BEFORE reaching the processor. */
  class EventTimeSessionizer(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, SessionSummary] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[TimedSession] = _
    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[TimedSession]("session",
        org.apache.spark.sql.Encoders.product[TimedSession],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    private def summary(userId: Long, s: TimedSession): SessionSummary =
      SessionSummary(userId, s.n, s.total,
        new java.sql.Timestamp(s.startMs),
        new java.sql.Timestamp(s.endMs), closed = true)
    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SessionSummary] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      if (sorted.isEmpty) return Iterator.empty
      val closed = scala.collection.mutable.ArrayBuffer
        .empty[SessionSummary]
      var cur = Option(st.get())
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.endMs > gapMs =>
            closed += summary(userId, s)
            if (s.timerMs > 0) getHandle.deleteTimer(s.timerMs)
            cur = Some(TimedSession(1L, e.value, t, t, 0L))
          case Some(s) =>
            cur = Some(TimedSession(s.n + 1, s.total + e.value,
              math.min(s.startMs, t), math.max(s.endMs, t), s.timerMs))
          case None =>
            cur = Some(TimedSession(1L, e.value, t, t, 0L))
        }
      }
      val s = cur.get
      if (s.timerMs > 0) getHandle.deleteTimer(s.timerMs)
      val timer = s.endMs + gapMs
      getHandle.registerTimer(timer)
      st.update(s.copy(timerMs = timer))
      closed.iterator
    }
    override def handleExpiredTimer(userId: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[SessionSummary] = {
      val s = st.get()
      // a stale timer (already superseded by a later registration, or
      // state already closed) must be a no-op
      if (s == null || s.timerMs != expiredTimerInfo.getExpiryTimeInMs)
        Iterator.empty
      else {
        st.clear()
        Iterator.single(summary(userId, s))
      }
    }
  }

  /** Closed-session stream per user — see [[EventTimeSessionizer]].
    * Applies the watermark (required by `TimeMode.EventTime`) and keys
    * by user. Same RocksDB state-store requirement as [[spendAlerts]]. */
  def sessionizeEventTime(events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "10 minutes"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF().withWatermark("ts", watermark).as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new EventTimeSessionizer(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Stream of threshold-crossing alerts per user — see
    * [[CumulativeSpendMonitor]]. Requires the RocksDB state store
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`): transformWithState keeps
    * each state variable in its own column family, which the default
    * HDFS-backed store doesn't support. */
  def spendAlerts(events: Dataset[Event], threshold: Double)
      : Dataset[SpendAlert] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new CumulativeSpendMonitor(threshold),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** Wire a parquet-backed stream with the events schema (used by tests:
    * one-file-per-trigger batch drive via memory sink). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    // normalize ts to TimestampType (nanos-as-long AND TIMESTAMP_NTZ
    // writer annotations) exactly as the batch entry point does —
    // watermarks reject NTZ outright, so this is load-bearing for every
    // event-time operator above
    graft.Tables.normalizeTs(raw)
  }
}
