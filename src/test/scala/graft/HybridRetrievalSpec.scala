package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hybrid retrieval (q191): the BM25 ⊕ ANN ⊕ RRF composition on the
  * sf0.01 split — both signals must actually shape the fused list,
  * and the fused ranking must obey the RRF contract. */
class HybridRetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.01"

  test("both rankings contribute: fused list contains items only one " +
      "side ranked, per-query depth respected, ranks contiguous") {
    val out = SparkEntry.queries("q191_hybrid_retrieval")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_._1)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length <= 8, s"query $q returned ${rows.length} > k")
      val ranks = rows.map(_._4).sorted.toSeq
      assert(ranks == (1L to rows.length).toSeq,
        s"query $q ranks not contiguous: $ranks")
      // rrf_q strictly ordered along fused_rank (ties broken by id,
      // so rrf_q itself is non-increasing)
      val byRank = rows.sortBy(_._4).map(_._3).toSeq
      assert(byRank == byRank.sorted.reverse,
        s"query $q rrf_q not non-increasing along fused_rank")
    }
    // a doc ranked by only ONE source scores at most 2^40/(60+1); a doc
    // ranked #1 by BOTH scores ~2*that. Assert the corpus produces both
    // single-source and double-source survivors — i.e. neither signal
    // is subsumed by the other.
    val single = (1L << 40) / 61
    assert(out.exists(_._3 > single),
      "no fused item carried contributions from both rankings")
    assert(out.exists(_._3 <= single),
      "every fused item came from both rankings — suspicious overlap")
  }

  test("streaming twin: per-batch hybrid serving over static corpus + " +
      "backbone == the batch q191 composition, batch for batch") {
    import spark.implicits._
    val p152 = SketchParams.q152
    val p = SketchParams.q157
    val docs = Tables.load(spark, dir, "documents")
    val emb = Tables.load(spark, dir, "embeddings")
    val old = emb.filter(col("vec_id") % p.batchMod =!= 0)
    val corpusDocs = docs.join(old.select(col("vec_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val graph = graft.operators.Ann.nnDescentPortable(old, "embedding",
      "vec_id", p152.k, p152.rounds, p152.scale).localCheckpoint(false)
    // two micro-batches of query docs (text + embedding joined)
    val queryDocs = emb.filter(col("vec_id") % p.batchMod === 0)
      .join(docs.select(col("doc_id").as("vec_id"), col("text")),
        Seq("vec_id"))
      .select(col("vec_id"), col("text"), col("embedding"))
    val (b1, b2) = {
      val all = queryDocs.orderBy("vec_id").collect()
      (all.take(5), all.drop(5).take(5))
    }
    val schema = queryDocs.schema
    val inDir = java.nio.file.Files.createTempDirectory("hyb-in")
    val sink = java.nio.file.Files
      .createTempDirectory("hyb-out").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("hyb-ck").toString
    spark.createDataFrame(java.util.Arrays.asList(b1: _*), schema)
      .coalesce(1).write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream.schema(schema)
      .parquet(inDir.toString + "/*")
    val q = graft.streaming.EventStreams.hybridServeIngest(stream,
      corpusDocs, graph, old, "text", "vec_id", "doc_id", "embedding",
      k = 8, ef = 8, maxRounds = 1, sink, ckpt)
    try {
      q.processAllAvailable()
      spark.createDataFrame(java.util.Arrays.asList(b2: _*), schema)
        .coalesce(1).write.parquet(inDir.resolve("b2").toString)
      q.processAllAvailable()
      val streamed = spark.read.parquet(sink)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      // batch reference: run the same composition per batch (RRF and
      // BM25 stats are query-local, so per-batch == per-query)
      def reference(rows: Array[org.apache.spark.sql.Row]) = {
        val b = spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), schema)
        val qt = b.select(col("vec_id").as("query_id"),
            explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
          .filter(col("term") =!= "")
          .groupBy(col("query_id"), col("term"))
          .agg(count(lit(1)).as("__tf"))
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("query_id"))
              .orderBy(col("__tf").desc, col("term").asc)))
          .filter(col("__rn") <= 8).select("query_id", "term")
        val bm = graft.operators.TextAnalysis
          .bm25FixedPointTopK(corpusDocs, "text", "doc_id", qt, 8)
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("query_id"))
              .orderBy(col("score_q").desc,
                col("doc_id").cast("string").asc)).cast("long"))
          .select(col("query_id"), col("doc_id"), col("rank"))
        val ann = graft.operators.Ann.beamSearchPortable(graph, old, b,
            "embedding", "vec_id", 8, 8, 1, scale = p152.scale)
          .select(col("id").as("query_id"),
            col("neighbor_id").as("doc_id"), col("rank"))
        graft.operators.TextAnalysis.reciprocalRankFusion(
            Seq(bm, ann), "query_id", "doc_id", "rank", 60, 8)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
      }
      assert(streamed == reference(b1) ++ reference(b2),
        "streamed hybrid serving diverged from the batch composition")
    } finally q.stop()
  }
}
