package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** MaxSim late-interaction scoring against hand-computed integer sums.
  *
  * Hand case (levels = 10, all coordinates exactly representable):
  *   doc 1 chunks (1.0, 0.0), (0.0, 1.0); docs 2/3 one chunk (0.5, 0.5)
  *   query 7 tokens t1 = (1.0, 0.0), t2 = (0.0, 1.0)
  * Quantized: (10,0), (0,10), (5,5).
  *   t1: max dot doc1 = 100 (chunk 1), docs 2/3 = 50
  *   t2: max dot doc1 = 100 (chunk 2), docs 2/3 = 50
  *   scores: doc1 = 200, doc2 = doc3 = 100 (a tie).
  */
class MaxSimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def chunks = Seq(
    (1L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
    (2L, Seq(0.5f, 0.5f)), (3L, Seq(0.5f, 0.5f))
  ).toDF("doc", "vec")

  private def qtoks = Seq(
    (7L, 0L, Seq(1.0f, 0.0f)), (7L, 1L, Seq(0.0f, 1.0f))
  ).toDF("qid", "tok", "vec")

  test("maxSimTopK reproduces the hand-computed MaxSim sums and ranks") {
    val out = Ann.maxSimTopK(chunks, "doc", "vec", qtoks, "qid", "tok",
        "vec", k = 3, levels = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((7L, 1L, 1L, 200L), (7L, 2L, 2L, 100L),
      (7L, 3L, 3L, 100L)))
  }

  test("k bounds the per-query output") {
    val out = Ann.maxSimTopK(chunks, "doc", "vec", qtoks, "qid", "tok",
        "vec", k = 1, levels = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((7L, 1L, 1L, 200L)))
  }

  test("score ties break by the doc id AS A STRING (the BottomK total " +
      "order: '10' sorts before '9')") {
    val c = Seq((9L, Seq(0.5f, 0.5f)), (10L, Seq(0.5f, 0.5f)))
      .toDF("doc", "vec")
    val q = Seq((1L, 0L, Seq(1.0f, 0.0f))).toDF("qid", "tok", "vec")
    val out = Ann.maxSimTopK(c, "doc", "vec", q, "qid", "tok", "vec",
        k = 2, levels = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 10L, 1L, 50L), (1L, 9L, 2L, 50L)))
  }

  test("repeated identical query tokens score independently (MaxSim " +
      "semantics: the sum is over TOKENS, not distinct vectors)") {
    val q2 = Seq((7L, 0L, Seq(1.0f, 0.0f)), (7L, 1L, Seq(1.0f, 0.0f)))
      .toDF("qid", "tok", "vec")
    val out = Ann.maxSimTopK(chunks, "doc", "vec", q2, "qid", "tok",
        "vec", k = 1, levels = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((7L, 1L, 1L, 200L))) // 100 + 100 from the same chunk
  }

  // --------------------------------------------------- per-row serving

  private val queriesSeq: Seq[(Long, Seq[Seq[Double]])] =
    Seq(7L -> Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))

  private def docRows = Seq(
    (1L, Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))),
    (2L, Seq(Seq(0.5f, 0.5f))),
    (3L, Seq(Seq(0.5f, 0.5f))),
    (4L, Seq.empty[Seq[Float]]) // chunk-less: dropped
  ).toDF("doc", "chunks")

  test("maxSimScorePerRow matches the grouped maxSimTopK scores " +
      "bit-for-bit; chunk-less docs drop") {
    val got = Ann.maxSimScorePerRow(docRows, "doc", "chunks",
        queriesSeq, levels = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((7L, 1L, 200L), (7L, 2L, 100L), (7L, 3L, 100L)))
    val grouped = Ann.maxSimTopK(chunks, "doc", "vec", qtoks, "qid",
        "tok", "vec", k = 3, levels = 10)
      .select("query_id", "doc_id", "score")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == grouped)
  }

  test("maxSimScorePerRow is a pure map: zero exchanges, zero joins") {
    val plan = Ann.maxSimScorePerRow(docRows, "doc", "chunks",
      queriesSeq, levels = 10).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("maxSimScorePerRow is stateless: identical scores over " +
      "readStream micro-batches and batch") {
    val want = Ann.maxSimScorePerRow(docRows, "doc", "chunks",
      queriesSeq, levels = 10).as[(Long, Long, Long)].collect().toSet
    val inDir = java.nio.file.Files.createTempDirectory("maxsim-stream")
    docRows.filter(col("doc") % 2 === 0)
      .coalesce(1).write.parquet(inDir.resolve("b0").toString)
    docRows.filter(col("doc") % 2 === 1)
      .coalesce(1).write.parquet(inDir.resolve("b1").toString)
    val stream = spark.readStream
      .schema("doc LONG, chunks ARRAY<ARRAY<FLOAT>>")
      .parquet(inDir.toString + "/*")
    val q = Ann.maxSimScorePerRow(stream, "doc", "chunks",
        queriesSeq, levels = 10)
      .writeStream.outputMode("append")
      .format("memory").queryName("maxsim_stream_test").start()
    try {
      q.processAllAvailable()
      val got = spark.table("maxsim_stream_test")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
