package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.model.IndexStore

/** The unified index persistence convention (r19): generation commit
  * protocol, torn-save invisibility, corrupt-params resilience, and
  * cross-index artifact mismatch — every persisted family (LSH corpus
  * index, IVF, suffix-array, KN model, BM25) rides these semantics. */
class IndexStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("ixstore").resolve("a").toString

  test("save commits generations; load returns the newest complete " +
      "one; superseded generations are GC'd") {
    import spark.implicits._
    val root = tmp()
    val g1 = IndexStore.save(root,
      Seq("f" -> Seq((1L, "a")).toDF("id", "v")),
      Seq(7).toDF("p"))
    assert(g1 == 1)
    val g2 = IndexStore.save(root,
      Seq("f" -> Seq((2L, "b")).toDF("id", "v")),
      Seq(8).toDF("p"))
    assert(g2 == 2)
    val (params, dir) = IndexStore.load(spark, root)
    assert(params.getAs[Int]("p") == 8 && dir.endsWith("/g2"))
    assert(spark.read.parquet(s"$dir/f").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    // g1 was GC'd post-commit
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).toSet
    assert(entries == Set("g2"), entries.toString)
  }

  test("a torn save (frames landed, params marker missing) is " +
      "invisible; a corrupt params table cannot brick future saves " +
      "or hide older complete generations") {
    import spark.implicits._
    val root = tmp()
    IndexStore.save(root, Seq("f" -> Seq(1L).toDF("id")),
      Seq(1).toDF("p"))
    // torn g2: frame lands, no params
    Seq(2L).toDF("id").write.parquet(s"$root/g2/f")
    val (p1, d1) = IndexStore.load(spark, root)
    assert(p1.getAs[Int]("p") == 1 && d1.endsWith("/g1"))
    // corrupt g3: params is garbage bytes, not parquet
    new java.io.File(s"$root/g3").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/g3/params"),
      "not parquet".getBytes)
    val (p2, d2) = IndexStore.load(spark, root)
    assert(p2.getAs[Int]("p") == 1 && d2.endsWith("/g1"),
      "corrupt newest generation must fall back, not fail")
    // the next save numbers PAST the junk (directory listing, never
    // params reads) and commits cleanly
    val g = IndexStore.save(root, Seq("f" -> Seq(4L).toDF("id")),
      Seq(4).toDF("p"))
    assert(g == 4)
    val (p3, d3) = IndexStore.load(spark, root)
    assert(p3.getAs[Int]("p") == 4 && d3.endsWith("/g4"))
  }

  test("cross-index artifact mismatch fails loudly: loading one " +
      "family's artifact as another is rejected at the params guard") {
    import spark.implicits._
    import graft.operators.{Dedup, SuffixArray}
    // a substr-index artifact…
    val corpus = Seq(
      (1L, (0 until 20).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val root = tmp()
    SuffixArray.saveSubstrIndex(
      SuffixArray.buildSubstrIndex(corpus, "text", "doc_id", 10, 4),
      root)
    // …must not rehydrate as an LSH corpus index: the params schema
    // has no ngram/num_hashes/bands fields
    val e = intercept[Exception] {
      Dedup.loadCorpusIndex(spark, root)
    }
    assert(e.getMessage != null)
    // …nor as an IVF index
    val e2 = intercept[Exception] {
      implicit val s2: org.apache.spark.sql.SparkSession = spark
      graft.operators.Ann.loadIvfIndex(root)
    }
    assert(e2.getMessage != null)
    // while its own loader still works over the same store
    val ok = SuffixArray.loadSubstrIndex(spark, root)
    assert(ok.minSpan == 10 && ok.baseSpan == 4)
  }

  test("KN model and BM25 index ride the store: round trip is " +
      "bit-exact and a torn second save keeps the committed model") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    implicit val s2: org.apache.spark.sql.SparkSession = spark
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat ran"),
      (2L, "a dog sat on a log and a dog ran away"))
      .toDF("doc_id", "text")
    val bm = TextAnalysis.bm25Index(docs, "text", "doc_id")
    val root = tmp()
    TextAnalysis.saveBm25Index(bm, root)
    val loaded = TextAnalysis.loadBm25Index(root)
    assert(loaded.postings.collect().toSet ==
      bm.postings.collect().toSet)
    assert(loaded.stats.collect().toSet == bm.stats.collect().toSet)
    // torn gen 2: one frame only — loader keeps gen 1
    bm.postings.limit(1).write.parquet(s"$root/g2/postings")
    val after = TextAnalysis.loadBm25Index(root)
    assert(after.postings.count() == bm.postings.count())
  }
}
