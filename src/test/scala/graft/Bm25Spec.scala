package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** BM25 ranked retrieval: the double/ln production scorer
  * ([[TextAnalysis.bm25Scores]] / [[TextAnalysis.bm25TopK]]) against
  * hand-derived values, and the exact-integer fixed-point twin
  * ([[TextAnalysis.bm25FixedPointTopK]], the q112 oracle gate) against
  * hand-computed integer arithmetic.
  *
  * Hand corpus: d1 = "a b a", d2 = "a c", d3 = "b b b c"
  *   N = 3, L = 9, avgdl = 3
  *   tf: (d1,a)=2 (d1,b)=1 (d2,a)=1 (d3,b)=3;  df(a) = df(b) = 2
  * Query 0 = {a, b} with k1 = 1.2, b = 0.75:
  *   idf(a) = idf(b) = ln(1 + (3−2+0.5)/(2+0.5)) = ln(1.6)
  *   sat(d1,a): 2·2.2/(2 + 1.2·(0.25+0.75·3/3)) = 4.4/3.2  = 1.375
  *   sat(d1,b): 1·2.2/(1 + 1.2·1)               = 2.2/2.2  = 1
  *   sat(d2,a): 1·2.2/(1 + 1.2·(0.25+0.75·2/3)) = 2.2/1.9
  *   sat(d3,b): 3·2.2/(3 + 1.2·(0.25+0.75·4/3)) = 6.6/4.5
  */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def handCorpus = {
    import spark.implicits._
    Seq((1L, "a b a"), (2L, "a c"), (3L, "b b b c")).toDF("doc_id", "text")
  }
  private def query0 = {
    import spark.implicits._
    Seq((0L, "a"), (0L, "b")).toDF("query_id", "term")
  }

  test("bm25Scores matches the hand-derived Lucene-form values") {
    val got = TextAnalysis.bm25Scores(handCorpus, "text", "doc_id", query0)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val ln16 = math.log(1.6)
    assert(math.abs(got(1L) - ln16 * (1.375 + 1.0)) < 1e-12)
    assert(math.abs(got(2L) - ln16 * 2.2 / 1.9) < 1e-12)
    assert(math.abs(got(3L) - ln16 * 6.6 / 4.5) < 1e-12)
  }

  test("bm25TopK ranks by score with raw-string-id tie-break and honors k") {
    val got = TextAnalysis.bm25TopK(handCorpus, "text", "doc_id", query0, k = 2)
      .orderBy(desc("score_fx")).collect()
    assert(got.length == 2)
    // d1 (2.375·ln1.6 ≈ 1.116) > d3 (6.6/4.5·ln1.6 ≈ 0.689) > d2
    assert(got(0).getLong(1) == 1L && got(1).getLong(1) == 3L)
    // score_fx is the 2^-40 fixed point of the double score
    assert(math.abs(got(0).getLong(2) / math.pow(2, 40)
      - math.log(1.6) * 2.375) < 1e-9)
  }

  test("fixed-point twin matches hand-computed integer arithmetic") {
    // s1=10000, s2=1000000; idfQ = 10000·3 DIV 5 = 6000
    //   satQ(d1,a) = 10^6·22·9·2 DIV (180+27+81)  = 396000000/288 = 1375000
    //   satQ(d1,b) = 10^6·22·9   DIV (90+27+81)   = 198000000/198 = 1000000
    //   satQ(d2,a) = 198000000 DIV (90+27+54=171) = 1157894 (floored)
    //   satQ(d3,b) = 10^6·22·9·3 DIV (270+27+108) = 594000000/405 = 1466666
    val got = TextAnalysis.bm25FixedPointTopK(
        handCorpus, "text", "doc_id", query0, k = 3)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got(1L) == 6000L * 1375000L + 6000L * 1000000L)
    assert(got(2L) == 6000L * 1157894L)
    assert(got(3L) == 6000L * 1466666L)
  }

  test("duplicated (query_id, term) rows do not double-count the term") {
    import spark.implicits._
    val clean = TextAnalysis.bm25FixedPointTopK(handCorpus, "text",
        "doc_id", query0, k = 3)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val dup = Seq((0L, "a"), (0L, "a"), (0L, "b"), (0L, "b"))
      .toDF("query_id", "term")
    val got = TextAnalysis.bm25FixedPointTopK(handCorpus, "text",
        "doc_id", dup, k = 3)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == clean)
  }

  test("terms absent from the corpus contribute nothing; all-miss queries " +
      "return no rows") {
    import spark.implicits._
    val q = Seq((0L, "a"), (0L, "zzz"), (7L, "zzz")).toDF("query_id", "term")
    val got = TextAnalysis.bm25FixedPointTopK(
        handCorpus, "text", "doc_id", q, k = 5)
      .collect()
    assert(got.forall(_.getLong(0) == 0L)) // query 7 absent entirely
    assert(got.map(_.getLong(1)).toSet == Set(1L, 2L)) // docs containing "a"
  }

  test("ids past 12 digits and non-numeric string ids survive the heap " +
      "round-trip (the lpad/cast corruption class)") {
    import spark.implicits._
    // 16-digit ids: the old lpad(12) carry truncated these silently
    val bigIds = Seq((1234567890123456L, "a b a"), (9876543210987654L, "a c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25FixedPointTopK(
        bigIds, "text", "doc_id", query0, k = 5)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(1234567890123456L, 9876543210987654L))
    // string ids: the old cast("long") nulled these on output
    val strIds = Seq(("doc-alpha", "a b a"), ("doc-beta", "a c"))
      .toDF("doc_id", "text")
    val got2 = TextAnalysis.bm25TopK(strIds, "text", "doc_id", query0, k = 5)
      .collect().map(_.getString(1)).toSet
    assert(got2 == Set("doc-alpha", "doc-beta"))
  }

  test("bm25ScorePerRow (serving shape, snapshot stats) matches the " +
      "shuffle-based bm25Scores to 1e-12") {
    import spark.implicits._
    val p = SketchParams.q112
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val q = p.queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val want = TextAnalysis.bm25Scores(docs, "text", "doc_id", q)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // index-time snapshot: df per term from termStats, N and L = token total
    val stats = TextAnalysis.termStats(docs, "text", "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    val l = docs.agg(sum(size(split(trim(lower(col("text"))), "\\s+"))))
      .collect()(0).getLong(0)
    val got = TextAnalysis.bm25ScorePerRow(docs, "text", "doc_id",
        p.queries, stats, n, l)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-12, s"$k: $v vs ${want(k)}")
    }
    assert(got.nonEmpty)
  }

  test("bm25ScorePerRow: out-of-vocabulary terms score 0; no-match docs " +
      "are dropped") {
    val got = TextAnalysis.bm25ScorePerRow(handCorpus, "text", "doc_id",
        Seq(0L -> Seq("a", "zzz"), 7L -> Seq("zzz")),
        dfSnapshot = Map("a" -> 2L), n = 3L, l = 9L)
      .collect()
    assert(got.forall(_.getLong(0) == 0L))
    assert(got.map(_.getLong(1)).toSet == Set(1L, 2L))
  }

  test("fixed-point twin matches a JVM integer reference on random " +
      "corpora (10-case fuzz)") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    for (round <- 1 to 10) {
      val nDocs = 2 + rng.nextInt(8)
      val corpus = (1L to nDocs).map(i =>
        (i, Seq.fill(1 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
          .mkString(" ")))
      val terms = rng.shuffle(vocab).take(1 + rng.nextInt(3))
      // integer reference: identical floored arithmetic
      val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }
      val n = toks.size.toLong
      val l = toks.map(_._2.size.toLong).sum
      val df = terms.map(t =>
        t -> toks.count(_._2.contains(t)).toLong).toMap
      val want = toks.flatMap { case (id, ws) =>
        val dl = ws.size.toLong
        val s = terms.map { t =>
          val tf = ws.count(_ == t).toLong
          if (tf == 0 || df(t) == 0) 0L
          else {
            val idfQ = (10000L * (2 * n - 2 * df(t) + 1)) / (2 * df(t) + 1)
            val satQ = (1000000L * 22 * l * tf) /
              (10 * l * tf + 3 * l + 9 * dl * n)
            idfQ * satQ
          }
        }.sum
        if (s > 0) Some((id, s)) else None
      }.toMap
      val got = TextAnalysis.bm25FixedPointTopK(
          corpus.toDF("doc_id", "text"), "text", "doc_id",
          terms.map(t => (0L, t)).toDF("query_id", "term"),
          k = Int.MaxValue)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(got == want, s"round $round: terms=$terms corpus=$corpus")
    }
  }

  test("fixed-point top-k agrees with its own window-ranked naive form " +
      "on the synthetic corpus") {
    import spark.implicits._
    val p = SketchParams.q112
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val q = p.queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val topk = TextAnalysis.bm25FixedPointTopK(docs, "text", "doc_id", q,
      p.k, p.s1, p.s2)
    // naive: full scores, window rank, same (-score, raw string id) order
    val full = TextAnalysis.bm25FixedPointTopK(docs, "text", "doc_id", q,
      k = Int.MaxValue, p.s1, p.s2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy((-col("score_q")).asc, col("doc_id").cast("string"))
    val naive = full.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= p.k).drop("rn")
    assert(topk.collect().toSet == naive.collect().toSet)
    assert(topk.groupBy("query_id").count().collect()
      .forall(_.getLong(1) == p.k))
  }

  test("index snapshot: served scores are integer-identical to " +
      "recomputed, through a parquet round trip, and trainOrLoad " +
      "builds once") {
    implicit val s = spark
    import spark.implicits._
    val p = SketchParams.q112
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val q = p.queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val recomputed = TextAnalysis.bm25FixedPointTopK(docs, "text",
      "doc_id", q, p.k, p.s1, p.s2).collect().toSet
    val built = TextAnalysis.bm25Index(docs, "text", "doc_id")
    assert(TextAnalysis.bm25FixedPointTopKFromIndex(built, q, p.k,
      p.s1, p.s2).collect().toSet == recomputed)
    // parquet round trip serves the same integers
    val root = java.nio.file.Files.createTempDirectory("bm25ix")
      .resolve("ix").toString
    TextAnalysis.saveBm25Index(built, root)
    val loaded = TextAnalysis.loadBm25Index(root)
    assert(TextAnalysis.bm25FixedPointTopKFromIndex(loaded, q, p.k,
      p.s1, p.s2).collect().toSet == recomputed)
    // trainOrLoad: second call must not rebuild
    var builds = 0
    TextAnalysis.trainOrLoadBm25Index(root + "2") {
      builds += 1; built }
    val served = TextAnalysis.trainOrLoadBm25Index(root + "2") {
      builds += 1; fail("rebuilt despite persisted index") }
    assert(builds == 1)
    assert(TextAnalysis.bm25FixedPointTopKFromIndex(served, q, p.k,
      p.s1, p.s2).collect().toSet == recomputed)
  }
}
