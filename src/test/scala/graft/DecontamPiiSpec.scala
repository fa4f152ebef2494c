package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pii
import graft.operators.Dedup

/** Decontamination screen, PII redaction, and the exact-substring dup
  * join — ground-truth assertions over planted corpora. */
class DecontamPiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("decontaminate flags exactly the docs sharing a benchmark n-gram") {
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    val corpus = Seq(
      // contains "quick brown fox jumps" → contaminated
      (1L, "a very quick brown fox jumps high today indeed"),
      // shares words but no 4-gram
      (2L, "the dog jumps while the fox sleeps lazy"),
      // clean
      (3L, "completely unrelated text about spark partitions"),
      // contains two benchmark 4-grams (overlapping window)
      (4L, "pack my box with five dozen liquor jugs again")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, bench, "text", "doc_id", ngram = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hit_grams"), r.getAs[Boolean]("contaminated"))).toMap
    assert(out(1L) == (1L, true))
    assert(out(2L) == (0L, false))
    assert(out(3L) == (0L, false))
    assert(out(4L)._2 && out(4L)._1 >= 2L) // whole benchmark doc embedded
    assert(out.size == 4) // one row per corpus doc, clean docs included
  }

  test("pii redaction masks emails and phones, counts match") {
    val df = Seq(
      (1L, "contact Jane.Doe+x@sub.example.co.uk or +61 412-345-678 now"),
      (2L, "no pii here, just 42 and 7 little digits"),
      (3L, "two mails: a@b.io c.d@e-f.org and line 02 9876 5432 end"))
      .toDF("id", "s")
      .select(col("id"), Pii.redact(col("s")).as("r"),
        Pii.emailCount(col("s")).as("ne"), Pii.phoneCount(col("s")).as("np"))
    val rows = df.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[String]("r"), r.getAs[Long]("ne"), r.getAs[Long]("np"))).toMap
    assert(rows(1L)._1 == "contact [EMAIL] or [PHONE] now")
    assert(rows(1L)._2 == 1L && rows(1L)._3 == 1L)
    assert(rows(2L) == (("no pii here, just 42 and 7 little digits", 0L, 0L)))
    assert(rows(3L)._1 == "two mails: [EMAIL] [EMAIL] and line [PHONE] end")
    assert(rows(3L)._2 == 2L && rows(3L)._3 == 1L)
  }

  test("decontamination screens a stream against a static benchmark") {
    // the same broadcast gram probe runs per micro-batch (stream-static):
    // explode grams -> semi-probe the static benchmark set -> per-doc agg
    val dir = java.nio.file.Files.createTempDirectory("decontam-stream")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.write.parquet(dir.resolve("in").toString + "/p")
    val isBench = col("doc_id") % 11 === 3
    val benchGrams = broadcast(
      docs.filter(isBench)
        .select(explode_outer(Dedup.shingles(col("text"), 4)).as("g"))
        .distinct())
    val stream = spark.readStream
      .schema(docs.schema).parquet(dir.resolve("in").toString + "/*")
      .filter(!isBench)
      .select(col("doc_id"), explode_outer(Dedup.shingles(col("text"), 4)).as("g"))
      .join(benchGrams, Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit_grams"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("decontam_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("decontam_stream").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit_grams")).toMap
      val batch = Dedup.decontaminate(
          docs.filter(!isBench), docs.filter(isBench), "text", "doc_id", 4)
        .filter(col("contaminated"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("n_hit_grams")).toMap
      assert(got == batch)
      assert(got.nonEmpty, "fixture should contain contaminated docs")
    } finally q.stop()
  }

  test("span dedup keeps first occurrence, reassembles in order") {
    val docs = Seq(
      // doc 1: two spans, the second repeats doc 1's first span
      (1L, "a b c a b c"),
      // doc 2 repeats doc 1's span then adds a fresh one
      (2L, "a b c x y z"),
      // doc 3 entirely fresh
      (3L, "p q r s t u")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "text", "doc_id", spanWords = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("n_dropped"))).toMap
    assert(out(1L) == (("a b c", 2L, 1L))) // internal repeat dropped
    assert(out(2L) == (("x y z", 2L, 1L))) // cross-doc repeat dropped
    assert(out(3L) == (("p q r s t u", 2L, 0L)))
  }

  test("exact-substring join finds aligned clones and skips short docs") {
    val base = ("x" * 35) + ("y" * 35) + ("z" * 35) // 105 chars
    val docs = Seq(
      (1L, base),
      (2L, base + "tail changed here"), // shared 105-char prefix
      (3L, "q" * 105),                  // no shared window
      (4L, "short doc")                 // < window, excluded
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstringDupJoin(docs, "text", "doc_id",
        window = 40, stride = 10)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("n_shared")).toMap
    // windows at 1,11,...,61 fit inside the 105-char shared prefix for
    // doc 1 (len 105 → starts 1..66); doc 2 is longer so it has more
    // starts, but only the aligned shared ones match: starts 1..61 → 7,
    // minus duplicates collapsed by the per-doc DISTINCT on window text
    assert(out.contains((1L, 2L)) && out((1L, 2L)) >= 1L)
    assert(!out.keys.exists { case (a, b) => a == 3L || b == 3L })
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("general substring join catches unaligned copies the strided form misses") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    def randText(n: Int): String =
      (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    // a 60-char span (>= window + stride - 1 = 49) copied at offset 0 in
    // doc 1 but offset 3 in doc 2: the copy starts at different positions
    // mod stride, so symmetric striding can never align windows on it
    val span = randText(60)
    val docs = Seq(
      (1L, span + randText(40)),
      (2L, randText(3) + span + randText(40)),
      (3L, randText(100))
    ).toDF("doc_id", "text")
    val strided = Dedup.exactSubstringDupJoin(docs, "text", "doc_id",
        window = 40, stride = 10)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(!strided.contains((1L, 2L)),
      "offset-3 copy unexpectedly caught by the aligned form")
    val general = Dedup.exactSubstringDupJoinGeneral(docs, "text", "doc_id",
        window = 40, stride = 10)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("n_shared")).toMap
    assert(general.contains((1L, 2L)),
      "general form missed the guaranteed-length unaligned copy")
    assert(!general.keys.exists { case (a, b) => a == 3L || b == 3L })
  }
}
