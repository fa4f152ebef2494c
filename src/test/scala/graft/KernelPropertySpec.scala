package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AbnKernel, SimKernel, TitleKernel}

/** Additional kernel properties beyond the core parity suites. */
class KernelPropertySpec extends AnyFunSuite {

  test("fast Levenshtein kernel equals Spark's builtin UTF8String distance") {
    import org.apache.spark.unsafe.types.UTF8String
    val rng = new scala.util.Random(42)
    val chars = "abcdeXY #&123éü"
    def rand() =
      Seq.fill(rng.nextInt(24))(chars(rng.nextInt(chars.length))).mkString
    (1 to 500).foreach { _ =>
      val (a, b) = (rand(), rand())
      val want = UTF8String.fromString(a)
        .levenshteinDistance(UTF8String.fromString(b))
      assert(SimKernel.levenshteinDistance(a, b) == want, s"'$a' vs '$b'")
    }
  }

  test("levenshteinRatio matches the composed-builtin expression exactly") {
    // the oracle computes 100*(1 - lev/greatest(len,len)) as SQL builtins;
    // the kernel must be bit-identical, including the both-empty NaN case
    val want = 100.0 * (1.0 - 3.0 / 7.0)
    assert(SimKernel.levenshteinRatio("kitten", "sitting") ==
      100.0 * (1.0 - 3.0 / 7.0))
    assert(want == SimKernel.levenshteinRatio("kitten", "sitting"))
    assert(SimKernel.levenshteinRatio("", "").isNaN)
    assert(SimKernel.levenshteinRatio("", "abc") == 0.0)
    assert(SimKernel.levenshteinRatio("abc", "abc") == 100.0)
    // symmetry + bounds on random pairs
    val rng = new scala.util.Random(7)
    def rand() = Seq.fill(rng.nextInt(16))(('a' + rng.nextInt(4)).toChar).mkString
    (1 to 300).foreach { _ =>
      val (a, b) = (rand(), rand())
      if (a.nonEmpty || b.nonEmpty) {
        val r = SimKernel.levenshteinRatio(a, b)
        assert(r == SimKernel.levenshteinRatio(b, a))
        assert(r >= 0.0 && r <= 100.0)
      }
    }
  }

  test("TitleKernel matches recorded CPython str.title() outputs") {
    val recorded = Seq(
      "o'brien co" -> "O'Brien Co",
      "3d systems" -> "3D Systems",
      "acme mining&co pty ltd" -> "Acme Mining&Co Pty Ltd",
      "ACME  &  X" -> "Acme  &  X",
      "café münchen" -> "Café München",
      "" -> "",
      "a" -> "A",
      "x9y z" -> "X9Y Z")
    recorded.foreach { case (in, want) =>
      assert(TitleKernel.title(in) == want, s"title($in)")
    }
  }

  test("TitleKernel is idempotent") {
    val rng = new scala.util.Random(42)
    val chars = "abcDEF 123&'-é"
    (1 to 200).foreach { _ =>
      val s = Seq.fill(rng.nextInt(20))(chars(rng.nextInt(chars.length))).mkString
      assert(TitleKernel.title(TitleKernel.title(s)) == TitleKernel.title(s), s)
    }
  }

  test("MinHashMd5Sig batch kernel equals the composed md5/array_min builtins") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.session
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
      .select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("gset"))
    val k = 4
    val composed = array((0 until k).map { j =>
      array_min(transform(col("gset"), g => md5(concat(lit(s"$j:"), g))))
    }: _*)
    val diff = docs
      .select(col("doc_id"),
        graft.functions.exprs.minhash_md5_sig(col("gset"), k).as("fast"),
        composed.as("slow"))
      .filter(not(col("fast") <=> col("slow")))
      .count()
    assert(diff === 0)
  }

  test("ABN checksum catches every adjacent-digit transposition " +
      "(weight deltas < 89 prime)") {
    val rng = new scala.util.Random(42)
    val abns = Iterator
      .continually("%011d".format(math.abs(rng.nextLong()) % 100000000000L))
      .filter(AbnKernel.isValid).take(30).toSeq
    abns.foreach { abn =>
      for (i <- 0 until 10 if abn(i) != abn(i + 1)) {
        val swapped = abn.updated(i, abn(i + 1)).updated(i + 1, abn(i))
        assert(!AbnKernel.isValid(swapped), s"$abn -> $swapped")
      }
    }
  }

  test("word_ngrams kernel == builtin shingle chain (set AND order) on " +
      "random + adversarial texts") {
    val spark = TestSpark.session
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "de", "e", "zeta-1", "x.y")
    val random = (0 until 120).map { i =>
      Seq.fill(1 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
        .mkString(if (i % 3 == 0) "  " else " ")
    }
    val adversarial = Seq(null, "", " ", "\t\n", "one", "one two",
      "  leading", "trailing  ", "ab\fc\rd", "x x x x x x")
    for (n <- Seq(1, 2, 3, 5)) {
      val df = (random ++ adversarial).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        .select(col("id"),
          graft.operators.Dedup.shingles(col("text"), n).as("kernel"),
          graft.operators.Dedup.shinglesBuiltin(col("text"), n).as("builtin"))
        .collect()
      df.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n id=${r.getLong(0)}")
      }
    }
  }

  test("word_ngram_hashes kernel == builtin hashed-shingle chain " +
      "(exact values AND order), incl. multibyte text") {
    val spark = TestSpark.session
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "de", "e", "zeta-1",
      "日本語", "naïve", "x.y")
    val random = (0 until 120).map { i =>
      Seq.fill(1 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
        .mkString(if (i % 3 == 0) "  " else " ")
    }
    val adversarial = Seq("", " ", "\t\n", "one", "one two",
      "  leading", "trailing  ", "ab\fc\rd", "日本 語 テスト")
    for (n <- Seq(1, 3, 5)) {
      val df = (random ++ adversarial).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val kernel = graft.operators.Dedup
        .shingleHashSet(df, "text", "doc_id", n)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val builtin = graft.operators.Dedup
        .shingleHashSetBuiltin(df, "text", "doc_id", n)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(kernel == builtin, s"n=$n")
    }
  }

  test("tf_expand kernel == old explode/groupBy expansion chain " +
      "(same element sets) on random + adversarial texts") {
    // the r13 chain this kernel replaced: split → filter '' →
    // groupBy(doc,t) capped count → t#1…t#c explode → collect per doc;
    // the q178 oracle still replays THAT chain, so the kernel must
    // produce the identical element set per doc (order is free — every
    // consumer is a set op)
    val spark = TestSpark.session
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "gamma", "de", "e", "zeta-1", "日本")
    val random = (0 until 120).map { i =>
      Seq.fill(1 + rng.nextInt(20))(vocab(rng.nextInt(vocab.size)))
        .mkString(if (i % 3 == 0) "  " else " ")
    }
    val adversarial = Seq("", " ", "\t\n", "one", "x x x x x x x x",
      "  leading", "trailing  ", "ab\fc\rd ab\fc\rd", "a#1 a a")
    for (cap <- Seq(1, 3, 5)) {
      val df = (random ++ adversarial).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val kernel = graft.operators.Dedup
        .weightedExpansion(df, "text", "doc_id", cap)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).sorted).toMap
      val chain = df
        .select(col("doc_id").as("doc"),
          explode_outer(split(trim(col("text")), "\\s+")).as("t"))
        .filter(col("t") =!= "")
        .groupBy(col("doc"), col("t"))
        .agg(least(count(lit(1)), lit(cap.toLong)).as("c"))
        .select(col("doc"), explode(transform(
          sequence(lit(1), col("c").cast("int")),
          i => concat(col("t"), lit("#"), i))).as("g"))
        .groupBy(col("doc")).agg(collect_list(col("g")).as("gset"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).sorted).toMap
      assert(kernel == chain, s"cap=$cap")
    }
  }

  test("hashed shingles agree with string shingles on set size (no " +
      "collisions at corpus scale)") {
    val spark = TestSpark.session
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0 until 100).map { i =>
      (i.toLong, Seq.fill(20)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val stringSizes = docs
      .select(col("doc_id"),
        size(graft.operators.Dedup.shingles(col("text"), 3)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hashedSizes = graft.operators.Dedup
      .shingleHashSet(docs, "text", "doc_id", 3)
      .select(col("doc"), size(col("sh")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stringSizes == hashedSizes)
  }
}
