package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r21 codegen vector kernels must be bit-identical to the
  * `aggregate(zip_with(...))` lambda forms they replaced on every ANN
  * hot path — including the double domain, where bit-parity depends on
  * preserving the sequential left-to-right fold order. */
class VecKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private val longRows = (1 to 200).map { i =>
    val d = 1 + rng.nextInt(48)
    (i.toLong, Seq.fill(d)(rng.nextLong() % 100000L),
      Seq.fill(d)(rng.nextLong() % 100000L))
  }
  private val dblRows = (1 to 200).map { i =>
    val d = 1 + rng.nextInt(48)
    (i.toLong, Seq.fill(d)(rng.nextDouble() * 1e3 - 500),
      Seq.fill(d)(rng.nextDouble() * 1e3 - 500))
  }

  test("sq_l2_long / dot_long == the zip_with lambda fold, including " +
      "overflow wrap") {
    val df = longRows.toDF("id", "a", "b")
    val got = df.select(col("id"),
      graft.functions.exprs.sq_l2_long(col("a"), col("b")).as("sq"),
      graft.functions.exprs.dot_long(col("a"), col("b")).as("dp"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, e) => acc + e).as("sqRef"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, e) => acc + e).as("dpRef"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(3), s"sq mismatch id=${r.getLong(0)}")
      assert(r.getLong(2) == r.getLong(4), s"dot mismatch id=${r.getLong(0)}")
    }
  }

  test("sq_l2_double / dot_double == the zip_with lambda fold BIT-exactly " +
      "(sequential fold order preserved)") {
    val df = dblRows.toDF("id", "a", "b")
    val got = df.select(col("id"),
      graft.functions.exprs.sq_l2_double(col("a"), col("b")).as("sq"),
      graft.functions.exprs.dot_double(col("a"), col("b")).as("dp"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, e) => acc + e).as("sqRef"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, e) => acc + e).as("dpRef"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        s"sq bits mismatch id=${r.getLong(0)}")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(4)),
        s"dot bits mismatch id=${r.getLong(0)}")
    }
  }

  test("dimension mismatch fails fast with the clear message (the " +
      "deliberate deviation from zip_with's silent null-pad)") {
    val df = Seq((Seq(1L, 2L), Seq(1L, 2L, 3L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(graft.functions.exprs.sq_l2_long(col("a"), col("b")))
        .collect()
    }
    assert(e.getMessage != null)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("vector dimensions differ")),
      messages(e).mkString(" | "))
  }

  test("md5_long60 kernel == the md5/substring/conv builtin chain on " +
      "unicode, empty, and long strings") {
    val rows = (Seq("", "a", "hello world", "café ≠ cafe",
      "日本語テキスト", "x" * 10000) ++
      (1 to 100).map(i => s"token$i:${rng.nextLong()}")).map(Tuple1(_))
    val df = rows.toDF("s").repartition(3) // force distributed eval
    val got = df.select(
      graft.functions.exprs.md5_long60(col("s")).as("k"),
      graft.functions.PortableHash.md5Long60Builtins(col("s")).as("ref"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("simhash_md5_60 kernel == the per-bit aggregate/filter expression " +
      "form") {
    val rows = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "one",
      "a b c d e f g h i j k l m n o p",
      "repeated repeated repeated repeated x").map(Tuple1(_))
    val df = rows.toDF("text").repartition(2)
    val ref = df
      .select(col("text"),
        transform(split(trim(col("text")), "\\s+"),
          t => graft.functions.PortableHash.md5Long60(t)).as("__hs"))
      .select(col("text"),
        expr("""aggregate(sequence(0, 59), 0L, (acc, i) -> acc +
          IF(2 * size(filter(__hs, h -> shiftright(h, i) % 2 = 1)) > size(__hs),
             shiftleft(1L, i), 0L))""").as("ref"))
    val got = df.select(col("text"),
        graft.functions.exprs.simhash_md5_60(
          split(trim(col("text")), "\\s+")).as("k"))
      .join(ref, Seq("text"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), r.getString(0)))
  }

  test("kernels execute inside whole-stage codegen (no fallback)") {
    // spark.range (a Seq-backed frame collapses to LocalTableScan with
    // the projection evaluated at plan time — no codegen stage to see)
    val df = spark.range(100)
      .select(
        transform(sequence(lit(1L), lit(16L)), i => i * col("id")).as("a"),
        transform(sequence(lit(1L), lit(16L)), i => i + col("id")).as("b"))
      .select(graft.functions.exprs.sq_l2_long(col("a"), col("b")).as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\)".r.findAllIn(plan).nonEmpty, plan.take(800))
  }
}
