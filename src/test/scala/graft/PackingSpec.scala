package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** Distributed two-phase prefix sum ≡ the naive single-window form,
  * independent of partition count. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private lazy val docs = (0 until 300)
    .map(i => (i.toLong, 1L + rng.nextInt(100).toLong))
    .toDF("doc_id", "n_tokens")

  private def collectMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("tok_offset"), r.getAs[Long]("shard_id"))).toMap

  test("two-phase scan matches naive window at any partition count") {
    val naive = collectMap(
      Packing.assignShardsNaive(docs, "n_tokens", "doc_id", 500L))
    for (parts <- Seq(1, 3, 8)) {
      val dist = collectMap(
        Packing.assignShards(docs, "n_tokens", "doc_id", 500L, parts))
      assert(dist == naive, s"mismatch at numParts=$parts")
    }
  }

  test("prefixSums: multi-column two-phase scan matches per-column " +
      "naive windows at any partition count") {
    val withB = docs.withColumn("n_b", (col("doc_id") % 7) + 1L)
    val naive = {
      val rows = withB.select("doc_id", "n_tokens", "n_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val offT = rows.map(_._2).scanLeft(0L)(_ + _).init
      val offB = rows.map(_._3).scanLeft(0L)(_ + _).init
      rows.zip(offT.zip(offB))
        .map { case ((id, _, _), (ot, ob)) => id -> (ot, ob) }.toMap
    }
    for (parts <- Seq(1, 3, 8)) {
      val got = Packing.prefixSums(withB, "doc_id",
          Seq("n_tokens", "n_b"), parts)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_tokens_offset"), r.getAs[Long]("n_b_offset")))
        .toMap
      assert(got == naive, s"mismatch at numParts=$parts")
    }
  }

  test("orderCol packs in the shuffled order, independent of partition count") {
    import org.apache.spark.sql.functions._
    val keyed = docs.withColumn("k",
      graft.operators.Sampling.portableKey(col("doc_id"), 21))
    // driver-side reference: exclusive cumsum over (k, doc_id) order
    val order = keyed.select("doc_id", "n_tokens", "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1))
    var acc = 0L
    val expected = order.map { case (id, n, _) =>
      val off = acc; acc += n; id -> (off, off / 500L)
    }.toMap
    for (parts <- Seq(1, 5)) {
      val dist = collectMap(Packing.assignShards(keyed, "n_tokens",
        "doc_id", 500L, parts, orderCol = Some("k")))
      assert(dist == expected, s"mismatch at numParts=$parts")
    }
    // and the permutation actually reorders: some doc changes shard
    val idOrder = collectMap(
      Packing.assignShards(docs, "n_tokens", "doc_id", 500L, 4))
    assert(expected.exists { case (id, (_, s)) => idOrder(id)._2 != s })
  }

  test("offsets are an exclusive prefix sum; shards cover the stream") {
    val rows = Packing.assignShards(docs, "n_tokens", "doc_id", 500L, 4)
      .orderBy("doc_id").collect()
    var acc = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("tok_offset") == acc)
      acc += r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("shard_id") == r.getAs[Long]("tok_offset") / 500L)
    }
  }

  test("packSequences: every sequence but the last holds EXACTLY " +
      "seqLen tokens; pieces tile each doc contiguously") {
    val L = 128L
    val pieces = Packing.packSequences(docs, "n_tokens", "doc_id", L, 4)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("piece_start"), r.getAs[Long]("piece_tokens")))
    val totalTokens = docs.agg(org.apache.spark.sql.functions
      .sum("n_tokens")).head.getLong(0)
    // exact fill
    val bySeq = pieces.groupBy(_._2)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (s, rows) =>
      val tok = rows.map(_._4).sum
      if (s < lastSeq) assert(tok == L, s"seq $s holds $tok != $L")
      else assert(tok == totalTokens - lastSeq * L,
        s"final seq $s holds $tok")
    }
    // per-doc tiling: pieces ordered by seq_id start at 0, are
    // contiguous, and sum to the doc's tokens
    val nTok = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens"))
      .toMap
    pieces.groupBy(_._1).foreach { case (id, rows) =>
      val ordered = rows.sortBy(_._2)
      var pos = 0L
      ordered.foreach { case (_, _, start, n) =>
        assert(start == pos, s"doc $id piece starts at $start != $pos")
        assert(n >= 1)
        pos += n
      }
      assert(pos == nTok(id), s"doc $id pieces sum to $pos")
    }
    // splitting actually happens (docs longer than L must split)
    assert(pieces.groupBy(_._1).exists(_._2.length > 1) ||
      nTok.values.forall(_ <= L))
  }

  test("packManifest: the sequence-major view is the doc-major view " +
      "re-coordinated — pieces tile each sequence from 0, n_docs " +
      "counts the sequence's rows") {
    val L = 128L
    val docMajor = Packing.packSequences(docs, "n_tokens", "doc_id", L, 4)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("piece_tokens")))
    val manifest = Packing.packManifest(docs, "n_tokens", "doc_id", L, 4)
      .collect()
      .map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("seq_start"), r.getAs[Long]("piece_tokens"),
        r.getAs[Long]("n_docs")))
    // same (doc, seq, piece_tokens) multiset as the doc-major view
    assert(manifest.map(m => (m._2, m._1, m._4)).sorted.toSeq ==
      docMajor.sorted.toSeq)
    manifest.groupBy(_._1).foreach { case (sid, rows) =>
      // n_docs is the row count of the sequence, on every row
      assert(rows.forall(_._5 == rows.length),
        s"seq $sid n_docs wrong")
      // pieces tile [0, sum) contiguously in seq_start order
      var pos = 0L
      rows.sortBy(_._3).foreach { case (_, _, start, n, _) =>
        assert(start == pos, s"seq $sid piece at $start != $pos")
        pos += n
      }
      assert(pos <= L)
    }
    // some sequence holds more than one doc (the mask case that matters)
    assert(manifest.exists(_._5 > 1))
  }
}
