package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Components, Dedup, Packing, TextAnalysis}

/** End-to-end curation pipeline: the operators composed the way a real
  * training-data build chains them — quality gate → exact dedup →
  * near-dup clustering → representative selection → curriculum-ordered
  * shard packing — with the row-flow invariants asserted at each stage
  * boundary. Each operator is unit- and oracle-gated elsewhere; this
  * spec proves they COMPOSE (schemas line up, id sets flow through,
  * the end state is deterministic). */
class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  test("gate -> exact dedup -> near-dup clusters -> pack, invariants hold") {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"),
        trim(regexp_replace(col("text"), "[ \\t\\n\\x0B\\f\\r]+", " "))
          .as("text"))
    val nBase = base.count()
    // corpus = originals + exact copies (+100k) + near-dup tails (+200k)
    val corpus = base
      .unionByName(base.select((col("doc_id") + 100000L).as("doc_id"),
        col("text")))
      .unionByName(base.select((col("doc_id") + 200000L).as("doc_id"),
        regexp_replace(col("text"), " [^ ]+$", "").as("text")))

    // 1. quality gate (fast path — sweep shape)
    val gated = corpus.join(
      TextAnalysis.hashedLinearScoreFast(corpus, "text", "doc_id")
        .filter(col("keep")).select(col("doc_id")),
      Seq("doc_id"))
    val nGated = gated.count()
    assert(nGated > 0 && nGated < corpus.count(),
      "gate must pass some and drop some")

    // 2. exact dedup: identical texts collapse to the min id — every
    // surviving original's +100k copy is gone (both gated or both not:
    // the gate is a pure function of the text)
    val exactKept = gated.join(
      Dedup.exact(gated, "text", "doc_id")
        .select(col("keep_id").as("doc_id")),
      Seq("doc_id"))
    val exactIds = exactKept.select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(!exactIds.exists(id => id >= 100000L && id < 200000L),
      "every exact copy shadows its lower-id original")

    // 3. near-dup pairs -> connected components -> keep representatives
    val pairs = Dedup.minhashLsh(exactKept, "text", "doc_id",
      ngram = 3, numHashes = 16, bands = 8, jaccardThreshold = 0.4)
    val assign = Components.dedupAssignments(
      exactKept, "doc_id", pairs, "id_a", "id_b")
    val reps = exactKept.join(
      assign.filter(col("id") === col("keep_id"))
        .select(col("id").as("doc_id")),
      Seq("doc_id"))
    val repIds = reps.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // a tail-truncated variant whose original survived must have
    // clustered with it and lost (min id wins)
    val origSurvivors = repIds.filter(_ < 100000L)
    val dupSurvivors = repIds.filter(_ >= 200000L)
    assert(dupSurvivors.forall(id => !origSurvivors.contains(id - 200000L)),
      "near-dup variant and its original must never both survive")
    assert(origSurvivors.nonEmpty)

    // 4. curriculum packing of the survivors
    val scored = reps.join(
      TextAnalysis.hashedLinearScoreFast(reps, "text", "doc_id")
        .select(col("doc_id"), col("score")), Seq("doc_id"))
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        (-col("score")).as("ord"))
    val packed = Packing.assignShards(scored, "n_tokens", "doc_id",
      maxTokensPerShard = 500L, orderCol = Some("ord"))
    assert(packed.count() == reps.count(),
      "every representative lands in exactly one shard")
    val shardLoads = packed.groupBy(col("shard_id"))
      .agg(sum(col("n_tokens")).as("load"), count(lit(1)).as("n"))
      .collect()
    // contiguous chunking: a shard exceeds the budget only via the one
    // straddling document
    shardLoads.foreach { r =>
      assert(r.getLong(1) <= 500L + scored.agg(max(col("n_tokens")))
        .collect()(0).getLong(0), r.toString)
    }
    assert(shardLoads.length > 1, "corpus must span multiple shards")

    // 5. the whole chain is deterministic end to end
    val again = Packing.assignShards(scored, "n_tokens", "doc_id",
      maxTokensPerShard = 500L, orderCol = Some("ord"))
      .collect().map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    val first = packed.collect().map(r => (r.getLong(0), r.getLong(3)))
      .sorted.toSeq
    assert(first == again)
    assert(nBase > 0)
  }
}
