package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** J5 — the reference's optional LLM adjudication stage
  * (/root/reference/transform/entity_matching.py:177-258): for each
  * still-unmatched left row, an external model picks the best candidate key
  * from the blocked right side, and the pick is realized as a plain
  * equi-join on the returned key (entity_matching.py:236-237).
  *
  * The external call is non-deterministic and side-effecting, so it lives
  * behind a strategy trait executed via `mapPartitions`-style batching —
  * never a Catalyst expression. The production default is a deterministic
  * stub (hermetic tests; mirrors the reference's `enable_llm=False` default,
  * entity_matching.py:303).
  */
trait MatchStrategy extends Serializable {
  /** Given (leftId, leftName, candidate right names-by-key), return the
    * chosen right key, or None to abstain. */
  def adjudicate(leftName: String, candidates: Seq[(String, String)]): Option[String]
}

/** Deterministic stub: picks the candidate with the highest token-sort
  * similarity if any scores above `floor`, else abstains. Stands in for the
  * GPT-4 adjudicator with reproducible behavior. */
final class DeterministicStub(floor: Double = 50.0) extends MatchStrategy {
  override def adjudicate(
      leftName: String, candidates: Seq[(String, String)]): Option[String] = {
    if (leftName == null || candidates.isEmpty) return None
    val best = candidates
      .map { case (k, n) =>
        (k, if (n == null) 0.0 else graft.functions.SimKernel.tokenSortRatio(leftName, n)) }
      .maxBy { case (k, s) => (s, k) }  // deterministic tie-break on key
    if (best._2 > floor) Some(best._1) else None
  }
}

object LlmMatch {
  /** Run the adjudication stage: for each left row, gather the blocked
    * candidate list, call the strategy, then equi-join the picked key back
    * to the right side (the reference's post-LLM ABN lookup).
    *
    * Implementation is a blocked-join + `groupBy(leftId)` candidate
    * collection (distributed; candidate lists stay bounded by block size),
    * then one strategy call per left row inside executors.
    */
  def apply(
      spark: SparkSession,
      left: DataFrame, right: DataFrame, blockKey: String,
      leftId: String, leftName: String,
      rightKey: String, rightName: String,
      strategy: MatchStrategy,
      llmScore: Double = 95.0,
      maxCandidates: Int = 256): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.expressions.Window

    // candidate lists are bounded (deterministically, by right key) BEFORE
    // collect_list: an external adjudicator's context window is finite,
    // and an unbounded hot block would otherwise balloon a single row
    val w = Window.partitionBy(col(leftId)).orderBy(col(rightKey).asc)
    val candidates = left.select(col(leftId), col(leftName), col(blockKey))
      .join(right.select(col(rightKey), col(rightName), col(blockKey)),
        Seq(blockKey), "inner")
      .withColumn("__cand_rank", row_number().over(w))
      .filter(col("__cand_rank") <= maxCandidates)
      .groupBy(col(leftId), col(leftName))
      .agg(collect_list(struct(col(rightKey).cast("string").as("k"),
        col(rightName).cast("string").as("n"))).as("cands"))

    val pickSchema = StructType(Seq(
      StructField("__left_id", StringType),
      StructField("__picked_key", StringType)))
    val picksRdd = candidates.rdd.mapPartitions { it =>
      it.flatMap { row =>
        val id = Option(row.get(0)).map(_.toString).orNull
        val name = row.getAs[String](1)
        val cands = row.getSeq[Row](2).map(r => (r.getString(0), r.getString(1)))
        strategy.adjudicate(name, cands).map(k => Row(id, k))
      }
    }
    val picks = spark.createDataFrame(picksRdd, pickSchema)

    left.join(picks,
        left(leftId).cast("string") === picks("__left_id"), "inner")
      .join(right,
        picks("__picked_key") === right(rightKey).cast("string"), "inner")
      // the reference's post-LLM lookup joins on the returned key alone
      // (entity_matching.py:236-237); the right side's copy of the blocking
      // column is redundant in the output
      .drop(right(blockKey))
      .drop("__left_id", "__picked_key")
      .withColumn("match_method", lit("LLM"))
      .withColumn("match_score", lit(llmScore))
      .withColumn("match_confidence", lit("medium"))
  }
}
