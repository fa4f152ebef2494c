package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's three-stage entity-match cascade
  * (/root/reference/transform/entity_matching.py, SURVEY.md §2.4/§3.3),
  * re-expressed as one lazy Spark DAG:
  *
  *   ruleMatches (J1 exact-key join) → residue (J3 anti-join)
  *   → fuzzyMatches (J2 blocking semi-join + J4 blocked similarity join
  *     + per-key argmax) → residue → llmMatches (J5, pluggable strategy)
  *   → unionByName (U1).
  *
  * Scale notes (100 TB design):
  *   - The blocked fuzzy join is a plain equi-join on the blocking key, so
  *     it hash-partitions across executors; AQE splits skewed blocks
  *     (metro postcodes). Similarity scoring is a codegen'd expression
  *     ([[graft.functions.TokenSortRatio]]), so the O(block²) inner scoring
  *     loop stays inside whole-stage codegen.
  *   - The argmax is a `min_by` partial aggregation (map-side combine) —
  *     no driver-side loops; the reference's 50k-row chunk pagination
  *     (entity_matching.py:95-110) is deliberately dropped: Spark computes
  *     the global argmax in one distributed pass (SURVEY.md §2.4 fine print).
  *   - A deterministic tie-break (score desc, right key asc) replaces the
  *     reference's scan-order-dependent `extractOne` tie-break.
  */
object Cascade {

  /** Config mirroring the reference's thresholds
    * (entity_matching.py:137,155,168,231,248-249). */
  final case class MatchConfig(
      fuzzyAcceptThreshold: Double = 80.0,
      fuzzyHighConfidence: Double = 92.0,
      llmScore: Double = 95.0,
      enableLlm: Boolean = false)

  /** J1 — rule-based exact-key inner join + DISTINCT + literal match
    * metadata (entity_matching.py:113-135). Keys are trimmed at clean time,
    * so a plain equi-join (broadcast-able when one side is small). */
  def ruleMatch(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    left.join(right, left(leftKey) === right(rightKey), "inner")
      .distinct()
      .withColumn("match_method", lit("rule_based_abn"))
      .withColumn("match_score", lit(100.0))
      .withColumn("match_confidence", lit("high"))
  }

  /** J3 — cascade residue: left rows whose `key` matched nothing yet
    * (entity_matching.py:172-173,256-257,272-273). */
  def residue(left: DataFrame, matched: DataFrame, leftKey: String,
      matchedKey: String): DataFrame =
    left.join(matched.select(col(matchedKey).as(leftKey)).distinct(),
      Seq(leftKey), "left_anti")

  /** J2 + J4 — blocked fuzzy similarity join with per-left-row argmax.
    *
    * @param blockKey   equi-join blocking column present on both sides
    *                   (postcode in the reference); turns O(N·M) scoring
    *                   into per-block products, hash-partitioned.
    * @param score      similarity expression over the JOINED output's
    *                   column names (left/right column names must not
    *                   collide apart from blockKey), scale 0..100.
    * @param leftId     unique left-row id for the argmax window.
    * @param tieBreak   deterministic tie-break columns (right-side key asc).
    * @param saltBlocks when > 1, the blocking equi-join is salted: the
    *                   left side gets a deterministic per-row salt and the
    *                   right side is replicated per salt value, spreading
    *                   a hot block (metro postcodes) over `saltBlocks`
    *                   tasks. Result-identical to the unsalted join; use
    *                   when AQE skew splitting isn't enough because one
    *                   block exceeds a single task's memory. */
  def fuzzyMatch(
      left: DataFrame, right: DataFrame, blockKey: String,
      score: Column,
      leftId: String, tieBreak: Seq[String],
      cfg: MatchConfig = MatchConfig(),
      saltBlocks: Int = 1): DataFrame = {
    // J2: restrict the (large) right side to blocks that exist on the left —
    // the reference's `postcode IN (SELECT DISTINCT postcode …)` semi-join
    // (entity_matching.py:100-103).
    val blocked = right.join(
      left.select(blockKey).distinct(), Seq(blockKey), "left_semi")
    val joined =
      if (saltBlocks <= 1) left.join(blocked, Seq(blockKey), "inner")
      else {
        val saltedLeft = left.withColumn("__salt",
          pmod(xxhash64(col(leftId)), lit(saltBlocks.toLong)).cast("int"))
        val replicated = blocked.withColumn("__salt",
          explode(array((0 until saltBlocks).map(i => lit(i)): _*)))
        saltedLeft.join(replicated, Seq(blockKey, "__salt"), "inner")
          .drop("__salt")
      }
    val scored = joined
      .withColumn("match_score", score)
      .filter(col("match_score") >= cfg.fuzzyAcceptThreshold)
    // per-left-row argmax as a partial-aggregating min_by (map-side
    // combine, no sort shuffle — cheaper than window row_number at scale);
    // ordering key (-score, tieBreak...) == (score desc, tieBreak asc)
    val others = scored.columns.filter(_ != leftId).toSeq
    val orderKey = struct(
      (negate(col("match_score")) +: tieBreak.map(col)): _*)
    scored
      .groupBy(col(leftId))
      .agg(min_by(struct(others.map(col): _*), orderKey).as("__best"))
      .select(col(leftId) +: others.map(c => col(s"__best.`$c`").as(c)): _*)
      .withColumn("match_method", lit("fuzzy"))
      .withColumn("match_confidence",
        when(col("match_score") >= cfg.fuzzyHighConfidence, "high")
          .otherwise("medium"))
  }

  /** U1 — union stage outputs with differing column sets, null-padding
    * (entity_matching.py:297, :57-66). */
  def unionStages(stages: Seq[DataFrame]): DataFrame =
    stages.reduce(_.unionByName(_, allowMissingColumns = true))
}
