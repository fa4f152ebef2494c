package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{exprs, Cleaning}
import graft.operators.{Cascade, LlmMatch, MatchStrategy, DeterministicStub}

/** The callable, composable pipeline `run_pipeline.py` promised but never
  * implemented (/root/reference/run_pipeline.py:7-22 imports functions that
  * don't exist — SURVEY.md §3.4): stg → pre_dwh cleaning → three-stage
  * match cascade → dwh.dim_entity_match_company_data, as ONE lazy Spark
  * DAG with no driver round-trips.
  */
object Pipeline {

  final case class Config(
      fuzzyAcceptThreshold: Double = 80.0,
      fuzzyHighConfidence: Double = 92.0,
      llmScore: Double = 95.0,
      enableLlm: Boolean = false,   // mirrors entity_matching.py:303 default
      llmStrategy: MatchStrategy = new DeterministicStub())

  /** stg → pre_dwh for ABR rows: clean + standardize + dedup
    * (/root/reference/transform/data_cleaning.py:157-185). */
  def cleanAbr(stgAbr: DataFrame): DataFrame =
    stgAbr
      .withColumn("entity_name", Cleaning.cleanCompanyName(col("entity_name")))
      .withColumn("abn", Cleaning.cleanAbn(col("abn")))
      .withColumn("postcode", Cleaning.cleanPostcode(col("postcode")))
      .withColumn("state", Cleaning.standardizeState(col("state")))
      .dropDuplicates("abn", "entity_name", "state", "postcode") // A1

  /** stg → pre_dwh for crawl rows. */
  def cleanCrawl(stgCrawl: DataFrame): DataFrame =
    stgCrawl
      .withColumn("company_name", Cleaning.cleanCompanyName(col("company_name")))
      .withColumn("abn", Cleaning.cleanAbn(col("abn")))
      .withColumn("postcode", Cleaning.cleanPostcode(col("postcode")))
      .dropDuplicates("abn", "company_name", "postcode") // A1

  /** pre_dwh → dwh: the full match cascade (SURVEY.md §3.3) over cleaned
    * frames with the reference's column contract
    * (crawl: domain/company_name/abn/postcode,
    *  abr: abn/entity_name/entity_type/state/postcode). */
  def matchEntities(spark: SparkSession, cleanedCrawl: DataFrame,
      cleanedAbr: DataFrame, cfg: Config = Config()): DataFrame = {
    // Each cascade stage reads the cleaned frames AND the prior stages
    // (residue anti-joins), so without materialization the regex-heavy
    // cleaning + dedup exchanges re-execute once PER BRANCH of the
    // final union (rule, fuzzy, llm, and both residue chains — the
    // optimizer does not reuse exchanges across them). Lazy
    // localCheckpoints make each shared frame compute exactly once per
    // action (guide §3.3 "materialise an intermediate to truncate the
    // plan"); the blocks are corpus-proportional — the same bytes any
    // ONE branch already materialized in its shuffles.
    val crawl = cleanedCrawl.select(
      col("domain").as("crawl_domain"),
      col("company_name").as("crawl_company_name"),
      col("abn").as("crawl_abn"),
      col("postcode").as("crawl_postcode")).localCheckpoint(false)
    val abr = cleanedAbr.select(
      col("abn").as("abr_abn"),
      col("entity_name").as("abr_company_name"),
      col("entity_type").as("abr_entity_type"),
      col("state").as("abr_state"),
      col("postcode").as("abr_postcode")).localCheckpoint(false)

    // J1 — exact ABN equi-join (keys cleaned upstream, so plain ===)
    val rule = Cascade.ruleMatch(
      crawl.filter(col("crawl_abn").isNotNull),
      abr.filter(col("abr_abn").isNotNull), "crawl_abn", "abr_abn")
      .localCheckpoint(false)

    // J3 — residue keyed on domain (entity_matching.py:172-173)
    val afterRule = Cascade.residue(crawl, rule, "crawl_domain", "crawl_domain")

    // J2+J4 — postcode-blocked token_sort_ratio fuzzy join, global argmax
    val fuzzyLeft = afterRule
      .withColumnRenamed("crawl_postcode", "block")
      .filter(col("block").isNotNull)
    val fuzzyRight = abr.withColumnRenamed("abr_postcode", "block")
      .filter(col("block").isNotNull)
    val fuzzy = Cascade.fuzzyMatch(
        fuzzyLeft, fuzzyRight, "block",
        exprs.token_sort_ratio(col("crawl_company_name"), col("abr_company_name")),
        "crawl_domain", Seq("abr_abn"),
        Cascade.MatchConfig(cfg.fuzzyAcceptThreshold, cfg.fuzzyHighConfidence))
      .withColumn("crawl_postcode", col("block"))
      .withColumn("abr_postcode", col("block"))
      .drop("block")
      .localCheckpoint(false)

    // NOT checkpointed (measured 2.5 → 3.4 s when tried): the llm
    // stage's candidate gather reads only 3 columns of this frame, and
    // a checkpoint would materialize every column, defeating pruning —
    // the residue recompute over the checkpointed inputs is cheaper
    val afterFuzzy = Cascade.residue(afterRule, fuzzy,
      "crawl_domain", "crawl_domain")

    // J5 — optional external adjudication within the postcode block
    val llm =
      if (!cfg.enableLlm) None
      else Some {
        LlmMatch(spark,
            afterFuzzy.withColumnRenamed("crawl_postcode", "block")
              .filter(col("block").isNotNull),
            abr.withColumnRenamed("abr_postcode", "block")
              .filter(col("block").isNotNull),
            "block", "crawl_domain", "crawl_company_name",
            "abr_abn", "abr_company_name",
            cfg.llmStrategy, cfg.llmScore)
          .withColumn("crawl_postcode", col("block"))
          .withColumn("abr_postcode", col("block"))
          .drop("block")
      }

    // U1 + K4 — union stages, stamp load timestamps, project the dwh shape
    val stages = Seq(rule, fuzzy) ++ llm.toSeq
    Cascade.unionStages(stages)
      .withColumn("match_score",
        col("match_score").cast("decimal(5,2)")) // ddl_scripts.sql:87
      .withColumn("created_at", current_timestamp())
      .withColumn("creation_dt", current_timestamp())
      .select("crawl_domain", "crawl_company_name", "crawl_abn",
        "abr_abn", "abr_company_name", "abr_entity_type", "abr_state",
        "abr_postcode", "match_method", "match_score", "match_confidence",
        "created_at", "creation_dt")
  }

  /** Full run: raw stg frames in, dwh match table out. */
  def run(spark: SparkSession, stgAbr: DataFrame, stgCrawl: DataFrame,
      cfg: Config = Config()): DataFrame =
    matchEntities(spark, cleanCrawl(stgCrawl), cleanAbr(stgAbr), cfg)

  /** Attach per-stage match metrics via `Dataset.observe`: the counters
    * ride the job itself (no second pass over the data) and are readable
    * from the returned Observation after any action — the production
    * monitoring hook for the cascade (the reference only had progress
    * prints, e.g. entity_matching.py:269). */
  def withMatchMetrics(matches: DataFrame):
      (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("match_metrics")
    val observed = matches.observe(obs,
      count(lit(1)).as("n_matches"),
      sum(when(col("match_method") === "rule_based_abn", 1L).otherwise(0L))
        .as("n_rule"),
      sum(when(col("match_method") === "fuzzy", 1L).otherwise(0L))
        .as("n_fuzzy"),
      sum(when(col("match_method") === "LLM", 1L).otherwise(0L))
        .as("n_llm"),
      min(col("match_score")).as("min_score"))
    (observed, obs)
  }
}
