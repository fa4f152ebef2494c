package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.exprs

/** Rule-based data-quality gates. The reference embeds its checks inline
  * as extraction filters (ABN checksum commoncrawl_scraper.py:40-57, AU
  * postcode class :65-67, 11-digit gate data_cleaning.py:71-75, state
  * whitelist :31-53); here they are declarative named rules evaluated in
  * ONE pass that splits a frame into (valid, quarantine) with per-row
  * failure reasons — the standard large-pipeline pattern (bad rows are
  * never dropped silently; quarantine is auditable).
  */
object Validate {

  final case class RuleSet(rules: Seq[(String, Column)]) {
    def and(name: String, predicate: Column): RuleSet =
      RuleSet(rules :+ (name -> predicate))
  }

  def rules(first: (String, Column), rest: (String, Column)*): RuleSet =
    RuleSet(first +: rest)

  /** Evaluate all rules in one projection; returns the input plus
    * `__failed: array<string>` of violated rule names (empty = valid). */
  def check(df: DataFrame, rs: RuleSet): DataFrame = {
    val failed = array_compact(array(rs.rules.map { case (name, pred) =>
      // null predicate result counts as a failure (unknown ≠ valid)
      when(coalesce(pred, lit(false)), lit(null).cast("string"))
        .otherwise(lit(name))
    }: _*))
    df.withColumn("__failed", failed)
  }

  def valid(checked: DataFrame): DataFrame =
    checked.filter(size(col("__failed")) === 0).drop("__failed")

  def quarantine(checked: DataFrame): DataFrame =
    checked.filter(size(col("__failed")) > 0)

  /** The reference pipeline's company-record rule set. */
  def companyRules: RuleSet = rules(
    "abn_checksum" -> exprs.abn_valid(col("abn")),
    "postcode_au" -> col("postcode").rlike("^(0[289][0-9]{2}|[1-9][0-9]{3})$"),
    "state_known" -> col("state").isin(
      graft.functions.Cleaning.StateMapping.values.toSeq.distinct: _*),
    "name_present" -> (col("entity_name").isNotNull &&
      length(trim(col("entity_name"))) > 0))
}
