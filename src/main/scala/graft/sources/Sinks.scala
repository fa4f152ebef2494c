package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink operators (SURVEY.md §2.2 K1–K4). The reference's hand-rolled
  * batching (50k/500k-row `execute_values` chunks, DROP+CREATE DDL,
  * TRUNCATE, ON CONFLICT no-ops) all collapses into Spark's distributed
  * writers; what remains engine-relevant is layout: partitioning for
  * pruning, bucketing for co-located joins.
  */
object Sinks {

  /** K1/K2 — full-refresh load (abr_parser.py:27-48,
    * commoncrawl_scraper.py:70-125; the reference's ON CONFLICT DO NOTHING
    * has no observable effect and is intentionally dropped). */
  def overwrite(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** K3 — typed full refresh (vs the reference's all-TEXT type erasure,
    * data_cleaning.py:103-153 — schemas stay typed here, SURVEY.md §1.3). */
  def overwriteTyped(df: DataFrame, path: String): Unit =
    overwrite(df, path)

  def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** K4 — match-result load: stamp load timestamps, partition by match
    * method so downstream consumers prune by cascade stage
    * (entity_matching.py:24-83). */
  def writeMatches(matches: DataFrame, path: String): Unit =
    matches
      .withColumn("creation_dt", coalesce(col("creation_dt"), current_timestamp()))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("match_method")
      .parquet(path)

  /** Scale layout: hash-partition by a join key at write time so repeated
    * downstream equi-joins on that key shuffle once here instead of once
    * per query (the parquet-level stand-in for bucketing; saveAsTable
    * bucketBy needs a metastore). */
  def writeKeyPartitioned(df: DataFrame, path: String, key: String,
      numPartitions: Int): Unit =
    df.repartition(numPartitions, col(key))
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
}
