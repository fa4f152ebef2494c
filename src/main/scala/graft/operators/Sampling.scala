package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BottomK

/** Deterministic sampling for training-data pipelines, built on the
  * [[graft.functions.BottomK]] bounded-state aggregate: sample = the k
  * rows with the smallest `xxhash64(id, seed)` — uniform, reproducible,
  * mergeable across partitions, and immune to the task-retry
  * re-execution hazards of `rand()`-based sampling.
  */
object Sampling {

  /** Global deterministic k-sample of id values. */
  def deterministicSample(df: DataFrame, idCol: String, k: Int,
      seed: Int = 42): DataFrame =
    df.agg(BottomK.bottom_k(
        xxhash64(col(idCol), lit(seed)), col(idCol), k).as("sample"))
      .select(explode(col("sample")).as("s"))
      .select(col("s.value").cast("long").as(idCol))

  /** Per-group deterministic k-sample (stratified). */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
      k: Int, seed: Int = 42): DataFrame =
    stratifiedSampleByKey(df, groupCol, idCol, k,
      xxhash64(col(idCol), lit(seed)))

  /** Engine-portable deterministic sort key: the first 60 bits of
    * `md5("<id>:<seed>")`. Any md5-capable engine reproduces it
    * (`('0x'||substr(md5(id||':'||seed),1,15))::BIGINT` in DuckDB), which
    * lets an external oracle verify the sample exactly; `xxhash64` stays
    * the fast default key. Key collisions don't break parity: BottomK
    * orders by (key, value-as-string), so the oracle's
    * `ORDER BY key, id::VARCHAR` reproduces the pick even on a collision. */
  def portableKey(id: org.apache.spark.sql.Column, seed: Int): org.apache.spark.sql.Column =
    conv(substring(md5(concat(id.cast("string"), lit(s":$seed"))), 1, 15),
      16, 10).cast("long")

  /** Per-group bottom-k by an arbitrary deterministic key column. */
  def stratifiedSampleByKey(df: DataFrame, groupCol: String, idCol: String,
      k: Int, key: org.apache.spark.sql.Column): DataFrame =
    df.groupBy(col(groupCol))
      .agg(BottomK.bottom_k(key, col(idCol), k).as("sample"))
      .select(col(groupCol), explode(col("sample")).as("s"))
      .select(col(groupCol), col("s.value").cast("long").as(idCol))
}
