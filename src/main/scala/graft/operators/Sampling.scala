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
    df.groupBy(col(groupCol))
      .agg(BottomK.bottom_k(
        xxhash64(col(idCol), lit(seed)), col(idCol), k).as("sample"))
      .select(col(groupCol), explode(col("sample")).as("s"))
      .select(col(groupCol), col("s.value").cast("long").as(idCol))
}
