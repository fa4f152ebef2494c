package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Targeted data selection for training-mix construction.
  *
  * [[targetAffinity]] is the relational core of DSIR (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): rank a raw candidate pool by similarity to a small
  * TARGET (seed) corpus through hashed word features. DSIR proper scores
  * the log-likelihood ratio of two hashed n-gram bag models; this
  * variant keeps the identical pipeline shape — hash features into
  * `nBuckets`, aggregate the target profile, score each candidate
  * against it — but the score is the exact integer bilinear affinity
  * Σ_b count_doc(b)·count_target(b), so the whole selection decision is
  * engine-reproducible (md5 feature hashing, BIGINT arithmetic; the only
  * double is one final normalization divide of exact integers — the q68
  * argument).
  *
  * Scale shape: tokenization is map-only; candidate features shuffle as
  * (doc, bucket, count) partial-aggregated rows; the target profile is
  * at most `nBuckets` rows, built by a distributed aggregation and
  * BROADCAST back — nothing reaches the driver; the scoring join is an
  * equi-join on the bucket id. At 100 TB the target corpus is the small
  * curated seed (DSIR's setting), so the profile stays tiny by
  * construction.
  */
object Selection {

  /** Per-candidate affinity to the target profile. `isTarget` marks the
    * seed rows (scored rows are the complement). Output:
    * (doc_id, n_tokens, affinity, rel_affinity) — `rel_affinity` the
    * length-normalized score to rank by; token-less docs contribute no
    * features and are absent. */
  def targetAffinity(
      docs: DataFrame, textCol: String, idCol: String,
      isTarget: Column, nBuckets: Int = 4096): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val norm = trim(regexp_replace(col(textCol), "[ \\t\\n\\x0B\\f\\r]+", " "))
    val toks = docs.select(col(idCol).as("doc_id"), isTarget.as("__tgt"),
        explode(split(norm, " ")).as("__w"))
      .filter(col("__w") =!= "")
      .select(col("doc_id"), col("__tgt"),
        (graft.functions.PortableHash.md5Long60(col("__w")) % nBuckets)
          .as("bucket"))
    val target = toks.filter(col("__tgt"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("__tcount"))
    val cand = toks.filter(!col("__tgt"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("__c"))
    cand.join(broadcast(target), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__c") * coalesce(col("__tcount"), lit(0L))).as("affinity"))
      .select(col("doc_id"), col("n_tokens"), col("affinity"),
        (col("affinity").cast("double") / col("n_tokens").cast("double"))
          .as("rel_affinity"))
  }
}
