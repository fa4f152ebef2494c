package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Storage hygiene for driver-controlled iteration loops.
  *
  * `localCheckpoint` persists its blocks (MEMORY_AND_DISK) and nothing
  * ever frees them within a session — a loop that checkpoints per round
  * accumulates one obsolete block set per iteration, and a repeated
  * caller (a bench loop, a long-lived notebook) leaks executor storage
  * until eviction churn dominates runtime (the round-7 PageRank lesson:
  * 22 s → 2.4 s warm-run difference). The fix is structural: a round's
  * checkpoint is only referenced until the NEXT round's checkpoint is
  * materialized, so each loop unpersists the superseded generation as
  * soon as its successor's materializing action has run — bounded
  * live-block footprint (≤ 2 generations) at any iteration count.
  *
  * The returned frame's own (final) checkpoint stays persisted — the
  * caller reads through it; like any localCheckpoint it lives until the
  * session ends or the RDD is garbage-collected.
  */
private[graft] object CheckpointHygiene {

  /** `df.localCheckpoint(eager)` plus the handle of the persisted RDD
    * backing the returned frame, taken from the frame's own plan (the
    * checkpointed Dataset is a scan over exactly that RDD). Reading the
    * handle off the frame — rather than diffing the context's global
    * persistence map — is what makes this safe under CONCURRENT loops
    * on one SparkContext (graft.Verify runs queries 4 at a time): a
    * global diff can capture another thread's fresh checkpoint and hand
    * it to the wrong loop to free. */
  def checkpointTracked(df: DataFrame,
      eager: Boolean = false): (DataFrame, Seq[RDD[_]]) = {
    val out = df.localCheckpoint(eager)
    val rdds = out.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    (out, rdds)
  }

  /** Unpersist a superseded checkpoint generation. ONLY call after the
    * successor checkpoint is materialized (its action has run): a
    * localCheckpoint's lineage is truncated, so dropped blocks are not
    * recomputable. */
  def free(rdds: Seq[RDD[_]]): Unit =
    rdds.foreach(_.unpersist(blocking = false))
}
