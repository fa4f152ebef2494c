package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the clustering step that turns
  * near-duplicate PAIRS (from [[Dedup.minhashLsh]] etc.) into dedup
  * groups with one canonical representative each. Label-propagation on
  * DataFrames: every vertex converges to the minimum id reachable from it.
  *
  * Iterations are driver-controlled but each step is a fully distributed
  * join+aggregate; lineage is truncated per step (localCheckpoint) so the
  * plan doesn't grow with iteration count. Near-dup clusters have tiny
  * diameters, so convergence is typically 2–3 rounds.
  */
object Components {

  /** @param pairs DataFrame with two id columns (edges, undirected)
    * @return (id, component) — component = min id in the component */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(false)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(false)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("component")).as("neighbor_min"))
      // the previous label rides along into the checkpoint so the
      // convergence check is a filter+count over the checkpointed frame —
      // one materializing action per iteration instead of a second
      // join+count against the old labels
      val updated = labels.withColumnRenamed("component", "old")
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("old"), coalesce(col("neighbor_min"), col("old")))
            .as("component"),
          col("old"))
        .localCheckpoint(false)
      val changed = updated.filter(col("component") =!= col("old")).count()
      labels = updated.select(col("id"), col("component"))
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Dedup keep-list from near-dup pairs over a corpus: every id mapped to
    * its canonical representative (component minimum); ids with no dup
    * pair map to themselves. */
  def dedupAssignments(
      corpus: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol)
    corpus.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("keep_id"))
  }
}
