package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two strategies:
  *   - [[bruteForceTopK]]: exact — broadcast the (small) query set against
  *     the corpus, score every pair, per-query top-k window. The baseline
  *     and the verifier for the approximate paths. Scales in the corpus
  *     dimension (corpus stays partitioned; only queries are broadcast).
  *   - [[lshTopK]]: random-hyperplane LSH — bucket corpus and queries by
  *     sign-bit signatures, score only within shared buckets. The 100 TB
  *     path: candidate generation is an equi-join on the signature, so no
  *     full cross product ever materializes.
  *
  * All arithmetic is done in double (floats are widened first) with
  * sequential fold order, so results are bit-deterministic.
  */
object Ann {

  /** Cosine similarity of two array<double> columns, built from codegen'd
    * higher-order functions (`zip_with` dot product + `aggregate` fold). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Dimensionality of the embedding column (reads one row). */
  def dimOf(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  /** Deterministic random hyperplanes: `planes` rows of `dim` doubles. */
  private def planesFor(dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit signature of a vector against the seeded hyperplanes,
    * packed into a long: bit j = (v · plane_j) > 0. The planes enter the
    * plan as single array LITERALS (`typedlit`), not per-row CreateArray
    * nodes — constant-folded once, not rebuilt for every row. */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int, seed: Long): Column = {
    val ps = planesFor(dim, planes, seed)
    val v = transform(vec, _.cast("double"))
    val bits = ps.zipWithIndex.map { case (p, j) =>
      val planeLit = typedlit(p.toSeq)
      val d = aggregate(zip_with(v, planeLit, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** Exact top-k neighbors for each query vector. `queries` must be small
    * enough to broadcast (the usual ANN-serving shape). Ties broken by
    * corpus id ascending for determinism. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), _.cast("double")).as("__cv"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("__qv"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** LSH-bucketed approximate top-k: score only pairs sharing a signature
    * under at least one of `tables` independent hyperplane sets. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int, planes: Int = 8, tables: Int = 4, seed: Long = 42L,
      excludeSelf: Boolean = true): DataFrame = {
    val dim = dimOf(corpus, vecCol)
    // signatures-only exploded view: the vector array is NOT duplicated
    // across the `tables` rows of the bucket-join shuffle
    def withSigs(df: DataFrame, id: String, out: String): DataFrame =
      df.select(col(id).as(out),
          posexplode(array((0 until tables).map(t =>
            hyperplaneSignature(col(vecCol), dim, planes, seed + t)): _*))
            .as(Seq("table", "sig")))
    val c = withSigs(corpus, idCol, "neighbor_id")
    val q = withSigs(queries, queryIdCol, "query_id")
    val cand = c.join(q, Seq("table", "sig"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select("query_id", "neighbor_id").distinct()
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), _.cast("double")).as("__v_neighbor_id"))
    val qv = queries.select(col(queryIdCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("__v_query_id"))
    val scored = cand
      .join(broadcast(qv), Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .withColumn("cosine",
        cosine(col("__v_query_id"), col("__v_neighbor_id")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }
}
