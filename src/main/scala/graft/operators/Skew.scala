package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities.
  *
  * First line of defense at 100 TB is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin`, on by default) — it needs no code
  * changes. Explicit salting remains necessary when a single key is so hot
  * that even a split partition overwhelms one task's build side (e.g. the
  * reference's metro-postcode blocks, SURVEY.md §7.4), or when the skewed
  * join feeds an aggregation that must itself be decomposed.
  */
object Skew {

  /** Salted inner equi-join: the skewed (large) side gets a deterministic
    * per-row salt in [0, saltFactor); the small side is replicated once
    * per salt value; the join key becomes (key, salt). Result equals the
    * plain inner join, but the hot key's rows spread over `saltFactor`
    * tasks.
    *
    * The salt is a hash of the whole skewed-side row (deterministic →
    * reproducible plans, no `rand()` re-execution hazards under task
    * retry).
    */
  def saltedInnerJoin(
      skewed: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.map(col).toIndexedSeq: _*)),
        lit(saltFactor.toLong)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(
        array((0 until saltFactor).map(i => lit(i)): _*)))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * pre-aggregate on (key, salt), then combine per key. Spark's hash
    * aggregate already does map-side partial combine; this helper exists
    * for aggregations where the COMBINE state is large (e.g. collect-ish)
    * and a single reducer for the hot key would spill. */
  def twoPhaseAgg(
      df: DataFrame, key: String, saltFactor: Int,
      partial: Map[String, Column => Column],
      combine: Map[String, Column => Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)),
        lit(saltFactor.toLong)).cast("int"))
    val pre = salted.groupBy(col(key), col("__salt"))
      .agg(partial.head._2(col(partial.head._1)).as(partial.head._1),
        partial.tail.map { case (c, f) => f(col(c)).as(c) }.toSeq: _*)
    pre.groupBy(col(key))
      .agg(combine.head._2(col(combine.head._1)).as(combine.head._1),
        combine.tail.map { case (c, f) => f(col(c)).as(c) }.toSeq: _*)
  }
}
