package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table catalog over a driver testdata dir
  * (`/root/testdata/sf*`, see TESTDATA.md). One parquet file per table.
  *
  * At cluster scale these would be partitioned parquet/iceberg table roots;
  * the API surface (named-table access, column pruning + predicate pushdown
  * via the parquet datasource) is identical.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql(...)` works over
    * the catalog (the SQL entry surface next to the DataFrame API). */
  def registerAll(s: SparkSession, d: String): Unit =
    All.foreach { name =>
      val df = if (name == "events") events(s, d) else load(s, d, name)
      df.createOrReplaceTempView(name)
    }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** The events parquet stores TIMESTAMP(NANOS); Spark has no nanosecond
    * timestamp type, so the session must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[graft.Spark]]) and
    * we rebuild `ts` as a microsecond timestamp here (integer `DIV`, no
    * double round-trip — nanos exceed double's 53-bit mantissa). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
