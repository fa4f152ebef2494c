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
  /** Normalize an event-time column to `TimestampType` regardless of how
    * the parquet writer annotated it. Real pipelines meet all three
    * shapes, often from different writers of the same logical table:
    *
    *  - `TIMESTAMP(NANOS)` read as `LongType` (via
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, see [[graft.Spark]]):
    *    rebuilt as a microsecond timestamp with integer `DIV` (no double
    *    round-trip — nanos exceed double's 53-bit mantissa).
    *  - `TIMESTAMP_MICROS(isAdjustedToUTC=0)` read as `TimestampNTZType`:
    *    cast to `TimestampType` under session-timezone semantics. Every
    *    graft entry point pins the session timezone to UTC, so the cast
    *    relabels the same instant rather than shifting it. Without this,
    *    `.withWatermark` hard-fails (`EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`)
    *    — watermarks require `TimestampType`.
    *  - `TIMESTAMP_MICROS(isAdjustedToUTC=1)` read as `TimestampType`:
    *    passed through.
    */
  private[graft] def normalizeTs(df: DataFrame, c: String = "ts"): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema(c).dataType match {
      case LongType =>
        df.withColumn(c, timestamp_micros(expr(s"$c DIV 1000")))
      case TimestampNTZType =>
        df.withColumn(c, col(c).cast(TimestampType))
      case _ => df
    }
  }

  /** Events with `ts` normalized to `TimestampType` — see [[normalizeTs]]
    * for the writer annotations tolerated. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
