package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark 4 VARIANT for schemaless JSON payloads (the modern form of the
  * reference's JSONB columns — SURVEY.md §1.2). */
class VariantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("parse_json to VARIANT and typed field extraction") {
    import spark.implicits._
    val df = Seq(
      """{"k": 7, "tags": ["a", "b"], "nested": {"x": 1.5}}""",
      """{"k": 9, "tags": [], "nested": {"x": -2.0}}""")
      .toDF("props")
      .select(parse_json(col("props")).as("v"))
    val got = df.select(
      try_variant_get(col("v"), "$.k", "int").as("k"),
      try_variant_get(col("v"), "$.nested.x", "double").as("x"),
      try_variant_get(col("v"), "$.missing", "string").as("m"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.isNullAt(2)))
    assert(got.toSeq == Seq((7, 1.5, true), (9, -2.0, true)))
  }

  test("variant survives a parquet round trip") {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("variant").toString + "/t"
    Seq("""{"a": 1}""", """{"a": 2}""").toDF("props")
      .select(parse_json(col("props")).as("v")).write.parquet(p)
    val back = spark.read.parquet(p)
      .select(try_variant_get(col("v"), "$.a", "long").as("a"))
      .collect().map(_.getLong(0)).sorted
    assert(back.toSeq == Seq(1L, 2L))
  }

  test("events.props parses as variant at scale") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val sumK = events.select(
        try_variant_get(parse_json(col("props")), "$.k", "long").as("k"))
      .agg(sum(col("k"))).head().getLong(0)
    val viaJson = events.select(
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .agg(sum(col("k"))).head().getLong(0)
    assert(sumK == viaJson)
  }
}
