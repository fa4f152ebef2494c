package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{AbrCompany, CleanedAbr}

/** Source-format coverage (csv/json round trips with explicit schemas)
  * and the typed Dataset[T] API over the layer case classes (SURVEY.md
  * §1.1 Spark mapping). */
class FormatsAndTypedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("csv round trip with explicit schema (header, typed columns)") {
    import spark.implicits._
    val p = Files.createTempDirectory("fmt-csv").toString + "/t"
    val df = Seq((1L, "Acme Pty Ltd", 12.5), (2L, "Wattle, Inc", 7.25))
      .toDF("id", "name", "score")
    df.write.option("header", "true").csv(p)
    val back = spark.read
      .option("header", "true")
      .schema("id LONG, name STRING, score DOUBLE")
      .csv(p)
    assert(back.as[(Long, String, Double)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "Acme Pty Ltd", 12.5), (2L, "Wattle, Inc", 7.25)))
  }

  test("json lines round trip (the CC index-scan shape, SURVEY §2.1 S2)") {
    val p = Files.createTempDirectory("fmt-json").toString + "/t"
    val jsonl = Seq(
      """{"url": "https://a.com.au/", "offset": 100, "length": 50}""",
      """{"url": "https://b.com.au/", "offset": 900, "length": 70}""",
      """not json — malformed lines must not kill the scan""")
    Files.writeString(java.nio.file.Paths.get(
      Files.createDirectories(java.nio.file.Paths.get(p)).toString, "part.jsonl"),
      jsonl.mkString("\n"))
    val back = spark.read
      .schema("url STRING, offset LONG, length LONG, _corrupt_record STRING")
      .json(p)
    assert(back.filter(col("url").isNotNull).count() == 2) // malformed skipped
  }

  test("parquet schema evolution: mergeSchema unions column sets") {
    import spark.implicits._
    val p = Files.createTempDirectory("evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "name").write.parquet(p + "/v=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(p + "/v=2")
    val back = spark.read.option("mergeSchema", "true").parquet(p)
    assert(back.columns.toSet == Set("id", "name", "score", "v"))
    val rows = back.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score"))) // old rows null-pad
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.5)
  }

  test("typed Dataset[AbrCompany] round trip and typed transforms") {
    import spark.implicits._
    val rows = Seq(
      AbrCompany("51824753556", "Harbour Mining Group Pty Ltd",
        "Australian Private Company", "Active", "NSW 2000", "2000", "NSW",
        java.sql.Date.valueOf("2019-04-01")),
      AbrCompany("99999999999", "Wattle Consulting", "Individual",
        "Cancelled", null, "3000", "VIC", null))
    val ds = rows.toDS()
    // typed filter + map keep compile-time field checks
    val active = ds.filter(_.entity_status == "Active")
      .map(c => CleanedAbr(c.abn, c.entity_name.toUpperCase,
        c.entity_type, c.state, c.postcode))
    val got = active.collect()
    assert(got.length == 1)
    assert(got.head.entity_name == "HARBOUR MINING GROUP PTY LTD")
    // round trip through parquet keeps the encoder schema
    val p = Files.createTempDirectory("typed").toString + "/t"
    ds.write.parquet(p)
    assert(spark.read.parquet(p).as[AbrCompany].collect().map(_.abn).sorted.toSeq
      == Seq("51824753556", "99999999999"))
  }
}
