package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S6 — the reference's actual table substrate is a SQL database
  * (pd.read_sql / psycopg2, SURVEY.md §2.1 S6): covered here against an
  * embedded Derby over real JDBC, incl. write, read-back, and predicate
  * pushdown into the JDBC scan. Plus the ORC columnar format round trip.
  */
class JdbcAndOrcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("jdbc write + read-back + predicate pushdown (embedded Derby)") {
    import spark.implicits._
    val db = java.nio.file.Files.createTempDirectory("derby").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    val df = (1 to 100).map(i => (i.toLong, s"company$i", i % 10))
      .toDF("id", "name", "bucket")
    df.write.mode("overwrite").jdbc(url, "companies", props)

    val back = spark.read.jdbc(url, "companies", props)
    assert(back.count() == 100)

    val filtered = back.filter(col("bucket") === 3)
    assert(filtered.count() == 10)
    // Catalyst pushes the predicate into the JDBC source scan
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("bucket"),
      s"JDBC pushdown missing:\n${plan.take(1200)}")
  }

  test("orc round trip preserves schema and values") {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("orc").toString + "/t"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    df.write.orc(p)
    val back = spark.read.orc(p)
    // nullability widens through the file round trip; field names/types hold
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.as[(Long, String, Double)].collect().sorted.toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5)))
  }
}
