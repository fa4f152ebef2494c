package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("K1 overwrite is a full refresh (second write replaces, not appends)") {
    import spark.implicits._
    val p = Files.createTempDirectory("sink-k1").toString + "/t"
    Sinks.overwrite(Seq(1, 2, 3).toDF("x"), p)
    Sinks.overwrite(Seq(4, 5).toDF("x"), p)
    assert(spark.read.parquet(p).collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(4, 5))
  }

  test("append accumulates") {
    import spark.implicits._
    val p = Files.createTempDirectory("sink-app").toString + "/t"
    Sinks.append(Seq(1).toDF("x"), p)
    Sinks.append(Seq(2).toDF("x"), p)
    assert(spark.read.parquet(p).count() == 2)
  }

  test("K4 writeMatches partitions by match_method and stamps creation_dt") {
    import spark.implicits._
    val p = Files.createTempDirectory("sink-k4").toString + "/t"
    val matches = Seq(
      ("a.com.au", "rule_based_abn"), ("b.com.au", "fuzzy"))
      .toDF("crawl_domain", "match_method")
      .withColumn("creation_dt", lit(null).cast("timestamp"))
    Sinks.writeMatches(matches, p)
    val dirs = new java.io.File(p).listFiles().map(_.getName).filter(_.startsWith("match_method="))
    assert(dirs.toSet == Set("match_method=rule_based_abn", "match_method=fuzzy"))
    val back = spark.read.parquet(p)
    assert(back.filter(col("creation_dt").isNull).count() == 0)
    // partition pruning: reading one method touches one partition dir
    assert(back.filter(col("match_method") === "fuzzy").count() == 1)
  }

  test("key-partitioned layout round trips with stable partition count") {
    import spark.implicits._
    val p = Files.createTempDirectory("sink-bucket").toString + "/t"
    val df = (1 to 100).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    Sinks.writeKeyPartitioned(df, p, "k", 8)
    val back = spark.read.parquet(p)
    assert(back.count() == 100)
    assert(new java.io.File(p).listFiles()
      .count(_.getName.startsWith("part-")) <= 8)
  }
}
