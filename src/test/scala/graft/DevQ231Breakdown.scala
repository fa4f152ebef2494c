package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only q231 stage probe: how much of normalized decontamination is
  * the per-token normalization lambda vs the SA machinery. */
object DevQ231Breakdown {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    SparkEntry.queries("q01_pricing_summary")(spark, dir).count() // warm
    def tokNorm(c: Column, sentinel: String): Column =
      concat_ws(" ", transform(split(c, "\\s+"), t => {
        val n = regexp_replace(
          functions.exprs.nfc_normalize(lower(t)),
          "[^\\p{L}\\p{N}]+", "")
        when(n === "", lit(sentinel)).otherwise(n)
      }))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    (1 to 2).foreach { i =>
      tm(s"raw text noop #$i")(noop(docs))
      tm(s"tokNorm noop #$i")(noop(
        docs.select(col("doc_id"), tokNorm(col("text"), "c"))))
    }
    (1 to 2).foreach { i =>
      tm(s"q231 full #$i")(
        SparkEntry.queries("q231_normalized_decontam")(spark, dir).count())
      tm(s"q229 full #$i")(
        SparkEntry.queries("q229_exact_substr_decontam")(spark, dir).count())
    }
    spark.stop()
  }
}
